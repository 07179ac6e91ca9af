"""SDF primitives as pure JAX functions over pytree shape-fields.

TPU-native re-design of the reference's PrimitiveShapeField hierarchy
(reference: deps/torch_robotics/torch_robotics/environments/primitives.py).
Each field is a flat struct of arrays; SDF evaluation is a pure function of
(field, points) so it can live inside jitted samplers and `jax.grad`.

SDF conventions match the reference exactly:
- sphere: ||x - c|| - r                       (primitives.py:108)
- box:    max_d(|x - c|_d - h_d), min boxes   (primitives.py:223-226 — the
          max-coordinate box SDF: exact inside, axis-aligned outside)
- rounded box: ||relu(q)|| + min(max_d q_d, 0) - r, q = |x-c| - h + r
          (primitives.py:312-330)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax.struct import dataclass as pytree_dataclass

BIG = 1e6  # SDF of "no objects"


@pytree_dataclass
class SphereField:
    centers: jax.Array  # (n, dim)
    radii: jax.Array    # (n,)

    def sdf(self, x: jax.Array) -> jax.Array:
        """x: (..., dim) -> (...,) min over spheres."""
        if self.centers.shape[0] == 0:
            return jnp.full(x.shape[:-1], BIG, x.dtype)
        d = jnp.linalg.norm(x[..., None, :] - self.centers, axis=-1) - self.radii
        return d.min(axis=-1)


@pytree_dataclass
class BoxField:
    centers: jax.Array     # (n, dim)
    half_sizes: jax.Array  # (n, dim)

    def sdf(self, x: jax.Array) -> jax.Array:
        """x: (..., dim) -> (...,) min over boxes (reference max-coord SDF)."""
        if self.centers.shape[0] == 0:
            return jnp.full(x.shape[:-1], BIG, x.dtype)
        d = jnp.abs(x[..., None, :] - self.centers) - self.half_sizes  # (..., n, dim)
        return d.max(axis=-1).min(axis=-1)


@pytree_dataclass
class RoundedBoxField:
    centers: jax.Array
    half_sizes: jax.Array
    radius: jax.Array  # (n,)

    def sdf(self, x: jax.Array) -> jax.Array:
        if self.centers.shape[0] == 0:
            return jnp.full(x.shape[:-1], BIG, x.dtype)
        q = jnp.abs(x[..., None, :] - self.centers) - self.half_sizes + self.radius[..., None]
        max_q = q.max(axis=-1)
        outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        d = jnp.minimum(max_q, 0.0) + outside - self.radius
        return d.min(axis=-1)


def union_sdf(fields, x: jax.Array) -> jax.Array:
    """min over a list of primitive fields (reference: ObjectField
    primitives.py:554, env_base.compute_sdf env_base.py:152-168)."""
    if not fields:
        return jnp.full(x.shape[:-1], BIG, x.dtype)
    vals = [f.sdf(x) for f in fields]
    out = vals[0]
    for v in vals[1:]:
        out = jnp.minimum(out, v)
    return out

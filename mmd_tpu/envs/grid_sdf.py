"""Precomputed SDF grid with a surrogate-gradient lookup.

TPU-native re-design of GridMapSDF
(reference: deps/torch_robotics/torch_robotics/environments/grid_map_sdf.py).

The reference precomputes an SDF value grid + an SDF gradient grid, then at
query time does a floor-index lookup and wires the precomputed gradient into
autograd via a surrogate:  sdf(x) := sdf(x̂) + (x - x̂)·∇sdf(x̂)
(grid_map_sdf.py:100-112). We express that directly as a `jax.custom_vjp`:
forward returns the cell value, backward returns the cell gradient. The
whole thing stays in HBM and is one batched gather inside the jitted
guidance step — no host round trip, no autograd replay.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree_dataclass


@pytree_dataclass
class GridSDF:
    lower: jax.Array      # (dim,)
    upper: jax.Array      # (dim,)
    values: jax.Array     # (N0, N1)
    grads: jax.Array      # (N0, N1, dim)

    @property
    def shape(self):
        return self.values.shape


def _cell_index(grid: GridSDF, x: jax.Array) -> jax.Array:
    """Reference indexing (grid_map_sdf.py:100-104): floor((x-lo)/span * N),
    clamped to the grid. Grid points sit on linspace(lo, hi, N)."""
    n = jnp.asarray(grid.values.shape, jnp.int32)
    span = grid.upper - grid.lower
    idx = jnp.floor((x - grid.lower) / span * n.astype(x.dtype)).astype(jnp.int32)
    return jnp.clip(idx, 0, n - 1)


def _lookup(grid: GridSDF, x: jax.Array):
    idx = _cell_index(grid, x)
    i, j = idx[..., 0], idx[..., 1]
    vals = grid.values[i, j]
    grads = grid.grads[i, j]
    return vals, grads


@jax.custom_vjp
def grid_sdf(grid: GridSDF, x: jax.Array) -> jax.Array:
    """Query the SDF grid at points x: (..., dim) -> (...,).

    Differentiable via the precomputed gradient (surrogate-gradient trick,
    grid_map_sdf.py:106-112): value = nearest-cell value, d/dx = nearest-cell
    gradient.
    """
    vals, _ = _lookup(grid, x)
    return vals


def _grid_sdf_fwd(grid, x):
    vals, grads = _lookup(grid, x)
    return vals, grads


def _grid_sdf_bwd(grads, g):
    # No gradient w.r.t. the grid itself (it's static geometry).
    return None, g[..., None] * grads


grid_sdf.defvjp(_grid_sdf_fwd, _grid_sdf_bwd)


def build_grid_sdf(sdf_fn, lower, upper, cell_size: float = 0.005,
                   dtype=jnp.float32) -> GridSDF:
    """Precompute value + gradient grids for `sdf_fn` on a regular grid.

    Mirrors GridMapSDF.precompute_sdf (grid_map_sdf.py:34-63): grid points are
    linspace(lo, hi, ceil(span/cell)); gradients via jax.grad of the analytic
    SDF (the reference uses an autograd jacobian of the same function).
    """
    lower_np = np.asarray(lower, np.float64)
    upper_np = np.asarray(upper, np.float64)
    # Host-side size computation: device float32 ceil can round 2/0.005 to
    # 401 on some backends, desyncing grid shapes across environments.
    n = [int(np.ceil((upper_np[d] - lower_np[d]) / cell_size))
         for d in range(lower_np.shape[0])]
    lower = jnp.asarray(lower, dtype)
    upper = jnp.asarray(upper, dtype)
    axes = [jnp.linspace(lower[d], upper[d], n[d], dtype=dtype) for d in range(len(n))]
    mesh = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)  # (N0, N1, dim)
    pts = mesh.reshape(-1, mesh.shape[-1])

    vals = sdf_fn(pts)
    grads = jax.vmap(jax.grad(lambda p: sdf_fn(p[None])[0]))(pts)
    return GridSDF(
        lower=lower, upper=upper,
        values=vals.reshape(*n),
        grads=grads.reshape(*n, lower.shape[0]),
    )

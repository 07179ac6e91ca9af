"""Dataset normalizers as pure pytree structs.

TPU-native re-design of the reference normalizers
(reference: mmd/datasets/normalization.py:13-196). Instead of stateful
objects bound to a dataset, each normalizer is a small pytree of arrays that
can ride through `jax.jit` / `vmap` boundaries as data.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax.struct import dataclass as pytree_dataclass


@pytree_dataclass
class LimitsNormalizer:
    """Map per-dimension [min, max] -> [-1, 1].

    reference: mmd/datasets/normalization.py:145-168 (LimitsNormalizer).
    The reference's unnormalize clips inputs to [-1, 1] + eps first; we keep
    that behavior (it bounds guidance queries to the trained data range).
    """

    mins: jax.Array  # (D,)
    maxs: jax.Array  # (D,)

    @staticmethod
    def from_data(x: jax.Array) -> "LimitsNormalizer":
        flat = x.reshape(-1, x.shape[-1])
        return LimitsNormalizer(mins=flat.min(axis=0), maxs=flat.max(axis=0))

    @staticmethod
    def from_limits(mins, maxs) -> "LimitsNormalizer":
        return LimitsNormalizer(mins=jnp.asarray(mins, jnp.float32),
                                maxs=jnp.asarray(maxs, jnp.float32))

    @property
    def span(self) -> jax.Array:
        return jnp.maximum(self.maxs - self.mins, 1e-12)

    def normalize(self, x: jax.Array) -> jax.Array:
        # [min, max] -> [0, 1] -> [-1, 1]
        return 2.0 * (x - self.mins) / self.span - 1.0

    def unnormalize(self, x: jax.Array) -> jax.Array:
        # The reference clips to [-1, 1] when out of range (:157-163); an
        # unconditional clip is identical for in-range inputs and avoids a
        # data-dependent branch under jit.
        x = jnp.clip(x, -1.0, 1.0)
        return 0.5 * (x + 1.0) * self.span + self.mins

    def unnormalize_unclipped(self, x: jax.Array) -> jax.Array:
        return 0.5 * (x + 1.0) * self.span + self.mins


@pytree_dataclass
class GaussianNormalizer:
    """Standardize to zero mean / unit std.

    reference: mmd/datasets/normalization.py:120-142.
    """

    means: jax.Array
    stds: jax.Array

    @staticmethod
    def from_data(x: jax.Array) -> "GaussianNormalizer":
        flat = x.reshape(-1, x.shape[-1])
        return GaussianNormalizer(means=flat.mean(axis=0),
                                  stds=jnp.maximum(flat.std(axis=0), 1e-8))

    def normalize(self, x: jax.Array) -> jax.Array:
        return (x - self.means) / self.stds

    def unnormalize(self, x: jax.Array) -> jax.Array:
        return x * self.stds + self.means


def fixed_limits_normalizer(state_dim: int, low: float = -1.0,
                            high: float = 1.0) -> LimitsNormalizer:
    """FixedLimitsNormalizer: constant [-1, 1] limits on every dimension,
    independent of the data (reference: mmd/datasets/normalization.py:188-196).
    """
    return LimitsNormalizer(mins=jnp.full((state_dim,), low, jnp.float32),
                            maxs=jnp.full((state_dim,), high, jnp.float32))


def safe_limits_from_data(x: jax.Array, eps: float = 1.0) -> LimitsNormalizer:
    """SafeLimitsNormalizer: LimitsNormalizer that tolerates constant dims.

    reference: mmd/datasets/normalization.py:171-186. The reference loops
    over dimensions and, for EACH degenerate dim (min == max), widens
    EVERY dim's limits by eps (`self.mins -= eps`, `self.maxs += eps` are
    whole-array ops inside the per-dim loop). We match that semantics
    bit-for-bit — including the quirk that one constant dim widens all
    dims — so normalizers fit on the same data agree with the reference.
    Real trajectory datasets have no constant dims, where this reduces to
    a plain LimitsNormalizer.
    """
    flat = x.reshape(-1, x.shape[-1])
    mins = flat.min(axis=0)
    maxs = flat.max(axis=0)
    n_degenerate = jnp.sum(mins == maxs)
    pad = eps * n_degenerate
    return LimitsNormalizer(mins=mins - pad, maxs=maxs + pad)


def make_normalizer(name: str, x: jax.Array):
    """Normalizer factory over the reference's four-name kwarg surface
    (reference: mmd/datasets/trajectories.py:28 `'LimitsNormalizer'`
    default; normalization.py:120,145,171,188 for the four classes)."""
    if name == "LimitsNormalizer":
        return LimitsNormalizer.from_data(x)
    if name == "GaussianNormalizer":
        return GaussianNormalizer.from_data(x)
    if name == "SafeLimitsNormalizer":
        return safe_limits_from_data(x)
    if name == "FixedLimitsNormalizer":
        return fixed_limits_normalizer(x.shape[-1])
    raise ValueError(f"Unknown normalizer {name!r}; expected one of "
                     "LimitsNormalizer, GaussianNormalizer, "
                     "SafeLimitsNormalizer, FixedLimitsNormalizer")


Normalizer = LimitsNormalizer  # default, matching trajectories.py:28

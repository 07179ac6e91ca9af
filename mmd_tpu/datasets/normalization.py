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


def safe_limits_from_data(x: jax.Array, margin_ratio: float = 0.0) -> LimitsNormalizer:
    """SafeLimitsNormalizer: widen degenerate (min==max) dims by eps.

    reference: mmd/datasets/normalization.py:171-186.
    """
    flat = x.reshape(-1, x.shape[-1])
    mins = flat.min(axis=0)
    maxs = flat.max(axis=0)
    degenerate = maxs - mins < 1e-8
    eps = jnp.where(degenerate, 1.0, margin_ratio * (maxs - mins))
    return LimitsNormalizer(mins=mins - eps * degenerate, maxs=maxs + eps * degenerate)


Normalizer = LimitsNormalizer  # default, matching trajectories.py:28

"""Trajectory metrics, jit-compatible.

Mirrors deps/torch_robotics/torch_robotics/trajectory/metrics.py:7-65.
All take (B, H, D) batches with positions [..., :q_dim], velocities
[..., q_dim:2q_dim].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_path_length(trajs: jax.Array, q_dim: int = 2) -> jax.Array:
    """Sum of segment lengths (metrics.py:7-16). (B, H, D) -> (B,)."""
    pos = trajs[..., :q_dim]
    return jnp.linalg.norm(jnp.diff(pos, axis=-2), axis=-1).sum(-1)


def compute_smoothness(trajs: jax.Array, q_dim: int = 2) -> jax.Array:
    """Sum of ||dvel|| over the horizon (metrics.py:31-40). (B, H, D) -> (B,)."""
    vel = trajs[..., q_dim: 2 * q_dim]
    return jnp.linalg.norm(jnp.diff(vel, axis=-2), axis=-1).sum(-1)


def compute_average_acceleration(trajs: jax.Array, q_dim: int = 2) -> jax.Array:
    """Mean ||dvel|| over the horizon (metrics.py:42-65). (B, H, D) -> (B,)."""
    vel = trajs[..., q_dim: 2 * q_dim]
    return jnp.linalg.norm(jnp.diff(vel, axis=-2), axis=-1).mean(-1)


def compute_variance_waypoints(trajs: jax.Array, q_dim: int = 2) -> jax.Array:
    """Sum over waypoints of the variance of pairwise inter-sample distances
    (metrics.py:18-29). (B, H, D) -> scalar."""
    pos = trajs[..., :q_dim]  # (B, H, q)
    per_t = jnp.swapaxes(pos, 0, 1)  # (H, B, q)
    d = jnp.linalg.norm(per_t[:, :, None, :] - per_t[:, None, :, :], axis=-1)  # (H, B, B)
    B = pos.shape[0]
    iu = jnp.triu_indices(B, k=1)
    # The reference takes var over the flattened upper triangle INCLUDING the
    # zero diagonal/lower entries it zeroed via triu().view(-1); mirror that.
    tri = jnp.where(jnp.triu(jnp.ones((B, B), bool), k=1)[None], d, 0.0)
    flat = tri.reshape(d.shape[0], -1)
    return jnp.var(flat, axis=-1, ddof=1).sum()

"""Constant-velocity GP prior cost, as pure functions.

TPU-native re-design of GPFactor + CostGPTrajectory
(reference: deps/motion_planning_baselines/mp_baselines/planners/costs/
factors/gp_factor.py:4-65, cost_functions.py:505-543).

State s_t = [pos, vel] in R^{2q}. Transition Phi = [[I, dt I], [0, I]];
error e_t = s_{t+1} - Phi s_t; cost = sum_t e_t^T Q_inv e_t with
Q_inv = [[12/dt^3 C, -6/dt^2 C], [-6/dt^2 C, 4/dt C]], C = I/sigma^2
(gp_factor.py:34-50).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def gp_matrices(q_dim: int, dt: float, sigma: float = 1.0):
    """Returns (Phi (2q, 2q), Q_inv (2q, 2q)) as numpy constants."""
    I = np.eye(q_dim, dtype=np.float32)
    Z = np.zeros((q_dim, q_dim), np.float32)
    phi = np.block([[I, dt * I], [Z, I]])
    C = I / sigma**2
    q_inv = np.block([
        [12.0 * dt**-3 * C, -6.0 * dt**-2 * C],
        [-6.0 * dt**-2 * C, 4.0 * dt**-1 * C],
    ]).astype(np.float32)
    return phi, q_inv


def gp_error(trajs: jax.Array, dt: float) -> jax.Array:
    """e_t = s_{t+1} - Phi s_t. trajs: (..., H, 2q) -> (..., H-1, 2q)."""
    q_dim = trajs.shape[-1] // 2
    phi, _ = gp_matrices(q_dim, dt)
    phi = jnp.asarray(phi, trajs.dtype)
    return trajs[..., 1:, :] - trajs[..., :-1, :] @ phi.T


def gp_trajectory_cost(trajs: jax.Array, dt: float, sigma: float = 1.0) -> jax.Array:
    """Per-trajectory GP smoothness cost. (..., H, 2q) -> (...,).

    Matches CostGPTrajectory.eval (cost_functions.py:531-543): quadratic form
    of per-step errors under Q_inv, summed over the horizon.
    """
    q_dim = trajs.shape[-1] // 2
    _, q_inv = gp_matrices(q_dim, dt, sigma)
    q_inv = jnp.asarray(q_inv, trajs.dtype)
    e = gp_error(trajs, dt)  # (..., H-1, 2q)
    return jnp.einsum("...ti,ij,...tj->...", e, q_inv, e)

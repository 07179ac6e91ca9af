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


# ----------------------------------------------------- GP trajectory prior
def const_vel_trajectory(start_state: jax.Array, goal_state: jax.Array,
                         horizon: int, dt: float,
                         zero_endpoint_vel: bool = True) -> jax.Array:
    """Constant-velocity mean trajectory (H, 2q) bridging start -> goal
    (reference: mp_priors_multi.py:131-151 const_vel_trajectory)."""
    q = start_state.shape[-1] // 2
    alpha = jnp.linspace(0.0, 1.0, horizon)[:, None]
    pos = (1 - alpha) * start_state[:q][None] + alpha * goal_state[:q][None]
    mean_vel = (goal_state[:q] - start_state[:q]) / ((horizon - 1) * dt)
    vel = jnp.tile(mean_vel[None], (horizon, 1))
    if zero_endpoint_vel:
        vel = vel.at[0].set(0.0).at[-1].set(0.0)
    return jnp.concatenate([pos, vel], -1)


@functools.lru_cache(maxsize=8)
def gp_prior_precision(horizon: int, q_dim: int, dt: float,
                       sigma_start: float = 1e-3, sigma_gp: float = 2e-1,
                       sigma_goal: float = 1e-3) -> np.ndarray:
    """Full-trajectory precision K_inv = A^T Q_inv A of the goal-directed
    constant-velocity GP (reference: mp_priors_multi.py:215-262
    get_const_vel_covariance — the sparse lifted-system form; Mukadam et
    al., GPMP2). Returns an (M, M) numpy constant, M = 2*q_dim*horizon.
    """
    D = 2 * q_dim
    M = D * horizon
    phi, q_inv = gp_matrices(q_dim, dt, sigma_gp)
    A = np.eye(M, dtype=np.float64)
    for t in range(horizon - 1):
        A[D * (t + 1):D * (t + 2), D * t:D * (t + 1)] = -phi
    goal_row = np.zeros((D, M))
    goal_row[:, -D:] = np.eye(D)
    A = np.concatenate([A, goal_row], 0)
    blocks = ([np.eye(D) / sigma_start**2]
              + [q_inv.astype(np.float64)] * (horizon - 1)
              + [np.eye(D) / sigma_goal**2])
    Q_inv = np.zeros((M + D, M + D))
    off = 0
    for b in blocks:
        Q_inv[off:off + D, off:off + D] = b
        off += D
    return (A.T @ Q_inv @ A).astype(np.float32)


def sample_gp_prior(key: jax.Array, start_state: jax.Array,
                    goal_state: jax.Array, horizon: int, dt: float,
                    n_samples: int, sigma_start: float = 1e-3,
                    sigma_gp: float = 2e-1,
                    sigma_goal: float = 1e-3) -> jax.Array:
    """Draw (n_samples, H, 2q) trajectories from the goal-directed GP prior
    N(const-vel mean, K_inv^-1) — the reference's MultiMPPrior sampling
    (mp_priors_multi.py:104-110 dist.sample via precision matrix), used for
    diverse trajectory initialization. Sampling uses the precision Cholesky:
    x = mean + L^-T z with L = chol(K_inv).
    """
    q_dim = start_state.shape[-1] // 2
    mean = const_vel_trajectory(start_state, goal_state, horizon, dt)
    k_inv = jnp.asarray(gp_prior_precision(horizon, q_dim, dt, sigma_start,
                                           sigma_gp, sigma_goal))
    L = jnp.linalg.cholesky(k_inv)                      # (M, M)
    z = jax.random.normal(key, (n_samples, k_inv.shape[0]))
    dev = jax.scipy.linalg.solve_triangular(L.T, z.T, lower=False).T
    return mean[None] + dev.reshape(n_samples, horizon, 2 * q_dim)

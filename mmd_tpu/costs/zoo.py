"""Off-main-path cost zoo, as pure jit-compatible functions.

TPU-native re-design of the remaining reference cost surface
(reference: deps/motion_planning_baselines/mp_baselines/planners/costs/
cost_functions.py:332-745): CostMaxVelocity (:332),
CostVelocityAndDirectionAlignment (:358), CostSmoothnessCHOMP (:559),
CostJointLimits (:581), CostGoalPrior (:678). None of these are used by
MMD's main planning path; they are reachable through the env
planner-param hooks (env_base.py:266-276) and the guide's optional extra
costs, and are wired here as optional `GuideConfig` terms
(mmd_tpu/costs/guide.py).

Conventions: trajectories are (..., H, D) with D = [pos(q), vel(q)];
all functions return per-trajectory costs (...,) unless noted. Matrix
constants are cached numpy (same pattern as costs/gp.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def finite_difference_vector(x: jax.Array, dt: float = 1.0,
                             method: str = "central") -> jax.Array:
    """Finite differences along the horizon with zero-padded borders
    (reference: torch_robotics/trajectory/utils.py:89-100)."""
    d = jnp.zeros_like(x)
    if method == "forward":
        return d.at[..., :-1, :].set(jnp.diff(x, axis=-2) / dt)
    if method == "backward":
        return d.at[..., 1:, :].set(jnp.diff(x, axis=-2) / dt)
    if method == "central":
        return d.at[..., 1:-1, :].set(
            (x[..., 2:, :] - x[..., :-2, :]) / (2.0 * dt))
    raise NotImplementedError(method)


def cost_max_velocity(trajs: jax.Array, dt: float, max_vel: float,
                      q_dim: int = 2) -> jax.Array:
    """Squared deviation of the central-difference velocity from `max_vel`,
    summed over state dims: (..., H, D) -> (..., H)
    (reference CostMaxVelocity.eval, cost_functions.py:345-352 — the
    per-component penalty, including the zero-padded border rows, is
    mirrored exactly)."""
    pos = trajs[..., :q_dim]
    vel = finite_difference_vector(pos, dt=dt, method="central")
    return jnp.sum((vel - max_vel) ** 2, axis=-1)


def cost_velocity_direction_alignment(trajs: jax.Array, dt: float,
                                      q_dim: int = 2,
                                      eps: float = 1e-8) -> jax.Array:
    """Sum over the horizon of dot(state direction, normalized spatial
    velocity): (..., H, D) -> (...,).

    The reference class (cost_functions.py:358-374) calls
    `robot.get_direction_vector` / `get_spatial_component`, which exist
    NOWHERE in the released deps — the cost cannot execute upstream. We
    implement its documented intent for the [pos, vel] state: direction =
    the state's (normalized) velocity block, spatial velocity = central
    finite difference of positions.
    """
    pos = trajs[..., :q_dim]
    direction = trajs[..., q_dim:2 * q_dim]
    direction = direction / (
        jnp.linalg.norm(direction, axis=-1, keepdims=True) + eps)
    v = finite_difference_vector(pos, dt=dt, method="central")
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)
    return jnp.sum(direction * v, axis=(-2, -1))


@functools.lru_cache(maxsize=16)
def chomp_precision(horizon: int, dt: float) -> np.ndarray:
    """CHOMP time-correlated precision R = K^T K with K the backward
    finite-difference operator, boundary rows included
    (reference: chomp.py:82-101 _get_R_mat). (H, H) numpy constant."""
    K = np.eye(horizon) - np.diag(np.ones(horizon - 1), -1)
    K = np.concatenate([K, np.zeros((1, horizon))], axis=0)
    K[-1, -1] = -1.0
    K = K / dt**2
    return (K.T @ K).astype(np.float32)


def cost_smoothness_chomp(trajs: jax.Array, dt: float) -> jax.Array:
    """CHOMP smoothness x_d^T R x_d summed over state dims:
    (..., H, D) -> (...,) (reference CostSmoothnessCHOMP.eval,
    cost_functions.py:559-578 via batched_weighted_dot_prod,
    torch_utils.py:134-147)."""
    H = trajs.shape[-2]
    R = jnp.asarray(chomp_precision(H, dt), trajs.dtype)
    return jnp.einsum("...td,ts,...sd->...", trajs, R, trajs)


def cost_joint_limits(trajs: jax.Array, q_min: jax.Array, q_max: jax.Array,
                      eps: float = float(np.deg2rad(3)),
                      q_dim: int = 2) -> jax.Array:
    """Squared penetration beyond the eps-shrunk limit box
    [q_min + eps, q_max - eps]: (..., H, D) -> (...,).

    Reference CostJointLimits.eval (cost_functions.py:581-610). NOTE: the
    reference's flat argwhere gather accidentally sums violations across
    the whole BATCH into one scalar; the per-trajectory reduction here is
    the evident intent (and what a cost must return to rank candidates).
    """
    pos = trajs[..., :q_dim]
    lower = jnp.maximum(q_min + eps - pos, 0.0)
    upper = jnp.maximum(pos - (q_max - eps), 0.0)
    return jnp.sum(lower**2 + upper**2, axis=(-2, -1))


def cost_goal_prior(trajs: jax.Array, goal_state: jax.Array,
                    sigma: float = 1.0) -> jax.Array:
    """Gaussian prior on the final state: (..., H, D) -> (...,).

    err^T K err with err = goal - x_{H-1} and K = I/sigma^2 (reference
    CostGoalPrior.eval via UnaryFactor, cost_functions.py:713-728,
    unary_factor.py:24-31; the reference's multi-goal reshape is a
    particles-per-goal batching artifact — broadcasting `goal_state` to
    (..., D) expresses the same thing).
    """
    err = goal_state - trajs[..., -1, :]
    return jnp.sum(err * err, axis=-1) / sigma**2

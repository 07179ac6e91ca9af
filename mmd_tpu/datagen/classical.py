"""Classical trajectory-optimization baselines, jitted and particle-batched.

TPU-native re-designs of the mp_baselines planners the reference exposes via
its env param hooks (SURVEY.md section 2.3; deps/motion_planning_baselines/
mp_baselines/planners/{chomp,stomp,mppi,stoch_gpmp}.py). These are not on
the MMD main path (only GPMP2+RRT feed data generation) but complete the
baseline inventory. Each is a pure function: `lax.scan` over iterations,
`vmap` over particles.

All operate on (P, H, 4) [pos, vel] trajectories against a SceneData grid
SDF, with endpoints pinned to start/goal states.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.costs.gp import gp_matrices, gp_trajectory_cost
from mmd_tpu.envs.envs import SceneData
from mmd_tpu.envs.grid_sdf import grid_sdf
from mmd_tpu.tasks.task import boundary_signed_distances


def _obstacle_cost(scene: SceneData, pos: jax.Array, margin: float) -> jax.Array:
    """(..., H, 2) -> (...,) hinge obstacle+boundary cost."""
    from mmd_tpu.tasks.task import scene_object_sdf
    sd_obj = scene_object_sdf(scene, pos)
    sd_b = jnp.min(boundary_signed_distances(scene, pos), axis=-1)
    sd = jnp.minimum(sd_obj, sd_b)
    return jnp.maximum(margin - sd, 0.0).sum(-1)


def _pin_endpoints(trajs, start_state, goal_state):
    return trajs.at[..., 0, :].set(start_state).at[..., -1, :].set(goal_state)


# ------------------------------------------------------------------- CHOMP
@dataclasses.dataclass(frozen=True)
class CHOMPConfig:
    """reference hook values: env_conveyor_2d.py:123-140."""

    opt_iters: int = 100
    step_size: float = 0.05
    grad_clip: float = 0.05
    weight_prior_cost: float = 1e-4
    dt: float = 5.0 / 64.0
    collision_margin: float = 1.1 * 0.05 + 0.03


@functools.partial(jax.jit, static_argnames=("cfg",))
def chomp_optimize(scene: SceneData, start_state, goal_state,
                   init_trajs: jax.Array, cfg: CHOMPConfig) -> jax.Array:
    """Covariant gradient descent: obstacle + GP-smoothness gradients,
    clipped steps, pinned endpoints (reference: chomp.py)."""

    def cost(trajs):
        c_obs = _obstacle_cost(scene, trajs[..., :2], cfg.collision_margin)
        c_smooth = cfg.weight_prior_cost * gp_trajectory_cost(trajs, cfg.dt)
        return (c_obs + c_smooth).sum()

    def step(trajs, _):
        g = jax.grad(cost)(trajs)
        g = jnp.clip(g, -cfg.grad_clip, cfg.grad_clip)
        trajs = _pin_endpoints(trajs - cfg.step_size * g, start_state, goal_state)
        return trajs, None

    trajs, _ = jax.lax.scan(step, _pin_endpoints(init_trajs, start_state,
                                                 goal_state),
                            None, length=cfg.opt_iters)
    return trajs


# ------------------------------------------------------------------- STOMP
@dataclasses.dataclass(frozen=True)
class STOMPConfig:
    opt_iters: int = 100
    n_noisy: int = 16
    noise_std: float = 0.05
    temperature: float = 1.0
    dt: float = 5.0 / 64.0
    weight_smoothness: float = 1e-2
    collision_margin: float = 1.1 * 0.05 + 0.03


@functools.partial(jax.jit, static_argnames=("cfg",))
def stomp_optimize(scene: SceneData, start_state, goal_state,
                   init_trajs: jax.Array, key: jax.Array,
                   cfg: STOMPConfig) -> jax.Array:
    """Stochastic trajectory optimization: noisy rollouts weighted by
    exp(-cost/lambda) update the mean (reference: stomp.py)."""

    def cost(traj):
        return (_obstacle_cost(scene, traj[..., :2], cfg.collision_margin)
                + cfg.weight_smoothness * gp_trajectory_cost(traj, cfg.dt))

    def step(carry, key_i):
        trajs = carry
        noise = (jax.random.normal(key_i, (cfg.n_noisy, *trajs.shape))
                 * cfg.noise_std)
        noise = noise.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)
        cands = trajs[None] + noise                    # (K, P, H, D)
        costs = jax.vmap(cost)(cands)                  # (K, P)
        w = jax.nn.softmax(-costs / cfg.temperature, axis=0)  # (K, P)
        delta = jnp.einsum("kp,kp...->p...", w, noise)
        trajs = _pin_endpoints(trajs + delta, start_state, goal_state)
        return trajs, None

    keys = jax.random.split(key, cfg.opt_iters)
    trajs, _ = jax.lax.scan(step, _pin_endpoints(init_trajs, start_state,
                                                 goal_state), keys)
    return trajs


# -------------------------------------------------------------------- MPPI
@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    opt_iters: int = 50
    n_rollouts: int = 32
    noise_std: float = 0.1
    temperature: float = 1.0
    dt: float = 5.0 / 64.0
    collision_margin: float = 1.1 * 0.05 + 0.03


@functools.partial(jax.jit, static_argnames=("cfg",))
def mppi_optimize(scene: SceneData, start_state, goal_state,
                  init_trajs: jax.Array, key: jax.Array,
                  cfg: MPPIConfig) -> jax.Array:
    """Model-predictive path integral over velocity controls: sample control
    noise, roll out point dynamics, path-integral-weight the controls
    (reference: mppi.py + dynamics/point.py)."""
    P, H, D = init_trajs.shape
    q_dim = D // 2
    start_pos = start_state[:q_dim]

    def rollout(vel):                                  # (H, q) -> (H, q)
        pos = start_pos + jnp.cumsum(vel, axis=0) * cfg.dt
        return jnp.concatenate([start_pos[None], pos[:-1]], axis=0)

    def traj_cost(vel):
        pos = rollout(vel)
        c_obs = _obstacle_cost(scene, pos, cfg.collision_margin)
        c_goal = 10.0 * jnp.sum((pos[-1] - goal_state[:q_dim]) ** 2)
        return c_obs + c_goal

    def step(vels, key_i):                             # vels: (P, H, q)
        noise = (jax.random.normal(key_i, (cfg.n_rollouts, *vels.shape))
                 * cfg.noise_std)
        cands = vels[None] + noise
        costs = jax.vmap(jax.vmap(traj_cost))(cands)   # (K, P)
        w = jax.nn.softmax(-costs / cfg.temperature, axis=0)
        vels = vels + jnp.einsum("kp,kp...->p...", w, noise)
        return vels, None

    vels0 = init_trajs[..., q_dim:]
    keys = jax.random.split(key, cfg.opt_iters)
    vels, _ = jax.lax.scan(step, vels0, keys)
    pos = jax.vmap(rollout)(vels)
    return jnp.concatenate([pos, vels], axis=-1)


# --------------------------------------------------------------- StochGPMP
@dataclasses.dataclass(frozen=True)
class StochGPMPConfig:
    opt_iters: int = 100
    n_samples_per_particle: int = 8
    temperature: float = 1.0
    sigma_gp_sample: float = 0.02
    step_size: float = 0.5
    dt: float = 5.0 / 64.0
    weight_smoothness: float = 1e-2
    collision_margin: float = 1.1 * 0.05 + 0.03


@functools.partial(jax.jit, static_argnames=("cfg",))
def stoch_gpmp_optimize(scene: SceneData, start_state, goal_state,
                        init_trajs: jax.Array, key: jax.Array,
                        cfg: StochGPMPConfig) -> jax.Array:
    """Stochastic GPMP: per-particle GP-correlated perturbations weighted by
    cost (reference: stoch_gpmp.py). The perturbations are smoothed white
    noise (a cheap stand-in for exact GP covariance sampling)."""

    def cost(traj):
        return (_obstacle_cost(scene, traj[..., :2], cfg.collision_margin)
                + cfg.weight_smoothness * gp_trajectory_cost(traj, cfg.dt))

    kernel = jnp.asarray(np.exp(-0.5 * (np.arange(-4, 5) / 2.0) ** 2), jnp.float32)
    kernel = kernel / kernel.sum()

    def smooth_noise(noise):                           # (H, D)
        return jax.vmap(lambda col: jnp.convolve(col, kernel, mode="same"),
                        in_axes=1, out_axes=1)(noise)

    def step(trajs, key_i):
        noise = (jax.random.normal(
            key_i, (cfg.n_samples_per_particle, *trajs.shape))
            * cfg.sigma_gp_sample)
        noise = jax.vmap(jax.vmap(smooth_noise))(noise)
        noise = noise.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)
        cands = trajs[None] + noise
        costs = jax.vmap(jax.vmap(cost))(cands)        # (K, P)
        w = jax.nn.softmax(-costs / cfg.temperature, axis=0)
        trajs = trajs + cfg.step_size * jnp.einsum("kp,kp...->p...", w, noise)
        return _pin_endpoints(trajs, start_state, goal_state), None

    keys = jax.random.split(key, cfg.opt_iters)
    trajs, _ = jax.lax.scan(step, _pin_endpoints(init_trajs, start_state,
                                                 goal_state), keys)
    return trajs

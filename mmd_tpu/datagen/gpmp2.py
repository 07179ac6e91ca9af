"""GPMP2: Gauss-Newton trajectory optimization, jitted and particle-batched.

TPU-native re-design of GPMP2
(reference: deps/motion_planning_baselines/mp_baselines/planners/gpmp2.py:91-510).
The reference assembles per-factor linear systems (A, b, K) with autograd
Jacobians and solves LM normal equations per iteration in Python; here the
whitened residual vector is one pure function, its Jacobian comes from
`jax.jacrev`, and the damped Gauss-Newton update runs as `lax.scan` over
iterations, `vmap` over particles — one compiled program for the entire
optimization.

Factors (mirroring build_gpmp2_cost_composite):
- start prior: (s_0 - start)/sigma_start            (UnaryFactor)
- goal prior:  (s_{H-1} - goal)/sigma_goal
- GP prior:    L^T (s_{t+1} - Phi s_t), L = chol(Q_inv(sigma_gp))
- collision:   relu(margin - sdf(pos_t)) / sigma_coll for t in [1, H)
               via the precomputed grid SDF (FieldFactor cost_functions.py:166)
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.costs.gp import gp_matrices
from mmd_tpu.envs.envs import SceneData
from mmd_tpu.envs.grid_sdf import grid_sdf
from mmd_tpu.tasks.task import boundary_signed_distances


@dataclasses.dataclass(frozen=True)
class GPMP2Config:
    n_support_points: int = 64
    dt: float = 5.0 / 64.0
    # Defaults from the env hooks (env_conveyor_2d.py:94-116).
    sigma_start: float = 1e-5
    sigma_gp: float = 1e-2
    sigma_goal: float = 1e-5
    sigma_coll: float = 1e-5
    step_size: float = 0.1
    delta: float = 1e-2          # LM damping (solver_params['delta'])
    opt_iters: int = 500
    collision_margin: float = 1.1 * 0.05 + 0.03  # link margin + cutoff


def _whitened_residuals(theta: jax.Array, scene: SceneData,
                        start_state: jax.Array, goal_state: jax.Array,
                        cfg: GPMP2Config, coll_fn=None) -> jax.Array:
    """theta: (H, 2*q_dim) -> flat whitened residual vector.

    `coll_fn` (optional, static) generalizes the collision factor beyond
    the point robot: it maps the (H-1, 2*q_dim) interior states to signed
    CLEARANCES (any shape; <0 = penetration). The default is the disk
    pipeline's grid-SDF-minus-margin at the xy position — an articulated
    robot passes its FK-sphere clearances instead (the reference ties the
    field factor to fk_map_collision the same way, cost_functions.py:166,
    robot_base.py:175-192).
    """
    H = cfg.n_support_points
    q_dim = theta.shape[-1] // 2
    phi, q_inv = gp_matrices(q_dim, cfg.dt, cfg.sigma_gp)
    L = jnp.asarray(np.linalg.cholesky(q_inv).astype(np.float32))

    r_start = (theta[0] - start_state) / cfg.sigma_start
    r_goal = (theta[-1] - goal_state) / cfg.sigma_goal
    e_gp = theta[1:] - theta[:-1] @ jnp.asarray(phi).T          # (H-1, 4)
    r_gp = e_gp @ L                                              # whitened

    if coll_fn is None:
        pos = theta[1:, :q_dim]
        from mmd_tpu.tasks.task import scene_object_sdf
        sd_obj = scene_object_sdf(scene, pos)
        sd_bound = jnp.min(boundary_signed_distances(scene, pos), axis=-1)
        clearance = jnp.minimum(sd_obj, sd_bound) - cfg.collision_margin
    else:
        clearance = coll_fn(theta[1:])
    r_coll = jnp.maximum(-clearance, 0.0).reshape(-1) / cfg.sigma_coll

    return jnp.concatenate([r_start, r_goal, r_gp.reshape(-1), r_coll])


@functools.partial(jax.jit, static_argnames=("cfg", "coll_fn"))
def gpmp2_optimize(scene: SceneData, start_state: jax.Array,
                   goal_state: jax.Array, init_trajs: jax.Array,
                   cfg: GPMP2Config, coll_fn=None) -> jax.Array:
    """init_trajs: (P, H, 4) -> optimized (P, H, 4).

    Damped Gauss-Newton: dtheta = -(J^T J + delta*diag(J^T J))^-1 J^T r,
    theta += step_size * dtheta (reference _step/_get_grad_terms/
    get_torch_solve, gpmp2.py:310-493; trust_region=True).
    """
    H, D = init_trajs.shape[1:]
    N = H * D

    def res_flat(theta_flat):
        return _whitened_residuals(theta_flat.reshape(H, D), scene,
                                   start_state, goal_state, cfg, coll_fn)

    def one_iter(theta_flat, _):
        r = res_flat(theta_flat)
        J = jax.jacrev(res_flat)(theta_flat)          # (R, N)
        JtJ = J.T @ J
        g = J.T @ r
        damped = JtJ + cfg.delta * jnp.diag(jnp.diag(JtJ)) + 1e-9 * jnp.eye(N)
        d_theta = -jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(damped), g)
        return theta_flat + cfg.step_size * d_theta, None

    def per_particle(theta0):
        theta, _ = jax.lax.scan(one_iter, theta0.reshape(-1), None,
                                length=cfg.opt_iters)
        return theta.reshape(H, D)

    return jax.vmap(per_particle)(init_trajs)

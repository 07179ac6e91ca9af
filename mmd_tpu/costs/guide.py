"""Cost guidance as one pure, jit-compatible gradient function.

TPU-native re-design of GuideManagerTrajectoriesWithVelocity
(reference: mmd/models/diffusion_models/guides.py:152-234). The reference
recomputes per-cost torch.autograd grads through a mutable cost list on every
guide step; here the whole thing is a pure function of (x_normalized,
GuideData) so it traces once into the jitted sampling scan and replans with
new constraints are pure data.

Semantics mirrored exactly:
- the guide receives the *normalized* trajectory, unnormalizes it, and
  computes each cost's gradient w.r.t. the *unnormalized* trajectory; that
  gradient is applied directly in normalized space (guides.py:181-226 —
  torch reassigns `x = unnormalize(x)` before autograd.grad, so no chain
  rule through the normalizer).
- per-cost gradient clipping by waypoint norm with the reference's
  `||g + 1e-6||` quirk, max norm 1.0 (guides.py:247-253).
- gradients zeroed at the first and last waypoint (guides.py:217-218).
- costs: object-field collision + boundary-field collision (separate clip
  and weight each, mpd.py:215-232), GP smoothness (mpd.py:234-238), then one
  cost per constraint (hard 2e-1 / soft 2e-2, mpd.py:409-412).
- collision costs skip waypoint 0 (FieldFactor traj_range [1, None],
  cost_functions.py:166-173) and use margin = 1.1*radius + 0.01.
- NOTE: the reference *intends* to evaluate collision on a 1.5x-interpolated
  trajectory but passes it under the wrong kwarg (`x_interpolated=` vs
  `trajs_interpolated=`, guides.py:202 vs cost_functions.py:71), so the
  interpolation never reaches the costs. We match the actual behavior by
  default; `interpolate_collision=True` enables the intended one.
- returns the *negative* weighted gradient sum (gradient descent direction,
  guides.py:224-226).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax.struct import dataclass as pytree_dataclass

from mmd_tpu.config import params as default_params
from mmd_tpu.costs.constraints import (
    ConstraintSet,
    SoftPathConstraints,
    constraint_cost_single,
    soft_path_cost,
)
from mmd_tpu.costs.gp import gp_trajectory_cost
from mmd_tpu.datasets.normalization import LimitsNormalizer
from mmd_tpu.envs.envs import SceneData
from mmd_tpu.envs.grid_sdf import grid_sdf
from mmd_tpu.tasks.task import boundary_signed_distances
from mmd_tpu.utils.interp import interpolate_points


@dataclasses.dataclass(frozen=True)
class GuideConfig:
    """Static guide knobs (hashable; safe as a jit static arg)."""

    q_dim: int = 2
    dt: float = default_params.trajectory_duration / default_params.horizon  # mpd.py:142
    robot_radius: float = default_params.robot_planar_disk_radius
    obstacle_cutoff_margin: float = 0.01   # tasks.py:29
    weight_collision: float = default_params.weight_grad_cost_collision
    weight_smoothness: float = default_params.weight_grad_cost_smoothness
    max_grad_norm: float = 1.0
    interpolate_collision: bool = False
    num_interpolated_points: int = 96      # ceil(64 * 1.5), mpd.py:263
    # Guide only on the env's extra objects (reference
    # use_guide_on_extra_objects_only, mmd_params.py:32, mpd.py:215-221).
    use_extra_objects_only: bool = False
    # Optional cost-zoo terms (costs/zoo.py; reference
    # cost_functions.py:332-745, reachable via env planner-param hooks,
    # env_base.py:266-276). Zero weights compile to nothing.
    weight_max_velocity: float = 0.0
    max_velocity: float = 0.0
    weight_chomp_smoothness: float = 0.0
    weight_joint_limits: float = 0.0
    joint_limit_eps: float = 0.05236  # np.deg2rad(3), cost_functions.py:585

    @property
    def collision_margin(self) -> float:
        # link margin (1.1 r, robot_planar_disk.py:68) + cutoff margin
        return 1.1 * self.robot_radius + self.obstacle_cutoff_margin


@pytree_dataclass
class GuideData:
    """Per-plan dynamic guide inputs (pure data; swapping never recompiles)."""

    scene: SceneData
    normalizer: LimitsNormalizer  # over the state dim (4,)
    constraints: ConstraintSet
    # Optional specialized per-waypoint group (ECBS/PP soft constraints);
    # presence/absence selects a compile variant, contents are data.
    soft_paths: Optional[SoftPathConstraints] = None


def _collision_points(u: jax.Array, cfg: GuideConfig) -> jax.Array:
    """Waypoint positions used by the collision costs."""
    if cfg.interpolate_collision:
        u = interpolate_points(u, cfg.num_interpolated_points)
    return u[..., 1:, : cfg.q_dim]  # skip waypoint 0 (FieldFactor range [1, None])


def collision_cost_objects(u: jax.Array, scene: SceneData, cfg: GuideConfig) -> jax.Array:
    """(B, H, D) unnormalized -> (B,). relu(margin - sdf) summed over H."""
    q = _collision_points(u, cfg)
    if cfg.use_extra_objects_only:
        sd = grid_sdf(scene.extra_grid, q)
    else:
        sd = jnp.minimum(grid_sdf(scene.grid, q), grid_sdf(scene.extra_grid, q))
    pen = jnp.maximum(cfg.collision_margin - sd, 0.0)
    return pen.sum(axis=-1)


def collision_cost_boundaries(u: jax.Array, scene: SceneData, cfg: GuideConfig) -> jax.Array:
    """(B, H, D) -> (B,). max-over-walls relu(margin - sd) summed over H."""
    q = _collision_points(u, cfg)
    sd = boundary_signed_distances(scene, q)  # (..., 4)
    pen = jnp.max(jnp.maximum(cfg.collision_margin - sd, 0.0), axis=-1)
    return pen.sum(axis=-1)


def _clip_by_norm(g: jax.Array, max_norm: float) -> jax.Array:
    """Per-waypoint norm clip with the reference's +1e-6 quirk
    (guides.py:247-253)."""
    norm = jnp.linalg.norm(g + 1e-6, axis=-1, keepdims=True)
    scale = jnp.clip(norm, 0.0, max_norm) / norm
    return g * scale


def _finish(g: jax.Array, max_norm: float) -> jax.Array:
    g = _clip_by_norm(g, max_norm)
    # Zero gradients at start and goal waypoints (guides.py:217-218).
    return g.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)


def guide_gradient(x_norm: jax.Array, gd: GuideData, cfg: GuideConfig) -> jax.Array:
    """One guidance gradient evaluation. x_norm: (B, H, D) -> (B, H, D).

    Returns the step to *add* to the normalized trajectory
    (x <- x + guide(x), sample_functions.py:100-107).
    """
    u = gd.normalizer.unnormalize(x_norm)

    g_obj = jax.grad(lambda v: collision_cost_objects(v, gd.scene, cfg).sum())(u)
    g_bound = jax.grad(lambda v: collision_cost_boundaries(v, gd.scene, cfg).sum())(u)
    g_gp = jax.grad(lambda v: gp_trajectory_cost(v, cfg.dt).sum())(u)

    total = cfg.weight_collision * _finish(g_obj, cfg.max_grad_norm)
    total = total + cfg.weight_collision * _finish(g_bound, cfg.max_grad_norm)
    total = total + cfg.weight_smoothness * _finish(g_gp, cfg.max_grad_norm)

    if cfg.weight_max_velocity > 0.0:
        from mmd_tpu.costs.zoo import cost_max_velocity
        g = jax.grad(lambda v: cost_max_velocity(
            v, cfg.dt, cfg.max_velocity, cfg.q_dim).sum())(u)
        total = total + cfg.weight_max_velocity * _finish(g, cfg.max_grad_norm)
    if cfg.weight_chomp_smoothness > 0.0:
        from mmd_tpu.costs.zoo import cost_smoothness_chomp
        g = jax.grad(lambda v: cost_smoothness_chomp(v, cfg.dt).sum())(u)
        total = total + cfg.weight_chomp_smoothness * _finish(g, cfg.max_grad_norm)
    if cfg.weight_joint_limits > 0.0:
        from mmd_tpu.costs.zoo import cost_joint_limits
        lo = gd.normalizer.mins[: cfg.q_dim]
        hi = gd.normalizer.maxs[: cfg.q_dim]
        g = jax.grad(lambda v: cost_joint_limits(
            v, lo, hi, cfg.joint_limit_eps, cfg.q_dim).sum())(u)
        total = total + cfg.weight_joint_limits * _finish(g, cfg.max_grad_norm)

    cset = gd.constraints
    if cset.max_constraints > 0:
        def one_constraint(k):
            g = jax.grad(
                lambda v: constraint_cost_single(v[..., : cfg.q_dim], cset, k).sum()
            )(u)
            return cset.weight[k] * _finish(g, cfg.max_grad_norm)

        g_cons = jax.vmap(one_constraint)(jnp.arange(cset.max_constraints))
        total = total + g_cons.sum(axis=0)

    if gd.soft_paths is not None:
        g_sp = jax.grad(
            lambda v: soft_path_cost(v[..., : cfg.q_dim], gd.soft_paths).sum()
        )(u)
        total = total + gd.soft_paths.weight * _finish(g_sp, cfg.max_grad_norm)

    return -total

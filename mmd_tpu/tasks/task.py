"""PlanningTask: collision queries + free/collision trajectory classification.

TPU-native re-design of PlanningTask
(reference: deps/torch_robotics/torch_robotics/tasks/tasks.py:22-331).
All device work is in module-level jitted pure functions of a fixed-shape
`SceneData` pytree, so one compiled program serves every environment; the
`PlanningTask` class is a thin host-side binder.

Collision semantics (mirroring the reference exactly):
- waypoint in collision iff grid-SDF(point) < margin OR any boundary signed
  distance to the 1.08-scaled workspace box < margin
  (tasks.py:50-86 builds the fields; distance_fields.py:318-326 the check;
  ws * 1.08 hack tasks.py:83-85)
- classification interpolates trajectories x5 via-points and uses
  margin = robot radius (tasks.py:236-254)
- free trajectories must additionally stay inside joint limits at every
  waypoint of the *non-interpolated* trajectory (tasks.py:263-285)
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.envs.envs import Env2D, SceneData, make_env
from mmd_tpu.envs.grid_sdf import grid_sdf
from mmd_tpu.robots.disk import DiskRobot
from mmd_tpu.utils.interp import interpolate_traj_via_points

WS_BOUNDARY_SCALE = 1.08  # reference: tasks.py:83-85


def boundary_signed_distances(scene: SceneData, q: jax.Array) -> jax.Array:
    """Signed distances to the 4 walls of the scaled workspace box.

    q: (..., 2) -> (..., 4): [q - ws_min, ws_max - q] per dim
    (reference: distance_fields.py:354-368).
    """
    lo = scene.ws_min * WS_BOUNDARY_SCALE
    hi = scene.ws_max * WS_BOUNDARY_SCALE
    return jnp.concatenate([q - lo, hi - q], axis=-1)


def scene_object_sdf(scene: SceneData, q: jax.Array) -> jax.Array:
    """Min over the fixed grid and the extra-objects grid (the reference's
    get_df_obj_list aggregation, env_base.py:76-89)."""
    return jnp.minimum(grid_sdf(scene.grid, q), grid_sdf(scene.extra_grid, q))


def waypoint_in_collision(scene: SceneData, q: jax.Array, margin: float) -> jax.Array:
    """q: (..., 2) -> (...,) bool. Occupancy-style check at one margin."""
    obj_coll = scene_object_sdf(scene, q) < margin
    bound_coll = jnp.any(boundary_signed_distances(scene, q) < margin, axis=-1)
    return obj_coll | bound_coll


@functools.partial(jax.jit, static_argnames=("num_interpolation",))
def classify_trajs(scene: SceneData, trajs: jax.Array, radius: float,
                   q_min: jax.Array, q_max: jax.Array,
                   num_interpolation: int = 5) -> Tuple[jax.Array, jax.Array]:
    """Classify a batch of trajectories as free / in collision.

    trajs: (B, H, D) with positions in [..., :2]. Returns
    (free_mask (B,) bool, waypoint_collisions (B, H_interp) bool).
    Mirrors tasks.get_trajs_collision_and_free (tasks.py:236-311) but with
    fixed shapes: masks instead of gathered index lists.
    """
    q = trajs[..., :2]
    q_interp = interpolate_traj_via_points(q, num_interpolation)
    wp_coll = waypoint_in_collision(scene, q_interp, radius)
    coll_free = ~jnp.any(wp_coll, axis=-1)
    in_limits = jnp.all((q >= q_min) & (q <= q_max), axis=(-1, -2))
    return coll_free & in_limits, wp_coll


@jax.jit
def compute_collision_cost_sdf(scene: SceneData, q: jax.Array, margin: jax.Array) -> jax.Array:
    """Soft collision cost per waypoint: relu(margin - sdf), max over fields.

    q: (..., 2) -> (...,). Object field and boundary field each contribute
    max-over-objects relu(margin - sd) (reference: distance_fields.py:115-129:
    field cost = relu(margin - sdf), .max(-2) over objects, sum links; the
    disk has one link). The two fields are summed here for the plain
    task-level cost query (tasks.py:230-234); guidance keeps them separate
    (see mmd_tpu/costs/guide.py).
    """
    obj = jnp.maximum(margin - scene_object_sdf(scene, q), 0.0)
    bound = jnp.max(jnp.maximum(margin - boundary_signed_distances(scene, q), 0.0), axis=-1)
    return obj + bound


@functools.partial(jax.jit, static_argnames=("n_candidates",))
def _sample_coll_free(scene: SceneData, key: jax.Array, radius: float,
                      q_min: jax.Array, q_max: jax.Array,
                      n_candidates: int = 1024) -> Tuple[jax.Array, jax.Array]:
    """Batch rejection sampling of collision-free configurations.

    Returns (candidates (n_candidates, 2), free_mask (n_candidates,)).
    The reference loops torch.rand batches until enough survive
    (tasks.py:105-131); we draw one big batch (TPU-friendly) and let the
    host pick survivors.
    """
    qs = jax.random.uniform(key, (n_candidates, 2), minval=q_min, maxval=q_max)
    free = ~waypoint_in_collision(scene, qs, radius)
    return qs, free


class PlanningTask:
    """Host-side task binder: env + robot + jitted queries."""

    def __init__(self, env: Env2D, robot: Optional[DiskRobot] = None,
                 margin_for_classification: Optional[float] = None):
        self.env = env
        self.robot = robot or DiskRobot.make()
        self.scene = env.scene
        # Classification margin: the reference uses robot.radius when the
        # robot has one (tasks.py:249-254).
        self.margin = (margin_for_classification
                       if margin_for_classification is not None else self.robot.radius)

    def compute_collision(self, x: jax.Array, margin: Optional[float] = None) -> jax.Array:
        q = self.robot.get_position(x)
        return waypoint_in_collision(self.scene, q, margin if margin is not None else self.margin)

    def compute_collision_cost(self, x: jax.Array) -> jax.Array:
        q = self.robot.get_position(x)
        margin = self.robot.collision_link_margin + 0.01  # + obstacle_cutoff_margin (tasks.py:29)
        return compute_collision_cost_sdf(self.scene, q, margin)

    def get_trajs_collision_and_free(self, trajs: jax.Array, num_interpolation: int = 5):
        """Returns (free_mask (B,), waypoint_collisions (B, H_interp))."""
        return classify_trajs(self.scene, trajs, self.robot.radius,
                              self.robot.q_min, self.robot.q_max, num_interpolation)

    def random_coll_free_q(self, key: jax.Array, n_samples: int = 1,
                           max_tries: int = 8) -> jax.Array:
        """Sample n collision-free configurations (host-assembled)."""
        # Candidate batch scales with the request (rounded to a multiple of
        # 1024 to bound the number of compiled variants) so large draws —
        # e.g. 10k-context dataset generation — finish within max_tries
        # even on mostly-occupied maps.
        n_candidates = 1024 * max(1, -(-2 * n_samples // 1024))
        out = []
        for i in range(max_tries):
            key, sub = jax.random.split(key)
            qs, free = _sample_coll_free(self.scene, sub, self.robot.radius,
                                         self.robot.q_min, self.robot.q_max,
                                         n_candidates=n_candidates)
            qs = np.asarray(qs)[np.asarray(free)]
            out.extend(qs[: n_samples - len(out)])
            if len(out) >= n_samples:
                break
        if len(out) < n_samples:
            raise RuntimeError("random_coll_free_q: could not find free configurations")
        arr = jnp.asarray(np.stack(out))
        return arr[0] if n_samples == 1 else arr

    # -------- statistics over a batch of sampled trajectories -------------
    def compute_fraction_free_trajs(self, trajs) -> float:
        free, _ = self.get_trajs_collision_and_free(trajs)
        return float(jnp.mean(free.astype(jnp.float32)))

    def compute_collision_intensity_trajs(self, trajs) -> float:
        _, wp = self.get_trajs_collision_and_free(trajs)
        return float(jnp.mean(wp.astype(jnp.float32)))

    def compute_success_free_trajs(self, trajs) -> int:
        free, _ = self.get_trajs_collision_and_free(trajs)
        return int(jnp.any(free))


def make_task(env_name: str, robot: Optional[DiskRobot] = None) -> PlanningTask:
    return PlanningTask(make_env(env_name), robot)

"""Tiled planning task: global-frame queries over a chain of local tasks.

TPU-native re-design of TaskEnsemble/PlanningTaskEnsemble
(reference: deps/torch_robotics/torch_robotics/tasks/tasks_ensemble.py).
Per-tile scenes are STACKED into one pytree so global collision queries are
a single vmapped gather + select instead of the reference's per-tile Python
masking loop (tasks_ensemble.py:237-270).

Note: the reference's ensemble get_trajs_collision_and_free is stubbed to
return all-free (tasks_ensemble.py:271-277, acknowledged TODO); classification
in the ensemble planner path instead happens per tile in local frames
(get_traj_unnormalized -> tile task classify, :77-84), which is what we
implement.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.envs.envs import Env2D, SceneData
from mmd_tpu.robots.disk import DiskRobot
from mmd_tpu.tasks.task import PlanningTask, waypoint_in_collision


def stack_scenes(scenes: List[SceneData]) -> SceneData:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *scenes)


@functools.partial(jax.jit, static_argnames=())
def _global_collision(stacked: SceneData, transforms: jax.Array,
                      q_global: jax.Array, margin: float) -> jax.Array:
    """q_global: (..., 2) -> (...,) bool.

    Tile membership by local-frame containment (infer_task_id_from_q,
    tasks_ensemble.py:345); the first containing tile wins; points outside
    every tile are in collision (the reference's default-ones init,
    tasks_ensemble.py:247-256).
    """
    n_tiles = transforms.shape[0]

    def per_tile(scene_m, t_m):
        q_local = q_global - t_m
        inside = jnp.all(jnp.abs(q_local) <= 1.0, axis=-1)
        coll = waypoint_in_collision(scene_m, q_local, margin)
        return inside, coll

    inside, coll = jax.vmap(per_tile)(stacked, transforms)  # (T, ...), (T, ...)
    first = jnp.argmax(inside, axis=0)                       # (...,)
    any_inside = jnp.any(inside, axis=0)
    coll_sel = jnp.take_along_axis(coll, first[None], axis=0)[0]
    return jnp.where(any_inside, coll_sel, True)


class TaskEnsemble:
    """Host binder over a chain of per-tile PlanningTasks."""

    def __init__(self, tasks: List[PlanningTask], transforms: np.ndarray,
                 robot: Optional[DiskRobot] = None):
        self.tasks = tasks
        self.transforms = np.asarray(transforms, np.float32)  # (T, 2)
        self.robot = robot or tasks[0].robot
        self.stacked_scenes = stack_scenes([t.scene for t in tasks])
        self._transforms_dev = jnp.asarray(self.transforms)
        # Global workspace bounds: union of translated tile limits.
        lo = (self.transforms + np.array([-1.0, -1.0])).min(axis=0)
        hi = (self.transforms + np.array([1.0, 1.0])).max(axis=0)
        self.ws_min, self.ws_max = lo, hi

    @property
    def n_tiles(self) -> int:
        return len(self.tasks)

    def transform_q(self, task_id: int, q):
        """Local -> global; velocity dims pass through
        (tasks_ensemble.py:20-27)."""
        t = np.zeros(np.asarray(q).shape[-1], np.float32)
        t[:2] = self.transforms[task_id]
        return q + jnp.asarray(t)

    def inverse_transform_q(self, task_id: int, q):
        t = np.zeros(np.asarray(q).shape[-1], np.float32)
        t[:2] = self.transforms[task_id]
        return q - jnp.asarray(t)

    def compute_collision(self, x, margin: Optional[float] = None):
        """x: (..., >=2) global-frame states -> (...,) bool."""
        q = x[..., :2]
        m = margin if margin is not None else self.robot.radius
        return _global_collision(self.stacked_scenes, self._transforms_dev, q, m)

    def infer_task_id_from_q_idx(self, t_idx: int, horizon: int) -> int:
        """Tile by global time index: t // H (tasks_ensemble.py:340)."""
        return min(int(t_idx) // horizon, self.n_tiles - 1)

"""Multi-agent helpers: validity gates, path padding, start/goal generators.

Mirrors mmd/common/multi_agent_utils.py:28-225. These run on host per trial
(numpy); the heavy per-timestep collision math delegates to the vectorized
device check in mmd_tpu.robots.disk.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.config import params as default_params
from mmd_tpu.robots.disk import DiskRobot, check_rr_collisions
from mmd_tpu.tasks.task import PlanningTask


def is_multi_agent_state_valid(robot: DiskRobot, task: PlanningTask,
                               state_pos_l: List) -> bool:
    """reference: multi_agent_utils.py:32-50."""
    pos = jnp.asarray(np.stack([np.asarray(s) for s in state_pos_l]))
    coll, _ = check_rr_collisions(pos, robot.rr_margin)
    if bool(jnp.any(coll)):
        return False
    return not bool(jnp.any(task.compute_collision(pos)))


def is_multi_agent_start_goal_states_valid(robot: DiskRobot, task: PlanningTask,
                                           start_l: List, goal_l: List,
                                           is_enforce_min_dist: bool = True,
                                           min_dist: float = 0.15) -> bool:
    """reference: multi_agent_utils.py:53-94."""
    starts = np.stack([np.asarray(s) for s in start_l])
    goals = np.stack([np.asarray(g) for g in goal_l])
    if is_enforce_min_dist:
        for arr in (starts, goals):
            d = np.linalg.norm(arr[:, None] - arr[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            if (d < min_dist).any():
                return False
    for arr in (starts, goals):
        coll, _ = check_rr_collisions(jnp.asarray(arr), robot.rr_margin)
        if bool(jnp.any(coll)):
            return False
        if bool(jnp.any(task.compute_collision(jnp.asarray(arr)))):
            return False
    return True


def compute_collision_intensity(trajs_l: List, robot: DiskRobot,
                                task: PlanningTask) -> float:
    """Fraction of timesteps with any robot-robot or world collision
    (reference: multi_agent_utils.py:97-117) — vectorized over the horizon."""
    paths = jnp.asarray(np.stack([np.asarray(t)[:, :2] for t in trajs_l]))  # (n, T, 2)
    per_t = jnp.swapaxes(paths, 0, 1)  # (T, n, 2)
    rr, _ = check_rr_collisions(per_t, robot.rr_margin)  # (T, n, n)
    rr_any = jnp.any(rr, axis=(-1, -2))
    world = jnp.any(task.compute_collision(per_t), axis=-1)
    return float(jnp.mean((rr_any | world).astype(jnp.float32)))


def global_pad_paths(path_l: List[np.ndarray], start_time_l: List[int]) -> List[np.ndarray]:
    """Pad with repeated first state (stagger) / last state (to max length)
    (reference: multi_agent_utils.py:120-143)."""
    if len(path_l) == 0:
        return path_l
    path_l = [np.asarray(p) for p in path_l]
    max_t = max(len(p) + start_time_l[i] for i, p in enumerate(path_l))
    out = []
    for i, p in enumerate(path_l):
        tail = max_t - len(p) - start_time_l[i]
        if tail > 0:
            p = np.concatenate([p, np.repeat(p[-1:], tail, axis=0)])
        if start_time_l[i] > 0:
            p = np.concatenate([np.repeat(p[:1], start_time_l[i], axis=0), p])
        out.append(p)
    return out


def get_start_goal_pos_circle(num_agents: int, radius: float = 0.8
                              ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Antipodal points on a circle (reference: multi_agent_utils.py:146-155)."""
    starts, goals = [], []
    for i in range(num_agents):
        a = 2 * np.pi * i / num_agents
        starts.append(np.array([radius * np.cos(a), radius * np.sin(a)], np.float32))
        goals.append(np.array([radius * np.cos(a + np.pi), radius * np.sin(a + np.pi)], np.float32))
    return starts, goals


def get_start_goal_pos_boundary(num_agents: int, dist: float = 0.87
                                ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """reference: multi_agent_utils.py:157-174."""
    starts = []
    for i in range(num_agents):
        a = 2 * np.pi * i / num_agents
        s = np.array([0.8 * np.cos(a), 0.8 * np.sin(a)], np.float32)
        if abs(s[0]) > abs(s[1]):
            s[0] = np.sign(s[0]) * dist
        else:
            s[1] = np.sign(s[1]) * dist
        starts.append(s)
    goals = []
    for s in starts:
        g = np.array([s[0] if abs(s[0]) < abs(s[1]) else -s[0],
                      s[1] if abs(s[1]) < abs(s[0]) else -s[1]], np.float32)
        goals.append(g)
    return starts, goals


def get_state_pos_column(num_agents: int, x_pos: float) -> List[np.ndarray]:
    """reference: multi_agent_utils.py:176-180."""
    return [np.array([x_pos, 0.8 * (1 - 2 * i / num_agents)], np.float32)
            for i in range(num_agents)]


def get_start_goal_pos_random_in_env(num_agents: int, task: PlanningTask,
                                     rng: Optional[np.random.Generator] = None,
                                     margin: float = 0.15,
                                     obstacle_margin: float = 0.16,
                                     max_tries: int = 10000
                                     ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Rejection-sample mutually-separated, obstacle-clear starts and goals
    (reference: multi_agent_utils.py:183-225)."""
    rng = rng or np.random.default_rng(0)
    from mmd_tpu.envs.grid_sdf import grid_sdf

    def sample_set():
        # Batch the obstacle check: draw all candidates up front and clear
        # them against the SDF in ONE device call (a per-sample call costs a
        # full host<->device round trip on the tunneled TPU), then do the
        # cheap mutual-separation filtering on host.
        cand = (rng.random((max_tries, 2)).astype(np.float32) * 1.9 - 0.95)
        clear = np.asarray(grid_sdf(task.scene.grid, jnp.asarray(cand))
                           ) > obstacle_margin
        pts: List[np.ndarray] = []
        for q in cand[clear]:
            if pts and np.min(np.linalg.norm(np.stack(pts) - q, axis=-1)) <= margin:
                continue
            pts.append(q)
            if len(pts) == num_agents:
                return pts
        raise RuntimeError("could not sample valid multi-agent states")

    return sample_set(), sample_set()

"""Linear trajectory data generation, batched on device.

Mirrors generate_linear_trajectories
(reference: scripts/generate_data/generate_trajectories.py:559-705), which
produces the training data for the empty environments: straight start->goal
motion at fixed speed, optionally waiting at the goal for the remaining
steps; velocities are per-step position differences (reference :630-632).

The reference generates one (context, trajectory) per process invocation;
here the whole dataset is one vmapped batch on device.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.datasets.trajectories import TrajectoryDataset
from mmd_tpu.tasks.task import PlanningTask, make_task


def _linear_batch(starts: jax.Array, goals: jax.Array, horizon: int,
                  v_mag: jax.Array) -> jax.Array:
    """starts/goals: (N, 2), v_mag: (N,) -> (N, H, 4) trajectories."""
    dist = jnp.linalg.norm(goals - starts, axis=-1)  # (N,)
    n_move = jnp.floor(dist / v_mag).astype(jnp.int32)  # reference :621-623
    n_move = jnp.clip(n_move, 2, horizon)
    i = jnp.arange(horizon, dtype=jnp.float32)[None, :]  # (1, H)
    alpha = jnp.clip(i / (n_move[:, None].astype(jnp.float32) - 1.0), 0.0, 1.0)
    pos = starts[:, None, :] + alpha[..., None] * (goals - starts)[:, None, :]
    vel = jnp.concatenate([pos[:, 1:] - pos[:, :-1],
                           jnp.zeros_like(pos[:, :1])], axis=1)  # :630-632
    return jnp.concatenate([pos, vel], axis=-1)


def sample_start_goal_pairs(task: PlanningTask, key: jax.Array, n: int,
                            threshold: float = 1.0,
                            max_tries: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Collision-free start/goal pairs with min separation `threshold`
    (reference: generate_trajectories.py:593-601)."""
    starts, goals = [], []
    for _ in range(max_tries):
        key, k1 = jax.random.split(key)
        qs = np.asarray(task.random_coll_free_q(k1, n_samples=2 * n))
        s, g = qs[:n], qs[n:]
        ok = np.linalg.norm(s - g, axis=-1) > threshold
        starts.extend(s[ok])
        goals.extend(g[ok])
        if len(starts) >= n:
            break
    if len(starts) < n:
        raise RuntimeError("could not sample enough start/goal pairs")
    return np.stack(starts[:n]), np.stack(goals[:n])


def generate_linear_dataset(env_name: str, n_contexts: int = 500,
                            horizon: int = 64, is_wait_at_goal: Optional[bool] = None,
                            seed: int = 0, threshold: float = 1.0) -> TrajectoryDataset:
    """Build a TrajectoryDataset of linear trajectories for an (empty) env.

    is_wait_at_goal: True -> fixed speed 0.05/step + dwell at goal (EnvEmpty2D
    training data); False -> speed spread over the whole horizon
    (EnvEmptyNoWait2D). Defaults from the env name.
    """
    if is_wait_at_goal is None:
        is_wait_at_goal = "NoWait" not in env_name
    task = make_task(env_name)
    key = jax.random.PRNGKey(seed)
    starts, goals = sample_start_goal_pairs(task, key, n_contexts, threshold)
    starts = jnp.asarray(starts)
    goals = jnp.asarray(goals)
    dist = jnp.linalg.norm(goals - starts, axis=-1)
    if is_wait_at_goal:
        v_mag = jnp.full((n_contexts,), 0.05)      # reference :614
    else:
        v_mag = dist / horizon                      # reference :617
    trajs = _linear_batch(starts, goals, horizon, v_mag)

    free, _ = task.get_trajs_collision_and_free(trajs)
    trajs_free = np.asarray(trajs)[np.asarray(free)]
    if len(trajs_free) == 0:
        raise RuntimeError("no free linear trajectories — wrong env for this generator?")
    return TrajectoryDataset(trajs_free, env_name)

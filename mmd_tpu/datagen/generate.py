"""Full data-generation pipeline for obstacle environments.

Mirrors generate_collision_free_trajectories
(reference: scripts/generate_data/generate_trajectories.py:30-289):
per context: rejection-sample a valid (start, goal), pick a random skill,
plan RRT(start->skill_0) + Identity(skill) + RRT(skill_-1->goal) (or one
RRT-Connect when the env has no skills), spline-resample, GPMP2-polish the
whole particle batch on device, classify, keep the free trajectories.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from mmd_tpu.datagen.gpmp2 import GPMP2Config
from mmd_tpu.datagen.host_collision import HostCollisionChecker
from mmd_tpu.datagen.hybrid import hybrid_plan
from mmd_tpu.datagen.rrt import IdentityPlanner, RRTConnect, RRTStar
from mmd_tpu.datasets.trajectories import TrajectoryDataset
from mmd_tpu.tasks.task import make_task

# reference env hook values (env_conveyor_2d.py:79-86).
RRT_PARAMS = dict(n_iters=10000, step_size=0.01, n_radius=0.05, max_time=50.0)


def generate_context_trajectories(env_name: str, rng: np.random.Generator,
                                  n_trajectories: int = 20,
                                  horizon: int = 64,
                                  duration: float = 5.0,
                                  threshold_start_goal_pos: float = 0.5,
                                  gpmp_opt_iters: int = 500,
                                  max_sample_tries: int = 1000) -> np.ndarray:
    """One context: (n_free, H, 4) collision-free trajectories (may be 0)."""
    task = make_task(env_name)
    env = task.env
    checker = HostCollisionChecker(env, task.robot.radius)

    # Start/goal rejection sampling (reference :594-601 + env veto).
    start = goal = None
    for _ in range(max_sample_tries):
        qs = checker.sample_free(rng, 2)
        s, g = qs[0], qs[1]
        if not env.is_start_goal_valid_for_data_gen(s, g):
            continue
        if np.linalg.norm(s - g) > threshold_start_goal_pos:
            start, goal = s, g
            break
    if start is None:
        raise RuntimeError("no valid start/goal found")

    skills = env.get_skill_pos_seq_l(start_pos=start, goal_pos=goal, rng=rng)

    # Prefer the native C++ planners (native/rrt.cpp) — the host-side
    # data-gen hot loop; fall back to pure Python when g++ is unavailable.
    from mmd_tpu.datagen.native_rrt import (
        NativeRRTConnect, NativeRRTStar, native_available,
    )

    use_native = native_available()
    rrt_params = {k: v for k, v in RRT_PARAMS.items()
                  if not (use_native and k == "max_time")}

    def connect(a, b):
        if use_native:
            return NativeRRTConnect(checker, a, b, seed=int(rng.integers(2**31)),
                                    **rrt_params)
        return RRTConnect(checker, a, b,
                          rng=np.random.default_rng(rng.integers(2**31)),
                          **rrt_params)

    def star(a, b):
        if use_native:
            return NativeRRTStar(checker, a, b, seed=int(rng.integers(2**31)),
                                 **rrt_params)
        return RRTStar(checker, a, b,
                       rng=np.random.default_rng(rng.integers(2**31)),
                       **rrt_params)

    if not skills:
        factories = [lambda: connect(start, goal)]
    else:
        skill = skills[int(rng.integers(0, len(skills)))]
        factories = [
            lambda: star(start, skill[0]),
            lambda: IdentityPlanner(skill),
            lambda: star(skill[-1], goal),
        ]

    cfg = GPMP2Config(n_support_points=horizon, dt=duration / horizon,
                      opt_iters=gpmp_opt_iters,
                      collision_margin=1.1 * task.robot.radius + 0.03)
    trajs = hybrid_plan(task.scene, factories, n_trajectories, start, goal, cfg)

    free, _ = task.get_trajs_collision_and_free(trajs)
    return trajs[np.asarray(free)]


def generate_dataset(env_name: str, n_contexts: int = 100,
                     n_trajectories_per_context: int = 20,
                     horizon: int = 64, duration: float = 5.0, seed: int = 0,
                     gpmp_opt_iters: int = 300,
                     verbose: bool = True) -> TrajectoryDataset:
    """Full dataset for one environment (reference scale: 500 contexts x 20,
    launch_generate_trajectories.py:15-42)."""
    rng = np.random.default_rng(seed)
    all_trajs = []
    t0 = time.time()
    for i in range(n_contexts):
        try:
            trajs = generate_context_trajectories(
                env_name, rng, n_trajectories=n_trajectories_per_context,
                horizon=horizon, duration=duration,
                gpmp_opt_iters=gpmp_opt_iters)
        except RuntimeError:
            continue
        if len(trajs):
            all_trajs.append(trajs)
        if verbose and (i + 1) % 10 == 0:
            n = sum(len(t) for t in all_trajs)
            print(f"[datagen {env_name}] context {i + 1}/{n_contexts}: "
                  f"{n} free trajs ({time.time() - t0:.0f}s)")
    if not all_trajs:
        raise RuntimeError(f"no free trajectories generated for {env_name}")
    return TrajectoryDataset(np.concatenate(all_trajs), env_name,
                             duration=duration)

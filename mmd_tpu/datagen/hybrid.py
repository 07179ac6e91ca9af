"""Hybrid planner: sample-based segments -> spline resample -> GPMP2 polish.

Mirrors HybridPlanner (reference: deps/motion_planning_baselines/
mp_baselines/planners/hybrid_planner.py:36-129):
- run each pre-optimization planner n_trajectories times, concatenate
  per-trajectory segment paths (linear-interp fallback when a segment fails)
- cubic-spline smooth + resample to H points with clamped boundary
  conditions and average-velocity fill
  (smoothen_trajectory, torch_robotics trajectory/utils.py:8-38)
- fine-tune all particles with GPMP2 (one vmapped device call here).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from scipy import interpolate

from mmd_tpu.datagen.gpmp2 import GPMP2Config, gpmp2_optimize
from mmd_tpu.envs.envs import SceneData


def smoothen_trajectory(traj_pos: np.ndarray, n_support_points: int,
                        dt: float) -> np.ndarray:
    """(K, 2) waypoints -> (H, 4) [pos, vel] states.

    reference: trajectory/utils.py:8-38 — cubic spline with clamped BCs,
    average velocity on interior points computed from the input path's first
    segment over the total duration.
    """
    traj_pos = np.asarray(traj_pos, np.float64)
    if traj_pos.shape[0] < 4:
        # Too short for a clamped cubic — densify first (reference retries
        # with a jittered extra point; linear densify is equivalent here).
        t = np.linspace(0, 1, 4)
        traj_pos = np.stack([
            np.interp(t, np.linspace(0, 1, traj_pos.shape[0]), traj_pos[:, d])
            for d in range(traj_pos.shape[1])], axis=-1)
    x = np.linspace(0, 1, traj_pos.shape[0])
    spline = interpolate.make_interp_spline(x, traj_pos, k=3, bc_type="clamped")
    pos = spline(np.linspace(0, 1, n_support_points))
    vel = np.zeros_like(pos)
    avg_vel = (traj_pos[1] - traj_pos[0]) / (n_support_points * dt)
    vel[1:-1] = avg_vel
    return np.concatenate([pos, vel], axis=-1).astype(np.float32)


def hybrid_plan(scene: SceneData,
                segment_planner_factories: Sequence,
                n_trajectories: int,
                start_state_pos: np.ndarray,
                goal_state_pos: np.ndarray,
                gpmp_cfg: GPMP2Config) -> np.ndarray:
    """Returns (n_trajectories, H, 4) optimized trajectories.

    segment_planner_factories: list of callables () -> planner with
    .optimize() -> (K, 2) path or None; run once per trajectory per segment
    (MultiSampleBasedPlanner semantics, multi_sample_based_planner.py:22-42).
    """
    H = gpmp_cfg.n_support_points
    init = []
    for _ in range(n_trajectories):
        segs = []
        for factory in segment_planner_factories:
            planner = factory()
            path = planner.optimize()
            if path is None:
                # Linear-interp fallback (hybrid_planner.py:47-57).
                path = np.linspace(np.asarray(planner.start_state_pos, np.float32),
                                   np.asarray(planner.goal_state_pos, np.float32), 10)
            segs.append(np.asarray(path, np.float32))
        full = np.concatenate(segs, axis=0)
        init.append(smoothen_trajectory(full, H, gpmp_cfg.dt))
    init_trajs = jnp.asarray(np.stack(init))

    start_state = jnp.asarray(np.concatenate([start_state_pos[:2], np.zeros(2)]).astype(np.float32))
    goal_state = jnp.asarray(np.concatenate([goal_state_pos[:2], np.zeros(2)]).astype(np.float32))
    out = gpmp2_optimize(scene, start_state, goal_state, init_trajs, gpmp_cfg)
    return np.asarray(out)

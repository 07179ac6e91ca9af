"""Training-time sampling summaries.

Mirrors SummaryTrajectoryGeneration
(reference: mmd/summaries/summary_trajectory_generation.py:19-100): sample a
small batch of trajectories for a random dataset task, report
fraction-free / collision-intensity / success, and save a dataset-vs-
diffusion figure.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.config import DiffusionConfig
from mmd_tpu.datasets.trajectories import TrajectoryDataset
from mmd_tpu.models.diffusion import guided_p_sample_loop
from mmd_tpu.models.schedules import DiffusionSchedule


def summary_trajectory_generation(model, params, schedule: DiffusionSchedule,
                                  dataset: TrajectoryDataset, key: jax.Array,
                                  n_samples: int = 25,
                                  save_dir: Optional[str] = None,
                                  step: int = 0) -> dict:
    """Sample n trajectories for a random dataset start/goal and score them."""
    key, tkey, skey = jax.random.split(key, 3)
    idx = int(jax.random.randint(tkey, (), 0, dataset.n_trajs))
    ref_traj = dataset.trajs[idx]
    start_pos = ref_traj[0, :2]
    goal_pos = ref_traj[-1, :2]
    hard = dataset.get_hard_conditions(start_pos, goal_pos)

    cfg = DiffusionConfig(horizon=dataset.n_support_points,
                          state_dim=dataset.state_dim,
                          n_samples=n_samples,
                          n_diffusion_steps=schedule.n_steps)
    _, chain = guided_p_sample_loop(model.apply, params, schedule, hard, skey,
                                    cfg, gd=None)
    trajs = dataset.unnormalize_trajectories(chain[-1])

    stats = {
        "step": step,
        "fraction_free": dataset.task.compute_fraction_free_trajs(trajs),
        "collision_intensity": dataset.task.compute_collision_intensity_trajs(trajs),
        "success": dataset.task.compute_success_free_trajs(trajs),
    }

    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from mmd_tpu.viz.visualizer import PlanningVisualizer

        fig, axs = plt.subplots(1, 2, figsize=(10, 5))
        viz = PlanningVisualizer(task=dataset.task)
        for ax, (title, data) in zip(axs, [
                ("dataset", np.asarray(dataset.trajs[:n_samples])),
                ("diffusion", np.asarray(trajs))]):
            ax.set_aspect("equal")
            viz.render_env(ax)
            for tr in data:
                ax.plot(tr[:, 0], tr[:, 1], alpha=0.4, lw=0.8)
            ax.set_title(title)
        fig.savefig(os.path.join(save_dir, f"summary_step_{step:07d}.png"), dpi=80)
        plt.close(fig)
    return stats

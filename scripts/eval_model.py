"""Model evaluation: sampling quality statistics for a trained checkpoint.

The reference's regression signal is metric-based (SURVEY.md section 4):
fraction-free / collision-intensity / success over sampled batches, plus the
per-env data-adherence score. This script reports those for N random tasks.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mmd_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.config import DiffusionConfig
from mmd_tpu.datasets.trajectories import env_name_from_model_id, model_id
from mmd_tpu.experiments.trial import ModelRegistry
from mmd_tpu.planners.single_agent.mpd import MPD


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True)
    ap.add_argument("--n_tasks", type=int, default=10)
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--render_dir", default=None)
    args = ap.parse_args()

    registry = ModelRegistry()
    mid = model_id(args.env)
    model, params, schedule, dataset = registry.get(mid)
    task = dataset.task
    env = task.env
    key = jax.random.PRNGKey(args.seed)

    stats = {"fraction_free": [], "success": [], "adherence": [],
             "plan_time": []}
    for i in range(args.n_tasks):
        key, k1 = jax.random.split(key)
        qs = task.random_coll_free_q(k1, n_samples=2)
        start, goal = qs[0], qs[1]
        planner = MPD(model, params, schedule, dataset, start, goal,
                      seed=args.seed * 1000 + i)
        out = planner()
        stats["fraction_free"].append(out.fraction_free_trajs)
        stats["success"].append(out.success_free_trajs)
        stats["plan_time"].append(out.t_total)
        if out.traj_final_free_best is not None:
            adh = env.compute_traj_data_adherence(
                np.asarray(out.traj_final_free_best)[:, :2])
            stats["adherence"].append(adh)
        if args.render_dir and out.trajs_final_free is not None:
            from mmd_tpu.viz.visualizer import PlanningVisualizer
            os.makedirs(args.render_dir, exist_ok=True)
            viz = PlanningVisualizer(task=task)
            fig, ax = viz.render_robot_trajectories(
                trajs=np.asarray(out.trajs_final_free),
                start_state=start, goal_state=goal)
            fig.savefig(os.path.join(args.render_dir, f"task_{i}.png"), dpi=90)

    print(f"model {mid} over {args.n_tasks} tasks:")
    print(f"  fraction_free: {np.mean(stats['fraction_free']):.3f}")
    print(f"  success_rate:  {np.mean(stats['success']):.3f}")
    if stats["adherence"]:
        print(f"  adherence:     {np.mean(stats['adherence']):.3f}")
    print(f"  plan_time:     {np.mean(stats['plan_time'][1:] or stats['plan_time']):.3f}s")


if __name__ == "__main__":
    main()

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
    ap.add_argument("--n_tasks", type=int, default=50)
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--render_dir", default=None)
    ap.add_argument("--out_yaml", default=None,
                    help="append the aggregate row to this yaml file")
    ap.add_argument("--models_dir", default="data_trained_models")
    ap.add_argument("--data_dir", default="data_trajectories")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 UNet inference (see TemporalUnet.dtype)")
    ap.add_argument("--sampler", default="ddpm", choices=["ddpm", "ddim"],
                    help="'ddim' = n_steps//5-substep fast mode "
                         "(reference diffusion_model_base.py:214-291)")
    ap.add_argument("--ddim_substeps", type=int, default=0,
                    help="override the DDIM substep count (0 = n_steps//5);"
                         " ladder probe for the speed-vs-adherence curve")
    ap.add_argument("--tag", default=None,
                    help="override the yaml row's model-name suffix "
                         "(e.g. 'vd+bf16'); default '+bf16' when --bf16")
    ap.add_argument("--variant", default=None,
                    help="free-text provenance note stored in the yaml row")
    args = ap.parse_args()

    registry = ModelRegistry(trained_models_dir=args.models_dir,
                             trajectories_dir=args.data_dir)
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
                      seed=args.seed * 1000 + i, bf16=args.bf16,
                      sampler=args.sampler, ddim_substeps=args.ddim_substeps)
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
            if i == 0:
                # Deep-render set for the first task: SDF + gradient field,
                # joint-space panels, denoising-chain animation.
                sfig, sax = viz.render_env_sdf()
                sfig.savefig(os.path.join(args.render_dir, "env_sdf.png"),
                             dpi=120)
                gfig, gax = viz.render_env_grad_sdf()
                gfig.savefig(os.path.join(args.render_dir, "env_grad_sdf.png"),
                             dpi=120)
                fmask = np.zeros(len(out.trajs_final), bool)
                fmask[np.asarray(out.trajs_final_free_idxs)] = True
                viz.plot_joint_space_trajectories(
                    np.asarray(out.trajs_final), free_mask=fmask,
                    pos_start=np.asarray(start), pos_goal=np.asarray(goal),
                    q_min=np.asarray(planner.robot.q_min),
                    q_max=np.asarray(planner.robot.q_max),
                    output_fpath=os.path.join(args.render_dir,
                                              "joint_space.png"))
                viz.animate_opt_iters(
                    np.asarray(out.trajs_iters), idx_best=out.idx_best_traj,
                    start_state=np.asarray(start), goal_state=np.asarray(goal),
                    video_filepath=os.path.join(args.render_dir,
                                                "opt_iters.gif"))

    row = {
        "model": mid, "n_tasks": args.n_tasks,
        "fraction_free": float(np.mean(stats["fraction_free"])),
        "success_rate": float(np.mean(stats["success"])),
        "adherence": (float(np.mean(stats["adherence"]))
                      if stats["adherence"] else None),
        "plan_time": float(np.mean(stats["plan_time"][1:]
                                   or stats["plan_time"])),
    }
    if args.tag:
        # e.g. 'vd+bf16': distinguishes alternate checkpoint roots
        # (--models_dir) and numerics in one suffix.
        row["model"] = mid + "+" + args.tag
    else:
        # Separate yaml rows: the plain f32/ddpm row for the same
        # checkpoint is the quality-parity baseline.
        suffix = (["bf16"] if args.bf16 else []) + (
            [args.sampler + (str(args.ddim_substeps)
                             if args.ddim_substeps else "")]
            if args.sampler != "ddpm" else [])
        if suffix:
            row["model"] = mid + "+" + "+".join(suffix)
    if args.variant:
        row["variant"] = args.variant
    print(f"model {row['model']} over {args.n_tasks} tasks:")
    print(f"  fraction_free: {row['fraction_free']:.3f}")
    print(f"  success_rate:  {row['success_rate']:.3f}")
    if row["adherence"] is not None:
        print(f"  adherence:     {row['adherence']:.3f}")
    print(f"  plan_time:     {row['plan_time']:.3f}s")
    if args.out_yaml:
        import yaml
        rows = []
        if os.path.exists(args.out_yaml):
            with open(args.out_yaml) as f:
                rows = yaml.safe_load(f) or []
        rows = [r for r in rows if r.get("model") != row["model"]] + [row]
        with open(args.out_yaml, "w") as f:
            yaml.safe_dump(rows, f)


if __name__ == "__main__":
    main()

"""Render the contents of a data_trajectories/<model-id>/ dataset.

Counterpart of the reference's dataset inspection script
(reference: scripts/generate_data/visualize_trajectories.py:24-86): print
metadata, overlay a sample of the stored collision-free trajectories on the
environment, plot them in joint space, and animate a handful as a GIF.

Usage:
    python scripts/visualize_trajectories.py --env EnvConveyor2D \
        [--data_dir data_trajectories] [--n 128] [--out media/dataset_renders]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml

from mmd_tpu.datasets.trajectories import TrajectoryDataset, model_id
from mmd_tpu.viz.visualizer import PlanningVisualizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True, help="e.g. EnvConveyor2D")
    ap.add_argument("--data_dir", default="data_trajectories")
    ap.add_argument("--n", type=int, default=128,
                    help="number of trajectories to overlay")
    ap.add_argument("--n_animate", type=int, default=8,
                    help="trajectories in the animation GIF (0 to skip)")
    ap.add_argument("--out", default=None,
                    help="output dir (default: media/dataset_renders/<mid>)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    mid = model_id(args.env)
    with open(os.path.join(args.data_dir, mid, "metadata.yaml")) as f:
        meta = yaml.safe_load(f)
    print("-------------- METADATA --------------")
    print(yaml.safe_dump(meta), end="")
    print("--------------------------------------")

    ds = TrajectoryDataset.load(args.data_dir, mid)
    out = args.out or os.path.join("media", "dataset_renders", mid)
    os.makedirs(out, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    trajs = np.asarray(ds.trajs)
    idx = rng.choice(len(trajs), size=min(args.n, len(trajs)), replace=False)
    sample = trajs[idx]

    viz = PlanningVisualizer(task=ds.task)

    # Workspace overlay (reference render_robot_trajectories call, :70-75).
    fig, ax = viz.render_robot_trajectories(trajs=sample,
                                            show_robot_in_image=False)
    ax.set_title(f"{mid}: {len(sample)}/{len(trajs)} free trajectories")
    fig.savefig(os.path.join(out, "trajectories.png"), dpi=150)

    # Joint-space panels (reference plot_joint_space_state_trajectories,
    # :63-68).
    viz.plot_joint_space_trajectories(
        sample, q_min=ds.robot.q_min[:2], q_max=ds.robot.q_max[:2],
        output_fpath=os.path.join(out, "joint_space.png"))

    # Animated subset (reference animate_robot_trajectories -> GIF, :78-86).
    if args.n_animate > 0:
        anim_trajs = sample[:args.n_animate]
        viz.animate_multi_robot_trajectories(
            trajs_l=list(anim_trajs),
            start_state_l=[t[0, :2] for t in anim_trajs],
            goal_state_l=[t[-1, :2] for t in anim_trajs],
            video_filepath=os.path.join(out, "robot-traj.gif"),
            anim_time=float(meta.get("duration", 5.0)))

    print(f"wrote renders to {out}")


if __name__ == "__main__":
    main()

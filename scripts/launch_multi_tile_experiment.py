"""Multi-tile (2x2 / 3x3 grid) experiments with staggered start times.

Equivalent of scripts/inference/launch_multi_tile_experiment.py
(reference: 2x2 & 3x3 tile grids, stagger dt=10, runtime 240 s).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mmd_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from mmd_tpu.experiments.experiments import MultiAgentPlanningExperimentConfig
from launch_multi_agent_experiment import run_multi_agent_experiment  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", nargs="+", default=[
        "EnvTestTwoByTwoRobotPlanarDiskRandom",
        "EnvTestThreeByThreeRobotPlanarDiskRandom",
    ])
    ap.add_argument("--num_agents", type=int, nargs="+", default=[2, 4, 6])
    ap.add_argument("--planners", nargs="+", default=["XECBS", "PP"])
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--runtime_limit", type=float, default=240.0)
    ap.add_argument("--stagger_dt", type=int, default=10)
    ap.add_argument("--frontier_width", type=int, default=1)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 UNet inference for every tile model.")
    ap.add_argument("--time_str", default=None,
                    help="Reuse results/<time_str> to resume (done trials skip).")
    args = ap.parse_args()

    time_str = args.time_str or time.strftime("%y-%m-%d--%H-%M-%S")
    for instance in args.instances:
        cfg = MultiAgentPlanningExperimentConfig(
            time_str=time_str,
            instance_name=instance,
            num_agents_l=args.num_agents,
            multi_agent_planner_class_l=args.planners,
            num_trials_per_combination=args.trials,
            runtime_limit=args.runtime_limit,
            stagger_start_time_dt=args.stagger_dt,
            single_agent_planner_class="MPDEnsemble",
            frontier_width=args.frontier_width,
            bf16=args.bf16,
        )
        run_multi_agent_experiment(cfg)


if __name__ == "__main__":
    main()

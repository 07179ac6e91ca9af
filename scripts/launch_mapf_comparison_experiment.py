"""MAPF planner comparison: agents x planners x envs x trials.

Equivalent of scripts/inference/launch_mapf_comparison_experiment.py
(reference scale: agents {3,6,9,12,15,20} x planners {XECBS,ECBS,PP,CBS,XCBS}
x 3 envs x 10 trials).
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
        "EnvConveyor2DRobotPlanarDiskRandom",
        "EnvHighways2DRobotPlanarDiskRandom",
        "EnvDropRegion2DRobotPlanarDiskRandom",
    ])
    ap.add_argument("--num_agents", type=int, nargs="+",
                    default=[3, 6, 9, 12, 15, 20])
    ap.add_argument("--planners", nargs="+",
                    default=["XECBS", "ECBS", "PP", "CBS", "XCBS"])
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--runtime_limit", type=float, default=180.0)
    ap.add_argument("--time_str", default=None,
                    help="Reuse an existing results/<time_str> dir to resume "
                         "an interrupted sweep (done trials are skipped).")
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
        )
        run_multi_agent_experiment(cfg)


if __name__ == "__main__":
    main()

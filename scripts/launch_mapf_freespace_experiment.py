"""Free-space MAPF scaling experiment: 2-30 agents, empty map.

Equivalent of scripts/inference/launch_mapf_freespace_experiment.py
(reference: 2-30 agents, runtime 240 s).
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
    ap.add_argument("--instance", default="EnvEmptyNoWait2DRobotPlanarDiskCircle")
    ap.add_argument("--num_agents", type=int, nargs="+",
                    default=list(range(2, 31, 2)))
    ap.add_argument("--planners", nargs="+", default=["XECBS", "PP"])
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--runtime_limit", type=float, default=240.0)
    ap.add_argument("--time_str", default=None,
                    help="Reuse results/<time_str> to resume (done trials skip).")
    args = ap.parse_args()

    cfg = MultiAgentPlanningExperimentConfig(
        time_str=args.time_str or time.strftime("%y-%m-%d--%H-%M-%S"),
        instance_name=args.instance,
        num_agents_l=args.num_agents,
        multi_agent_planner_class_l=args.planners,
        num_trials_per_combination=args.trials,
        runtime_limit=args.runtime_limit,
    )
    run_multi_agent_experiment(cfg)


if __name__ == "__main__":
    main()

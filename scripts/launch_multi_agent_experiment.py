"""Experiment sets: agents x planners x trials grids with aggregation.

Equivalent of scripts/inference/launch_multi_agent_experiment.py and the
launch_mapf_* variants in the reference.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# MMD_CPU_DEVICES=N forces an N-device virtual CPU backend (same escape
# hatch as inference_multi_agent.py — capability sweeps stay runnable when
# the tunneled TPU is unavailable; wall-clock is then not comparable).
_n_cpu = int(os.environ.get("MMD_CPU_DEVICES", "0"))
if _n_cpu:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_n_cpu}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

from mmd_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from mmd_tpu.experiments.experiment_utils import combine_and_save_results_for_experiment
from mmd_tpu.experiments.experiments import (
    MultiAgentPlanningExperimentConfig,
    get_result_dir_from_trial_config,
)
from mmd_tpu.experiments.trial import run_multi_agent_trial


def run_multi_agent_experiment(cfg: MultiAgentPlanningExperimentConfig,
                               results_root: str = "./results",
                               registry=None):
    """Sequential trial loop with per-trial error capture
    (reference: launch_multi_agent_experiment.py:31-58).

    Resumable: trials whose results.pkl already exists under the experiment's
    time_str directory are skipped, so an interrupted sweep can be relaunched
    with the same time_str and continue where it stopped.
    """
    cfg.save(results_root)
    for trial_cfg in cfg.get_single_trial_configs_from_experiment_config():
        done_marker = os.path.join(
            get_result_dir_from_trial_config(trial_cfg, cfg.time_str,
                                             trial_cfg.trial_number,
                                             root=results_root),
            "results.pkl")
        if os.path.exists(done_marker):
            continue
        try:
            result = run_multi_agent_trial(trial_cfg, registry=registry,
                                           results_root=results_root)
            print(f"[{trial_cfg.multi_agent_planner_class} "
                  f"n={trial_cfg.num_agents} trial={trial_cfg.trial_number}] "
                  f"{result.success_status} in {result.planning_time:.1f}s")
        except Exception as e:  # noqa: BLE001 — sweep continues past failures
            err_path = os.path.join(results_root, f"error_{cfg.time_str}.txt")
            with open(err_path, "a") as f:
                f.write(f"{trial_cfg}: {e!r}\n")
            print(f"trial failed: {e!r}")
    return combine_and_save_results_for_experiment(cfg, results_root)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instance", default="EnvEmptyNoWait2DRobotPlanarDiskCircle")
    ap.add_argument("--num_agents", type=int, nargs="+", default=[3, 6, 9])
    ap.add_argument("--planners", nargs="+",
                    default=["XECBS", "ECBS", "PP", "CBS", "XCBS"])
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--runtime_limit", type=float, default=180.0)
    ap.add_argument("--stagger_dt", type=int, default=0)
    ap.add_argument("--frontier_width", type=int, default=1,
                    help="Expand the top-M open CT nodes per fused device "
                         "call (CBS family; 1 = reference expansion order).")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 UNet inference (guide/posterior/selection "
                         "stay f32) — the numerics bench.py measures.")
    ap.add_argument("--repair_period", type=int, default=0,
                    help="Beyond-reference: one Jacobi repair round on the "
                         "popped node every N accepted expansions (0 = off).")
    ap.add_argument("--greedy_iters", type=int, default=0,
                    help="Speculative greedy-chain depth per fused call "
                         "(0 = CBS default, 8).")
    ap.add_argument("--models_dir", default="data_trained_models",
                    help="alternate checkpoint root (e.g. the H=128 "
                         "long-horizon models in data_trained_models_h128)")
    ap.add_argument("--data_dir", default="data_trajectories")
    ap.add_argument("--time_str", default=None,
                    help="Reuse results/<time_str> to resume (done trials "
                         "skip).")
    args = ap.parse_args()
    from mmd_tpu.experiments.trial import ModelRegistry
    registry = ModelRegistry(trained_models_dir=args.models_dir,
                             trajectories_dir=args.data_dir)

    cfg = MultiAgentPlanningExperimentConfig(
        time_str=args.time_str or time.strftime("%y-%m-%d--%H-%M-%S"),
        instance_name=args.instance,
        num_agents_l=args.num_agents,
        multi_agent_planner_class_l=args.planners,
        num_trials_per_combination=args.trials,
        runtime_limit=args.runtime_limit,
        stagger_start_time_dt=args.stagger_dt,
        frontier_width=args.frontier_width,
        bf16=args.bf16,
        repair_period=args.repair_period,
        greedy_iters=args.greedy_iters,
    )
    analyzed = run_multi_agent_experiment(cfg, registry=registry)
    for n, per_planner in analyzed.items():
        for planner, metrics in per_planner.items():
            print(f"n={n} {planner}: success={metrics['success_rate']:.2f} "
                  f"time={metrics['avg_planning_time']:.1f}s")


if __name__ == "__main__":
    main()

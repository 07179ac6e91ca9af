"""Reading and aggregating experiment results.

Mirrors mmd/common/experiments/experiment_utils.py:45-196: walk the results
tree, unpickle per-trial results, compute success/failure rates and averages
(success-conditioned metrics normalized over successful trials only).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict

from mmd_tpu.experiments.experiments import (
    MultiAgentPlanningExperimentConfig,
    MultiAgentPlanningSingleTrialConfig,
    get_result_dir_from_time_str,
    get_result_dir_from_trial_config,
)
from mmd_tpu.experiments.status import TrialSuccessStatus


def read_aggregated_trial_results_for_experiment(
        cfg: MultiAgentPlanningExperimentConfig, root: str = "./results") -> Dict:
    """{num_agents: {planner_class: [trial results]}} (reference :45-81)."""
    out = {}
    for num_agents in cfg.num_agents_l:
        out[num_agents] = {}
        for planner_cls in cfg.multi_agent_planner_class_l:
            out[num_agents][planner_cls] = []
            for trial_number in range(cfg.num_trials_per_combination):
                tc = MultiAgentPlanningSingleTrialConfig(
                    instance_name=cfg.instance_name, num_agents=num_agents,
                    multi_agent_planner_class=planner_cls,
                    single_agent_planner_class=cfg.single_agent_planner_class)
                d = get_result_dir_from_trial_config(tc, time_str=cfg.time_str,
                                                     trial_number=trial_number,
                                                     root=root)
                fpath = os.path.join(d, "results.pkl")
                if not os.path.exists(fpath):
                    continue
                with open(fpath, "rb") as f:
                    out[num_agents][planner_cls].append(pickle.load(f))
    return out


def combine_and_save_results_for_experiment(
        cfg: MultiAgentPlanningExperimentConfig, root: str = "./results") -> Dict:
    """reference :84-196. Success-conditioned averages are normalized by the
    number of successful trials; rates by total trials."""
    agg = read_aggregated_trial_results_for_experiment(cfg, root)
    analyzed = {}
    for num_agents in cfg.num_agents_l:
        analyzed[num_agents] = {}
        for planner_cls in cfg.multi_agent_planner_class_l:
            trials = agg[num_agents][planner_cls]
            d = {
                "num_trials": len(trials),
                "success_rate": 0.0,
                "fail_rate_runtime_limit": 0.0,
                "fail_rate_no_solution": 0.0,
                "fail_rate_collision_agents": 0.0,
                "avg_num_collisions_in_solution": 0.0,
                "avg_collisions_all_trials": 0.0,
                "avg_ct_expansions": 0.0,
                "avg_data_adherence": 0.0,
                "avg_planning_time": 0.0,
                # Warm-time companion (extension): planning time minus the
                # XLA compile share the trial paid — cross-planner latency
                # comparisons should read this column.
                "avg_warm_planning_time": 0.0,
                "avg_path_length_per_agent": 0.0,
                "avg_mean_path_acceleration_per_agent": 0.0,
            }
            n_success = sum(1 for t in trials
                            if t.success_status == TrialSuccessStatus.SUCCESS)
            n = len(trials)
            for t in trials:
                if n:
                    d["success_rate"] += bool(t.success_status) / n
                    d["fail_rate_runtime_limit"] += (
                        t.success_status == TrialSuccessStatus.FAIL_RUNTIME_LIMIT) / n
                    d["fail_rate_no_solution"] += (
                        t.success_status == TrialSuccessStatus.FAIL_NO_SOLUTION) / n
                    d["fail_rate_collision_agents"] += (
                        t.success_status == TrialSuccessStatus.FAIL_COLLISION_AGENTS) / n
                    # Extension beyond the reference: residual collisions
                    # averaged over ALL trials (incl. failures) — how close
                    # failed searches got. The reference-named metric below
                    # is success-conditioned like the reference's.
                    d["avg_collisions_all_trials"] += t.num_collisions_in_solution / n
                if t.success_status == TrialSuccessStatus.SUCCESS and n_success:
                    # Success-conditioned, matching the reference exactly
                    # (experiment_utils.py:137-148; ~0 by construction).
                    d["avg_num_collisions_in_solution"] += \
                        t.num_collisions_in_solution / n_success
                    d["avg_ct_expansions"] += t.num_ct_expansions / n_success
                    d["avg_data_adherence"] += t.data_adherence / n_success
                    d["avg_planning_time"] += t.planning_time / n_success
                    # Clamped at 0: XLA compiles on parallel threads, so the
                    # summed compile durations can exceed the wall time they
                    # overlapped with.
                    d["avg_warm_planning_time"] += max(
                        0.0, t.planning_time
                        - getattr(t, "jit_compile_time", 0.0)) / n_success
                    d["avg_path_length_per_agent"] += t.path_length_per_agent / n_success
                    d["avg_mean_path_acceleration_per_agent"] += \
                        t.mean_path_acceleration_per_agent / n_success
            analyzed[num_agents][planner_cls] = d

    out_dir = get_result_dir_from_time_str(cfg.time_str, root)
    os.makedirs(out_dir, exist_ok=True)
    # Suffix with the instance so multi-instance sweeps sharing one
    # time_str dir don't overwrite each other's aggregates.
    stem = (f"analyzed_results__{cfg.instance_name}" if cfg.instance_name
            else "analyzed_results")
    with open(os.path.join(out_dir, f"{stem}.pkl"), "wb") as f:
        pickle.dump(analyzed, f)
    with open(os.path.join(out_dir, f"{stem}.txt"), "w") as f:
        for num_agents, per_planner in analyzed.items():
            for planner_cls, metrics in per_planner.items():
                f.write(f"num_agents={num_agents} planner={planner_cls}: {metrics}\n")
    return analyzed

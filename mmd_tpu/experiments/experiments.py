"""Experiment configs, per-trial results, and results-directory layout.

Mirrors mmd/common/experiments/experiments.py:47-274. Results serialize with
pickle (results.pkl) plus a human-readable results.txt, under
results/<time>/instance_name___X/num_agents___N/planner___P/
single_agent_planner___S/<trial>/.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
import zlib
from pathlib import Path
from typing import List, Optional

import numpy as np

from mmd_tpu.config import params as default_params
from mmd_tpu.experiments.status import TrialSuccessStatus


@dataclasses.dataclass
class MultiAgentPlanningSingleTrialConfig:
    """reference: experiments.py:122-166."""

    time_str: Optional[str] = None
    trial_number: int = 0
    runtime_limit: float = 10.0
    num_agents: int = 1
    stagger_start_time_dt: int = 0
    multi_agent_planner_class: str = "XECBS"
    single_agent_planner_class: str = "MPD"
    instance_name: Optional[str] = None
    render_animation: bool = False
    start_state_pos_l: Optional[List[np.ndarray]] = None
    goal_state_pos_l: Optional[List[np.ndarray]] = None
    global_model_ids: Optional[List[List[str]]] = None
    agent_skeleton_l: Optional[List[List[List[int]]]] = None
    # Beyond-reference throughput mode (CBS family): expand the top-M open
    # CT nodes per fused device call (cbs.CBS frontier_width). 1 keeps the
    # reference's one-node-per-round order.
    frontier_width: int = 1
    # bfloat16 UNet inference (guide/posterior/selection stay f32) — the
    # numerics bench.py measures; MODEL_EVAL.yaml carries quality parity.
    bf16: bool = False
    # Beyond-reference dense-instance levers (cbs.CBS): Jacobi repair every
    # N accepted expansions (0 = off), and the speculative greedy-chain
    # depth per fused call (0 = the CBS.GREEDY_ITERS default, 8).
    repair_period: int = 0
    greedy_iters: int = 0


@dataclasses.dataclass
class MultiAgentPlanningExperimentConfig:
    """reference: experiments.py:47-120."""

    time_str: Optional[str] = None
    instance_name: Optional[str] = None
    num_agents_l: List[int] = dataclasses.field(default_factory=list)
    stagger_start_time_dt: int = 0
    multi_agent_planner_class_l: List[str] = dataclasses.field(default_factory=list)
    single_agent_planner_class: str = "MPD"
    runtime_limit: float = default_params.runtime_limit
    num_trials_per_combination: int = 1
    render_animation: bool = False
    frontier_width: int = 1  # forwarded to every CBS-family trial
    bf16: bool = False       # forwarded to every trial's UNet inference
    repair_period: int = 0   # forwarded to every CBS-family trial
    greedy_iters: int = 0    # forwarded to every CBS-family trial

    def get_single_trial_configs_from_experiment_config(self):
        """Same start/goals reused across planners per trial
        (reference :68-97)."""
        from mmd_tpu.experiments.problems import get_planning_problem

        configs = []
        for num_agents in self.num_agents_l:
            # Deterministic per-(instance, agents, trial) seeds so a resumed
            # sweep regenerates identical problems and the paired design
            # (same starts/goals across planners per trial) survives restarts.
            base = zlib.crc32(f"{self.instance_name}:{num_agents}".encode())
            problems = [get_planning_problem(self.instance_name, num_agents,
                                             seed=base + t)
                        for t in range(self.num_trials_per_combination)]
            for planner_cls in self.multi_agent_planner_class_l:
                for trial_number in range(self.num_trials_per_combination):
                    c = MultiAgentPlanningSingleTrialConfig(
                        time_str=self.time_str,
                        trial_number=trial_number,
                        num_agents=num_agents,
                        stagger_start_time_dt=self.stagger_start_time_dt,
                        multi_agent_planner_class=planner_cls,
                        single_agent_planner_class=self.single_agent_planner_class,
                        instance_name=self.instance_name,
                        runtime_limit=self.runtime_limit,
                        render_animation=self.render_animation,
                        frontier_width=getattr(self, "frontier_width", 1),
                        bf16=getattr(self, "bf16", False),
                        repair_period=getattr(self, "repair_period", 0),
                        greedy_iters=getattr(self, "greedy_iters", 0),
                    )
                    (c.start_state_pos_l, c.goal_state_pos_l,
                     c.global_model_ids, c.agent_skeleton_l) = problems[trial_number]
                    configs.append(c)
        return configs

    def save(self, root: str = "./results"):
        d = get_result_dir_from_time_str(self.time_str, root)
        Path(d).mkdir(parents=True, exist_ok=True)
        with open(os.path.join(d, "experiment_config.pkl"), "wb") as f:
            pickle.dump(self, f)


@dataclasses.dataclass
class MultiAgentPlanningSingleTrialResult:
    """reference: experiments.py:179-239."""

    trial_config: Optional[MultiAgentPlanningSingleTrialConfig] = None
    agent_path_l: List[np.ndarray] = dataclasses.field(default_factory=list)
    num_ct_expansions: int = 0
    success_status: TrialSuccessStatus = TrialSuccessStatus.UNKNOWN
    num_collisions_in_solution: int = 0
    data_adherence: float = 0.0
    planning_time: float = 0.0
    # XLA trace+lower+compile seconds included in planning_time (first
    # trial per process/shape-bucket pays jit compilation; warm trials are
    # planning_time - jit_compile_time). Recorded for latency honesty in
    # cross-planner sweep comparisons.
    jit_compile_time: float = 0.0
    path_length_per_agent: float = 0.0
    mean_path_acceleration_per_agent: float = 0.0
    start_state_pos_l: List[np.ndarray] = dataclasses.field(default_factory=list)
    goal_state_pos_l: List[np.ndarray] = dataclasses.field(default_factory=list)
    global_model_ids: List[List[str]] = dataclasses.field(default_factory=list)
    agent_skeleton_l: List[List[List[int]]] = dataclasses.field(default_factory=list)

    def save(self, results_dir: str):
        Path(results_dir).mkdir(parents=True, exist_ok=True)
        with open(os.path.join(results_dir, "results.pkl"), "wb") as f:
            pickle.dump(self, f)
        with open(os.path.join(results_dir, "results.txt"), "w") as f:
            f.write(str(self))

    def __str__(self):
        tc = self.trial_config
        return (f"Trial Config Summary:\n"
                f"  Method: {tc.multi_agent_planner_class if tc else '?'}\n"
                f"  Num Agents: {tc.num_agents if tc else '?'}\n"
                f"  Instance: {tc.instance_name if tc else '?'}\n"
                f"Trial Results:\n"
                f"  success_status: {self.success_status}\n"
                f"  num_collisions_in_solution: {self.num_collisions_in_solution}\n"
                f"  data_adherence: {self.data_adherence}\n"
                f"  planning_time: {self.planning_time}\n"
                f"  jit_compile_time: {self.jit_compile_time}\n"
                f"  path_length_per_agent: {self.path_length_per_agent}\n"
                f"  mean_path_acceleration_per_agent: {self.mean_path_acceleration_per_agent}\n"
                f"  num_ct_expansions: {self.num_ct_expansions}\n")


def get_result_dir_from_time_str(time_str: str, root: str = "./results") -> str:
    return os.path.abspath(os.path.join(root, f"{time_str}"))


def get_result_dir_from_trial_config(trial_config: MultiAgentPlanningSingleTrialConfig,
                                     time_str: Optional[str] = None,
                                     trial_number: int = 0,
                                     root: str = "./results") -> str:
    """reference: experiments.py:258-274."""
    if time_str is None:
        raise ValueError("Time string must be provided.")
    return os.path.abspath(os.path.join(
        get_result_dir_from_time_str(time_str, root),
        f"instance_name___{trial_config.instance_name}",
        f"num_agents___{trial_config.num_agents}",
        f"planner___{trial_config.multi_agent_planner_class}",
        f"single_agent_planner___{trial_config.single_agent_planner_class}",
        str(trial_number)))

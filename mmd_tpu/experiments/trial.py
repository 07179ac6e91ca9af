"""Trial runner: the flagship inference entry point.

TPU-native re-design of run_multi_agent_trial
(reference: scripts/inference/inference_multi_agent.py:81-366): per-agent
planner construction from (model ids, tile skeletons), team planning via
CBS/PP, post-hoc solution audit, data adherence, metrics, result saving,
and optional GIF rendering.
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mmd_tpu.config import DiffusionConfig, params as default_params
from mmd_tpu.datasets.trajectories import TrajectoryDataset, env_name_from_model_id
from mmd_tpu.envs.envs import make_env
from mmd_tpu.experiments.experiments import (
    MultiAgentPlanningSingleTrialConfig,
    MultiAgentPlanningSingleTrialResult,
    get_result_dir_from_trial_config,
)
from mmd_tpu.experiments.status import TrialSuccessStatus
from mmd_tpu.planners.multi_agent.cbs import CBS
from mmd_tpu.planners.multi_agent.prioritized_planning import PrioritizedPlanning
from mmd_tpu.planners.single_agent.mpd import MPD
from mmd_tpu.planners.single_agent.mpd_ensemble import MPDEnsemble
from mmd_tpu.tasks.task_ensemble import TaskEnsemble
from mmd_tpu.train.trainer import load_checkpoint
from mmd_tpu.utils.metrics import (
    compute_average_acceleration,
    compute_path_length,
)

TILE_WIDTH = 2.0   # reference: inference_multi_agent.py:146-149
TILE_HEIGHT = 2.0


def tile_transform(coord: List[int]) -> np.ndarray:
    """Skeleton coord [row, col] -> world translation (col*W, -row*H)."""
    r, c = coord
    return np.array([c * TILE_WIDTH, -r * TILE_HEIGHT], np.float32)


class ModelRegistry:
    """Caches (model, params, schedule, dataset) per model id.

    Plays the role of the reference's per-planner checkpoint/dataset loading
    (mpd.py:116-177) with process-wide reuse.
    """

    def __init__(self, trained_models_dir: str = "data_trained_models",
                 trajectories_dir: str = "data_trajectories"):
        self.trained_models_dir = trained_models_dir
        self.trajectories_dir = trajectories_dir
        self._cache: Dict[str, Tuple] = {}

    def get(self, mid: str):
        if mid in self._cache:
            return self._cache[mid]
        model_dir = os.path.join(self.trained_models_dir, mid)
        model, params, schedule, info = load_checkpoint(model_dir)
        env_name = env_name_from_model_id(mid)
        try:
            dataset = TrajectoryDataset.load(self.trajectories_dir, mid)
        except FileNotFoundError:
            from mmd_tpu.datagen.synthetic import generate_linear_dataset
            dataset = generate_linear_dataset(env_name, n_contexts=256, seed=7)
        # Restore the exact training normalizer from the checkpoint
        # (the reference reloads args.yaml for the same purpose, mpd.py:120).
        from mmd_tpu.datasets.normalization import LimitsNormalizer
        dataset.normalizer = LimitsNormalizer.from_limits(
            info["normalizer_mins"], info["normalizer_maxs"])
        dataset.trajs_normalized = dataset.normalizer.normalize(dataset.trajs)
        self._cache[mid] = (model, params, schedule, dataset)
        return self._cache[mid]


_DEFAULT_REGISTRY: Optional[ModelRegistry] = None


def default_registry() -> ModelRegistry:
    global _DEFAULT_REGISTRY
    if _DEFAULT_REGISTRY is None:
        _DEFAULT_REGISTRY = ModelRegistry()
    return _DEFAULT_REGISTRY


def build_agent_planner(registry: ModelRegistry, model_ids: List[str],
                        transforms: np.ndarray, start_global: np.ndarray,
                        goal_global: np.ndarray, seed: int = 0,
                        cfg: Optional[DiffusionConfig] = None,
                        bf16: bool = False):
    """Single-tile skeleton -> MPD (local frame); longer -> MPDEnsemble."""
    if len(model_ids) == 1:
        model, params, schedule, dataset = registry.get(model_ids[0])
        start_local = np.asarray(start_global) - transforms[0]
        goal_local = np.asarray(goal_global) - transforms[0]
        return MPD(model, params, schedule, dataset, jnp.asarray(start_local),
                   jnp.asarray(goal_local), cfg=cfg, seed=seed, bf16=bf16)
    models, params_l, datasets = [], [], []
    schedule = None
    for mid in model_ids:
        model, params, sched, dataset = registry.get(mid)
        models.append(model)
        params_l.append(params)
        datasets.append(dataset)
        schedule = sched
    return MPDEnsemble(models, params_l, schedule, datasets, transforms,
                       np.asarray(start_global), np.asarray(goal_global),
                       cfg=cfg, seed=seed, bf16=bf16)


def make_team_planner(planner_class: str, low_level_planner_l, start_l, goal_l,
                      **kwargs):
    """reference: inference_multi_agent.py:112-113, 240-254."""
    if planner_class == "PP":
        return PrioritizedPlanning(low_level_planner_l, start_l, goal_l, **kwargs)
    flags = {"CBS": (False, False), "ECBS": (True, False),
             "XCBS": (False, True), "XECBS": (True, True)}[planner_class]
    return CBS(low_level_planner_l, start_l, goal_l,
               is_ecbs=flags[0], is_xcbs=flags[1], **kwargs)


def audit_solution_collisions(paths_l: List[np.ndarray],
                              robot_radius: float) -> int:
    """Post-hoc solution audit: number of unordered (pair, t) contacts
    closer than 2*radius (reference: inference_multi_agent.py:286-296).

    ONE device call via the batched team summary — the reference's dense
    host-side (n, n, T) pairwise tensor stops scaling past a few dozen
    agents; here only a scalar crosses the host boundary.
    """
    from mmd_tpu.planners.multi_agent.conflict_detection import (
        team_conflict_summary,
    )
    arr = jnp.asarray(np.stack([np.asarray(p)[:, :2] for p in paths_l]))
    count, *_ = team_conflict_summary(arr, 2.0 * robot_radius)
    return int(count) // 2  # ordered -> unordered pairs


def run_multi_agent_trial(cfg: MultiAgentPlanningSingleTrialConfig,
                          registry: Optional[ModelRegistry] = None,
                          results_root: str = "./results",
                          save: bool = True,
                          diffusion_cfg: Optional[DiffusionConfig] = None,
                          mesh=None
                          ) -> MultiAgentPlanningSingleTrialResult:
    """reference: inference_multi_agent.py:81-366.

    `mesh`: optional jax.sharding.Mesh with an 'agent' axis — CBS-family
    planners run team roots/repair SPMD over it (multi-chip flag flip)."""
    registry = registry or default_registry()
    num_agents = cfg.num_agents
    global_model_ids = cfg.global_model_ids
    skeletons = cfg.agent_skeleton_l

    # Global-frame starts/goals (local tile frame in the config,
    # reference :196-200).
    start_l = [np.asarray(cfg.start_state_pos_l[i], np.float32)
               + tile_transform(skeletons[i][0]) for i in range(num_agents)]
    goal_l = [np.asarray(cfg.goal_state_pos_l[i], np.float32)
              + tile_transform(skeletons[i][-1]) for i in range(num_agents)]

    # Per-agent planners.
    agent_model_ids_l, agent_transforms_l, planners = [], [], []
    for i in range(num_agents):
        mids = [global_model_ids[r][c] for r, c in skeletons[i]]
        transforms = np.stack([tile_transform(rc) for rc in skeletons[i]])
        agent_model_ids_l.append(mids)
        agent_transforms_l.append(transforms)
        planners.append(build_agent_planner(registry, mids, transforms,
                                            start_l[i], goal_l[i],
                                            # Vary the sampler stream per
                                            # trial: on deterministic problem
                                            # generators (circle/boundary)
                                            # fixed keys would make every
                                            # trial an identical replica.
                                            seed=(default_params.seed + i
                                                  + 1009 * cfg.trial_number),
                                            cfg=diffusion_cfg,
                                            bf16=getattr(cfg, "bf16", False)))

    # Reference task/robot spanning all tiles (reference :163-190).
    all_coords = [[r, c] for r in range(len(global_model_ids))
                  for c in range(len(global_model_ids[0]))]
    ref_tasks = [registry.get(global_model_ids[r][c])[3].task for r, c in all_coords]
    ref_transforms = np.stack([tile_transform(rc) for rc in all_coords])
    if len(all_coords) == 1:
        reference_task = ref_tasks[0]
    else:
        reference_task = TaskEnsemble(ref_tasks, ref_transforms)
    reference_robot = planners[0].robot

    start_time_l = [cfg.stagger_start_time_dt * i for i in range(num_agents)]
    mesh_kw = ({"mesh": mesh} if mesh is not None
               and cfg.multi_agent_planner_class != "PP" else {})
    if (getattr(cfg, "frontier_width", 1) > 1
            and cfg.multi_agent_planner_class != "PP"):
        mesh_kw["frontier_width"] = cfg.frontier_width
    if (getattr(cfg, "repair_period", 0) > 0
            and cfg.multi_agent_planner_class != "PP"):
        mesh_kw["repair_period"] = cfg.repair_period
    if (getattr(cfg, "greedy_iters", 0) or 0) > 0 \
            and cfg.multi_agent_planner_class != "PP":
        mesh_kw["greedy_iters"] = cfg.greedy_iters
    team = make_team_planner(cfg.multi_agent_planner_class, planners,
                             start_l, goal_l, start_time_l=start_time_l,
                             reference_robot=reference_robot,
                             reference_task=reference_task, **mesh_kw)

    from mmd_tpu.utils.profiling import compile_time_monitor

    t0 = time.time()
    with compile_time_monitor() as compile_acc:
        paths_l, num_ct_expansions, status, n_coll = team.plan(
            runtime_limit=cfg.runtime_limit)
    planning_time = time.time() - t0

    result = MultiAgentPlanningSingleTrialResult(
        trial_config=cfg,
        agent_path_l=[np.asarray(p) for p in paths_l],
        num_ct_expansions=num_ct_expansions,
        success_status=status,
        num_collisions_in_solution=n_coll,
        planning_time=planning_time,
        jit_compile_time=float(compile_acc["compile_s"]),
        start_state_pos_l=[s.tolist() for s in start_l],
        goal_state_pos_l=[g.tolist() for g in goal_l],
        global_model_ids=global_model_ids,
        agent_skeleton_l=skeletons,
    )

    # Post-hoc audit: any pair within 2r flips success (reference :286-296).
    if len(paths_l) > 0 and status == TrialSuccessStatus.SUCCESS:
        n_audit = audit_solution_collisions(
            paths_l, default_params.robot_planar_disk_radius)
        if n_audit > 0:
            result.num_collisions_in_solution += n_audit
            result.success_status = TrialSuccessStatus.FAIL_COLLISION_AGENTS

    if result.success_status == TrialSuccessStatus.SUCCESS:
        # Data adherence per agent, averaged over skeleton tiles
        # (reference :301-320).
        adh_total = 0.0
        for i in range(num_agents):
            # Tile length from the agent's planner (supports long-horizon
            # models, e.g. H=128 Conveyor, not just the H=64 default).
            H = getattr(planners[i], "n_support_points",
                        default_params.horizon)
            agent_adh = 0.0
            path = np.asarray(paths_l[i])
            for step, mid in enumerate(agent_model_ids_l[i]):
                seg = path[start_time_l[i] + step * H:
                           start_time_l[i] + (step + 1) * H, :2]
                seg_local = seg - agent_transforms_l[i][step]
                env = make_env(env_name_from_model_id(mid))
                agent_adh += env.compute_traj_data_adherence(seg_local)
            adh_total += agent_adh / len(agent_model_ids_l[i])
        result.data_adherence = adh_total / num_agents

        lengths = [float(compute_path_length(jnp.asarray(p)[None])[0])
                   for p in paths_l]
        accels = [float(compute_average_acceleration(jnp.asarray(p)[None])[0])
                  for p in paths_l]
        result.path_length_per_agent = float(np.mean(lengths))
        result.mean_path_acceleration_per_agent = float(np.mean(accels))

    if save:
        results_dir = get_result_dir_from_trial_config(
            cfg, cfg.time_str or time.strftime("%y-%m-%d--%H-%M-%S"),
            cfg.trial_number, root=results_root)
        result.save(results_dir)
        if result.success_status == TrialSuccessStatus.SUCCESS and len(paths_l):
            from mmd_tpu.viz.visualizer import PlanningVisualizer
            envs = [make_env(env_name_from_model_id(global_model_ids[r][c]))
                    for r, c in all_coords]
            viz = PlanningVisualizer(robot_radius=reference_robot.radius)
            viz.save_frame(paths_l, start_l, goal_l,
                           output_fpath=os.path.join(results_dir, "mmd_single_trial.png"),
                           envs=envs, env_transforms=ref_transforms)
            if cfg.render_animation:
                viz.animate_multi_robot_trajectories(
                    trajs_l=paths_l, start_state_l=start_l, goal_state_l=goal_l,
                    video_filepath=os.path.join(results_dir, "mmd_single_trial.gif"),
                    envs=envs, env_transforms=ref_transforms)
    return result

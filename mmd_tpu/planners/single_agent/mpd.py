"""MPD: guided-diffusion single-agent motion planner.

TPU-native re-design of MPD (reference: mmd/planners/single_agent/mpd.py:58-617).
The reference's plan call chains Python loops (guide autograd, post-hoc
selection); here ONE jitted program runs the entire call: guided denoise ->
unnormalize -> classify free/collision -> score (path length + smoothness)
-> select best -> savgol smooth. Constraints arrive as padded ConstraintSet
pytrees bucketed to a few static shapes, so CBS replans reuse the compiled
executable.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree_dataclass

from mmd_tpu.common.constraints import MultiPointConstraint
from mmd_tpu.common.experiences import PathBatchExperience
from mmd_tpu.config import DiffusionConfig, params as default_params
from mmd_tpu.costs.constraints import (
    ConstraintSet,
    SoftPathConstraints,
    empty_constraint_set,
    pack_constraint_set,
    split_soft_path_constraints,
)
from mmd_tpu.costs.guide import GuideConfig, GuideData
from mmd_tpu.datasets.trajectories import TrajectoryDataset
from mmd_tpu.models.diffusion import (
    HardConds,
    guided_p_sample_loop,
    q_sample,
)
from mmd_tpu.models.schedules import DiffusionSchedule
from mmd_tpu.planners.single_agent.common import PlannerOutput
from mmd_tpu.tasks.task import classify_trajs
from mmd_tpu.utils.interp import savgol_matrix
from mmd_tpu.utils.metrics import (
    compute_path_length,
    compute_smoothness,
    compute_variance_waypoints,
)

# Static shape buckets for packed constraints: (max_constraints, max_points).
# The large P buckets cover ECBS/PP soft constraints, which carry one point
# per other-agent waypoint ((n_agents-1) * H points in one constraint).
# The 128/256 K tiers and the 4096 P tier are for dense teams: a 25-agent
# Conveyor CT node can legitimately accumulate >64 hard constraints on one
# agent (first hit: conveyor-vd-cpu n=25 trial 1), and soft constraints
# carry (n_agents-1)*64 points, which passes 2048 at 33 agents.
K_BUCKETS = (4, 16, 64, 128, 256)
P_BUCKETS = (1, 64, 512, 2048, 4096)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"{n} exceeds the largest bucket {buckets[-1]}")


_BF16_CLONES: dict = {}


def _bf16_model(model):
    """bfloat16-compute clone of a flax module, cached by identity so all
    planners sharing `model` share one apply_fn (one jit cache entry)."""
    key = id(model)
    if key not in _BF16_CLONES:
        _BF16_CLONES[key] = (model, model.clone(dtype=jnp.bfloat16))
    return _BF16_CLONES[key][1]


@pytree_dataclass
class PlanResult:
    """Fixed-shape device output of one plan call."""

    trajs_iters: jax.Array     # (S+1, B, H, D) unnormalized chain
    trajs_final: jax.Array     # (B, H, D) savgol-smoothed final
    free_mask: jax.Array       # (B,) bool
    wp_collisions: jax.Array   # (B, H_interp) bool
    cost_path_length: jax.Array  # (B,)
    cost_smoothness: jax.Array   # (B,)
    cost_all: jax.Array        # (B,) path+smoothness, +inf where not free
    idx_best: jax.Array        # () int32 argmin of cost_all
    variance_waypoints: jax.Array  # () over free trajs proxy (all trajs)


def _finalize_plan(chain_norm: jax.Array, normalizer, scene, radius: float,
                   q_min, q_max, savgol: jax.Array) -> PlanResult:
    """Unnormalize + classify + score + select + smooth, all on device.

    Mirrors mpd.py:354-405 (classification, path-length+smoothness scoring,
    argmin over free trajs, savgol smoothing of the finals).
    """
    trajs_iters = normalizer.unnormalize(chain_norm)
    trajs_final = trajs_iters[-1]
    free_mask, wp_coll = classify_trajs(scene, trajs_final, radius, q_min, q_max)
    c_len = compute_path_length(trajs_final)
    c_smooth = compute_smoothness(trajs_final)
    cost_all = jnp.where(free_mask, c_len + c_smooth, jnp.inf)
    idx_best = jnp.argmin(cost_all).astype(jnp.int32)
    smoothed = jnp.einsum("ij,bjd->bid", savgol, trajs_final)
    return PlanResult(
        trajs_iters=trajs_iters,
        trajs_final=smoothed,
        free_mask=free_mask,
        wp_collisions=wp_coll,
        cost_path_length=c_len,
        cost_smoothness=c_smooth,
        cost_all=cost_all,
        idx_best=idx_best,
        variance_waypoints=compute_variance_waypoints(trajs_final),
    )


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg"))
def _plan_fresh(apply_fn, params, schedule, hard: HardConds, gd: GuideData,
                key, cfg: DiffusionConfig, guide_cfg: GuideConfig,
                scene, radius, q_min, q_max, savgol) -> PlanResult:
    _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard, key, cfg,
                                    gd=gd, guide_cfg=guide_cfg)
    return _finalize_plan(chain, gd.normalizer, scene, radius, q_min, q_max, savgol)


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg",
                                             "n_noise", "n_denoise"))
def _plan_local(apply_fn, params, schedule, hard: HardConds, gd: GuideData,
                seed_trajs_norm, key, cfg: DiffusionConfig,
                guide_cfg: GuideConfig, scene, radius, q_min, q_max, savgol,
                n_noise: int, n_denoise: int) -> PlanResult:
    key, nkey = jax.random.split(key)
    B = seed_trajs_norm.shape[0]
    t = jnp.full((B,), n_noise, jnp.int32)
    noise = jax.random.normal(nkey, seed_trajs_norm.shape, seed_trajs_norm.dtype)
    warm = q_sample(schedule, seed_trajs_norm, t, noise)
    _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard, key, cfg,
                                    gd=gd, guide_cfg=guide_cfg,
                                    n_diffusion_steps=n_denoise, warm_start=warm)
    return _finalize_plan(chain, gd.normalizer, scene, radius, q_min, q_max, savgol)


class MPD:
    """Single-agent guided-diffusion planner bound to one (env, model).

    Construction mirrors MPD.__init__ (mpd.py:116-304): dataset + model +
    costs/guide + fixed start/goal hard conditions; `warmup()` precompiles
    the plan shapes like the reference's torch.compile warmup (mpd.py:176-177).
    """

    def __init__(self, model, params, schedule: DiffusionSchedule,
                 dataset: TrajectoryDataset,
                 start_state_pos, goal_state_pos,
                 cfg: Optional[DiffusionConfig] = None,
                 guide_cfg: Optional[GuideConfig] = None,
                 seed: int = default_params.seed,
                 bf16: bool = False, sampler: str = "ddpm",
                 ddim_substeps: int = 0):
        # bf16: run UNet inference in bfloat16 compute (params stay f32;
        # the flax modules cast at use — see TemporalUnet.dtype). Guide
        # gradients, posterior math, and selection stay float32. The clone
        # is cached per model object so every planner sharing a model also
        # shares one apply_fn (jit-cache + _batchable identity friendly).
        self.model = _bf16_model(model) if bf16 else model
        self.params = params
        self.schedule = schedule
        self.dataset = dataset
        self.task = dataset.task
        self.robot = dataset.robot
        H = dataset.n_support_points
        self.cfg = cfg or DiffusionConfig(
            horizon=H,
            state_dim=dataset.state_dim,
            n_diffusion_steps=schedule.n_steps,
            t_start_guide=int(np.ceil(default_params.start_guide_steps_fraction
                                      * schedule.n_steps)),
            n_guide_steps=default_params.n_guide_steps,
        )
        if sampler != self.cfg.sampler or ddim_substeps:
            # 'ddim' fast mode: fresh full-denoise loops run ddim_substeps
            # (default n_steps//5) DDIM substeps; XCBS local inference stays
            # DDPM (see models/diffusion.guided_p_sample_loop dispatch).
            self.cfg = dataclasses.replace(self.cfg, sampler=sampler,
                                           ddim_substeps=int(ddim_substeps))
        self.guide_cfg = guide_cfg or GuideConfig(
            dt=getattr(dataset, "duration",
                       default_params.trajectory_duration) / H,
            robot_radius=self.robot.radius,
        )
        self.start_state_pos = jnp.asarray(start_state_pos)
        self.goal_state_pos = jnp.asarray(goal_state_pos)
        self.hard_conds = dataset.get_hard_conditions(self.start_state_pos,
                                                      self.goal_state_pos)
        self._savgol = jnp.asarray(savgol_matrix(H))
        self._key = jax.random.PRNGKey(seed)
        self.n_support_points = H

    # ------------------------------------------------------------------ util
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _pack(self, constraints_l: Optional[List[MultiPointConstraint]]):
        """Returns (generic ConstraintSet, optional SoftPathConstraints).

        Large per-waypoint groups (ECBS/PP soft constraints) split into the
        specialized form — (B, R, T) cost instead of (B, K, P, H)."""
        constraints_l = constraints_l or []
        rest, spc = split_soft_path_constraints(constraints_l,
                                                self.n_support_points)
        if not rest:
            return empty_constraint_set(K_BUCKETS[0], P_BUCKETS[0]), spc
        K = _bucket(len(rest), K_BUCKETS)
        P = _bucket(max(len(c.q_l) for c in rest), P_BUCKETS)
        return pack_constraint_set(rest, K, P), spc

    def _guide_data(self, cset: ConstraintSet,
                    spc: Optional[SoftPathConstraints] = None) -> GuideData:
        return GuideData(scene=self.task.scene, normalizer=self.dataset.normalizer,
                         constraints=cset, soft_paths=spc)

    def warmup(self):
        """Precompile the fresh-plan path (reference warmup, mpd.py:176-177)."""
        out = self._run(None, None)
        jax.block_until_ready(out.trajs_final)

    def _run(self, constraints_l, experience) -> PlanResult:
        gd = self._guide_data(*self._pack(constraints_l))
        args = (self.task.scene, self.robot.radius, self.robot.q_min,
                self.robot.q_max, self._savgol)
        if experience is None:
            return _plan_fresh(self.model.apply, self.params, self.schedule,
                               self.hard_conds, gd, self._next_key(), self.cfg,
                               self.guide_cfg, *args)
        seed_norm = self.dataset.normalize_trajectories(
            jnp.asarray(experience.path_b))
        return _plan_local(self.model.apply, self.params, self.schedule,
                           self.hard_conds, gd, seed_norm, self._next_key(),
                           self.cfg, self.guide_cfg, *args,
                           n_noise=default_params.n_local_inference_noising_steps,
                           n_denoise=default_params.n_local_inference_denoising_steps)

    # ------------------------------------------------------------------ call
    def __call__(self, start_state_pos=None, goal_state_pos=None,
                 constraints_l: Optional[List[MultiPointConstraint]] = None,
                 experience: Optional[PathBatchExperience] = None,
                 **kwargs) -> PlannerOutput:
        if start_state_pos is not None:
            assert np.allclose(np.asarray(start_state_pos),
                               np.asarray(self.start_state_pos)), \
                "start differs from the one bound at construction (mpd.py:318)"
        if goal_state_pos is not None:
            assert np.allclose(np.asarray(goal_state_pos),
                               np.asarray(self.goal_state_pos)), \
                "goal differs from the one bound at construction (mpd.py:321)"

        t0 = time.perf_counter()
        res = self._run(constraints_l, experience)
        jax.block_until_ready(res.trajs_final)
        t_total = time.perf_counter() - t0
        return self._to_output(res, constraints_l, t_total)

    def _to_output(self, res: PlanResult, constraints_l, t_total) -> PlannerOutput:
        free = np.asarray(res.free_mask)
        free_idxs = np.nonzero(free)[0]
        coll_idxs = np.nonzero(~free)[0]
        out = PlannerOutput()
        out.trajs_iters = res.trajs_iters
        out.trajs_final = res.trajs_final
        out.trajs_final_free_idxs = free_idxs
        out.trajs_final_coll_idxs = coll_idxs
        out.trajs_final_free = res.trajs_final[jnp.asarray(free_idxs)] if len(free_idxs) else None
        out.trajs_final_coll = res.trajs_final[jnp.asarray(coll_idxs)] if len(coll_idxs) else None
        out.success_free_trajs = int(len(free_idxs) > 0)
        out.fraction_free_trajs = float(free.mean())
        out.collision_intensity_trajs = float(np.asarray(res.wp_collisions).mean())
        if len(free_idxs):
            out.idx_best_traj = int(res.idx_best)
            out.traj_final_free_best = res.trajs_final[int(res.idx_best)]
            out.cost_best_free_traj = float(res.cost_all[int(res.idx_best)])
        out.cost_smoothness = res.cost_smoothness
        out.cost_path_length = res.cost_path_length
        out.cost_all = res.cost_all
        out.variance_waypoint_trajs_final_free = float(res.variance_waypoints)
        out.t_total = t_total
        out.constraints_l = constraints_l
        return out

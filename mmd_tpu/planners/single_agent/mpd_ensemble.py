"""MPDEnsemble: multi-tile guided-diffusion planner for long horizons.

TPU-native re-design of MPDEnsemble
(reference: mmd/planners/single_agent/mpd_ensemble.py:65-723). An agent's
"skeleton" is a chain of tiles (each a local [-1,1]^2 map with its own
diffusion model); per-tile batches denoise as ONE vmapped forward over
stacked parameters, seams are cross-conditioned every step, and the final
global (B, T*H, D) trajectory is assembled, classified, scored, and smoothed
in the same jitted program.

Frame/time conventions mirrored from the reference:
- start is pinned in tile 0 at t=0, goal in the last tile at t=H-1, both in
  LOCAL normalized coordinates (mpd_ensemble.py:286-296)
- constraints arrive in GLOBAL frame/time; each point routes to tile
  t_start // H, shifts time by -tile*H and position by -transform
  (split_cost_constraints_to_tasks, mpd_ensemble.py:431-518); per tile, hard
  points aggregate into one constraint and soft points into another
- classification is per-tile in local frames, a sample is free iff free in
  every tile (tasks_ensemble.py:77-84, combine_trajs :162-225)
"""
from __future__ import annotations

import functools
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.common.constraints import MultiPointConstraint
from mmd_tpu.common.experiences import PathBatchExperience
from mmd_tpu.config import DiffusionConfig, params as default_params
from mmd_tpu.costs.constraints import ConstraintSet, empty_constraint_set, pack_constraint_set
from mmd_tpu.costs.guide import GuideConfig, GuideData
from mmd_tpu.datasets.trajectories import TrajectoryDataset
from mmd_tpu.models.diffusion import HardConds, q_sample
from mmd_tpu.models.ensemble import (
    CrossConds,
    apply_cross_conditioning,
    ensemble_p_sample_loop,
    stack_params,
)
from mmd_tpu.models.schedules import DiffusionSchedule
from mmd_tpu.planners.single_agent.common import PlannerOutput
from mmd_tpu.planners.single_agent.mpd import K_BUCKETS, P_BUCKETS, PlanResult, _bucket
from mmd_tpu.tasks.task import classify_trajs
from mmd_tpu.tasks.task_ensemble import TaskEnsemble
from mmd_tpu.utils.interp import savgol_matrix
from mmd_tpu.utils.metrics import (
    compute_path_length,
    compute_smoothness,
    compute_variance_waypoints,
)


def _split_global_path_constraint(constraints_l, global_horizon: int):
    """Split one large per-waypoint (ECBS-style) constraint, in GLOBAL
    frame/time, out of the list. Returns (rest, (points, mask, radius,
    weight) or None) with numpy arrays over the global horizon."""
    from mmd_tpu.costs.constraints import split_soft_path_constraints

    rest, spc = split_soft_path_constraints(constraints_l, global_horizon)
    if spc is None:
        return rest, None
    return rest, (np.asarray(spc.points), np.asarray(spc.mask),
                  float(spc.radius), float(spc.weight))


def _finalize_ensemble(chain: jax.Array, gds: GuideData, transforms: jax.Array,
                       stacked_scenes, radius, q_min, q_max, savgol) -> PlanResult:
    """chain: (S+1, T, B, H, D) normalized per-tile -> global PlanResult."""
    S1, T, B, H, D = chain.shape
    # Per-tile unnormalize + translate to global frame.
    def to_global(chain_m, norm_m, t_m):
        u = norm_m.unnormalize(chain_m)  # (S+1, B, H, D)
        shift = jnp.zeros((D,)).at[:2].set(t_m)
        return u + shift

    global_tiles = jax.vmap(to_global, in_axes=(1, 0, 0), out_axes=1)(
        chain, gds.normalizer, transforms)        # (S+1, T, B, H, D)
    trajs_iters = jnp.transpose(global_tiles, (0, 2, 1, 3, 4)).reshape(S1, B, T * H, D)
    trajs_final = trajs_iters[-1]

    # Per-tile local classification, free iff free in all tiles.
    final_local = jax.vmap(lambda c, n: n.unnormalize(c), in_axes=(0, 0))(
        chain[-1], gds.normalizer)                # (T, B, H, D)
    free_t, wp_t = jax.vmap(
        lambda scene, tr: classify_trajs(scene, tr, radius, q_min, q_max)
    )(stacked_scenes, final_local)                # (T, B), (T, B, Hi)
    free_mask = jnp.all(free_t, axis=0)
    wp_coll = jnp.transpose(wp_t, (1, 0, 2)).reshape(B, -1)

    c_len = compute_path_length(trajs_final)
    c_smooth = compute_smoothness(trajs_final)
    cost_all = jnp.where(free_mask, c_len + c_smooth, jnp.inf)
    idx_best = jnp.argmin(cost_all).astype(jnp.int32)
    smoothed = jnp.einsum("ij,bjd->bid", savgol, trajs_final)
    return PlanResult(
        trajs_iters=trajs_iters, trajs_final=smoothed, free_mask=free_mask,
        wp_collisions=wp_coll, cost_path_length=c_len, cost_smoothness=c_smooth,
        cost_all=cost_all, idx_best=idx_best,
        variance_waypoints=compute_variance_waypoints(trajs_final),
    )


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg", "n_tiles"))
def _plan_fresh_ensemble(apply_fn, stacked_params, schedule, hard: HardConds,
                         cc: CrossConds, gds: GuideData, key,
                         cfg: DiffusionConfig, guide_cfg: GuideConfig,
                         transforms, stacked_scenes, radius, q_min, q_max,
                         savgol, n_tiles: int) -> PlanResult:
    _, chain = ensemble_p_sample_loop(apply_fn, stacked_params, schedule, hard,
                                      cc, key, cfg, gds=gds, guide_cfg=guide_cfg,
                                      n_tiles=n_tiles)
    return _finalize_ensemble(chain, gds, transforms, stacked_scenes, radius,
                              q_min, q_max, savgol)


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg",
                                             "n_tiles", "n_noise", "n_denoise"))
def _plan_local_ensemble(apply_fn, stacked_params, schedule, hard: HardConds,
                         cc: CrossConds, gds: GuideData, seed_local_norm, key,
                         cfg: DiffusionConfig, guide_cfg: GuideConfig,
                         transforms, stacked_scenes, radius, q_min, q_max,
                         savgol, n_tiles: int, n_noise: int, n_denoise: int) -> PlanResult:
    key, nkey = jax.random.split(key)
    T, B = seed_local_norm.shape[:2]
    t = jnp.full((T * B,), n_noise, jnp.int32)
    noise = jax.random.normal(nkey, seed_local_norm.shape, seed_local_norm.dtype)
    warm = q_sample(schedule, seed_local_norm.reshape(T * B, *seed_local_norm.shape[2:]),
                    t, noise.reshape(T * B, *seed_local_norm.shape[2:]))
    warm = warm.reshape(seed_local_norm.shape)
    _, chain = ensemble_p_sample_loop(apply_fn, stacked_params, schedule, hard,
                                      cc, key, cfg, gds=gds, guide_cfg=guide_cfg,
                                      n_diffusion_steps=n_denoise,
                                      warm_start=warm, n_tiles=n_tiles)
    return _finalize_ensemble(chain, gds, transforms, stacked_scenes, radius,
                              q_min, q_max, savgol)


class MPDEnsemble:
    """Multi-tile planner bound to a skeleton of (model, dataset) tiles."""

    def __init__(self, models: List, params_list: List, schedule: DiffusionSchedule,
                 datasets: List[TrajectoryDataset], transforms,
                 start_state_pos, goal_state_pos,
                 cfg: Optional[DiffusionConfig] = None,
                 guide_cfg: Optional[GuideConfig] = None,
                 seed: int = default_params.seed,
                 bf16: bool = False):
        assert len(models) == len(params_list) == len(datasets)
        from mmd_tpu.planners.single_agent.mpd import _bf16_model
        self.n_tiles = len(models)
        # all tiles share the architecture; bf16 = bfloat16-compute clone
        # (params stay f32) — see MPD.__init__.
        self.model = _bf16_model(models[0]) if bf16 else models[0]
        self.stacked_params = stack_params(params_list)
        self.schedule = schedule
        self.datasets = datasets
        self.robot = datasets[0].robot
        self.transforms = np.asarray(transforms, np.float32)
        self.task = TaskEnsemble([d.task for d in datasets], self.transforms,
                                 self.robot)
        H = datasets[0].n_support_points
        self.n_support_points = H
        self.cfg = cfg or DiffusionConfig(
            horizon=H, state_dim=datasets[0].state_dim,
            n_diffusion_steps=schedule.n_steps,
            t_start_guide=int(np.ceil(default_params.start_guide_steps_fraction
                                      * schedule.n_steps)),
            n_guide_steps=default_params.n_guide_steps)
        self.guide_cfg = guide_cfg or GuideConfig(
            dt=getattr(datasets[0], "duration",
                       default_params.trajectory_duration) / H,
            robot_radius=self.robot.radius)

        self.start_state_pos = np.asarray(start_state_pos, np.float32)
        self.goal_state_pos = np.asarray(goal_state_pos, np.float32)
        # Hard conds: start in tile 0 at t=0, goal in last tile at t=H-1,
        # local frames, normalized (mpd_ensemble.py:286-296).
        start_local = jnp.asarray(self.start_state_pos - self.transforms[0])
        goal_local = jnp.asarray(self.goal_state_pos - self.transforms[-1])
        mask = np.zeros((self.n_tiles, H, 1), np.float32)
        values = np.zeros((self.n_tiles, H, datasets[0].state_dim), np.float32)
        mask[0, 0] = 1.0
        mask[-1, H - 1] = 1.0
        sv = datasets[0].normalizer.normalize(
            jnp.concatenate([start_local, jnp.zeros(2)]))
        gv = datasets[-1].normalizer.normalize(
            jnp.concatenate([goal_local, jnp.zeros(2)]))
        values[0, 0] = np.asarray(sv)
        values[-1, H - 1] = np.asarray(gv)
        self.hard_conds = HardConds(mask=jnp.asarray(mask), values=jnp.asarray(values))

        self.cc = CrossConds.from_transforms(self.transforms,
                                             datasets[0].state_dim)
        self._stacked_normalizers = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[d.normalizer for d in datasets])
        self._savgol = jnp.asarray(savgol_matrix(self.n_tiles * H))
        self._key = jax.random.PRNGKey(seed)

    # ----------------------------------------------------------------- util
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _route_constraints(self, constraints_l: Optional[List[MultiPointConstraint]]):
        """Global constraints -> per-tile aggregated hard/soft constraints
        (split_cost_constraints_to_tasks, mpd_ensemble.py:431-518).

        Returns (stacked ConstraintSet, stacked SoftPathConstraints or None).
        Large per-waypoint soft groups (ECBS) take the cheap (R, H) form,
        routed per tile with local frames/times.
        """
        from mmd_tpu.costs.constraints import (
            SoftPathConstraints,
            split_soft_path_constraints,
        )

        H = self.n_support_points
        # Split one big per-waypoint group across the GLOBAL horizon.
        rest, global_spc_src = _split_global_path_constraint(
            constraints_l or [], self.n_tiles * H)

        per_tile_hard = [[] for _ in range(self.n_tiles)]
        per_tile_soft = [[] for _ in range(self.n_tiles)]
        for c in rest:
            for q, (t0, t1), r in zip(c.q_l, c.t_range_l, c.radius_l):
                tid = min(max(int(t0) // H, 0), self.n_tiles - 1)
                entry = (np.asarray(q, np.float32)[:2] - self.transforms[tid],
                         (t0 - tid * H, t1 - tid * H), float(r))
                (per_tile_soft if c.is_soft else per_tile_hard)[tid].append(entry)

        tile_csets = []
        max_pts = 1
        per_tile_lists = []
        for tid in range(self.n_tiles):
            lst = []
            for group, is_soft in ((per_tile_hard[tid], False),
                                   (per_tile_soft[tid], True)):
                if group:
                    qs, ranges, radii = zip(*group)
                    lst.append(MultiPointConstraint(
                        q_l=list(qs), t_range_l=list(ranges),
                        radius_l=list(radii), is_soft=is_soft))
                    max_pts = max(max_pts, len(qs))
            per_tile_lists.append(lst)
        K = _bucket(max(1, max(len(l) for l in per_tile_lists)), K_BUCKETS)
        P = _bucket(max_pts, P_BUCKETS)
        for lst in per_tile_lists:
            tile_csets.append(pack_constraint_set(lst, K, P) if lst
                              else empty_constraint_set(K, P))
        stacked_csets = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tile_csets)

        stacked_spc = None
        if global_spc_src is not None:
            points_g, mask_g, radius, weight = global_spc_src  # (R, T*H, 2)
            R = points_g.shape[0]
            pts = points_g.reshape(R, self.n_tiles, H, 2).transpose(1, 0, 2, 3).copy()
            pts -= self.transforms[:, None, None, :]
            msk = mask_g.reshape(R, self.n_tiles, H).transpose(1, 0, 2)
            stacked_spc = SoftPathConstraints(
                points=jnp.asarray(pts), mask=jnp.asarray(msk),
                radius=jnp.full((self.n_tiles,), radius),
                weight=jnp.full((self.n_tiles,), weight))
        return stacked_csets, stacked_spc

    def _guide_data(self, stacked_csets, stacked_spc=None) -> GuideData:
        return GuideData(scene=self.task.stacked_scenes,
                         normalizer=self._stacked_normalizers,
                         constraints=stacked_csets, soft_paths=stacked_spc)

    def _run(self, constraints_l, experience) -> PlanResult:
        gds = self._guide_data(*self._route_constraints(constraints_l))
        args = (jnp.asarray(self.transforms), self.task.stacked_scenes,
                self.robot.radius, self.robot.q_min, self.robot.q_max,
                self._savgol)
        if experience is None:
            return _plan_fresh_ensemble(self.model.apply, self.stacked_params,
                                        self.schedule, self.hard_conds, self.cc,
                                        gds, self._next_key(), self.cfg,
                                        self.guide_cfg, *args,
                                        n_tiles=self.n_tiles)
        # Global (B, T*H, D) seed -> per-tile local normalized seeds.
        seed = np.asarray(experience.path_b)
        B = seed.shape[0]
        H = self.n_support_points
        tiles = seed.reshape(B, self.n_tiles, H, -1).transpose(1, 0, 2, 3).copy()
        tiles[..., :2] -= self.transforms[:, None, None, :]
        seed_local_norm = jax.vmap(lambda x, n: n.normalize(x))(
            jnp.asarray(tiles), self._stacked_normalizers)
        return _plan_local_ensemble(self.model.apply, self.stacked_params,
                                    self.schedule, self.hard_conds, self.cc,
                                    gds, seed_local_norm, self._next_key(),
                                    self.cfg, self.guide_cfg, *args,
                                    n_tiles=self.n_tiles,
                                    n_noise=default_params.n_local_inference_noising_steps,
                                    n_denoise=default_params.n_local_inference_denoising_steps)

    # ----------------------------------------------------------------- call
    def __call__(self, start_state_pos=None, goal_state_pos=None,
                 constraints_l: Optional[List[MultiPointConstraint]] = None,
                 experience: Optional[PathBatchExperience] = None,
                 **kwargs) -> PlannerOutput:
        if start_state_pos is not None:
            assert np.allclose(np.asarray(start_state_pos), self.start_state_pos), \
                "start differs from construction (mpd_ensemble.py:348)"
        if goal_state_pos is not None:
            assert np.allclose(np.asarray(goal_state_pos), self.goal_state_pos), \
                "goal differs from construction (mpd_ensemble.py:350)"
        t0 = time.perf_counter()
        res = self._run(constraints_l, experience)
        jax.block_until_ready(res.trajs_final)
        t_total = time.perf_counter() - t0
        # Reuse MPD's output conversion.
        from mmd_tpu.planners.single_agent.mpd import MPD
        return MPD._to_output(self, res, constraints_l, t_total)

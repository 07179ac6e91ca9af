"""Team-batched planning: one device call plans every agent's batch.

The reference's CBS/PP call per-agent planners one at a time
(cbs.py:316-335); BASELINE.json's north star is to vmap the per-robot
sampler so a whole team's (re)plans batch onto one chip. This module vmaps
the full fresh-plan program (guided denoise + classify + score + smooth)
over an agent axis; on a multi-chip mesh the agent axis shards across
devices (see mmd_tpu/parallel/sharding.py).
"""
from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.config import DiffusionConfig
from mmd_tpu.costs.guide import GuideConfig, GuideData
from mmd_tpu.models.diffusion import HardConds, guided_p_sample_loop
from mmd_tpu.planners.single_agent.mpd import PlanResult, _finalize_plan


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg"))
def plan_fresh_team(apply_fn, params, schedule, hard_team: HardConds,
                    gd: GuideData, keys: jax.Array, cfg: DiffusionConfig,
                    guide_cfg: GuideConfig, scene, radius, q_min, q_max,
                    savgol) -> PlanResult:
    """Batched fresh plans for A agents sharing one model.

    hard_team.values: (A, H, D) per-agent start/goal conditions (mask shared);
    keys: (A, 2). Returns a PlanResult with a leading agent axis on every
    field. Equivalent to A sequential _plan_fresh calls with empty/shared
    constraints — the CBS root case.
    """

    def one_agent(values, key):
        hard = HardConds(mask=hard_team.mask, values=values)
        _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard, key,
                                        cfg, gd=gd, guide_cfg=guide_cfg)
        return _finalize_plan(chain, gd.normalizer, scene, radius, q_min,
                              q_max, savgol)

    return jax.vmap(one_agent)(hard_team.values, keys)


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg"))
def plan_sequential_root_soft(apply_fn, params, schedule, hard_team: HardConds,
                              scene, normalizer, base_cset, keys: jax.Array,
                              cfg: DiffusionConfig, guide_cfg: GuideConfig,
                              radius, q_min, q_max, savgol,
                              soft_radius, soft_weight):
    """ECBS sequential root creation as ONE device call.

    The reference plans the root agents one at a time, agent i softly
    avoiding the already-planned agents' chosen paths (cbs.py:316-335 +
    create_soft_constraints_from_other_agents_paths, cbs.py:468-506). That
    order dependency is real, but nothing else needs the host: this scan
    keeps the chosen (A, H, 2) positions in the carry and builds each
    agent's SoftPathConstraints in-graph, eliminating the reference's (and
    round 1's) per-agent dispatch + host-side constraint packing.

    Returns (trajs (A, B, H, D), free_any (A,), idx_best (A,),
    free_mask (A, B)). Assumes uniform start times (mask t in [1, H-1]).
    """
    from mmd_tpu.costs.constraints import SoftPathConstraints

    A = hard_team.values.shape[0]
    H = cfg.horizon
    q_dim = 2

    def body(carry, inp):
        sel_pos, planned = carry                     # (A, H, 2), (A,)
        values, key, i = inp
        tmask = jnp.ones((A, H), jnp.float32).at[:, 0].set(0.0)
        hard = HardConds(mask=hard_team.mask, values=values)
        key_soft, key_free = jax.random.split(key)

        def plan_with(spc_mask, k):
            spc = SoftPathConstraints(points=sel_pos, mask=spc_mask,
                                      radius=soft_radius, weight=soft_weight)
            gd = GuideData(scene=scene, normalizer=normalizer,
                           constraints=base_cset, soft_paths=spc)
            _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard,
                                            k, cfg, gd=gd, guide_cfg=guide_cfg)
            return _finalize_plan(chain, normalizer, scene, radius, q_min,
                                  q_max, savgol)

        res = plan_with(planned[:, None] * tmask, key_soft)
        # Graceful degradation: in dense teams the accumulated soft
        # constraints can leave an agent with ZERO obstacle-free samples —
        # the reference aborts the whole trial there (cbs.py:326-330). A
        # constraint-free replan for just that agent keeps the root viable
        # (CBS-root semantics for this agent; conflicts are resolved by the
        # CT search) and strictly dominates the reference's hard failure.
        res = jax.lax.cond(
            jnp.any(res.free_mask),
            lambda _: res,
            lambda _: plan_with(jnp.zeros((A, H), jnp.float32), key_free),
            None)
        best = res.trajs_final[res.idx_best]          # least-cost free traj
        sel_pos = sel_pos.at[i].set(best[..., :q_dim])
        planned = planned.at[i].set(1.0)
        return (sel_pos, planned), (res.trajs_final, res.idx_best,
                                    jnp.any(res.free_mask), res.free_mask)

    init = (jnp.zeros((A, H, q_dim)), jnp.zeros((A,), jnp.float32))
    _, (trajs, idx_best, free_any, free_mask) = jax.lax.scan(
        body, init, (hard_team.values, keys, jnp.arange(A)))
    return trajs, free_any, idx_best, free_mask


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg"))
def plan_prioritized_scan(apply_fn, params, schedule, hard_team: HardConds,
                          scene, normalizer, base_cset, keys: jax.Array,
                          cfg: DiffusionConfig, guide_cfg: GuideConfig,
                          radius, q_min, q_max, savgol, cons_radius,
                          hard_weight, margin):
    """The ENTIRE prioritized-planning pass in ONE device call.

    The reference (and the host path in
    planners/multi_agent/prioritized_planning.py) plans agents one at a
    time, agent i avoiding the already-planned agents' chosen paths via
    hard per-waypoint keep-out constraints, then selects the
    fewest-conflicts candidate (reference prioritized_planning.py:46-201).
    The order dependency lives in the scan carry: chosen (A, H, 2)
    positions accumulate, each agent's keep-out group is built in-graph
    with the hard constraint weight, and selection minimizes (conflict
    count, path cost) lexicographically — agent 0 reduces to the
    least-cost free candidate exactly as the host path's idx_best does.

    Unplanned carry rows sit at distinct far-away sentinels so they
    contribute zero conflicts (and no guide gradient, being masked).
    Returns (trajs (A, B, H, D), free_any (A,), ix (A,), free_mask (A, B),
    team conflict summary of the final selection).
    """
    from mmd_tpu.costs.constraints import SoftPathConstraints
    from mmd_tpu.planners.multi_agent.conflict_detection import (
        candidate_conflict_counts,
        team_conflict_summary,
    )

    A = hard_team.values.shape[0]
    H = cfg.horizon

    def body(carry, inp):
        sel_pos, planned = carry
        values, key, i = inp
        tmask = jnp.ones((A, H), jnp.float32).at[:, 0].set(0.0)
        spc = SoftPathConstraints(points=sel_pos,
                                  mask=planned[:, None] * tmask,
                                  radius=cons_radius, weight=hard_weight)
        gd = GuideData(scene=scene, normalizer=normalizer,
                       constraints=base_cset, soft_paths=spc)
        hard = HardConds(mask=hard_team.mask, values=values)
        _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard, key,
                                        cfg, gd=gd, guide_cfg=guide_cfg)
        res = _finalize_plan(chain, normalizer, scene, radius, q_min, q_max,
                             savgol)
        counts = candidate_conflict_counts(res.trajs_final[..., :2], i,
                                           sel_pos, margin)
        key_lex = jnp.where(res.free_mask,
                            counts.astype(jnp.float32) * 1e6 + res.cost_all,
                            jnp.inf)
        ix = jnp.argmin(key_lex).astype(jnp.int32)
        sel_pos = sel_pos.at[i].set(res.trajs_final[ix][..., :2])
        planned = planned.at[i].set(1.0)
        return (sel_pos, planned), (res.trajs_final, ix,
                                    jnp.any(res.free_mask), res.free_mask)

    # Distinct far-away sentinels per unplanned row (identical sentinels
    # would register as mutual collisions in the scoring).
    far = jnp.stack([jnp.full((A,), 1e6) + 1e3 * jnp.arange(A),
                     jnp.full((A,), 1e6)], axis=-1)            # (A, 2)
    init = (jnp.broadcast_to(far[:, None, :], (A, H, 2)),
            jnp.zeros((A,), jnp.float32))
    (sel_pos, _), (trajs, ix, free_any, free_mask) = jax.lax.scan(
        body, init, (hard_team.values, keys, jnp.arange(A)))
    return (trajs, free_any, ix, free_mask,
            team_conflict_summary(sel_pos, margin))


def _add_team_evals(cfg, hard_team: "HardConds") -> None:
    """FLOP accounting (utils/baked.py): a team program runs one full
    guided loop per agent (DDPM or DDIM per cfg.sampler)."""
    from mmd_tpu.utils.baked import add_unet_evals, loop_unet_evals

    add_unet_evals(hard_team.values.shape[0]
                   * loop_unet_evals(cfg, False, 0))


def _planner_bake(p0):
    """(invariant operands, their cache-key digests) for closure baking."""
    from mmd_tpu.utils.baked import bake_key

    inv = (p0.model.apply, p0.params, p0.schedule, p0.cfg, p0.guide_cfg,
           p0.task.scene, p0.dataset.normalizer, p0.robot.radius,
           p0.robot.q_min, p0.robot.q_max, p0._savgol)
    digest = (p0.model.apply, p0.cfg, p0.guide_cfg, bake_key(p0.params),
              bake_key(p0.schedule), bake_key(p0.task.scene),
              bake_key(p0.dataset.normalizer), bake_key(p0.robot.radius),
              bake_key(p0.robot.q_min), bake_key(p0.robot.q_max),
              bake_key(p0._savgol))
    return inv, digest


def plan_prioritized_device(planners: List, keys: Optional[jax.Array] = None,
                            margin: float = 0.0):
    """One-call PP over batchable MPD planners; None when not batchable.

    The planner invariants are closure-baked (mmd_tpu/utils/baked.py); only
    the per-trial hard-cond values and PRNG keys cross the host boundary."""
    from mmd_tpu.config import params as default_params
    from mmd_tpu.utils.baked import bake_key, baked_program

    if not _batchable(planners):
        return None
    p0 = planners[0]
    hard_team = stack_hard_conds([p.hard_conds for p in planners])
    if keys is None:
        keys = jnp.stack([p._next_key() for p in planners])
    base_cset, _ = p0._pack(None)
    margin = float(margin)
    cons_radius = default_params.vertex_constraint_radius
    hard_weight = default_params.weight_grad_cost_constraints
    (apply_fn, params, schedule, cfg, guide_cfg, scene, normalizer, radius,
     q_min, q_max, savgol), digest = _planner_bake(p0)
    mask = hard_team.mask
    ckey = ("plan_prioritized", *digest, bake_key(mask), bake_key(base_cset),
            margin, cons_radius, hard_weight)

    def build():
        def fn(values, keys):
            return plan_prioritized_scan(
                apply_fn, params, schedule,
                HardConds(mask=mask, values=values), scene, normalizer,
                base_cset, keys, cfg, guide_cfg, radius, q_min, q_max,
                savgol, cons_radius, hard_weight, margin)
        return fn

    _add_team_evals(cfg, hard_team)
    return baked_program(ckey, build)(hard_team.values, keys)


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg"))
def _fresh_team_with_summary(apply_fn, params, schedule, hard_team, gd, keys,
                             cfg, guide_cfg, scene, radius, q_min, q_max,
                             savgol, margin):
    """plan_fresh_team + the root node's conflict summary in ONE program
    (saves the separate _summarize round trip over the TPU tunnel)."""
    from mmd_tpu.planners.multi_agent.conflict_detection import (
        team_conflict_summary,
    )

    res = plan_fresh_team(apply_fn, params, schedule, hard_team, gd, keys,
                          cfg, guide_cfg, scene, radius, q_min, q_max, savgol)
    A = res.trajs_final.shape[0]
    pos = res.trajs_final[jnp.arange(A), res.idx_best][..., :2]
    return res, team_conflict_summary(pos, margin)


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg"))
def _sequential_root_with_summary(apply_fn, params, schedule, hard_team,
                                  scene, normalizer, base_cset, keys, cfg,
                                  guide_cfg, radius, q_min, q_max, savgol,
                                  soft_radius, soft_weight, margin):
    """plan_sequential_root_soft + conflict summary, one device call."""
    from mmd_tpu.planners.multi_agent.conflict_detection import (
        team_conflict_summary,
    )

    trajs, free_any, idx_best, free_mask = plan_sequential_root_soft(
        apply_fn, params, schedule, hard_team, scene, normalizer, base_cset,
        keys, cfg, guide_cfg, radius, q_min, q_max, savgol, soft_radius,
        soft_weight)
    A = trajs.shape[0]
    pos = trajs[jnp.arange(A), idx_best][..., :2]
    return (trajs, free_any, idx_best, free_mask,
            team_conflict_summary(pos, margin))


def plan_fresh_team_soft_device(p0, hard_team: HardConds, soft_team,
                                keys: jax.Array) -> "PlanResult":
    """Baked-invariant wrapper of plan_fresh_team_soft (the Jacobi repair
    call): only (hard values, keys, per-agent soft paths) cross the host
    boundary per round."""
    from mmd_tpu.costs.constraints import empty_constraint_set
    from mmd_tpu.utils.baked import bake_key, baked_program

    base_cset = empty_constraint_set(4, 1)
    (apply_fn, params, schedule, cfg, guide_cfg, scene, normalizer, radius,
     q_min, q_max, savgol), digest = _planner_bake(p0)
    mask = hard_team.mask
    ckey = ("fresh_team_soft", *digest, bake_key(mask))

    def build():
        def fn(values, soft_team, keys):
            return plan_fresh_team_soft(
                apply_fn, params, schedule,
                HardConds(mask=mask, values=values), scene, normalizer,
                base_cset, soft_team, keys, cfg, guide_cfg, radius, q_min,
                q_max, savgol)
        return fn

    _add_team_evals(cfg, hard_team)
    return baked_program(ckey, build)(hard_team.values, soft_team, keys)


def stack_hard_conds(hard_l: List[HardConds]) -> HardConds:
    """Stack per-agent HardConds (shared mask) into one (A, H, D) pytree."""
    mask = hard_l[0].mask
    values = jnp.stack([h.values for h in hard_l])
    return HardConds(mask=mask, values=values)


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg"))
def plan_fresh_team_soft(apply_fn, params, schedule, hard_team: HardConds,
                         scene, normalizer, base_cset, soft_team, keys: jax.Array,
                         cfg: DiffusionConfig, guide_cfg: GuideConfig,
                         radius, q_min, q_max, savgol) -> PlanResult:
    """Batched team plan where every agent carries a per-agent
    SoftPathConstraints group (leaves lead with the agent axis) — the
    Jacobi root-repair call: all agents re-plan simultaneously, each softly
    avoiding the others' current paths."""

    def one_agent(values, key, spc):
        gd = GuideData(scene=scene, normalizer=normalizer,
                       constraints=base_cset, soft_paths=spc)
        hard = HardConds(mask=hard_team.mask, values=values)
        _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard, key,
                                        cfg, gd=gd, guide_cfg=guide_cfg)
        return _finalize_plan(chain, normalizer, scene, radius, q_min, q_max,
                              savgol)

    return jax.vmap(one_agent, in_axes=(0, 0, 0))(hard_team.values, keys, soft_team)


@jax.jit
def team_select_by_conflicts(cand_all: jax.Array, free_all: jax.Array,
                             prev_pos: jax.Array, margin: float) -> jax.Array:
    """Per-agent least-collisions selection vs the team's previous paths.

    cand_all: (A, B, T, 2); free_all: (A, B); prev_pos: (A, T, 2) -> (A,).
    Jacobi analog of the reference's per-agent sequential selection.
    """
    from mmd_tpu.planners.multi_agent.conflict_detection import (
        candidate_conflict_counts,
    )

    A = cand_all.shape[0]

    def one(cand, free, idx):
        counts = candidate_conflict_counts(cand, idx, prev_pos, margin)
        big = jnp.iinfo(jnp.int32).max
        masked = jnp.where(free, counts, big)
        ix = jnp.argmin(masked).astype(jnp.int32)
        # Conflict count of the agent's CURRENT path, for accept-if-improved.
        cur = candidate_conflict_counts(prev_pos[idx][None], idx, prev_pos,
                                        margin)[0]
        return ix, masked[ix], cur

    return jax.vmap(one, in_axes=(0, 0, 0))(cand_all, free_all, jnp.arange(A))


def team_soft_paths(pos: np.ndarray, radius: float,
                    weight: Optional[float] = None):
    """Per-agent stacked SoftPathConstraints from team best positions.

    pos: (A, T, 2) -> SoftPathConstraints with leaves leading (A, A-1, ...):
    agent i's rows are the other agents' paths, masked to t in [1, T-1]
    (the ECBS soft-constraint recipe, reference cbs.py:468-506).
    """
    from mmd_tpu.config import params as default_params
    from mmd_tpu.costs.constraints import SoftPathConstraints

    A, T, _ = pos.shape
    if weight is None:
        weight = default_params.weight_grad_cost_soft_constraints
    points = np.zeros((A, A - 1, T, 2), np.float32)
    mask = np.zeros((A, A - 1, T), np.float32)
    for i in range(A):
        points[i] = np.concatenate([pos[:i], pos[i + 1:]], axis=0)
        mask[i, :, 1:] = 1.0
    return SoftPathConstraints(
        points=jnp.asarray(points), mask=jnp.asarray(mask),
        radius=jnp.full((A,), radius), weight=jnp.full((A,), weight))


def shard_team_inputs(mesh, hard_team: HardConds, keys: jax.Array):
    """Shard the (A, ...) team inputs over the mesh's 'agent' axis.

    The jitted team programs are written once; running them multi-chip is
    a placement decision, not a rewrite: with `hard_team.values` and `keys`
    sharded P('agent') (mask replicated), XLA compiles the same program
    SPMD over the mesh and propagates the agent sharding through every
    downstream batched call (roots, repair, summaries, fused expansions).
    Returns the inputs unchanged when the mesh is None or the team size
    does not divide the agent axis.
    """
    if mesh is None or "agent" not in mesh.axis_names:
        return hard_team, keys
    A = hard_team.values.shape[0]
    if A % mesh.shape["agent"] != 0:
        return hard_team, keys
    from jax.sharding import NamedSharding, PartitionSpec as P

    agent = NamedSharding(mesh, P("agent"))
    repl = NamedSharding(mesh, P())
    hard_team = HardConds(mask=jax.device_put(hard_team.mask, repl),
                          values=jax.device_put(hard_team.values, agent))
    return hard_team, jax.device_put(keys, agent)


def _batchable(planners: List) -> bool:
    p0 = planners[0]
    # Only single-tile MPD planners share the (params, schedule, task)
    # layout these batched programs assume; MPDEnsemble exposes
    # stacked_params and takes the host/fused-ensemble paths instead.
    if any(not hasattr(p, "params") for p in planners):
        return False
    for p in planners[1:]:
        if (p.params is not p0.params or p.schedule is not p0.schedule
                or p.cfg != p0.cfg or p.guide_cfg != p0.guide_cfg
                or p.task is not p0.task):
            return False
    return True


def plan_team_roots_device(planners: List, keys: Optional[jax.Array] = None,
                           summary_margin: Optional[float] = None,
                           mesh=None):
    """Batched CBS/XCBS root creation, device-resident results.

    Returns (trajs_final (n, B, H, D), free_any (n,) bool, idx_best (n,),
    free_mask (n, B)[, summary]) or None when the planners are not batchable
    (mixed models/tasks) — the caller falls back to the sequential path.
    Pass `keys` (n, 2) to source all randomness from one split (one dispatch
    instead of n). With `summary_margin` set, the root node's conflict
    summary (count, t, a, b, mid) is computed inside the same program —
    no separate _summarize round trip.
    """
    if not _batchable(planners):
        return None
    from mmd_tpu.utils.baked import bake_key, baked_program

    p0 = planners[0]
    hard_team = stack_hard_conds([p.hard_conds for p in planners])
    if keys is None:
        keys = jnp.stack([p._next_key() for p in planners])
    hard_team, keys = shard_team_inputs(mesh, hard_team, keys)
    base_cset, _ = p0._pack(None)
    (apply_fn, params, schedule, cfg, guide_cfg, scene, normalizer, radius,
     q_min, q_max, savgol), digest = _planner_bake(p0)
    mask = hard_team.mask
    margin = None if summary_margin is None else float(summary_margin)
    ckey = ("team_roots", *digest, bake_key(mask), bake_key(base_cset),
            margin)

    def build():
        def fn(values, keys):
            hard = HardConds(mask=mask, values=values)
            gd = GuideData(scene=scene, normalizer=normalizer,
                           constraints=base_cset)
            common = (apply_fn, params, schedule, hard, gd, keys, cfg,
                      guide_cfg, scene, radius, q_min, q_max, savgol)
            if margin is not None:
                return _fresh_team_with_summary(*common, margin)
            return plan_fresh_team(*common)
        return fn

    _add_team_evals(cfg, hard_team)
    out = baked_program(ckey, build)(hard_team.values, keys)
    if summary_margin is not None:
        res, summary = out
        return (res.trajs_final, jnp.any(res.free_mask, axis=-1),
                res.idx_best, res.free_mask, summary)
    res = out
    return res.trajs_final, jnp.any(res.free_mask, axis=-1), res.idx_best, res.free_mask


def plan_team_roots_sequential_soft_device(planners: List,
                                           keys: Optional[jax.Array] = None,
                                           summary_margin: Optional[float] = None):
    """ECBS sequential soft-constrained root, device-resident (one call).

    Same return contract as plan_team_roots_device; None when the planners
    are not batchable (caller falls back to the per-agent host loop).
    """
    from mmd_tpu.config import params as default_params
    from mmd_tpu.utils.baked import bake_key, baked_program

    if not _batchable(planners):
        return None
    p0 = planners[0]
    hard_team = stack_hard_conds([p.hard_conds for p in planners])
    if keys is None:
        keys = jnp.stack([p._next_key() for p in planners])
    base_cset, _ = p0._pack(None)
    soft_radius = default_params.vertex_constraint_radius
    soft_weight = default_params.weight_grad_cost_soft_constraints
    (apply_fn, params, schedule, cfg, guide_cfg, scene, normalizer, radius,
     q_min, q_max, savgol), digest = _planner_bake(p0)
    mask = hard_team.mask
    margin = None if summary_margin is None else float(summary_margin)
    ckey = ("seq_root_soft", *digest, bake_key(mask), bake_key(base_cset),
            soft_radius, soft_weight, margin)

    def build():
        def fn(values, keys):
            hard = HardConds(mask=mask, values=values)
            common = (apply_fn, params, schedule, hard, scene, normalizer,
                      base_cset, keys, cfg, guide_cfg, radius, q_min, q_max,
                      savgol, soft_radius, soft_weight)
            if margin is not None:
                return _sequential_root_with_summary(*common, margin)
            return plan_sequential_root_soft(*common)
        return fn

    _add_team_evals(cfg, hard_team)
    return baked_program(ckey, build)(hard_team.values, keys)

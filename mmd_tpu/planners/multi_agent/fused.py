"""Fully-fused CT-expansion programs: plan + select + conflict summary +
team-state update in ONE jitted device call.

This is the latency-critical inner loop of CBS search. The reference spends
a Python loop and dozens of device round trips per expansion
(cbs.py:390-466); here the host uploads a padded constraint set and gets
back seven scalars.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

import numpy as np

from mmd_tpu.config import DiffusionConfig
from mmd_tpu.costs.guide import GuideConfig, GuideData
from mmd_tpu.models.diffusion import HardConds, guided_p_sample_loop, q_sample
from mmd_tpu.planners.multi_agent.conflict_detection import (
    select_candidate_and_conflicts,
)
from mmd_tpu.planners.single_agent.mpd import _finalize_plan

# ---------------------------------------------------------------------------
# Closure-baked program cache.
#
# Passing the planner invariants (UNet params, schedule, SDF scene,
# normalizer, savgol filter, robot/guide scalars) as jit ARGUMENTS costs
# ~0.35 s per call on a tunneled TPU: numpy leaves (params fresh off
# msgpack) re-upload every call, and the remaining per-operand dispatch +
# lost constant-folding add the rest (measured 0.65 s arg-passing vs 0.29 s
# fully-baked for the 10-agent sequential root). The public entry points
# below therefore BAKE every invariant operand into a closure-jitted
# program and pass only the per-call data (hard-cond values, PRNG keys,
# team paths, constraint buffers, conflict scalars).
#
# Cache keys digest each invariant by VALUE (shape/dtype/content hash),
# memoized by object identity so the per-call cost is dict lookups: value
# keying lets every trial in a sweep — which rebuilds MPD objects but
# shares params/dataset via the model cache — reuse one compiled program.
# Shared machinery: mmd_tpu/utils/baked.py.
# ---------------------------------------------------------------------------
from mmd_tpu.utils.baked import (        # noqa: E402
    PROGRAM_CACHE as _PROGRAM_CACHE,
    add_unet_evals as _add_evals,
    bake_key as _bake_key,
    loop_unet_evals as _loop_evals,
    record_call as _record,
)


def _select_and_update(res, paths_all, ix_best, agent_idx, margin):
    n = paths_all.shape[0]
    others_pos = paths_all[jnp.arange(n), ix_best][..., :2]
    ix, count, t, a, b, mid = select_candidate_and_conflicts(
        res.trajs_final[..., :2], res.free_mask, agent_idx, others_pos, margin)
    new_paths_all = paths_all.at[agent_idx].set(res.trajs_final)
    any_free = jnp.any(res.free_mask)
    return new_paths_all, (any_free, ix, count, t, a, b, mid)


def expand_fresh(apply_fn, params, schedule, hard: HardConds, gd: GuideData,
                 key, cfg: DiffusionConfig, guide_cfg: GuideConfig,
                 scene, radius, q_min, q_max, savgol,
                 paths_all, ix_best, agent_idx, margin):
    """Fresh replan of one agent + least-collisions selection + conflict
    summary + paths update — one device call (closure-baked invariants)."""
    ckey = ("expand_fresh", apply_fn, cfg, guide_cfg,
            _bake_key(params), _bake_key(schedule), _bake_key(hard.mask),
            _bake_key(scene), _bake_key(gd.normalizer), _bake_key(radius),
            _bake_key(q_min), _bake_key(q_max), _bake_key(savgol),
            _bake_key(margin))
    fn = _PROGRAM_CACHE.get(ckey)
    if fn is None:
        mask, normalizer = hard.mask, gd.normalizer

        @jax.jit
        def fn(values, cset, spc, key, paths_all, ix_best, agent_idx):
            hard_ = HardConds(mask=mask, values=values)
            gd_ = GuideData(scene=scene, normalizer=normalizer,
                            constraints=cset, soft_paths=spc)
            _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard_,
                                            key, cfg, gd=gd_,
                                            guide_cfg=guide_cfg)
            res = _finalize_plan(chain, normalizer, scene, radius, q_min,
                                 q_max, savgol)
            return _select_and_update(res, paths_all, ix_best, agent_idx,
                                      margin)

        _PROGRAM_CACHE[ckey] = fn
    _add_evals(_loop_evals(cfg, False, 0))
    return _record(ckey, fn)(hard.values, gd.constraints, gd.soft_paths, key, paths_all,
              ix_best, agent_idx)


def expand_children(apply_fn, params, schedule, hard_c: HardConds,
                    cset_c, keys, cfg: DiffusionConfig,
                    guide_cfg: GuideConfig, scene, normalizer, radius,
                    q_min, q_max, savgol, paths_all, ix_best, agent_ids,
                    margin, soft_radius, soft_weight,
                    use_soft: bool, local: bool,
                    n_noise: int = 0, n_denoise: int = 0):
    """All children of a CT expansion in ONE device call, any CBS variant
    (dispatcher; invariants closure-baked, see _PROGRAM_CACHE above).

    A conflict spawns children, each replanning a different agent under its
    own constraints — independent programs the reference runs sequentially
    (cbs.py:395-466). Static flags select the variant:
      use_soft: ECBS — each child softly avoids the others' current best
        paths; the SoftPathConstraints rows are built IN-GRAPH from
        (paths_all, ix_best), replacing the reference's per-expansion host
        loop over (n_agents-1)*H waypoints (cbs.py:468-506).
      local: XCBS — warm-start from the agent's current batch
        (q_sample-noise n_noise steps, denoise n_denoise steps).

    hard_c.values: (C, H, D); cset_c: ConstraintSet with leaves leading
    (C, ...) — children packed to COMMON (K, P) buckets; keys: (C, 2);
    agent_ids: (C,) int. Returns (child_trajs (C, B, H, D), per-child
    scalar tuple (any_free, ix, count, t, a, b, mid)).
    """
    ckey = ("expand_children", apply_fn, cfg, guide_cfg, use_soft, local,
            n_noise, n_denoise, _bake_key(params), _bake_key(schedule),
            _bake_key(hard_c.mask), _bake_key(scene), _bake_key(normalizer),
            _bake_key(radius), _bake_key(q_min), _bake_key(q_max),
            _bake_key(savgol), _bake_key(margin), _bake_key(soft_radius),
            _bake_key(soft_weight))
    fn = _PROGRAM_CACHE.get(ckey)
    if fn is None:
        mask = hard_c.mask

        @jax.jit
        def fn(hard_values_c, cset_c, keys, paths_all, ix_best, agent_ids):
            return _expand_children_core(
                apply_fn, params, schedule, HardConds(mask=mask,
                                                      values=hard_values_c),
                cset_c, keys, cfg, guide_cfg, scene, normalizer, radius,
                q_min, q_max, savgol, paths_all, ix_best, agent_ids, margin,
                soft_radius, soft_weight, use_soft=use_soft, local=local,
                n_noise=n_noise, n_denoise=n_denoise)

        _PROGRAM_CACHE[ckey] = fn
    _add_evals(hard_c.values.shape[0] * _loop_evals(cfg, local, n_denoise))
    return _record(ckey, fn)(hard_c.values, cset_c, keys, paths_all, ix_best, agent_ids)


def _expand_children_core(apply_fn, params, schedule, hard_c: HardConds,
                          cset_c, keys, cfg: DiffusionConfig,
                          guide_cfg: GuideConfig, scene, normalizer, radius,
                          q_min, q_max, savgol, paths_all, ix_best, agent_ids,
                          margin, soft_radius, soft_weight,
                          use_soft: bool, local: bool,
                          n_noise: int = 0, n_denoise: int = 0):
    from mmd_tpu.costs.constraints import SoftPathConstraints

    n = paths_all.shape[0]
    best_pos = paths_all[jnp.arange(n), ix_best][..., :2]   # (n, H, 2)
    H = best_pos.shape[1]

    def one_child(hard_values, cset, key, agent_idx):
        spc = None
        if use_soft:
            tmask = jnp.ones((n, H), jnp.float32).at[:, 0].set(0.0)
            rmask = (jnp.arange(n) != agent_idx).astype(jnp.float32)[:, None]
            spc = SoftPathConstraints(points=best_pos, mask=rmask * tmask,
                                      radius=soft_radius, weight=soft_weight)
        gd = GuideData(scene=scene, normalizer=normalizer, constraints=cset,
                       soft_paths=spc)
        hard = HardConds(mask=hard_c.mask, values=hard_values)
        if local:
            seed = normalizer.normalize(paths_all[agent_idx])
            key, nkey = jax.random.split(key)
            t = jnp.full((seed.shape[0],), n_noise, jnp.int32)
            noise = jax.random.normal(nkey, seed.shape, seed.dtype)
            warm = q_sample(schedule, seed, t, noise)
            _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard,
                                            key, cfg, gd=gd,
                                            guide_cfg=guide_cfg,
                                            n_diffusion_steps=n_denoise,
                                            warm_start=warm)
        else:
            _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard,
                                            key, cfg, gd=gd,
                                            guide_cfg=guide_cfg)
        res = _finalize_plan(chain, normalizer, scene, radius, q_min, q_max,
                             savgol)
        sel = select_candidate_and_conflicts(
            res.trajs_final[..., :2], res.free_mask, agent_idx, best_pos,
            margin)
        return res.trajs_final, (jnp.any(res.free_mask), *sel)

    return jax.vmap(one_child, in_axes=(0, 0, 0, 0))(
        hard_c.values, cset_c, keys, agent_ids)


def _cset_from_rows(q_rows: jax.Array, t_rows: jax.Array, n: jax.Array,
                    radius, weight):
    """Point-constraint buffer rows -> ConstraintSet (K constraints x 1 pt).

    q_rows: (K, 2) centers; t_rows: (K, 2) t-ranges; n: () live-row count.
    """
    from mmd_tpu.costs.constraints import ConstraintSet

    K = q_rows.shape[0]
    live = (jnp.arange(K) < n).astype(jnp.float32)
    return ConstraintSet(
        q=q_rows[:, None, :],
        t_range=t_rows[:, None, :],
        radius=jnp.full((K, 1), radius),
        weight=jnp.full((K,), weight) * live,
        point_mask=live[:, None],
        active=live,
    )


def _greedy_core(apply_fn, params, schedule, hard_all: HardConds, keys,
                 cfg: DiffusionConfig, guide_cfg: GuideConfig, scene,
                 normalizer, radius, q_min, q_max, savgol,
                 paths_all, ix_best, cons_q, cons_t, cons_n,
                 conflict0, margin, cons_radius, hard_weight,
                 soft_radius, soft_weight,
                 use_soft: bool, local: bool, n_noise: int, n_denoise: int,
                 k_iters: int, t_pad: int = 2, start_done=None):
    """k speculative best-first CT-search iterations in ONE device call.

    Each iteration expands the current node's first conflict into two
    children (one constrained agent each, exactly the reference expansion,
    cbs.py:390-466), then greedily descends into the child with fewer
    conflicts. The host validates each recorded step against its open list
    (greedy is only correct when the chosen child is strictly better than
    every other open node) and discards the speculated tail on mismatch —
    CBS semantics are preserved while k expansions share one round trip
    over the TPU tunnel.

    Per-agent constraint accumulation lives on device as fixed-shape
    buffers: cons_q (A, K, 2) centers, cons_t (A, K, 2) t-ranges,
    cons_n (A,) live counts.

    hard_all.values: (A, H, D); keys: (k_iters, 2, 2); conflict0 =
    (count, t, a, b, mid) scalars of the popped node. Returns per-iteration
    stacked records:
      (trajs (k, 2, B, H, D), agent_ids (k, 2), any_free (k, 2), ix (k, 2),
       counts (k, 2), c_t (k, 2), c_a (k, 2), c_b (k, 2), c_mid (k, 2, 2),
       chosen (k,), valid (k,))
    """
    from mmd_tpu.costs.constraints import SoftPathConstraints

    A, _, H, _ = paths_all.shape
    Kbuf = cons_q.shape[1]

    def expand_one_child(carry_paths, carry_ix, cq, ct, cn, agent_idx,
                         new_q, new_t0, new_t1, key):
        """Replan `agent_idx` under its accumulated constraints + the new
        one; least-collisions select; summarize. Returns child record."""
        n_a = cn[agent_idx]
        cq2 = cq.at[agent_idx, jnp.minimum(n_a, Kbuf - 1)].set(new_q)
        ct2 = ct.at[agent_idx, jnp.minimum(n_a, Kbuf - 1)].set(
            jnp.stack([new_t0, new_t1]))
        cn2 = cn.at[agent_idx].add(1)
        cset = _cset_from_rows(cq2[agent_idx], ct2[agent_idx], cn2[agent_idx],
                               cons_radius, hard_weight)
        best_pos = carry_paths[jnp.arange(A), carry_ix][..., :2]
        spc = None
        if use_soft:
            tmask = jnp.ones((A, H), jnp.float32).at[:, 0].set(0.0)
            rmask = (jnp.arange(A) != agent_idx).astype(jnp.float32)[:, None]
            spc = SoftPathConstraints(points=best_pos, mask=rmask * tmask,
                                      radius=soft_radius, weight=soft_weight)
        gd = GuideData(scene=scene, normalizer=normalizer, constraints=cset,
                       soft_paths=spc)
        hard = HardConds(mask=hard_all.mask, values=hard_all.values[agent_idx])
        if local:
            seed = normalizer.normalize(carry_paths[agent_idx])
            key, nkey = jax.random.split(key)
            tt = jnp.full((seed.shape[0],), n_noise, jnp.int32)
            noise = jax.random.normal(nkey, seed.shape, seed.dtype)
            warm = q_sample(schedule, seed, tt, noise)
            _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard,
                                            key, cfg, gd=gd,
                                            guide_cfg=guide_cfg,
                                            n_diffusion_steps=n_denoise,
                                            warm_start=warm)
        else:
            _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard,
                                            key, cfg, gd=gd,
                                            guide_cfg=guide_cfg)
        res = _finalize_plan(chain, normalizer, scene, radius, q_min, q_max,
                             savgol)
        ix, count, t, a, b, mid = select_candidate_and_conflicts(
            res.trajs_final[..., :2], res.free_mask, agent_idx, best_pos,
            margin)
        return (res.trajs_final, jnp.any(res.free_mask), ix, count, t, a, b,
                mid, cq2, ct2, cn2)

    def body(carry, inp):
        (paths, ixb, cq, ct, cn, cflt, done) = carry
        count0, t0, a0, b0, mid0 = cflt
        keys2 = inp
        # New constraint from the parent's first conflict
        # (conflict_conversion.py:18-43 with t_pad, clamped to [0, H-1]).
        lo = jnp.clip(t0 - t_pad, 0, H - 1).astype(jnp.float32)
        hi = jnp.clip(t0 + t_pad, 0, H - 1).astype(jnp.float32)
        agents = jnp.stack([a0, b0])

        child = jax.vmap(
            lambda agent_idx, key: expand_one_child(
                paths, ixb, cq, ct, cn, agent_idx, mid0, lo, hi, key)
        )(agents, keys2)
        (trajs2, free2, ix2, count2, ct2_, ca2, cb2, mid2, cq2, ctr2, cn2) = child

        # Greedy choice: least-conflicts FREE child.
        big = jnp.iinfo(jnp.int32).max
        masked = jnp.where(free2, count2, big)
        j = jnp.argmin(masked).astype(jnp.int32)
        any_ok = jnp.any(free2)

        agent_j = agents[j]
        new_paths = paths.at[agent_j].set(trajs2[j])
        new_ixb = ixb.at[agent_j].set(ix2[j])
        new_cflt = (count2[j], ct2_[j], ca2[j], cb2[j], mid2[j])

        # Freeze once done: node solved (count0==0), no free child, or a
        # constraint buffer overflowed.
        overflow = (cn[a0] >= Kbuf) | (cn[b0] >= Kbuf)
        valid = (~done) & (count0 > 0) & ~overflow
        step_done = done | (count0 == 0) | ~any_ok | overflow

        def keep(new, old):
            return jax.tree_util.tree_map(
                lambda n_, o_: jnp.where(step_done, o_, n_), new, old)

        carry2 = (keep(new_paths, paths), keep(new_ixb, ixb),
                  keep(cq2[j], cq), keep(ctr2[j], ct), keep(cn2[j], cn),
                  keep(new_cflt, cflt), step_done)
        out = (trajs2, agents, free2, ix2, count2, ct2_, ca2, cb2, mid2, j,
               valid)
        return carry2, out

    count0, t0, a0, b0, mid0 = conflict0
    done0 = jnp.asarray(False) if start_done is None else start_done
    init = (paths_all, ix_best, cons_q, cons_t, cons_n,
            (count0.astype(jnp.int32), t0.astype(jnp.int32),
             a0.astype(jnp.int32), b0.astype(jnp.int32), mid0),
            done0)
    # Early-exit loop instead of lax.scan: once the carry freezes (node
    # solved, both children starved, or constraint-buffer overflow) the
    # remaining iterations would compute 2 full plans each and discard
    # them — a while_loop skips that work entirely. Untouched output rows
    # stay zero, so the host sees valid=False there exactly as it did with
    # the frozen-carry scan.
    B = paths_all.shape[1]
    outs0 = (
        jnp.zeros((k_iters, 2, B, H, paths_all.shape[3]), paths_all.dtype),
        jnp.zeros((k_iters, 2), jnp.int32),      # agent ids
        jnp.zeros((k_iters, 2), bool),           # any_free
        jnp.zeros((k_iters, 2), jnp.int32),      # ix
        jnp.zeros((k_iters, 2), jnp.int32),      # counts
        jnp.zeros((k_iters, 2), jnp.int32),      # conflict t
        jnp.zeros((k_iters, 2), jnp.int32),      # conflict a
        jnp.zeros((k_iters, 2), jnp.int32),      # conflict b
        jnp.zeros((k_iters, 2, 2), paths_all.dtype),  # conflict mid
        jnp.zeros((k_iters,), jnp.int32),        # chosen child
        jnp.zeros((k_iters,), bool),             # valid
    )

    def w_cond(state):
        s, carry, _ = state
        return (s < k_iters) & ~carry[-1]

    def w_body(state):
        s, carry, outs = state
        carry2, out = body(carry, keys[s])
        outs2 = jax.tree_util.tree_map(
            lambda buf, o: buf.at[s].set(o), outs, tuple(out))
        return s + 1, carry2, outs2

    _, _, outs = jax.lax.while_loop(
        w_cond, w_body, (jnp.asarray(0, jnp.int32), init, outs0))
    return outs


def greedy_expand(apply_fn, params, schedule, hard_all: HardConds, keys,
                  cfg: DiffusionConfig, guide_cfg: GuideConfig, scene,
                  normalizer, radius, q_min, q_max, savgol,
                  paths_all, ix_best, cons_q, cons_t, cons_n,
                  conflict0, margin, cons_radius, hard_weight,
                  soft_radius, soft_weight,
                  use_soft: bool, local: bool, n_noise: int, n_denoise: int,
                  k_iters: int, t_pad: int = 2):
    """Dispatcher for `_greedy_core` with invariants closure-baked (see
    _PROGRAM_CACHE above). Signature matches the core exactly."""
    ckey = ("greedy_expand", apply_fn, cfg, guide_cfg, use_soft, local,
            n_noise, n_denoise, k_iters, t_pad, _bake_key(params),
            _bake_key(schedule), _bake_key(hard_all.mask), _bake_key(scene),
            _bake_key(normalizer), _bake_key(radius), _bake_key(q_min),
            _bake_key(q_max), _bake_key(savgol), _bake_key(margin),
            _bake_key(cons_radius), _bake_key(hard_weight),
            _bake_key(soft_radius), _bake_key(soft_weight))
    fn = _PROGRAM_CACHE.get(ckey)
    if fn is None:
        mask = hard_all.mask

        @jax.jit
        def fn(hard_values, keys, paths_all, ix_best, cons_q, cons_t, cons_n,
               conflict0):
            return _greedy_core(
                apply_fn, params, schedule,
                HardConds(mask=mask, values=hard_values), keys, cfg,
                guide_cfg, scene, normalizer, radius, q_min, q_max, savgol,
                paths_all, ix_best, cons_q, cons_t, cons_n, conflict0,
                margin, cons_radius, hard_weight, soft_radius, soft_weight,
                use_soft=use_soft, local=local, n_noise=n_noise,
                n_denoise=n_denoise, k_iters=k_iters, t_pad=t_pad)

        _PROGRAM_CACHE[ckey] = fn
    # Upper bound: the k_iters greedy while_loop can exit early on a
    # conflict-free accept (see module-level note in utils/baked.py).
    _add_evals(k_iters * 2 * _loop_evals(cfg, local, n_denoise))
    return _record(ckey, fn)(hard_all.values, keys, paths_all, ix_best, cons_q, cons_t,
              cons_n, conflict0)


def frontier_expand(apply_fn, params, schedule, hard_all: HardConds, keys,
                    cfg: DiffusionConfig, guide_cfg: GuideConfig, scene,
                    normalizer, radius, q_min, q_max, savgol,
                    paths_m, ix_m, cons_q_m, cons_t_m, cons_n_m,
                    conflict_m, margin, cons_radius, hard_weight,
                    soft_radius, soft_weight,
                    use_soft: bool, local: bool, n_noise: int,
                    n_denoise: int, t_pad: int = 2):
    """Both children of M open CT nodes in ONE device call (dispatcher;
    invariants closure-baked, see _PROGRAM_CACHE above).

    Dense instances leave the open list deep in near-tied nodes; expanding
    them one at a time (reference cbs.py:390-466) or down a single greedy
    chain leaves the MXU idle between tunnel round trips. Here the top-M
    nodes' first conflicts are expanded together — a (M, 2)-way vmap over
    the same per-child program `_greedy_core` runs sequentially — so the
    UNet sees 2*M*B-trajectory batches and the search advances M nodes per
    round trip. CBS stays sound: each child is the exact single-node
    expansion of its own parent (same constraint accumulation, selection,
    and conflict summary); only the HOST-side expansion ORDER generalizes
    from "one best node" to "M best nodes per round".

    paths_m: (M, A, B, H, D); ix_m: (M, A) int; cons_*_m: per-node
    constraint buffers (M, A, K, ...) / (M, A); conflict_m = (count, t, a,
    b, mid) each (M,)-leading; keys: (M, 2, 2). Returns per-child records
    stacked (M, 2, ...): (trajs, any_free, ix, count, c_t, c_a, c_b, c_mid)
    plus the (M, 2) constrained-agent ids.
    """
    ckey = ("frontier_expand", apply_fn, cfg, guide_cfg, use_soft, local,
            n_noise, n_denoise, t_pad, _bake_key(params),
            _bake_key(schedule), _bake_key(hard_all.mask), _bake_key(scene),
            _bake_key(normalizer), _bake_key(radius), _bake_key(q_min),
            _bake_key(q_max), _bake_key(savgol), _bake_key(margin),
            _bake_key(cons_radius), _bake_key(hard_weight),
            _bake_key(soft_radius), _bake_key(soft_weight))
    fn = _PROGRAM_CACHE.get(ckey)
    if fn is None:
        mask = hard_all.mask

        @jax.jit
        def fn(hard_values, keys, paths_m, ix_m, cons_q_m, cons_t_m,
               cons_n_m, conflict_m):
            return _frontier_core(
                apply_fn, params, schedule,
                HardConds(mask=mask, values=hard_values), keys, cfg,
                guide_cfg, scene, normalizer, radius, q_min, q_max, savgol,
                paths_m, ix_m, cons_q_m, cons_t_m, cons_n_m, conflict_m,
                margin, cons_radius, hard_weight, soft_radius, soft_weight,
                use_soft=use_soft, local=local, n_noise=n_noise,
                n_denoise=n_denoise, t_pad=t_pad)

        _PROGRAM_CACHE[ckey] = fn
    _add_evals(paths_m.shape[0] * 2 * _loop_evals(cfg, local, n_denoise))
    return _record(ckey, fn)(hard_all.values, keys, paths_m, ix_m, cons_q_m, cons_t_m,
              cons_n_m, conflict_m)


def frontier_greedy_expand(apply_fn, params, schedule, hard_all: HardConds,
                           keys_m, cfg: DiffusionConfig,
                           guide_cfg: GuideConfig, scene, normalizer, radius,
                           q_min, q_max, savgol, paths_m, ix_m, cons_q_m,
                           cons_t_m, cons_n_m, conflict_m, margin,
                           cons_radius, hard_weight, soft_radius, soft_weight,
                           use_soft: bool, local: bool, n_noise: int,
                           n_denoise: int, k_iters: int, t_pad: int = 2):
    """k-iteration speculative greedy CT descents from M open nodes in ONE
    device call — a vmap of `_greedy_core` over the node axis.

    The single-expansion frontier (frontier_expand) trades DEPTH for
    breadth and measurably loses to the greedy descent on dense instances
    (Conveyor vd, 20 agents, 60 s: 0/10 at width 4 vs 3/10 greedy-only —
    near-tied siblings soak the budget one level deep). This program keeps
    the descent: M near-tied open nodes each run the full k-step greedy
    chain, so one round trip advances M chains x k expansions and the UNet
    sees up to 2*M*B-trajectory batches. CBS stays complete: every child of
    every accepted step enters the open list (throughput mode relaxes only
    the strict best-first expansion ORDER, as frontier mode already does).

    keys_m: (M, k, 2, 2); paths_m: (M, A, B, H, D); ix_m: (M, A);
    cons_*_m: per-node constraint buffers (M, A, K, ...) / (M, A);
    conflict_m = (count, t, a, b, mid) each (M,)-leading. Returns
    `_greedy_core`'s record tuple with an (M,) node axis prepended.
    """
    ckey = ("frontier_greedy", apply_fn, cfg, guide_cfg, use_soft, local,
            n_noise, n_denoise, k_iters, t_pad, _bake_key(params),
            _bake_key(schedule), _bake_key(hard_all.mask), _bake_key(scene),
            _bake_key(normalizer), _bake_key(radius), _bake_key(q_min),
            _bake_key(q_max), _bake_key(savgol), _bake_key(margin),
            _bake_key(cons_radius), _bake_key(hard_weight),
            _bake_key(soft_radius), _bake_key(soft_weight))
    fn = _PROGRAM_CACHE.get(ckey)
    if fn is None:
        mask = hard_all.mask

        @jax.jit
        def fn(hard_values, keys_m, paths_m, ix_m, cons_q_m, cons_t_m,
               cons_n_m, conflict_m):
            hard = HardConds(mask=mask, values=hard_values)

            def one_node(keys, paths, ixb, cq, ct, cn, c0):
                return _greedy_core(
                    apply_fn, params, schedule, hard, keys, cfg, guide_cfg,
                    scene, normalizer, radius, q_min, q_max, savgol, paths,
                    ixb, cq, ct, cn, c0, margin, cons_radius, hard_weight,
                    soft_radius, soft_weight, use_soft=use_soft, local=local,
                    n_noise=n_noise, n_denoise=n_denoise, k_iters=k_iters,
                    t_pad=t_pad)

            return jax.vmap(one_node)(keys_m, paths_m, ix_m, cons_q_m,
                                      cons_t_m, cons_n_m, conflict_m)

        _PROGRAM_CACHE[ckey] = fn
    # Upper bound: each node's k_iters greedy chain can freeze early.
    _add_evals(paths_m.shape[0] * k_iters * 2
               * _loop_evals(cfg, local, n_denoise))
    return _record(ckey, fn)(hard_all.values, keys_m, paths_m, ix_m, cons_q_m, cons_t_m,
              cons_n_m, conflict_m)


def _frontier_core(apply_fn, params, schedule, hard_all: HardConds, keys,
                   cfg: DiffusionConfig, guide_cfg: GuideConfig, scene,
                   normalizer, radius, q_min, q_max, savgol,
                   paths_m, ix_m, cons_q_m, cons_t_m, cons_n_m,
                   conflict_m, margin, cons_radius, hard_weight,
                   soft_radius, soft_weight,
                   use_soft: bool, local: bool, n_noise: int,
                   n_denoise: int, t_pad: int = 2):
    A = paths_m.shape[1]
    H = paths_m.shape[3]
    Kbuf = cons_q_m.shape[2]

    def one_node(paths, ixb, cq, ct, cn, cflt, keys2):
        count0, t0, a0, b0, mid0 = cflt
        lo = jnp.clip(t0 - t_pad, 0, H - 1).astype(jnp.float32)
        hi = jnp.clip(t0 + t_pad, 0, H - 1).astype(jnp.float32)
        agents = jnp.stack([a0, b0])

        def one_child(agent_idx, key):
            # Identical math to _greedy_core.expand_one_child: append the
            # parent's first conflict to this agent's constraint rows,
            # replan under them (+ECBS soft rows / XCBS warm start),
            # least-collisions select, summarize vs the others' best.
            from mmd_tpu.costs.constraints import SoftPathConstraints

            n_a = cn[agent_idx]
            cq2 = cq.at[agent_idx, jnp.minimum(n_a, Kbuf - 1)].set(mid0)
            ct2 = ct.at[agent_idx, jnp.minimum(n_a, Kbuf - 1)].set(
                jnp.stack([lo, hi]))
            cn2 = cn.at[agent_idx].add(1)
            cset = _cset_from_rows(cq2[agent_idx], ct2[agent_idx],
                                   cn2[agent_idx], cons_radius, hard_weight)
            best_pos = paths[jnp.arange(A), ixb][..., :2]
            spc = None
            if use_soft:
                tmask = jnp.ones((A, H), jnp.float32).at[:, 0].set(0.0)
                rmask = (jnp.arange(A) != agent_idx).astype(
                    jnp.float32)[:, None]
                spc = SoftPathConstraints(points=best_pos, mask=rmask * tmask,
                                          radius=soft_radius,
                                          weight=soft_weight)
            gd = GuideData(scene=scene, normalizer=normalizer,
                           constraints=cset, soft_paths=spc)
            hard = HardConds(mask=hard_all.mask,
                             values=hard_all.values[agent_idx])
            if local:
                seed = normalizer.normalize(paths[agent_idx])
                key2, nkey = jax.random.split(key)
                tt = jnp.full((seed.shape[0],), n_noise, jnp.int32)
                noise = jax.random.normal(nkey, seed.shape, seed.dtype)
                warm = q_sample(schedule, seed, tt, noise)
                _, chain = guided_p_sample_loop(
                    apply_fn, params, schedule, hard, key2, cfg, gd=gd,
                    guide_cfg=guide_cfg, n_diffusion_steps=n_denoise,
                    warm_start=warm)
            else:
                _, chain = guided_p_sample_loop(
                    apply_fn, params, schedule, hard, key, cfg, gd=gd,
                    guide_cfg=guide_cfg)
            res = _finalize_plan(chain, normalizer, scene, radius, q_min,
                                 q_max, savgol)
            ix, count, t, a, b, mid = select_candidate_and_conflicts(
                res.trajs_final[..., :2], res.free_mask, agent_idx, best_pos,
                margin)
            return (res.trajs_final, jnp.any(res.free_mask), ix, count, t, a,
                    b, mid)

        out = jax.vmap(one_child)(agents, keys2)
        return (*out, agents)

    return jax.vmap(one_node)(paths_m, ix_m, cons_q_m, cons_t_m, cons_n_m,
                              conflict_m, keys)


def root_greedy(apply_fn, params, schedule, hard_team: HardConds, base_cset,
                keys_root, keys_greedy, cfg: DiffusionConfig,
                guide_cfg: GuideConfig, scene, normalizer, radius, q_min,
                q_max, savgol, margin, cons_radius, hard_weight, soft_radius,
                soft_weight, kbuf: int, use_soft: bool, local: bool,
                n_noise: int, n_denoise: int, k_iters: int,
                sequential_root: bool):
    """Dispatcher for `_root_greedy_core` with invariants closure-baked (see
    _PROGRAM_CACHE above). base_cset (the root's empty constraint set) is an
    invariant too — it's derived from buckets, not per-call data."""
    ckey = ("root_greedy", apply_fn, cfg, guide_cfg, kbuf, use_soft, local,
            n_noise, n_denoise, k_iters, sequential_root, _bake_key(params),
            _bake_key(schedule), _bake_key(hard_team.mask),
            _bake_key(base_cset), _bake_key(scene), _bake_key(normalizer),
            _bake_key(radius), _bake_key(q_min), _bake_key(q_max),
            _bake_key(savgol), _bake_key(margin), _bake_key(cons_radius),
            _bake_key(hard_weight), _bake_key(soft_radius),
            _bake_key(soft_weight))
    fn = _PROGRAM_CACHE.get(ckey)
    if fn is None:
        mask = hard_team.mask

        @jax.jit
        def fn(hard_values, keys_root, keys_greedy):
            return _root_greedy_core(
                apply_fn, params, schedule,
                HardConds(mask=mask, values=hard_values), base_cset,
                keys_root, keys_greedy, cfg, guide_cfg, scene, normalizer,
                radius, q_min, q_max, savgol, margin, cons_radius,
                hard_weight, soft_radius, soft_weight, kbuf=kbuf,
                use_soft=use_soft, local=local, n_noise=n_noise,
                n_denoise=n_denoise, k_iters=k_iters,
                sequential_root=sequential_root)

        _PROGRAM_CACHE[ckey] = fn
    # Root: one full loop per agent. Greedy tail: upper bound (early exit).
    _add_evals(hard_team.values.shape[0] * _loop_evals(cfg, False, 0)
               + k_iters * 2 * _loop_evals(cfg, local, n_denoise))
    return _record(ckey, fn)(hard_team.values, keys_root, keys_greedy)


def _root_greedy_core(apply_fn, params, schedule, hard_team: HardConds,
                      base_cset, keys_root, keys_greedy,
                      cfg: DiffusionConfig, guide_cfg: GuideConfig, scene,
                      normalizer, radius, q_min, q_max, savgol, margin,
                      cons_radius, hard_weight, soft_radius, soft_weight,
                      kbuf: int, use_soft: bool, local: bool,
                      n_noise: int, n_denoise: int, k_iters: int,
                      sequential_root: bool):
    """Root creation + conflict summary + k speculative greedy CT expansions
    in ONE device call — easy instances (the 10-robot bench included) solve
    in a single round trip over the TPU tunnel.

    The root is either the ECBS sequential soft-constrained scan
    (sequential_root=True; reference cbs.py:316-335) or the vmapped
    CBS/XCBS fresh-team program. Its first-conflict summary seeds the same
    greedy loop `greedy_expand` runs from a popped node (empty constraint
    buffers — the root has none); the host applies the identical open-list
    validation to the returned records. When a root agent has no free path,
    the greedy loop starts frozen (all records invalid) and the host takes
    its FAIL_NO_SOLUTION branch exactly as with the unfused root.

    Returns ((trajs_all, free_any, idx_best, free_mask), summary,
    greedy_outs).
    """
    from mmd_tpu.parallel.team import (
        plan_fresh_team,
        plan_sequential_root_soft,
    )
    from mmd_tpu.planners.multi_agent.conflict_detection import (
        team_conflict_summary,
    )

    if sequential_root:
        trajs, free_any, idx_best, free_mask = plan_sequential_root_soft(
            apply_fn, params, schedule, hard_team, scene, normalizer,
            base_cset, keys_root, cfg, guide_cfg, radius, q_min, q_max,
            savgol, soft_radius, soft_weight)
    else:
        gd = GuideData(scene=scene, normalizer=normalizer,
                       constraints=base_cset)
        res = plan_fresh_team(apply_fn, params, schedule, hard_team, gd,
                              keys_root, cfg, guide_cfg, scene, radius,
                              q_min, q_max, savgol)
        trajs, free_any, idx_best, free_mask = (
            res.trajs_final, jnp.any(res.free_mask, axis=-1), res.idx_best,
            res.free_mask)

    A = trajs.shape[0]
    pos = trajs[jnp.arange(A), idx_best][..., :2]
    summary = team_conflict_summary(pos, margin)

    cons_q = jnp.zeros((A, kbuf, 2), jnp.float32)
    cons_t = jnp.zeros((A, kbuf, 2), jnp.float32)
    cons_n = jnp.zeros((A,), jnp.int32)
    count, t, a, b, mid = summary
    outs = _greedy_core(
        apply_fn, params, schedule, hard_team, keys_greedy, cfg, guide_cfg,
        scene, normalizer, radius, q_min, q_max, savgol, trajs,
        idx_best.astype(jnp.int32), cons_q, cons_t, cons_n,
        (count, t, a, b, mid), margin, cons_radius, hard_weight, soft_radius,
        soft_weight, use_soft=use_soft, local=local, n_noise=n_noise,
        n_denoise=n_denoise, k_iters=k_iters,
        # Start the greedy loop already-done on a conflict-free OR starved
        # root: without the count==0 term every easy instance paid one full
        # while_loop iteration (two complete child plans) before the
        # carry froze on count0==0 inside `body`.
        start_done=(count == 0) | ~jnp.all(free_any))
    return (trajs, free_any, idx_best, free_mask), summary, outs


@functools.partial(jax.jit, static_argnames=(
    "apply_fn", "cfg", "guide_cfg", "n_tiles", "use_soft", "local",
    "n_noise", "n_denoise", "T_out"))
def expand_child_ensemble(apply_fn, stacked_params, schedule,
                          hard: HardConds, cc, gds: GuideData, key,
                          cfg: DiffusionConfig, guide_cfg: GuideConfig,
                          transforms, stacked_scenes, radius, q_min, q_max,
                          savgol, paths_all, ix_best, agent_idx, start_times,
                          margin, soft_radius, soft_weight,
                          n_tiles: int, use_soft: bool, local: bool,
                          n_noise: int, n_denoise: int, T_out: int):
    """One CT child for a multi-tile (MPDEnsemble) agent in ONE device call.

    The generic path pays two device calls plus host numpy padding per
    expansion (plan, then select+summarize after global_pad_paths); here the
    cross-conditioned ensemble plan, global assembly, stagger padding,
    least-collisions selection, conflict summary, and team-state update all
    run in one jitted program — the multi-tile analog of
    expand_fresh/expand_local (reference: cbs.py:390-466 against
    MPDEnsemble, mpd_ensemble.py:335-528).

    paths_all: (A, B, L, D) GLOBAL-frame team batches (L = n_tiles * H,
    uniform across agents); start_times: (A,) int stagger offsets;
    T_out = max(start_times) + L (static). ECBS soft constraints are built
    IN-GRAPH per tile from the others' padded best paths (reference
    cbs.py:468-506 routed through split_cost_constraints_to_tasks,
    mpd_ensemble.py:431-518). XCBS warm-starts from the agent's current
    GLOBAL batch, split into per-tile local normalized seeds.
    """
    from mmd_tpu.costs.constraints import SoftPathConstraints
    from mmd_tpu.models.diffusion import q_sample as _q_sample
    from mmd_tpu.planners.multi_agent.conflict_detection import (
        pad_team_positions,
    )
    from mmd_tpu.planners.single_agent.mpd_ensemble import _finalize_ensemble

    A, B, L, D = paths_all.shape
    H = L // n_tiles
    others_pos = paths_all[jnp.arange(A), ix_best][..., :2]        # (A, L, 2)
    others_pad = pad_team_positions(others_pos, start_times, T_out)

    if use_soft:
        # Tile m, local step t <-> agent-global time u = m*H + t; the other
        # agents' positions at absolute time start_times[agent] + u become
        # per-tile keep-out balls in that tile's local frame.
        u = jnp.arange(L).reshape(n_tiles, H)                      # (T, H)
        tau = jnp.clip(start_times[agent_idx] + u, 0, T_out - 1)
        pts = others_pad[:, tau]                                   # (A, T, H, 2)
        pts = jnp.transpose(pts, (1, 0, 2, 3)) - transforms[:, None, None, :]
        rmask = (jnp.arange(A) != agent_idx).astype(jnp.float32)
        msk = jnp.broadcast_to(rmask[None, :, None], (n_tiles, A, H))
        msk = msk * (u[:, None, :] >= 1)  # skip the start waypoint (ref :480)
        spc = SoftPathConstraints(
            points=pts, mask=msk,
            radius=jnp.full((n_tiles,), soft_radius),
            weight=jnp.full((n_tiles,), soft_weight))
        gds = GuideData(scene=gds.scene, normalizer=gds.normalizer,
                        constraints=gds.constraints, soft_paths=spc)

    from mmd_tpu.models.ensemble import ensemble_p_sample_loop
    if local:
        seed = paths_all[agent_idx]                                # (B, L, D)
        tiles = jnp.transpose(seed.reshape(B, n_tiles, H, D), (1, 0, 2, 3))
        tiles = tiles.at[..., :2].add(-transforms[:, None, None, :])
        seed_local = jax.vmap(lambda x, nrm: nrm.normalize(x))(
            tiles, gds.normalizer)
        key, nkey = jax.random.split(key)
        tt = jnp.full((n_tiles * B,), n_noise, jnp.int32)
        noise = jax.random.normal(nkey, seed_local.shape, seed_local.dtype)
        warm = _q_sample(schedule, seed_local.reshape(n_tiles * B, H, D), tt,
                         noise.reshape(n_tiles * B, H, D)).reshape(
                             n_tiles, B, H, D)
        _, chain = ensemble_p_sample_loop(apply_fn, stacked_params, schedule,
                                          hard, cc, key, cfg, gds=gds,
                                          guide_cfg=guide_cfg,
                                          n_diffusion_steps=n_denoise,
                                          warm_start=warm, n_tiles=n_tiles)
    else:
        _, chain = ensemble_p_sample_loop(apply_fn, stacked_params, schedule,
                                          hard, cc, key, cfg, gds=gds,
                                          guide_cfg=guide_cfg, n_tiles=n_tiles)
    res = _finalize_ensemble(chain, gds, transforms, stacked_scenes, radius,
                             q_min, q_max, savgol)

    idx = jnp.clip(jnp.arange(T_out) - start_times[agent_idx], 0, L - 1)
    cand_pad = res.trajs_final[..., :2][:, idx, :]                 # (B, T_out, 2)
    ix, count, t, a, b, mid = select_candidate_and_conflicts(
        cand_pad, res.free_mask, agent_idx, others_pad, margin)
    new_paths_all = paths_all.at[agent_idx].set(res.trajs_final)
    return new_paths_all, (jnp.any(res.free_mask), ix, count, t, a, b, mid)


def expand_local(apply_fn, params, schedule, hard: HardConds, gd: GuideData,
                 key, cfg: DiffusionConfig, guide_cfg: GuideConfig,
                 scene, radius, q_min, q_max, savgol,
                 paths_all, ix_best, agent_idx, margin,
                 n_noise: int, n_denoise: int):
    """XCBS expansion: the agent's current batch is the warm-start seed
    (normalized in-graph), locally re-denoised under the new constraints
    (dispatcher; invariants closure-baked, see _PROGRAM_CACHE above)."""
    ckey = ("expand_local", apply_fn, cfg, guide_cfg, n_noise, n_denoise,
            _bake_key(params), _bake_key(schedule), _bake_key(hard.mask),
            _bake_key(scene), _bake_key(gd.normalizer), _bake_key(radius),
            _bake_key(q_min), _bake_key(q_max), _bake_key(savgol),
            _bake_key(margin))
    fn = _PROGRAM_CACHE.get(ckey)
    if fn is None:
        mask, normalizer = hard.mask, gd.normalizer

        @jax.jit
        def fn(values, cset, spc, key, paths_all, ix_best, agent_idx):
            hard_ = HardConds(mask=mask, values=values)
            gd_ = GuideData(scene=scene, normalizer=normalizer,
                            constraints=cset, soft_paths=spc)
            seed = normalizer.normalize(paths_all[agent_idx])
            key2, nkey = jax.random.split(key)
            B = seed.shape[0]
            t = jnp.full((B,), n_noise, jnp.int32)
            noise = jax.random.normal(nkey, seed.shape, seed.dtype)
            warm = q_sample(schedule, seed, t, noise)
            _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard_,
                                            key2, cfg, gd=gd_,
                                            guide_cfg=guide_cfg,
                                            n_diffusion_steps=n_denoise,
                                            warm_start=warm)
            res = _finalize_plan(chain, normalizer, scene, radius, q_min,
                                 q_max, savgol)
            return _select_and_update(res, paths_all, ix_best, agent_idx,
                                      margin)

        _PROGRAM_CACHE[ckey] = fn
    _add_evals(_loop_evals(cfg, True, n_denoise))
    return _record(ckey, fn)(hard.values, gd.constraints, gd.soft_paths, key, paths_all,
              ix_best, agent_idx)

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

from mmd_tpu.config import DiffusionConfig
from mmd_tpu.costs.guide import GuideConfig, GuideData
from mmd_tpu.models.diffusion import HardConds, guided_p_sample_loop, q_sample
from mmd_tpu.planners.multi_agent.conflict_detection import (
    select_candidate_and_conflicts,
)
from mmd_tpu.planners.single_agent.mpd import _finalize_plan


def _select_and_update(res, paths_all, ix_best, agent_idx, margin):
    n = paths_all.shape[0]
    others_pos = paths_all[jnp.arange(n), ix_best][..., :2]
    ix, count, t, a, b, mid = select_candidate_and_conflicts(
        res.trajs_final[..., :2], res.free_mask, agent_idx, others_pos, margin)
    new_paths_all = paths_all.at[agent_idx].set(res.trajs_final)
    any_free = jnp.any(res.free_mask)
    return new_paths_all, (any_free, ix, count, t, a, b, mid)


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg"))
def expand_fresh(apply_fn, params, schedule, hard: HardConds, gd: GuideData,
                 key, cfg: DiffusionConfig, guide_cfg: GuideConfig,
                 scene, radius, q_min, q_max, savgol,
                 paths_all, ix_best, agent_idx, margin):
    """Fresh replan of one agent + least-collisions selection + conflict
    summary + paths update — one device call."""
    _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard, key, cfg,
                                    gd=gd, guide_cfg=guide_cfg)
    res = _finalize_plan(chain, gd.normalizer, scene, radius, q_min, q_max, savgol)
    return _select_and_update(res, paths_all, ix_best, agent_idx, margin)


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg",
                                             "n_noise", "n_denoise"))
def expand_children_local(apply_fn, params, schedule, hard_pair: HardConds,
                          gd_pair: GuideData, keys, cfg: DiffusionConfig,
                          guide_cfg: GuideConfig, scene, radius, q_min, q_max,
                          savgol, paths_all, ix_best, agent_pair, margin,
                          n_noise: int, n_denoise: int):
    """Both children of a CT expansion in ONE device call (vmapped).

    A conflict spawns two children, each replanning a different agent under
    its own constraints — independent programs the reference runs
    sequentially (cbs.py:395-466). hard_pair.values: (2, H, D); gd_pair
    leaves lead with the child axis; agent_pair: (2,) int.
    Returns (child_trajs (2, B, H, D), per-child scalar tuple).
    """

    def one_child(hard_values, gd, key, agent_idx):
        seed = gd.normalizer.normalize(paths_all[agent_idx])
        key, nkey = jax.random.split(key)
        B = seed.shape[0]
        t = jnp.full((B,), n_noise, jnp.int32)
        noise = jax.random.normal(nkey, seed.shape, seed.dtype)
        warm = q_sample(schedule, seed, t, noise)
        hard = HardConds(mask=hard_pair.mask, values=hard_values)
        _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard, key,
                                        cfg, gd=gd, guide_cfg=guide_cfg,
                                        n_diffusion_steps=n_denoise,
                                        warm_start=warm)
        res = _finalize_plan(chain, gd.normalizer, scene, radius, q_min,
                             q_max, savgol)
        n = paths_all.shape[0]
        others_pos = paths_all[jnp.arange(n), ix_best][..., :2]
        sel = select_candidate_and_conflicts(
            res.trajs_final[..., :2], res.free_mask, agent_idx, others_pos,
            margin)
        return res.trajs_final, (jnp.any(res.free_mask), *sel)

    return jax.vmap(one_child, in_axes=(0, 0, 0, 0))(
        hard_pair.values, gd_pair, keys, agent_pair)


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg",
                                             "n_noise", "n_denoise"))
def expand_local(apply_fn, params, schedule, hard: HardConds, gd: GuideData,
                 key, cfg: DiffusionConfig, guide_cfg: GuideConfig,
                 scene, radius, q_min, q_max, savgol,
                 paths_all, ix_best, agent_idx, margin,
                 n_noise: int, n_denoise: int):
    """XCBS expansion: the agent's current batch is the warm-start seed
    (normalized in-graph), locally re-denoised under the new constraints."""
    seed = gd.normalizer.normalize(paths_all[agent_idx])
    key, nkey = jax.random.split(key)
    B = seed.shape[0]
    t = jnp.full((B,), n_noise, jnp.int32)
    noise = jax.random.normal(nkey, seed.shape, seed.dtype)
    warm = q_sample(schedule, seed, t, noise)
    _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard, key, cfg,
                                    gd=gd, guide_cfg=guide_cfg,
                                    n_diffusion_steps=n_denoise, warm_start=warm)
    res = _finalize_plan(chain, gd.normalizer, scene, radius, q_min, q_max, savgol)
    return _select_and_update(res, paths_all, ix_best, agent_idx, margin)

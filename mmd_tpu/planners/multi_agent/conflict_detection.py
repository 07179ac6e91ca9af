"""Batched multi-agent conflict detection on device.

TPU-native re-design of CBS.get_conflicts + the least-collisions selection
loop (reference: mmd/planners/multi_agent/cbs.py:166-246, 446-458). The
reference stacks padded paths and calls check_rr_collisions once per
candidate trajectory in a Python loop; here ONE jitted call scores every
candidate in the batch simultaneously, and full-team conflict tensors come
back as fixed-shape bools the host turns into Conflict records.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.common.conflicts import PointConflict
from mmd_tpu.robots.disk import check_rr_collisions


@jax.jit
def team_collision_tensor(paths_pos: jax.Array, margin: float):
    """paths_pos: (n_agents, T, 2) padded positions.

    Returns (coll (T, n, n) bool, midpoints (T, n, n, 2)) — the reference's
    stacked check (cbs.py:185-193).
    """
    per_t = jnp.swapaxes(paths_pos, 0, 1)
    return check_rr_collisions(per_t, margin)


@jax.jit
def candidate_conflict_counts(cand_pos: jax.Array, agent_idx: jax.Array,
                              paths_pos: jax.Array, margin: float) -> jax.Array:
    """Ordered-pair conflict count for each candidate path of one agent.

    cand_pos: (B, T, 2) candidate positions for agent `agent_idx`;
    paths_pos: (n, T, 2) current best paths (agent_idx row is ignored).
    Returns (B,) int32: total ordered-pair conflicts of the team if the
    candidate replaced the agent's path — exactly what the reference
    computes with B separate get_conflicts calls (cbs.py:446-458).
    """
    n = paths_pos.shape[0]
    # Conflicts involving the candidate agent: (B, n, T).
    d = jnp.linalg.norm(cand_pos[:, None, :, :] - paths_pos[None, :, :, :], axis=-1)
    hits = d < margin
    not_self = (jnp.arange(n) != agent_idx)[None, :, None]
    cnt_agent = (hits & not_self).sum(axis=(1, 2))  # unordered, x2 below

    # Conflicts among the other agents (constant across candidates).
    coll, _ = team_collision_tensor(paths_pos, margin)
    others = (jnp.arange(n) != agent_idx)
    pair_mask = others[:, None] & others[None, :]
    base = (coll & pair_mask[None]).sum()  # ordered count already (symmetric)

    return (2 * cnt_agent + base).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("T_out",))
def pad_team_positions(paths_pos: jax.Array, start_times: jax.Array,
                       T_out: int) -> jax.Array:
    """In-graph stagger padding: (n, L, 2), (n,) int -> (n, T_out, 2).

    Agent i's padded path repeats its first state for start_times[i] steps
    and its last state out to T_out — exactly global_pad_paths
    (mmd/common/multi_agent_utils.py:120-143) as one clipped gather, so
    staggered-start teams stay on device instead of round-tripping through
    host numpy padding.
    """
    L = paths_pos.shape[1]
    idx = jnp.clip(jnp.arange(T_out)[None, :] - start_times[:, None], 0, L - 1)
    return jnp.take_along_axis(paths_pos, idx[..., None], axis=1)


def densify_positions(paths_pos: jax.Array, factor: int) -> jax.Array:
    """Linear x`factor` densification along the time axis.

    (n, T, 2) -> (n, (T-1)*factor + 1, 2): inserts factor-1 evenly spaced
    midpoints between consecutive waypoints (the reference's densify_trajs,
    mmd/common/trajectory_utils.py:54-71, used by edge-conflict detection,
    cbs.py:185-193).
    """
    if factor == 1:
        return paths_pos
    n, T, d = paths_pos.shape
    seg = paths_pos[:, 1:] - paths_pos[:, :-1]           # (n, T-1, d)
    fr = jnp.arange(factor, dtype=paths_pos.dtype) / factor
    pts = (paths_pos[:, :-1, None, :]
           + seg[:, :, None, :] * fr[None, None, :, None])
    pts = pts.reshape(n, (T - 1) * factor, d)
    return jnp.concatenate([pts, paths_pos[:, -1:]], axis=1)


@jax.jit
def team_conflict_summary(paths_pos: jax.Array, margin: float):
    """paths_pos: (n, T, 2) -> (count, t, a, b, midpoint (2,)).

    Ordered-pair conflict count plus the FIRST conflict in row-major
    (t, a, b) order — all the CBS loop needs per node, in one device call
    (the reference builds a full Python conflict list, cbs.py:166-246).
    """
    coll, mid = team_collision_tensor(paths_pos, margin)   # (T, n, n)
    count = jnp.sum(coll).astype(jnp.int32)
    flat = coll.reshape(-1)
    first = jnp.argmax(flat).astype(jnp.int32)             # row-major first hit
    n = paths_pos.shape[0]
    t = first // (n * n)
    rem = first % (n * n)
    a = rem // n
    b = rem % n
    midpoint = mid.reshape(-1, 2)[first]
    return count, t, a, b, midpoint


@jax.jit
def select_candidate_and_conflicts(cand_pos: jax.Array, free_mask: jax.Array,
                                   agent_idx: jax.Array, paths_pos: jax.Array,
                                   margin: float):
    """Fused least-collisions selection + post-selection conflict summary.

    cand_pos: (B, T, 2) candidates for one agent; free_mask (B,);
    paths_pos (n, T, 2) team best paths. Returns
    (ix_best, count, t, a, b, midpoint) — one device call per CT expansion
    instead of the reference's B-candidate Python loop + conflict rebuild.
    """
    counts = candidate_conflict_counts(cand_pos, agent_idx, paths_pos, margin)
    big = jnp.iinfo(jnp.int32).max
    masked = jnp.where(free_mask, counts, big)
    ix = jnp.argmin(masked).astype(jnp.int32)
    new_paths = paths_pos.at[agent_idx].set(cand_pos[ix])
    count, t, a, b, midpoint = team_conflict_summary(new_paths, margin)
    return ix, count, t, a, b, midpoint


@functools.partial(jax.jit, static_argnames=("sweeps",))
def team_reselect(paths_pos_all: jax.Array, ix0: jax.Array, free_all: jax.Array,
                  margin: float, sweeps: int = 2):
    """In-graph Jacobi re-selection among candidate batches.

    paths_pos_all: (A, B, T, 2) every agent's candidate positions;
    ix0: (A,) current best indices; free_all: (A, B). Runs `sweeps`
    rounds where each agent picks its least-conflicts free candidate vs the
    others' current picks, accepting a round only if the team's total
    conflict count strictly decreases. Returns
    (ix (A,), count, t, a, b, midpoint) — ONE device call for the whole
    coordination pass.
    """
    A = paths_pos_all.shape[0]
    big = jnp.iinfo(jnp.int32).max

    def set_count(ix):
        chosen = paths_pos_all[jnp.arange(A), ix]
        coll, _ = team_collision_tensor(chosen, margin)
        return jnp.sum(coll).astype(jnp.int32)

    def sweep(carry, _):
        ix, count = carry
        prev = paths_pos_all[jnp.arange(A), ix]

        def one(cand, free, idx):
            counts = candidate_conflict_counts(cand, idx, prev, margin)
            return jnp.argmin(jnp.where(free, counts, big)).astype(jnp.int32)

        new_ix = jax.vmap(one, in_axes=(0, 0, 0))(
            paths_pos_all, free_all, jnp.arange(A))
        new_count = set_count(new_ix)
        better = new_count < count
        ix = jnp.where(better, new_ix, ix)
        count = jnp.where(better, new_count, count)
        return (ix, count), None

    (ix, count), _ = jax.lax.scan(sweep, (ix0, set_count(ix0)), None,
                                  length=sweeps)
    chosen = paths_pos_all[jnp.arange(A), ix]
    count, t, a, b, mid = team_conflict_summary(chosen, margin)
    return ix, count, t, a, b, mid


@jax.jit
def repair_accept(cand_pos_all: jax.Array, free_all: jax.Array,
                  prev_pos: jax.Array, margin: float):
    """Fused post-processing of a Jacobi repair round.

    cand_pos_all: (A, B, T, 2) repaired candidate positions; free_all (A, B);
    prev_pos (A, T, 2) current best set. Per agent: select the
    least-conflicts free candidate, accept only if it strictly improves on
    the agent's current path AND the agent has a free candidate; then keep
    the repaired SET only if its total conflicts do not increase. Returns
    (accept (A,) bool, ix (A,), count, t, a, b, mid) for the resulting set.
    """
    A = cand_pos_all.shape[0]
    big = jnp.iinfo(jnp.int32).max

    def one(cand, free, idx):
        counts = candidate_conflict_counts(cand, idx, prev_pos, margin)
        masked = jnp.where(free, counts, big)
        ix = jnp.argmin(masked).astype(jnp.int32)
        cur = candidate_conflict_counts(prev_pos[idx][None], idx, prev_pos,
                                        margin)[0]
        return ix, masked[ix], cur

    ix, new_counts, cur_counts = jax.vmap(one, in_axes=(0, 0, 0))(
        cand_pos_all, free_all, jnp.arange(A))
    accept = jnp.any(free_all, axis=-1) & (new_counts < cur_counts)

    new_set = jnp.where(accept[:, None, None],
                        cand_pos_all[jnp.arange(A), ix], prev_pos)
    new_count, t, a, b, mid = team_conflict_summary(new_set, margin)
    old_count, ot, oa, ob, omid = team_conflict_summary(prev_pos, margin)
    keep = new_count <= old_count
    accept = accept & keep
    count = jnp.where(keep, new_count, old_count)
    t = jnp.where(keep, t, ot)
    a = jnp.where(keep, a, oa)
    b = jnp.where(keep, b, ob)
    mid = jnp.where(keep, mid, omid)
    return accept, ix, count, t, a, b, mid


def find_conflicts(paths_l: List[np.ndarray], margin: float,
                   max_conflicts: Optional[int] = None,
                   conflict_types: Tuple = (PointConflict,)) -> List:
    """Build conflict records from padded best paths.

    Mirrors CBS.get_conflicts (reference cbs.py:166-246): paths are
    densified x2 when EdgeConflict is requested; every (t_dense, a, b) hit
    then yields, in the reference's order, a VertexConflict (integral time),
    an EdgeConflict (fractional time), and/or a PointConflict, for whichever
    of those types was requested. With the default (PointConflict,) this is
    the factor-1 fast path: every ordered hit becomes one PointConflict with
    q = pair midpoint.
    """
    from mmd_tpu.common.conflicts import EdgeConflict, VertexConflict

    if len(paths_l) == 0:
        return []
    factor = 2 if EdgeConflict in conflict_types else 1
    paths_pos = jnp.asarray(np.stack([np.asarray(p)[:, :2] for p in paths_l]))
    dense = densify_positions(paths_pos, factor)
    coll, mid = team_collision_tensor(dense, margin)
    idxs = np.argwhere(np.asarray(coll))  # (num, 3) rows [t, a, b], row-major
    mid = np.asarray(mid)
    pos = np.asarray(paths_pos)
    pos_dense = np.asarray(dense)
    out = []
    for t_dense, a, b in idxs[:max_conflicts] if max_conflicts else idxs:
        t_dense, a, b = int(t_dense), int(a), int(b)
        t_from, t_to = t_dense // factor, -(-t_dense // factor)
        m = mid[t_dense, a, b]
        if VertexConflict in conflict_types and t_from == t_to:
            out.append(VertexConflict(agent_ids=[a, b],
                                      q_map={a: pos[a, t_from],
                                             b: pos[b, t_from]},
                                      t=t_from))
        if EdgeConflict in conflict_types and t_from != t_to:
            out.append(EdgeConflict(agent_ids=[a, b],
                                    q_from_map={a: pos[a, t_from],
                                                b: pos[b, t_from]},
                                    q_to_map={a: pos[a, t_to],
                                              b: pos[b, t_to]},
                                    t_from=t_from, t_to=t_to))
        if PointConflict in conflict_types:
            out.append(PointConflict(agent_ids=[a, b],
                                     p_l=[pos_dense[a, t_dense],
                                          pos_dense[b, t_dense]],
                                     q_l=[m, m], t_from=t_from, t_to=t_to))
    return out


def count_conflicts(paths_l: List[np.ndarray], margin: float) -> int:
    """Ordered-pair conflict count without building records."""
    if len(paths_l) == 0:
        return 0
    paths_pos = jnp.asarray(np.stack([np.asarray(p)[:, :2] for p in paths_l]))
    coll, _ = team_collision_tensor(paths_pos, margin)
    return int(jnp.sum(coll))

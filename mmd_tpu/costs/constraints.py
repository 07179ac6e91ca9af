"""Fixed-shape padded constraint sets for in-graph guidance.

TPU-native re-design of MultiPointConstraint + CostConstraint
(reference: mmd/common/constraints.py:46-86, deps/motion_planning_baselines/
mp_baselines/planners/costs/cost_functions.py:275-326).

The reference mutates a Python list of CostConstraint modules per plan call
(guides.py:228-234), which would force a retrace per CBS replan. Here a
constraint set is one padded pytree with static shape (K constraints x P
points); replanning with different constraints is pure data — the jitted
sampler never recompiles.

Cost semantics match CostConstraint.eval (cost_functions.py:297-326): a
waypoint h contributes relu(radius - ||q_h - q_c||) when start <= h < end.
(The reference adds a constant `radius` for out-of-range/out-of-radius
waypoints via its zero-masking trick; constants vanish under the gradient,
which is all guidance uses.)
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree_dataclass

from mmd_tpu.config import params as default_params


@pytree_dataclass
class ConstraintSet:
    """K padded constraints, each with up to P (point, t-range, radius) triples."""

    q: jax.Array           # (K, P, q_dim) constraint centers
    t_range: jax.Array     # (K, P, 2) float [start, end), reference-exclusive end
    radius: jax.Array      # (K, P)
    weight: jax.Array      # (K,) guidance gradient weight (hard/soft)
    point_mask: jax.Array  # (K, P) 1.0 where the point is real
    active: jax.Array      # (K,) 1.0 where the constraint is real

    @property
    def max_constraints(self) -> int:
        return self.q.shape[0]

    @property
    def max_points(self) -> int:
        return self.q.shape[1]


_EMPTY_CSETS: dict = {}


def empty_constraint_set(max_constraints: int, max_points: int, q_dim: int = 2) -> ConstraintSet:
    # Memoized: callers treat the all-zero set as an immutable constant, and
    # a stable object identity lets the closure-baked program cache
    # (mmd_tpu/utils/baked.py) key it without re-digesting per call.
    cached = _EMPTY_CSETS.get((max_constraints, max_points, q_dim))
    if cached is not None:
        return cached
    K, P = max_constraints, max_points
    cached = _EMPTY_CSETS[(max_constraints, max_points, q_dim)] = ConstraintSet(
        q=jnp.zeros((K, P, q_dim)),
        t_range=jnp.zeros((K, P, 2)),
        radius=jnp.zeros((K, P)),
        weight=jnp.zeros((K,)),
        point_mask=jnp.zeros((K, P)),
        active=jnp.zeros((K,)),
    )
    return cached


def pack_constraint_set(
    constraints: Sequence,  # list of mmd_tpu.common.constraints.MultiPointConstraint
    max_constraints: int,
    max_points: int,
    hard_weight: float = default_params.weight_grad_cost_constraints,
    soft_weight: float = default_params.weight_grad_cost_soft_constraints,
    q_dim: int = 2,
) -> ConstraintSet:
    """Pack host-side constraint objects into one padded device pytree.

    Mirrors MPD.__call__'s constraint->CostConstraint conversion + the
    hard/soft weight split (reference: mpd.py:329-342, 409-412).
    """
    K, P = max_constraints, max_points
    q = np.zeros((K, P, q_dim), np.float32)
    t_range = np.zeros((K, P, 2), np.float32)
    radius = np.zeros((K, P), np.float32)
    weight = np.zeros((K,), np.float32)
    point_mask = np.zeros((K, P), np.float32)
    active = np.zeros((K,), np.float32)

    if len(constraints) > K:
        raise ValueError(f"{len(constraints)} constraints > static bound {K}")
    for k, c in enumerate(constraints):
        n = len(c.q_l)
        if n > P:
            raise ValueError(f"constraint {k} has {n} points > static bound {P}")
        # Vectorized fill — soft constraints carry O(n_agents * H) points.
        q[k, :n] = np.stack([np.asarray(p, np.float32)[:q_dim] for p in c.q_l])
        # Reference mask is start <= h < end (cost_functions.py:303-305)
        # with an *inclusive* declared range; it stores (t0, t1) and masks
        # h < t1, so we keep the raw values.
        t_range[k, :n] = np.asarray(c.t_range_l, np.float32)
        radius[k, :n] = np.asarray(c.radius_l, np.float32)
        point_mask[k, :n] = 1.0
        weight[k] = soft_weight if getattr(c, "is_soft", False) else hard_weight
        active[k] = 1.0

    return ConstraintSet(
        q=jnp.asarray(q), t_range=jnp.asarray(t_range), radius=jnp.asarray(radius),
        weight=jnp.asarray(weight), point_mask=jnp.asarray(point_mask),
        active=jnp.asarray(active),
    )


@pytree_dataclass
class SoftPathConstraints:
    """Specialized per-waypoint constraint group: one keep-out ball per
    (row, waypoint) pair, aligned with the trajectory's time axis.

    This is the shape of ECBS/PP soft constraints (reference cbs.py:468-506:
    one (q, [t, t+1], r) triple per other-agent waypoint): every point
    affects exactly ONE waypoint, so the cost is a (B, R, T) distance tensor
    instead of the generic padded form's (B, K, P, H) — ~H times cheaper.
    The whole group is one cost term with one gradient clip, matching the
    reference's single aggregated MultiPointConstraint.
    """

    points: jax.Array  # (R, T, q_dim) — row r's ball center at waypoint t
    mask: jax.Array    # (R, T) 1.0 where active
    radius: jax.Array  # () scalar
    weight: jax.Array  # () scalar guidance weight (hard/soft)

    @property
    def rows(self) -> int:
        return self.points.shape[0]


def empty_soft_path_constraints(rows: int, horizon: int, q_dim: int = 2) -> SoftPathConstraints:
    return SoftPathConstraints(
        points=jnp.zeros((rows, horizon, q_dim)),
        mask=jnp.zeros((rows, horizon)),
        radius=jnp.asarray(0.0), weight=jnp.asarray(0.0))


def soft_path_cost(q_pos: jax.Array, spc: SoftPathConstraints) -> jax.Array:
    """q_pos: (B, T, q_dim) -> (B,). sum_{r,t} mask * relu(radius - dist)."""
    d = jnp.linalg.norm(q_pos[:, None, :, :] - spc.points[None], axis=-1)  # (B, R, T)
    pen = jnp.maximum(spc.radius - d, 0.0) * spc.mask[None]
    return pen.sum(axis=(1, 2))


def split_soft_path_constraints(constraints_l, horizon: int,
                                row_buckets=(4, 8, 16, 32, 64),
                                min_points: int = 32,
                                hard_weight: float = default_params.weight_grad_cost_constraints,
                                soft_weight: float = default_params.weight_grad_cost_soft_constraints):
    """Split one large per-waypoint constraint out of a constraint list.

    Returns (remaining_constraints, SoftPathConstraints or None). Only a
    single such group is split (the reference creates exactly one per call);
    with several, all stay on the generic path to preserve per-constraint
    gradient clipping.
    """
    path_like = [c for c in constraints_l
                 if len(c.q_l) >= min_points
                 and all(t1 - t0 == 1 for t0, t1 in c.t_range_l)
                 and len(set(c.radius_l)) == 1]
    if len(path_like) != 1:
        return list(constraints_l), None
    c = path_like[0]
    rest = [x for x in constraints_l if x is not c]

    # Group points by waypoint t into rows.
    per_t: dict = {}
    for q, (t0, _t1) in zip(c.q_l, c.t_range_l):
        t = int(t0)
        if 0 <= t < horizon:
            per_t.setdefault(t, []).append(np.asarray(q, np.float32)[:2])
    n_rows = max((len(v) for v in per_t.values()), default=0)
    if n_rows == 0:
        return rest, None
    R = next((b for b in row_buckets if n_rows <= b), None)
    if R is None:
        return list(constraints_l), None
    points = np.zeros((R, horizon, 2), np.float32)
    mask = np.zeros((R, horizon), np.float32)
    for t, pts in per_t.items():
        for r, q in enumerate(pts):
            points[r, t] = q
            mask[r, t] = 1.0
    weight = soft_weight if c.is_soft else hard_weight
    spc = SoftPathConstraints(points=jnp.asarray(points), mask=jnp.asarray(mask),
                              radius=jnp.asarray(float(c.radius_l[0])),
                              weight=jnp.asarray(weight))
    return rest, spc


def constraint_cost_single(q_pos: jax.Array, cset: ConstraintSet, k) -> jax.Array:
    """Cost of constraint k over a batch. q_pos: (B, H, q_dim) -> (B,)."""
    H = q_pos.shape[-2]
    h_idx = jnp.arange(H, dtype=q_pos.dtype)
    qc = cset.q[k]                       # (P, q_dim)
    tr = cset.t_range[k]                 # (P, 2)
    rad = cset.radius[k]                 # (P,)
    pmask = cset.point_mask[k]           # (P,)
    in_range = (h_idx[None, :] >= tr[:, 0:1]) & (h_idx[None, :] < tr[:, 1:2])  # (P, H)
    dist = jnp.linalg.norm(q_pos[:, None, :, :] - qc[None, :, None, :], axis=-1)  # (B, P, H)
    pen = jnp.maximum(rad[None, :, None] - dist, 0.0)
    pen = pen * in_range[None].astype(q_pos.dtype) * pmask[None, :, None]
    return pen.sum(axis=(-1, -2)) * cset.active[k]

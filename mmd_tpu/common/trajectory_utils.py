"""Trajectory helpers mirrored from mmd/common/trajectory_utils.py.

- smooth_trajs: savgol window 10 order 2 (:31-52) — device matmul form
- densify_trajs: linear densify (:54-70)
- are_points_closer_than_margin (:73-92)
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax.numpy as jnp
import numpy as np

from mmd_tpu.utils.interp import smooth_trajs  # noqa: F401 (re-export)


def densify_trajs(trajs: Sequence, n_points_interp: int = 2) -> List:
    """Insert n interior points per segment for each (H, D) path."""
    out = []
    for traj in trajs:
        t = np.asarray(traj)
        if n_points_interp <= 1 or t.shape[0] < 2:
            out.append(t.copy())
            continue
        segs = []
        for a, b in zip(t[:-1], t[1:]):
            alphas = np.linspace(0.0, 1.0, n_points_interp,
                                 endpoint=False)[:, None]
            segs.append((1 - alphas) * a + alphas * b)
        segs.append(t[-1:])
        out.append(np.concatenate(segs, axis=0))
    return out


def are_points_closer_than_margin(points: np.ndarray, margin: float) -> bool:
    """True if ANY pair of points is closer than margin (:73-92)."""
    p = np.asarray(points)
    d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    return bool((d < margin).any())

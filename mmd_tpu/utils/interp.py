"""Trajectory interpolation / smoothing primitives, all jit-compatible.

TPU-native replacements for the reference's host-side scipy / torch helpers:
- `interpolate_points` ~ F.interpolate(..., mode='linear', align_corners=True)
  (reference: deps/torch_robotics/.../fields/distance_fields.py:66-73)
- `interpolate_traj_via_points` ~ per-segment linear densify
  (reference: deps/torch_robotics/.../trajectory/utils.py:73-87)
- `savgol_matrix` / `smooth_trajs` ~ scipy.signal.savgol_filter(window, order)
  (reference: mmd/common/trajectory_utils.py:31-52). Implemented as a single
  precomputed (H, H) smoothing matrix applied as one matmul — exact (including
  scipy's 'interp' edge handling) and MXU-friendly, no host round trip.
- `finite_difference_vector` (reference: torch_utils/trajectory/utils.py:89-100)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def interpolate_points(x: jax.Array, num_points: int) -> jax.Array:
    """Linear resample along the second-to-last axis, align_corners=True.

    x: (..., H, D) -> (..., num_points, D). Differentiable; gradients flow
    back to the support points exactly like torch's F.interpolate(linear).
    """
    H = x.shape[-2]
    if num_points == H:
        return x
    # Source coordinates for each output point (align_corners=True).
    src = jnp.linspace(0.0, H - 1.0, num_points, dtype=x.dtype)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, H - 2)
    frac = (src - lo.astype(x.dtype))[..., None]
    x_lo = jnp.take(x, lo, axis=-2)
    x_hi = jnp.take(x, lo + 1, axis=-2)
    return x_lo * (1.0 - frac) + x_hi * frac


def interpolate_traj_via_points(x: jax.Array, num_interpolation: int) -> jax.Array:
    """Insert `num_interpolation` points per segment (linear).

    x: (..., H, D) -> (..., (H-1)*(num_interpolation+1) + 1, D) if
    num_interpolation > 0 else x. Mirrors the reference classification
    densify (deps/torch_robotics/.../trajectory/utils.py:73-87), which uses
    a vectorized lerp between consecutive waypoints.
    """
    if num_interpolation <= 0:
        return x
    H = x.shape[-2]
    a = x[..., :-1, :]  # (..., H-1, D)
    b = x[..., 1:, :]
    alphas = jnp.linspace(0.0, 1.0, num_interpolation + 1, endpoint=False, dtype=x.dtype)
    # (..., H-1, k+1, D)
    seg = a[..., :, None, :] * (1 - alphas)[None, :, None] + b[..., :, None, :] * alphas[None, :, None]
    flat = seg.reshape(*x.shape[:-2], (H - 1) * (num_interpolation + 1), x.shape[-1])
    return jnp.concatenate([flat, x[..., -1:, :]], axis=-2)


@functools.lru_cache(maxsize=32)
def savgol_matrix(n: int, window: int = 10, order: int = 2) -> np.ndarray:
    """Precompute the (n, n) Savitzky-Golay smoothing matrix.

    smooth(y) = S @ y reproduces scipy.signal.savgol_filter(y, window, order,
    axis=0, mode='interp') exactly (verified in tests). Savgol is linear in
    the input, so the filter is a fixed matrix; applying it as one matmul
    keeps trajectory smoothing on-device (the reference ships trajectories
    to CPU for scipy, mmd/common/trajectory_utils.py:31-52).
    """
    from scipy.signal import savgol_filter

    eye = np.eye(n, dtype=np.float64)
    cols = [savgol_filter(eye[:, i], window, order, mode="interp") for i in range(n)]
    return np.stack(cols, axis=1).astype(np.float32)


def smooth_trajs(trajs: jax.Array, window: int = 10, order: int = 2) -> jax.Array:
    """Savgol-smooth trajectories along the horizon axis.

    trajs: (..., H, D). Equivalent to the reference's smooth_trajs
    (mmd/common/trajectory_utils.py:31), which savgol-filters each dim.
    """
    H = trajs.shape[-2]
    S = jnp.asarray(savgol_matrix(H, window, order), dtype=trajs.dtype)
    return jnp.einsum("ij,...jd->...id", S, trajs)


def finite_difference_vector(x: jax.Array, dt: float = 1.0, method: str = "central") -> jax.Array:
    """Finite differences along the horizon axis (..., H, D).

    reference: deps/torch_robotics/.../trajectory/utils.py:89-100.
    """
    if method == "central":
        inner = (x[..., 2:, :] - x[..., :-2, :]) / (2 * dt)
        first = (x[..., 1:2, :] - x[..., 0:1, :]) / dt
        last = (x[..., -1:, :] - x[..., -2:-1, :]) / dt
        return jnp.concatenate([first, inner, last], axis=-2)
    if method == "forward":
        d = (x[..., 1:, :] - x[..., :-1, :]) / dt
        return jnp.concatenate([d, d[..., -1:, :]], axis=-2)
    if method == "backward":
        d = (x[..., 1:, :] - x[..., :-1, :]) / dt
        return jnp.concatenate([d[..., :1, :], d], axis=-2)
    raise ValueError(method)

"""Velocity-diversity augmentation (scripts/augment_velocity_diversity.py).

The time-reparameterization must preserve geometry exactly (static maps,
envs.py) while adding schedule diversity: holds at start/goal, compressed
motion in between, dataset velocity convention (central differences, rest
endpoints) and a per-trajectory speed cap.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from augment_velocity_diversity import (  # noqa: E402
    augment, central_diff_velocities, time_reparam)


def _toy_trajs(n=5, H=64, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth random polylines from rest to rest.
    a = rng.uniform(-1, 1, size=(n, 2))
    b = rng.uniform(-1, 1, size=(n, 2))
    t = np.linspace(0, 1, H)[None, :, None]
    # min-jerk-like profile => zero endpoint velocity
    s = 10 * t**3 - 15 * t**4 + 6 * t**5
    pos = a[:, None] * (1 - s) + b[:, None] * s
    dt = 5.0 / (H - 1)
    vel = central_diff_velocities(pos, dt)
    return np.concatenate([pos, vel], -1).astype(np.float32), a, b, dt


def test_time_reparam_holds_and_endpoints():
    trajs, a, b, dt = _toy_trajs()
    p = trajs[0, :, :2].astype(np.float64)
    out = time_reparam(p, w_start=10, w_goal=6)
    assert out.shape == p.shape
    # Holds are exact copies of the endpoints.
    np.testing.assert_allclose(out[:11], np.broadcast_to(p[0], (11, 2)),
                               atol=1e-12)
    np.testing.assert_allclose(out[-7:], np.broadcast_to(p[-1], (7, 2)),
                               atol=1e-12)
    # Interior points lie on the original polyline (geometry preserved).
    seg = p[1:] - p[:-1]
    for x in out:
        t = np.clip(np.einsum("ij,ij->i", x - p[:-1], seg)
                    / (np.einsum("ij,ij->i", seg, seg) + 1e-18), 0, 1)
        proj = p[:-1] + t[:, None] * seg
        assert np.linalg.norm(proj - x, axis=1).min() < 1e-9


def test_augment_counts_speed_cap_and_convention():
    trajs, a, b, dt = _toy_trajs()
    aug = augment(trajs, duration=5.0, variants=3, speed_cap=2.8,
                  holds=(8, 16, 24), seed=0)
    n = trajs.shape[0]
    assert aug.shape == (4 * n, 64, 4)
    # Originals pass through untouched.
    np.testing.assert_array_equal(aug[:n], trajs)
    pos, vel = aug[..., :2], aug[..., 2:]
    # Velocity convention: central differences with rest endpoints.
    np.testing.assert_allclose(
        vel[:, 1:-1], (pos[:, 2:] - pos[:, :-2]) / (2 * dt), atol=1e-4)
    np.testing.assert_allclose(vel[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(vel[:, -1], 0.0, atol=1e-6)
    # Speed cap respected by every variant.
    assert np.linalg.norm(vel, axis=-1).max() <= 2.8 + 1e-3
    # Start/goal positions preserved for every variant.
    for k in range(1, 4):
        np.testing.assert_allclose(aug[k * n:(k + 1) * n, 0, :2],
                                   trajs[:, 0, :2], atol=1e-6)
        np.testing.assert_allclose(aug[k * n:(k + 1) * n, -1, :2],
                                   trajs[:, -1, :2], atol=1e-6)


def test_augment_adds_schedule_diversity():
    trajs, a, b, dt = _toy_trajs()
    aug = augment(trajs, duration=5.0, variants=3, speed_cap=100.0,
                  holds=(16,), seed=0)
    n = trajs.shape[0]
    speed = np.linalg.norm(aug[..., 2:], axis=-1)
    # Variant pass 0 holds at the start, pass 1 at the goal.
    assert (speed[n:2 * n, :12] < 1e-6).all()
    assert (speed[2 * n:3 * n, -12:] < 1e-6).all()
    # Compressed motion is faster than the original where it moves.
    assert speed[n:2 * n].max() > speed[:n].max()

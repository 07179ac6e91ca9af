import time

import numpy as np
import pytest

from mmd_tpu.datagen.host_collision import HostCollisionChecker
from mmd_tpu.datagen.native_rrt import (
    NativeRRTConnect,
    NativeRRTStar,
    native_available,
)
from mmd_tpu.datagen.rrt import RRTConnect
from mmd_tpu.envs.envs import make_env

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


def _checker():
    return HostCollisionChecker(make_env("EnvConveyor2D"), 0.05)


def test_native_rrt_connect_finds_free_path():
    checker = _checker()
    p = NativeRRTConnect(checker, np.array([-0.8, -0.8]), np.array([0.8, 0.8]),
                         seed=1)
    path = p.optimize()
    assert path is not None
    np.testing.assert_allclose(path[0], [-0.8, -0.8], atol=1e-5)
    np.testing.assert_allclose(path[-1], [0.8, 0.8], atol=1e-5)
    assert not checker.in_collision(path).any()
    # Consecutive waypoints connected by free segments.
    for a, b in zip(path[:-1], path[1:]):
        assert checker.segment_free(a, b)


def test_native_rrt_star_finds_free_path():
    checker = HostCollisionChecker(make_env("EnvHighways2D"), 0.05)
    p = NativeRRTStar(checker, np.array([-0.5, -0.5]), np.array([0.5, 0.5]),
                      seed=2)
    path = p.optimize()
    assert path is not None
    assert not checker.in_collision(path).any()


def test_native_rrt_deterministic_per_seed():
    checker = _checker()
    p1 = NativeRRTConnect(checker, np.array([-0.8, -0.8]), np.array([0.8, 0.8]), seed=7)
    p2 = NativeRRTConnect(checker, np.array([-0.8, -0.8]), np.array([0.8, 0.8]), seed=7)
    np.testing.assert_allclose(p1.optimize(), p2.optimize())


def test_native_rrt_invalid_endpoints():
    checker = _checker()
    p = NativeRRTConnect(checker, np.array([0.0, 0.0]),  # inside middle box
                         np.array([0.8, 0.8]), seed=3)
    assert p.optimize() is None


def test_native_faster_than_python():
    checker = _checker()
    start, goal = np.array([-0.8, -0.8]), np.array([0.8, 0.8])

    t0 = time.perf_counter()
    for s in range(5):
        NativeRRTConnect(checker, start, goal, seed=s).optimize()
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    RRTConnect(checker, start, goal, rng=np.random.default_rng(0)).optimize()
    t_python = time.perf_counter() - t0
    # 5 native runs beat ONE python run comfortably.
    assert t_native < t_python, (t_native, t_python)

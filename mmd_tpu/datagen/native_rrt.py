"""ctypes bindings for the native C++ RRT planners (native/rrt.cpp).

The shared library builds lazily with g++ on first use and is cached next to
the source; every caller falls back to the pure-Python planners
(mmd_tpu/datagen/rrt.py) when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "rrt.cpp")
_SO = os.path.join(_NATIVE_DIR, "librrt.so")

_lib = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib_failed = True
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    lib.rrt_connect_plan.restype = ctypes.c_int
    lib.rrt_connect_plan.argtypes = [
        dp, dp, ctypes.c_int, dp, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_uint64, dp, dp, dp, ctypes.c_int]
    lib.rrt_star_plan.restype = ctypes.c_int
    lib.rrt_star_plan.argtypes = [
        dp, dp, ctypes.c_int, dp, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_uint64,
        dp, dp, dp, ctypes.c_int]
    _lib = lib
    return _lib


def _as_dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class _NativePlannerBase:
    """Matches the .optimize() protocol of the Python planners."""

    MAX_PTS = 8192

    def __init__(self, checker, start_state_pos, goal_state_pos,
                 n_iters: int = 10000, step_size: float = 0.01,
                 n_radius: float = 0.05, seed: int = 0, max_time=None,
                 rewire_radius: float = 0.2, **_):
        self.boxes = np.ascontiguousarray(checker.centers, np.float64)
        self.half_sizes = np.ascontiguousarray(checker.half_sizes, np.float64)
        self.qlim = np.ascontiguousarray(
            np.concatenate([checker.q_min, checker.q_max]), np.float64)
        self.margin = float(checker.margin)
        self.start_state_pos = np.asarray(start_state_pos, np.float64)[:2].copy()
        self.goal_state_pos = np.asarray(goal_state_pos, np.float64)[:2].copy()
        self.n_iters = n_iters
        self.step_size = step_size
        self.n_radius = n_radius
        self.rewire_radius = rewire_radius
        self.seed = int(seed)


class NativeRRTConnect(_NativePlannerBase):
    def optimize(self, **_) -> Optional[np.ndarray]:
        lib = get_lib()
        assert lib is not None
        out = np.zeros((self.MAX_PTS, 2), np.float64)
        n = lib.rrt_connect_plan(
            _as_dp(self.boxes), _as_dp(self.half_sizes), len(self.boxes),
            _as_dp(self.qlim), self.margin, self.step_size, self.n_radius,
            self.n_iters, self.seed, _as_dp(self.start_state_pos),
            _as_dp(self.goal_state_pos), _as_dp(out), self.MAX_PTS)
        return out[:n].astype(np.float32) if n > 0 else None


class NativeRRTStar(_NativePlannerBase):
    def optimize(self, **_) -> Optional[np.ndarray]:
        lib = get_lib()
        assert lib is not None
        out = np.zeros((self.MAX_PTS, 2), np.float64)
        n = lib.rrt_star_plan(
            _as_dp(self.boxes), _as_dp(self.half_sizes), len(self.boxes),
            _as_dp(self.qlim), self.margin, self.step_size, self.n_radius,
            self.rewire_radius, self.n_iters, self.seed,
            _as_dp(self.start_state_pos), _as_dp(self.goal_state_pos),
            _as_dp(out), self.MAX_PTS)
        return out[:n].astype(np.float32) if n > 0 else None


def native_available() -> bool:
    return get_lib() is not None

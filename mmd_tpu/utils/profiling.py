"""Profiling helpers: the TPU analog of the reference's TimerCUDA regions
(torch_timer.py) plus real profiler traces the reference lacks.

Usage:
    with trace_region("plan"):          # wall time, device-synced
        planner()
    with profiler_trace("/tmp/trace"):  # full XLA profiler dump
        planner()
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_region(name: str, log_fn=print) -> Iterator[None]:
    jax.effects_barrier()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        jax.effects_barrier()
        log_fn(f"[trace] {name}: {time.perf_counter() - t0:.4f}s")


@contextlib.contextmanager
def profiler_trace(log_dir: str) -> Iterator[None]:
    """XLA profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

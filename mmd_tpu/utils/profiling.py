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


@contextlib.contextmanager
def compile_time_monitor(out: Optional[dict] = None) -> Iterator[dict]:
    """Accumulate XLA trace+lower+compile seconds spent inside the block.

    Sweep latency honesty: per-trial planning_time includes whatever jit
    variants the trial compiles first (the reference pays the analogous
    torch warmup inside its timed region too, diffusion_model_base.py:314).
    Rather than double-planning to warm every shape bucket, record the
    compile share separately so cross-planner comparisons at low densities
    can be read compile-free. Yields a dict whose "compile_s" accumulates
    /jax/core/compile/* event durations observed while the block runs.
    """
    from jax import monitoring

    acc = out if out is not None else {}
    acc.setdefault("compile_s", 0.0)

    def _listener(key: str, dur: float, **kw) -> None:
        if key.startswith("/jax/core/compile/"):
            acc["compile_s"] += dur

    monitoring.register_event_duration_secs_listener(_listener)
    try:
        yield acc
    finally:
        monitoring.unregister_event_duration_listener(_listener)


# Per-chip peak dense-matmul throughput (FLOP/s) by device kind, bf16 on
# the MXU — the denominator convention for every MFU number this repo
# reports (f32 programs are also quoted against the bf16 peak; on TPU the
# MXU is a bf16-multiply/f32-accumulate array, so there is no separate
# "f32 peak" to quote). Public figures: v4 275 TF, v5e 197 TF, v5p 459 TF,
# v6e 918 TF, v2 45 TF, v3 123 TF.
_TPU_PEAK_BF16 = {
    "v5 lite": 197e12,   # TPU v5e; jax device_kind "TPU v5 lite"
    "v5e": 197e12,
    "v5p": 459e12,
    "v5": 459e12,
    "v4": 275e12,
    "v6": 918e12,
    "v3": 123e12,
    "v2": 45e12,
}


def tpu_peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s of `device` (default: jax.devices()[0]), or None
    when the kind is unrecognized (e.g. the CPU test backend)."""
    d = device if device is not None else jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for sub, peak in _TPU_PEAK_BF16.items():
        if sub in kind:
            return peak
    return None

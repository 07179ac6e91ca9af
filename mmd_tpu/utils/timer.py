"""Device-accurate timing, the TPU analog of the reference's TimerCUDA
(reference: deps/torch_robotics/.../torch_utils/torch_timer.py:7-109).

JAX dispatch is async; we call `jax.block_until_ready` on entry/exit so the
measured interval covers all device work enqueued inside the block.
"""
from __future__ import annotations

import time

import jax


class TimerJax:
    """Context manager: `with TimerJax() as t: ...; t.elapsed`."""

    def __init__(self, sync_on_enter: bool = True):
        self.sync_on_enter = sync_on_enter
        self.elapsed = 0.0

    def __enter__(self):
        if self.sync_on_enter:
            jax.effects_barrier()
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        jax.effects_barrier()
        self.elapsed = time.perf_counter() - self._start
        return False


def block(tree):
    """Block until every array in a pytree is ready; returns the tree."""
    return jax.block_until_ready(tree)

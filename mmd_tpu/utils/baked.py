"""Closure-baked jit program cache.

Passing planner invariants (UNet params, schedule, SDF scene, normalizer,
savgol filter, robot/guide scalars) as jit ARGUMENTS costs ~0.35 s per call
on a tunneled TPU: numpy leaves (params fresh off msgpack) re-upload every
call, and the remaining per-operand dispatch + lost constant-folding add
the rest (measured 0.65 s arg-passing vs 0.29 s fully-baked for the
10-agent sequential soft root). The hot device programs therefore BAKE
every invariant operand into a closure-jitted program and pass only the
per-call data (hard-cond values, PRNG keys, team paths, constraint
buffers, conflict scalars).

Cache keys digest each invariant by VALUE (shape/dtype/content hash),
memoized by object identity so the per-call cost is dict lookups: value
keying lets every trial in a sweep — which rebuilds MPD objects but shares
params/dataset via the model cache — reuse one compiled program.
"""
from __future__ import annotations

from typing import Callable

import jax
import numpy as np

_BAKE_KEYS: dict = {}     # id(obj) -> ((digest...), strong ref)
PROGRAM_CACHE: dict = {}


def bake_key(x):
    """Value digest of a jit operand destined to be baked as a constant."""
    if x is None or isinstance(x, (bool, int, float, str)):
        return x
    k = id(x)
    hit = _BAKE_KEYS.get(k)
    if hit is None:
        leaves, treedef = jax.tree_util.tree_flatten(x)
        parts = []
        for leaf in leaves:
            if leaf is None or isinstance(leaf, (bool, int, float, str)):
                parts.append(leaf)
                continue
            a = np.asarray(leaf)
            parts.append((a.shape, str(a.dtype), hash(a.tobytes())))
        hit = ((str(treedef), tuple(parts)), x)
        _BAKE_KEYS[k] = hit
    return hit[0]


def baked_program(key: tuple, build: Callable[[], Callable]):
    """Look up (or build + jit + cache) the closure program for `key`."""
    fn = PROGRAM_CACHE.get(key)
    if fn is None:
        fn = jax.jit(build())
        PROGRAM_CACHE[key] = fn
    return fn

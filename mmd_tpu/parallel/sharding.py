"""Device-mesh helpers for multi-chip execution.

The reference is single-GPU; its parallelism axes are batch-of-trajectories
and (sequentially executed) agents/tiles (SURVEY.md section 2.5). On TPU the
natural mesh axes are:
- 'dp'    : trajectory-batch / training data parallelism
- 'agent' : one mesh slot per robot for team-batched planning
- 'tile'  : one mesh slot per skeleton tile (expert-parallel analog of the
            stacked per-tile UNets)

XLA inserts the collectives (psum for gradient reduction, all-gathers at
sharding boundaries) from the annotations — no hand-written NCCL analog is
needed. N-D meshes compose the axes, e.g. ('agent', 'dp') shards a team of
A robots over one axis and each robot's sample batch over the other.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[Union[int, Sequence[int]]] = None,
              axis_names: Sequence[str] = ("dp",)) -> Mesh:
    """Build an N-D mesh over the available devices.

    `n_devices`: total device count (factored automatically across the
    axes, largest-first) or an explicit per-axis shape matching
    `axis_names`. 1-D meshes take the first n devices; N-D meshes reshape
    row-major, so neighboring mesh coordinates map to neighboring devices
    (ICI locality on real TPU topologies).
    """
    devs = jax.devices()
    if isinstance(n_devices, (list, tuple)):
        shape = tuple(int(s) for s in n_devices)
        if len(shape) != len(axis_names):
            raise ValueError(f"shape {shape} vs axis_names {axis_names}")
    else:
        n = int(n_devices or len(devs))
        shape = _factor_mesh(n, len(axis_names))
    total = int(np.prod(shape))
    if total > len(devs):
        raise ValueError(f"mesh {shape} needs {total} devices, "
                         f"have {len(devs)}")
    arr = np.array(devs[:total]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def _factor_mesh(n: int, n_axes: int) -> tuple:
    """Factor n into n_axes balanced dims: each leading axis takes the
    largest divisor of the remainder not exceeding the balanced share
    rem**(1/axes_left)."""
    shape = [1] * n_axes
    rem = n
    for i in range(n_axes - 1):
        target = max(1, round(rem ** (1.0 / (n_axes - i))))
        best = 1
        for cand in range(1, rem + 1):
            if rem % cand == 0 and best <= cand <= target:
                best = cand
        shape[i] = best
        rem //= best
    shape[-1] = rem
    return tuple(shape)


def shard_leading_axis(tree, mesh: Mesh, axis: str = "dp"):
    """Place every array in the pytree with its leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def shard_axes(tree, mesh: Mesh, spec: P):
    """Place every array in the pytree with an explicit PartitionSpec —
    e.g. P('agent', 'dp') shards axis 0 over agents and axis 1 over the
    sample batch of a (A, B, H, D) team tensor."""
    sharding = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)

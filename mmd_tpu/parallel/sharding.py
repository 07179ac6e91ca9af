"""Device-mesh helpers for multi-chip execution.

The reference is single-GPU; its parallelism axes are batch-of-trajectories
and (sequentially executed) agents/tiles (SURVEY.md section 2.5). On TPU the
natural mesh axes are:
- 'dp'    : trajectory-batch / training data parallelism
- 'agent' : one mesh slot per robot for team-batched planning

XLA inserts the collectives (psum for gradient reduction) from sharding
annotations — no hand-written NCCL analog is needed.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp",)) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(axis_names) == 1:
        arr = np.array(devs[:n])
    else:
        raise NotImplementedError("only 1-D meshes are used so far")
    return Mesh(arr, axis_names)


def shard_leading_axis(tree, mesh: Mesh, axis: str = "dp"):
    """Place every array in the pytree with its leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)

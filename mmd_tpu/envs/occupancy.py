"""Binary occupancy grid.

Mirrors OccupancyMap (reference: deps/torch_robotics/torch_robotics/
environments/occupancy_map.py:62-172): a cell grid stamped from the env's
primitives, point-collision lookups by floor indexing. In the reference this
backs only the (off-by-default) occupancy-map task mode and RRT pre-sample
path (tasks.py:40-42).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree_dataclass

from mmd_tpu.envs.envs import Env2D


@pytree_dataclass
class OccupancyMap:
    lower: jax.Array   # (2,)
    upper: jax.Array   # (2,)
    grid: jax.Array    # (N0, N1) bool — True = occupied

    def get_collisions(self, x: jax.Array) -> jax.Array:
        """x: (..., 2) -> (...,) bool occupancy lookup
        (reference occupancy_map.py:100-130)."""
        n = jnp.asarray(self.grid.shape, jnp.int32)
        span = self.upper - self.lower
        idx = jnp.floor((x - self.lower) / span * n.astype(x.dtype)).astype(jnp.int32)
        oob = jnp.any((idx < 0) | (idx >= n), axis=-1)
        idx = jnp.clip(idx, 0, n - 1)
        return self.grid[idx[..., 0], idx[..., 1]] | oob


def build_occupancy_map(env: Env2D, cell_size: float = 0.01,
                        margin: float = 0.0) -> OccupancyMap:
    """Stamp env primitives into a binary grid
    (reference: env_base.py:101, primitives add_to_occupancy_map :121,233)."""
    lo, hi = env.limits[0], env.limits[1]
    n = [int(np.ceil((hi[d] - lo[d]) / cell_size)) for d in range(2)]
    xs = np.linspace(lo[0], hi[0], n[0], dtype=np.float32)
    ys = np.linspace(lo[1], hi[1], n[1], dtype=np.float32)
    pts = np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=-1).reshape(-1, 2)
    sdf = np.asarray(env.compute_sdf_exact(jnp.asarray(pts)))
    grid = (sdf < margin).reshape(n)
    return OccupancyMap(lower=jnp.asarray(lo), upper=jnp.asarray(hi),
                       grid=jnp.asarray(grid))

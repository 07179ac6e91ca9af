"""Planar disk robot: identity FK, vectorized robot-robot collision.

TPU-native re-design of RobotPlanarDisk
(reference: deps/torch_robotics/torch_robotics/robots/robot_planar_disk.py).
State layout: [x, y, vx, vy]; positions are x[..., :q_dim], velocities
x[..., q_dim:2*q_dim] (reference: robot_base.py:149-161).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree_dataclass

from mmd_tpu.config import params as default_params


@pytree_dataclass
class DiskRobot:
    radius: float = 0.05
    q_min: jax.Array = None  # (2,)
    q_max: jax.Array = None  # (2,)

    @staticmethod
    def make(radius: float = default_params.robot_planar_disk_radius,
             q_limits=((-1.0, -1.0), (1.0, 1.0))) -> "DiskRobot":
        lim = np.asarray(q_limits, np.float32)
        return DiskRobot(radius=radius,
                         q_min=jnp.asarray(lim[0]), q_max=jnp.asarray(lim[1]))

    @property
    def q_dim(self) -> int:
        return 2

    @property
    def collision_link_margin(self) -> float:
        # reference: robot_planar_disk.py:68 (1.1 * radius)
        return 1.1 * self.radius

    @property
    def rr_margin(self) -> float:
        # reference: robot_planar_disk.py:186 (2.1 * radius)
        return 2.1 * self.radius

    def get_position(self, x: jax.Array) -> jax.Array:
        return x[..., : self.q_dim]

    def get_velocity(self, x: jax.Array) -> jax.Array:
        return x[..., self.q_dim: 2 * self.q_dim]

    def sample_q(self, key: jax.Array, n: int) -> jax.Array:
        return jax.random.uniform(key, (n, self.q_dim),
                                  minval=self.q_min, maxval=self.q_max)

    def within_limits(self, q: jax.Array) -> jax.Array:
        """(..., q_dim) -> (...) bool, all dims inside joint limits."""
        return jnp.all((q >= self.q_min) & (q <= self.q_max), axis=-1)


def check_rr_collisions(points: jax.Array, margin: float):
    """Pairwise robot-robot collision check.

    points: (..., n_robots, q_dim). Returns (collisions (..., n, n) bool with
    False diagonal, midpoints (..., n, n, q_dim) of colliding pairs — NaN
    where no collision), matching the reference
    (robot_planar_disk.py:173-203). Pure function: vmap/jit it over whole
    trajectory batches — the reference runs it per padded-path stack in CBS.
    """
    a = points[..., :, None, :]
    b = points[..., None, :, :]
    dist = jnp.linalg.norm(a - b, axis=-1)
    n = points.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    coll = (dist < margin) & ~eye
    mid = 0.5 * (a + b)
    mid = jnp.where(coll[..., None], mid, jnp.nan)
    return coll, mid

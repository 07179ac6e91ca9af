"""Trajectory dataset: storage, normalization, hard conditions.

TPU-native re-design of TrajectoryDatasetBase/TrajectoryDataset
(reference: mmd/datasets/trajectories.py:23-249). Data lives in one
(N, H, D) device array; batches are index-gathers; normalization is a
LimitsNormalizer fit on the data (reference :28, :80-82). Storage format is
.npz (`trajs-free.npz` with array `trajs`) plus a small metadata.yaml —
replacing the reference's torch .pt pickles.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from mmd_tpu.datasets.normalization import (LimitsNormalizer,
                                            make_normalizer,
                                            safe_limits_from_data)
from mmd_tpu.envs.envs import make_env
from mmd_tpu.models.diffusion import HardConds
from mmd_tpu.robots.disk import DiskRobot
from mmd_tpu.tasks.task import PlanningTask


def model_id(env_name: str, robot_name: str = "RobotPlanarDisk") -> str:
    """Checkpoint/dataset directory naming, e.g. 'EnvEmpty2D-RobotPlanarDisk'
    (reference: inference_multi_agent.py:388, mpd.py:116)."""
    return f"{env_name}-{robot_name}"


def env_name_from_model_id(mid: str) -> str:
    return mid.split("-")[0]


class TrajectoryDataset:
    """Holds collision-free trajectories for one (env, robot) pair."""

    def __init__(self, trajs: np.ndarray, env_name: str,
                 robot: Optional[DiskRobot] = None,
                 duration: float = 5.0,
                 normalizer: str = "SafeLimitsNormalizer"):
        assert trajs.ndim == 3, trajs.shape
        self.env_name = env_name
        # Physical trajectory duration in seconds. The reference fixes 5.0 s
        # over H=64 (mmd_params.py:34, dt=5/64); longer-horizon variants
        # (e.g. H=128) keep dt constant by scaling duration with H.
        self.duration = float(duration)
        self.robot = robot or DiskRobot.make()
        self.task = PlanningTask(make_env(env_name), self.robot)
        self.trajs = jnp.asarray(trajs, jnp.float32)          # (N, H, D)
        self.n_trajs, self.n_support_points, self.state_dim = trajs.shape
        # reference: normalizer named by kwarg, fit on the trajectory field
        # (:28 default 'LimitsNormalizer', :80-82); all four reference names
        # are accepted. Our default is the safe variant — identical to
        # LimitsNormalizer on real data (no constant dims), and it guards
        # degenerate synthetic fixtures.
        self.normalizer = make_normalizer(normalizer, self.trajs)
        self.trajs_normalized = self.normalizer.normalize(self.trajs)

    # ------------------------------------------------------------- batches
    def sample_batch(self, key: jax.Array, batch_size: int,
                     start_idx: int = 0) -> Tuple[jax.Array, HardConds]:
        """Random batch of normalized trajs + per-sample hard conditions.

        Training hard conds pin each trajectory's own (normalized) start and
        goal states (reference: trajectories.py:153-168, 216-239).
        `start_idx` excludes a held-out validation prefix from the sampling
        range (the reference uses a real 95/5 random_split,
        train_loaders.py:59-82).
        """
        idx = jax.random.randint(key, (batch_size,), start_idx, self.n_trajs)
        batch = self.trajs_normalized[idx]
        H = self.n_support_points
        mask = jnp.zeros((H, 1)).at[0].set(1.0).at[H - 1].set(1.0)
        return batch, HardConds(mask=mask, values=batch)

    # -------------------------------------------------- inference hard conds
    def get_hard_conditions(self, start_pos: jax.Array, goal_pos: jax.Array,
                            normalize: bool = True) -> HardConds:
        """{0: [start_pos, 0 vel], H-1: [goal_pos, 0 vel]}, normalized
        (reference: trajectories.py:216-239)."""
        q_dim = start_pos.shape[-1]
        start = jnp.concatenate([start_pos, jnp.zeros(q_dim)])
        goal = jnp.concatenate([goal_pos, jnp.zeros(q_dim)])
        if normalize:
            start = self.normalizer.normalize(start)
            goal = self.normalizer.normalize(goal)
        H = self.n_support_points
        mask = jnp.zeros((H, 1)).at[0].set(1.0).at[H - 1].set(1.0)
        values = jnp.zeros((H, self.state_dim))
        values = values.at[0].set(start).at[H - 1].set(goal)
        return HardConds(mask=mask, values=values)

    def unnormalize_trajectories(self, x: jax.Array) -> jax.Array:
        return self.normalizer.unnormalize(x)

    def normalize_trajectories(self, x: jax.Array) -> jax.Array:
        return self.normalizer.normalize(x)

    # --------------------------------------------------------------- disk io
    def save(self, root: str, mid: Optional[str] = None):
        mid = mid or model_id(self.env_name)
        d = os.path.join(root, mid)
        os.makedirs(d, exist_ok=True)
        np.savez_compressed(os.path.join(d, "trajs-free.npz"),
                            trajs=np.asarray(self.trajs))
        with open(os.path.join(d, "metadata.yaml"), "w") as f:
            yaml.safe_dump({"env_id": self.env_name,
                            "robot_id": "RobotPlanarDisk",
                            "num_trajectories": int(self.n_trajs),
                            "horizon": int(self.n_support_points),
                            "duration": float(self.duration),
                            "state_dim": int(self.state_dim)}, f)

    @staticmethod
    def load(root: str, mid: str) -> "TrajectoryDataset":
        d = os.path.join(root, mid)
        with open(os.path.join(d, "metadata.yaml")) as f:
            meta = yaml.safe_load(f)
        trajs = np.load(os.path.join(d, "trajs-free.npz"))["trajs"]
        return TrajectoryDataset(trajs, meta["env_id"],
                                 duration=meta.get("duration", 5.0))

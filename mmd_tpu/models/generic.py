"""Generic small models.

Mirrors mmd/models/generic/{mlp_model,no_model}.py and the PointUnet
variant (temporal_unet.py:268): simple alternatives to the TemporalUnet for
experimentation.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmd_tpu.models.temporal_unet import TimeEncoder, mish


class MLPModel(nn.Module):
    """Plain MLP denoiser over the flattened trajectory
    (reference: mlp_model.py:9)."""

    state_dim: int = 4
    horizon: int = 64
    hidden_dims: Sequence[int] = (256, 256)
    time_emb_dim: int = 32

    @nn.compact
    def __call__(self, x, time):  # (B, H, D), (B,)
        B, H, D = x.shape
        t_emb = TimeEncoder(32, self.time_emb_dim)(time)
        h = jnp.concatenate([x.reshape(B, H * D), t_emb], axis=-1)
        for d in self.hidden_dims:
            h = mish(nn.Dense(d)(h))
        return nn.Dense(H * D)(h).reshape(B, H, D)


class NoModel(nn.Module):
    """Identity placeholder (reference: no_model.py:5)."""

    @nn.compact
    def __call__(self, x, time):
        return x


class PointUnet(nn.Module):
    """Per-waypoint MLP denoiser (reference: temporal_unet.py:268) — no
    temporal mixing; useful as a sanity baseline."""

    state_dim: int = 4
    hidden_dim: int = 64
    time_emb_dim: int = 32

    @nn.compact
    def __call__(self, x, time):  # (B, H, D), (B,)
        t_emb = TimeEncoder(32, self.time_emb_dim)(time)   # (B, E)
        t_b = jnp.repeat(t_emb[:, None, :], x.shape[1], axis=1)
        h = jnp.concatenate([x, t_b], axis=-1)
        h = mish(nn.Dense(self.hidden_dim)(h))
        h = mish(nn.Dense(self.hidden_dim)(h))
        return nn.Dense(self.state_dim)(h)

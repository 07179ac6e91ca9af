"""Temporal 1D-conv UNet denoiser in flax.linen.

TPU-native re-design of TemporalUnet
(reference: mmd/models/diffusion_models/temporal_unet.py:23-174 and
mmd/models/layers/layers.py: Conv1dBlock:279, ResidualTemporalBlock:326,
TimeEncoder:232, SinusoidalPosEmb:246, Downsample1d:261, Upsample1d:270).

Architecture matches the reference defaults for the MMD pipeline: input
(B, H, D) with D=4, channel dims 32*(1,2,4), kernel 5 conv blocks with
GroupNorm(8)+Mish, FiLM-style additive time conditioning, stride-2 down /
transposed-conv up, skip concatenation, no attention, no context
(start/goal enter via inpainting). Layout is channels-last (B, H, C) —
the natural XLA/TPU layout, so no rearranges are needed.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

UNET_DIM_MULTS = {0: (1, 2, 4), 1: (1, 2, 4, 8)}  # reference: temporal_unet.py:17-19


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class SinusoidalPosEmb(nn.Module):
    """reference: layers.py:246-258."""

    dim: int

    @nn.compact
    def __call__(self, t):  # (B,) -> (B, dim)
        half = self.dim // 2
        freq = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / (half - 1)))
        ang = t.astype(jnp.float32)[:, None] * freq[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimeEncoder(nn.Module):
    """Sin(dim) -> Linear(4*dim) -> Mish -> Linear(out) (layers.py:232-243)."""

    dim: int
    dim_out: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, t):
        h = SinusoidalPosEmb(self.dim)(t)
        h = nn.Dense(self.dim * 4, dtype=self.dtype)(h)
        h = mish(h)
        return nn.Dense(self.dim_out, dtype=self.dtype)(h)


class Conv1dBlock(nn.Module):
    """Conv1d -> GroupNorm -> Mish (layers.py:279-296)."""

    out_channels: int
    kernel_size: int = 5
    n_groups: int = 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):  # (B, H, C)
        pad = self.kernel_size // 2
        x = nn.Conv(self.out_channels, (self.kernel_size,), padding=pad,
                    dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.n_groups, dtype=self.dtype)(x)
        return mish(x)


class ResidualTemporalBlock(nn.Module):
    """Two conv blocks + FiLM time-add + 1x1 residual (layers.py:326-359)."""

    out_channels: int
    kernel_size: int = 5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, c):  # x: (B, H, C), c: (B, E)
        h = Conv1dBlock(self.out_channels, self.kernel_size,
                        dtype=self.dtype)(x)
        cond = nn.Dense(self.out_channels, dtype=self.dtype)(mish(c))
        h = h + cond[:, None, :]
        h = Conv1dBlock(self.out_channels, self.kernel_size,
                        dtype=self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            res = nn.Conv(self.out_channels, (1,), dtype=self.dtype)(x)
        else:
            res = x
        return h + res


class LinearAttention(nn.Module):
    """Linear self-attention over the time axis (layers.py:210-229) —
    optional (`self_attention=True`); the MMD pipeline ships with it off."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):  # (B, H, C)
        B, H, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1,), use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, H, self.heads, self.dim_head).transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)       # (B, h, d, H)
        q = jax.nn.softmax(q, axis=-2)
        k = jax.nn.softmax(k, axis=-1)
        ctx = jnp.einsum("bhdn,bhen->bhde", k, v)     # (B, h, d, d)
        out = jnp.einsum("bhde,bhdn->bhen", ctx, q)   # (B, h, d, H)
        out = out.transpose(0, 3, 1, 2).reshape(B, H, hidden)
        return nn.Conv(C, (1,))(out)


class PreNormResidual(nn.Module):
    """Residual(PreNorm(fn)) wrapper (layers.py:177-195)."""

    fn: nn.Module

    @nn.compact
    def __call__(self, x):
        return x + self.fn(nn.LayerNorm()(x))


class CrossAttention(nn.Module):
    """Multi-head cross-attention of the temporal features onto a context
    sequence (layers_attention.py:86-148 CrossAttention inside
    SpatialTransformer:151) — used by conditioning_type='attention'."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x, context):  # x: (B, H, C), context: (B, T, E)
        B, H, C = x.shape
        hidden = self.heads * self.dim_head
        q = nn.Dense(hidden, use_bias=False)(x)
        k = nn.Dense(hidden, use_bias=False)(context)
        v = nn.Dense(hidden, use_bias=False)(context)

        def heads(t):
            return t.reshape(*t.shape[:2], self.heads,
                             self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)          # (B, h, ., d)
        att = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(self.dim_head),
            axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, hidden)
        return nn.Dense(C)(out)


class ContextCrossBlock(nn.Module):
    """PreNorm residual cross-attention (attention conditioning spots,
    temporal_unet.py:152-170)."""

    @nn.compact
    def __call__(self, x, context):
        return x + CrossAttention()(nn.LayerNorm()(x), context)


class Downsample1d(nn.Module):
    """Stride-2 conv (layers.py:261-267)."""

    dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (3,), strides=(2,), padding=1,
                       dtype=self.dtype)(x)


class Upsample1d(nn.Module):
    """Transposed conv, kernel 4 stride 2 (layers.py:270-276)."""

    dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.dim, (4,), strides=(2,),
                                padding="SAME", dtype=self.dtype)(x)


class TemporalUnet(nn.Module):
    """Denoiser: (B, H, D), (B,) timestep -> (B, H, D) epsilon prediction.

    Context conditioning modes (reference temporal_unet.py:44-62, 121-152;
    the MMD pipeline uses None — start/goal enter via inpainting):
      None          — unconditional (default)
      'concatenate' — context tiled over the horizon and concatenated to
                      the (optionally MLP-embedded) state channels
      'attention'   — cross-attention onto the (B, E) context at every
                      resolution, after the self-attention spot
      'default'     — context concatenated to the time embedding
    """

    state_dim: int = 4
    unet_input_dim: int = 32
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    time_emb_dim: int = 32
    self_attention: bool = False  # temporal_unet.py:82-92 optional attention
    conditioning_type: str = ""   # "", 'concatenate', 'attention', 'default'
    conditioning_embed_dim: int = 32
    # Computation dtype (flax convention): params stay float32
    # (param_dtype default) and are cast at use. dtype=jnp.bfloat16 runs
    # every conv/dense/norm on the MXU's native bf16 path and halves the
    # activation HBM traffic; None keeps exact float32 semantics.
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, time, context=None):
        cond = self.conditioning_type or ""
        if cond:
            assert context is not None, f"mode {cond!r} requires context"
        in_dtype = x.dtype
        c = TimeEncoder(32, self.time_emb_dim, dtype=self.dtype)(time)

        if cond == "concatenate":
            # Embed the state when the context embedding dwarfs it
            # (temporal_unet.py:47-55).
            if self.state_dim < self.conditioning_embed_dim // 4:
                e = self.conditioning_embed_dim // 4
                h = nn.Dense(e // 2, dtype=self.dtype)(x)
                x_emb = nn.Dense(e, dtype=self.dtype)(mish(h))
            else:
                x_emb = x
            ctx = jnp.broadcast_to(context[:, None, :],
                                   (x.shape[0], x.shape[1], context.shape[-1]))
            x = jnp.concatenate([x_emb, ctx], axis=-1)
        elif cond == "attention":
            ctx3 = context[:, None, :]                  # (B, 1, E)
        elif cond == "default":
            c = jnp.concatenate([c, context], axis=-1)
        elif cond:
            raise NotImplementedError(cond)

        dims = [x.shape[-1]] + [self.unet_input_dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_res = len(in_out)

        h_stack = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            x = ResidualTemporalBlock(dim_out, dtype=self.dtype)(x, c)
            x = ResidualTemporalBlock(dim_out, dtype=self.dtype)(x, c)
            if self.self_attention:
                x = PreNormResidual(LinearAttention())(x)
            if cond == "attention":
                x = ContextCrossBlock()(x, ctx3)
            h_stack.append(x)
            if not is_last:
                x = Downsample1d(dim_out, dtype=self.dtype)(x)

        mid_dim = dims[-1]
        x = ResidualTemporalBlock(mid_dim, dtype=self.dtype)(x, c)
        if self.self_attention:
            x = PreNormResidual(LinearAttention())(x)
        if cond == "attention":
            x = ContextCrossBlock()(x, ctx3)
        x = ResidualTemporalBlock(mid_dim, dtype=self.dtype)(x, c)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            x = jnp.concatenate([x, h_stack.pop()], axis=-1)
            x = ResidualTemporalBlock(dim_in, dtype=self.dtype)(x, c)
            x = ResidualTemporalBlock(dim_in, dtype=self.dtype)(x, c)
            if self.self_attention:
                x = PreNormResidual(LinearAttention())(x)
            if cond == "attention":
                x = ContextCrossBlock()(x, ctx3)
            x = Upsample1d(dim_in, dtype=self.dtype)(x)

        x = Conv1dBlock(self.unet_input_dim, dtype=self.dtype)(x)
        x = nn.Conv(self.state_dim, (1,), dtype=self.dtype)(x)
        # Epsilon consumers (posterior math, guide) run float32; hand back
        # the caller's dtype regardless of the compute dtype.
        return x.astype(in_dtype)


def init_unet(key, horizon: int = 64, state_dim: int = 4,
              unet_input_dim: int = 32, dim_mults: Tuple[int, ...] = (1, 2, 4),
              conditioning_type: str = "", context_dim: int = 0, **kw):
    """Initialize a TemporalUnet; returns (module, params)."""
    model = TemporalUnet(state_dim=state_dim, unet_input_dim=unet_input_dim,
                         dim_mults=dim_mults,
                         conditioning_type=conditioning_type, **kw)
    args = [jnp.zeros((2, horizon, state_dim)), jnp.zeros((2,), jnp.int32)]
    if conditioning_type:
        args.append(jnp.zeros((2, context_dim)))
    params = model.init(key, *args)
    return model, params


def init_unet_abstract(horizon: int = 64, state_dim: int = 4,
                       unet_input_dim: int = 32,
                       dim_mults: Tuple[int, ...] = (1, 2, 4)):
    """Like init_unet but without running any computation: the params pytree
    holds ShapeDtypeStructs. Use when real weights are about to be restored
    from a checkpoint — avoids compiling a throwaway forward pass."""
    model = TemporalUnet(state_dim=state_dim, unet_input_dim=unet_input_dim,
                         dim_mults=dim_mults)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, horizon, state_dim)),
                           jnp.zeros((2,), jnp.int32)))
    return model, shapes

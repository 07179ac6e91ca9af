"""Guided Gaussian diffusion as pure, scan-compiled functions.

TPU-native re-design of GaussianDiffusionModel + ddpm_sample_fn
(reference: mmd/models/diffusion_models/diffusion_model_base.py:48-461,
sample_functions.py:41-107). The reference's Python reverse loop (25 steps x
20 guide autograd replays per step) becomes ONE jit-compiled program:
`lax.scan` over diffusion steps, with the guide gradient traced in-graph via
`jax.grad` and constraints as fixed-shape data (no recompilation across CBS
replans).

Exact semantics mirrored:
- step indices run i = n_steps-1 ... -n_no_noise; i < 0 evaluates the model
  at t=0 and adds no noise (sample_functions.py:53-57, 76-78)
- x0-prediction from epsilon, clamped to [-1, 1] (diffusion_model_base.py:148-160)
- guidance (n_guide_steps iterations of x += guide(x), re-applying hard
  conditions) only when i < t_start_guide (sample_functions.py:63-72, 89-107)
- extra noise std multiplier 0.5 (mpd.py:303)
- hard conditioning applied after init, after every sample step, and inside
  every guide iteration (diffusion_model_base.py:163-211)
- the returned chain stacks the initial noise plus every step's output:
  (n_steps + n_no_noise + 1, B, H, D) (diffusion_model_base.py:321-351)
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree_dataclass

from mmd_tpu.config import DiffusionConfig
from mmd_tpu.costs.guide import GuideConfig, GuideData, guide_gradient
from mmd_tpu.models.schedules import DiffusionSchedule


@pytree_dataclass
class HardConds:
    """Fixed-shape hard conditioning: x <- x*(1-mask) + values*mask.

    Replaces the reference's {t: state} dict (sample_functions.py:8-14) with
    a (H, 1) mask + (H, D) (or (B, H, D)) values tensor — any number of
    conditioned waypoints, one static shape.
    """

    mask: jax.Array    # (H, 1) in {0., 1.}
    values: jax.Array  # (H, D) or (B, H, D)

    def apply(self, x: jax.Array) -> jax.Array:
        return x * (1.0 - self.mask) + self.values * self.mask


def make_start_goal_hard_conds(start_state: jax.Array, goal_state: jax.Array,
                               horizon: int) -> HardConds:
    """{0: start, H-1: goal} (reference: trajectories.py:216-239)."""
    D = start_state.shape[-1]
    mask = jnp.zeros((horizon, 1)).at[0].set(1.0).at[horizon - 1].set(1.0)
    values = jnp.zeros(start_state.shape[:-1] + (horizon, D))
    values = values.at[..., 0, :].set(start_state).at[..., horizon - 1, :].set(goal_state)
    return HardConds(mask=mask, values=values)


# ----------------------------------------------------------------- forward
def q_sample(schedule: DiffusionSchedule, x_start: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    """Forward-noise x_start to step t (diffusion_model_base.py:425-433)."""
    shape = (-1,) + (1,) * (x_start.ndim - 1)
    a = schedule.sqrt_alphas_cumprod[t].reshape(shape)
    b = schedule.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
    return a * x_start + b * noise


def predict_start_from_noise(schedule: DiffusionSchedule, x_t: jax.Array,
                             t: jax.Array, eps: jax.Array) -> jax.Array:
    """diffusion_model_base.py:132-143 (predict_epsilon=True branch)."""
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    return (schedule.sqrt_recip_alphas_cumprod[t].reshape(shape) * x_t
            - schedule.sqrt_recipm1_alphas_cumprod[t].reshape(shape) * eps)


def q_posterior_mean(schedule: DiffusionSchedule, x_start: jax.Array,
                     x_t: jax.Array, t: jax.Array) -> jax.Array:
    """diffusion_model_base.py:145-152."""
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    return (schedule.posterior_mean_coef1[t].reshape(shape) * x_start
            + schedule.posterior_mean_coef2[t].reshape(shape) * x_t)


# ----------------------------------------------------------------- sampler
def _ddpm_step(apply_fn, params, schedule: DiffusionSchedule, x: jax.Array,
               i: jax.Array, key: jax.Array, hard: HardConds,
               gd: Optional[GuideData], cfg: DiffusionConfig,
               guide_cfg: Optional[GuideConfig], guided: bool) -> jax.Array:
    B = x.shape[0]
    t = jnp.maximum(i, 0)
    tb = jnp.full((B,), t, jnp.int32)

    eps = apply_fn(params, x, tb)
    x0 = predict_start_from_noise(schedule, x, tb, eps)
    if cfg.clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    x = q_posterior_mean(schedule, x0, x, tb)

    if guided and gd is not None:
        def guide_step(_, x):
            x = x + guide_gradient(x, gd, guide_cfg)
            return hard.apply(x)

        x = jax.lax.fori_loop(0, cfg.n_guide_steps, guide_step, x)

    log_var = schedule.posterior_log_variance_clipped[t]
    std = jnp.exp(0.5 * log_var)
    noise = jax.random.normal(key, x.shape, x.dtype)
    noise = noise * (i > 0).astype(x.dtype)  # no noise at/after t=0
    x = x + std * noise * cfg.noise_std_extra
    return hard.apply(x)


def guided_p_sample_loop(
    apply_fn: Callable,
    params,
    schedule: DiffusionSchedule,
    hard: HardConds,
    key: jax.Array,
    cfg: DiffusionConfig,
    gd: Optional[GuideData] = None,
    guide_cfg: Optional[GuideConfig] = None,
    n_diffusion_steps: Optional[int] = None,
    warm_start: Optional[jax.Array] = None,
    n_samples: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Full reverse process. Returns (x_final, chain (S+1, B, H, D)).

    The loop is split statically at t_start_guide: an unguided scan over the
    early steps then a guided scan — guidance structure is compiled in, the
    i < t_start_guide check never appears as a traced branch.
    """
    if (cfg.sampler == "ddim" and warm_start is None
            and n_diffusion_steps is None):
        # DDIM fast mode covers fresh full-denoise loops; warm-started /
        # shortened loops (XCBS local inference) keep the DDPM path — the
        # reference's ddim_sample has no local-inference analog
        # (diffusion_model_base.py:353-421 is DDPM-only).
        return ddim_sample_loop(apply_fn, params, schedule, hard, key, cfg,
                                gd=gd, guide_cfg=guide_cfg,
                                n_samples=n_samples)
    n_steps = n_diffusion_steps if n_diffusion_steps is not None else cfg.n_diffusion_steps
    n_no_noise = cfg.n_diffusion_steps_without_noise
    B = n_samples if n_samples is not None else cfg.n_samples

    key, init_key = jax.random.split(key)
    if warm_start is not None:
        x = warm_start
        B = x.shape[0]
    else:
        x = jax.random.normal(init_key, (B, cfg.horizon, cfg.state_dim))
    x = hard.apply(x)

    steps = list(range(n_steps - 1, -n_no_noise - 1, -1))
    unguided = [i for i in steps if i >= cfg.t_start_guide or gd is None]
    guided = [i for i in steps if i < cfg.t_start_guide and gd is not None]
    keys = jax.random.split(key, len(steps))

    def make_body(is_guided):
        def body(x, inp):
            i, k = inp
            x = _ddpm_step(apply_fn, params, schedule, x, i, k, hard, gd, cfg,
                           guide_cfg, is_guided)
            return x, x
        return body

    chains = [x[None]]
    if unguided:
        x, c1 = jax.lax.scan(
            make_body(False), x,
            (jnp.asarray(unguided, jnp.int32), keys[: len(unguided)]))
        chains.append(c1)
    if guided:
        x, c2 = jax.lax.scan(
            make_body(True), x,
            (jnp.asarray(guided, jnp.int32), keys[len(unguided):]))
        chains.append(c2)

    return x, jnp.concatenate(chains, axis=0)


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "guide_cfg"))
def run_inference(apply_fn, params, schedule: DiffusionSchedule, hard: HardConds,
                  gd: GuideData, key: jax.Array, cfg: DiffusionConfig,
                  guide_cfg: GuideConfig) -> jax.Array:
    """Guided sampling of a fresh batch; returns the normalized chain
    (n_steps + n_no_noise + 1, B, H, D) (diffusion_model_base.py:321-351)."""
    _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard, key, cfg,
                                    gd=gd, guide_cfg=guide_cfg)
    return chain


@functools.partial(jax.jit,
                   static_argnames=("apply_fn", "cfg", "guide_cfg",
                                    "n_noising_steps", "n_denoising_steps"))
def run_local_inference(apply_fn, params, schedule: DiffusionSchedule,
                        hard: HardConds, gd: GuideData, seed_trajs: jax.Array,
                        key: jax.Array, cfg: DiffusionConfig,
                        guide_cfg: GuideConfig, n_noising_steps: int = 3,
                        n_denoising_steps: int = 3) -> jax.Array:
    """XCBS experience reuse: q_sample the seed batch at t=n_noising_steps,
    then denoise n_denoising_steps (+ no-noise steps) under the current
    constraints (diffusion_model_base.py:353-421)."""
    B = seed_trajs.shape[0]
    key, nkey = jax.random.split(key)
    t = jnp.full((B,), n_noising_steps, jnp.int32)
    noise = jax.random.normal(nkey, seed_trajs.shape, seed_trajs.dtype)
    warm = q_sample(schedule, seed_trajs, t, noise)
    _, chain = guided_p_sample_loop(apply_fn, params, schedule, hard, key, cfg,
                                    gd=gd, guide_cfg=guide_cfg,
                                    n_diffusion_steps=n_denoising_steps,
                                    warm_start=warm)
    return chain


def ddim_sample_loop(
    apply_fn: Callable,
    params,
    schedule: DiffusionSchedule,
    hard: HardConds,
    key: jax.Array,
    cfg: DiffusionConfig,
    gd: Optional[GuideData] = None,
    guide_cfg: Optional[GuideConfig] = None,
    n_samples: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """DDIM sampling with eta=0 over n_steps//5 substeps.

    Mirrors GaussianDiffusionModel.ddim_sample exactly
    (diffusion_model_base.py:214-291): time pairs [(T-1, ...), ..., (0, -1)];
    with predict_epsilon the reference's `pred_noise =
    predict_noise_from_start(x, t, x0=model_out)` returns the model output
    unchanged (:119-120), so the deterministic update is
    x_{t'} = sqrt(ac_{t'}) x0 + sqrt(1-ac_{t'}) eps. Reference quirks kept:
    x0 is NOT clamped (the DDIM path never clips, unlike p_mean_variance
    :148-160); guidance gates on t_NEXT < t_start_guide (:270-271); the
    final (0, -1) pair breaks to x0 + hard conditioning with NO guidance
    (:251-256). (n_steps//5 + 1) UNet forwards total.
    """
    n_steps = cfg.n_diffusion_steps
    sub = (cfg.ddim_substeps if getattr(cfg, "ddim_substeps", 0)
           else max(1, n_steps // 5))
    times = [-1] + list(np.linspace(0, n_steps - 1, sub + 1).astype(int))
    times = times[::-1]
    pairs = list(zip(times[:-1], times[1:]))  # [(T-1, ...), ..., (0, -1)]

    B = n_samples if n_samples is not None else cfg.n_samples
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, (B, cfg.horizon, cfg.state_dim))
    x = hard.apply(x)

    chain = [x[None]]
    for t, t_next in pairs:
        tb = jnp.full((B,), t, jnp.int32)
        eps = apply_fn(params, x, tb)
        x0 = predict_start_from_noise(schedule, x, tb, eps)
        if t_next < 0:
            x = hard.apply(x0)
            chain.append(x[None])
            break
        ac_next = schedule.alphas_cumprod[t_next]
        x = jnp.sqrt(ac_next) * x0 + jnp.sqrt(1.0 - ac_next) * eps
        if gd is not None and t_next < cfg.t_start_guide:
            def guide_step(_, xx):
                xx = xx + guide_gradient(xx, gd, guide_cfg)
                return hard.apply(xx)

            x = jax.lax.fori_loop(0, cfg.n_guide_steps, guide_step, x)
        x = hard.apply(x)
        chain.append(x[None])

    return x, jnp.concatenate(chain, axis=0)


# ---------------------------------------------------------------- training
def diffusion_loss(apply_fn, params, schedule: DiffusionSchedule,
                   x_start: jax.Array, hard: HardConds, key: jax.Array,
                   n_diffusion_steps: int) -> jax.Array:
    """epsilon-prediction MSE with hard-conditioned input AND output.

    Mirrors p_losses (diffusion_model_base.py:435-456): conditioning the
    model's output rows removes those waypoints from the gradient.
    """
    B = x_start.shape[0]
    tkey, nkey = jax.random.split(key)
    t = jax.random.randint(tkey, (B,), 0, n_diffusion_steps)
    noise = jax.random.normal(nkey, x_start.shape, x_start.dtype)
    x_noisy = hard.apply(q_sample(schedule, x_start, t, noise))
    eps_hat = hard.apply(apply_fn(params, x_noisy, t))
    return jnp.mean((eps_hat - noise) ** 2)

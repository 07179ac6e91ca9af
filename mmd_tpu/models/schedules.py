"""Beta schedules + derived diffusion coefficients as one pytree.

Mirrors the schedule math of GaussianDiffusionModel.__init__
(reference: mmd/models/diffusion_models/diffusion_model_base.py:69-105) and
the beta schedules (helpers.py:29-49). The buffers live in one
`DiffusionSchedule` pytree passed into the jitted sampler as data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree_dataclass


def exponential_beta_schedule(n_steps: int, beta_start: float = 1e-4,
                              beta_end: float = 1.0) -> np.ndarray:
    """reference: helpers.py:43-49 (x = linspace(0, n, n)).

    With beta_end=1.0 the final beta is exactly 1 in float64 (alpha=0 ->
    division by zero downstream); the torch reference dodges this only via
    float32 rounding (its last beta lands at ~0.9999998). We compute in
    float32 and clip betas to < 1 so the derived coefficients stay finite.
    """
    x = np.linspace(0.0, n_steps, n_steps, dtype=np.float32)
    a = np.float32(np.log(beta_end / beta_start) / n_steps)
    betas = np.float32(beta_start) * np.exp(a * x)
    return np.clip(betas, 0.0, 1.0 - 1e-6).astype(np.float32)


def cosine_beta_schedule(n_steps: int, s: float = 0.008,
                         a_min: float = 0.0, a_max: float = 0.999) -> np.ndarray:
    """reference: helpers.py:29-40."""
    steps = n_steps + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, a_min, a_max).astype(np.float32)


def linear_beta_schedule(n_steps: int, beta_start: float = 1e-4,
                         beta_end: float = 0.02) -> np.ndarray:
    """reference: helpers.py:16-17."""
    return np.linspace(beta_start, beta_end, n_steps, dtype=np.float32)


SCHEDULES = {
    "exponential": exponential_beta_schedule,
    "cosine": cosine_beta_schedule,
    "linear": linear_beta_schedule,
}


@pytree_dataclass
class DiffusionSchedule:
    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @property
    def n_steps(self) -> int:
        return self.betas.shape[0]


def make_schedule(variance_schedule: str, n_steps: int) -> DiffusionSchedule:
    betas = SCHEDULES[variance_schedule](n_steps)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac[:-1]]).astype(np.float32)
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    return DiffusionSchedule(
        betas=jnp.asarray(betas),
        alphas_cumprod=jnp.asarray(ac),
        alphas_cumprod_prev=jnp.asarray(ac_prev),
        sqrt_alphas_cumprod=jnp.asarray(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1.0 - ac)),
        sqrt_recip_alphas_cumprod=jnp.asarray(np.sqrt(1.0 / ac)),
        sqrt_recipm1_alphas_cumprod=jnp.asarray(np.sqrt(1.0 / ac - 1.0)),
        posterior_variance=jnp.asarray(post_var),
        posterior_log_variance_clipped=jnp.asarray(np.log(np.maximum(post_var, 1e-20))),
        posterior_mean_coef1=jnp.asarray(betas * np.sqrt(ac_prev) / (1.0 - ac)),
        posterior_mean_coef2=jnp.asarray((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)),
    )

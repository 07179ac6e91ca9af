import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.config import DiffusionConfig
from mmd_tpu.costs.constraints import empty_constraint_set
from mmd_tpu.costs.guide import GuideConfig, GuideData
from mmd_tpu.datasets.normalization import LimitsNormalizer
from mmd_tpu.envs.envs import make_env
from mmd_tpu.models.diffusion import (
    HardConds,
    diffusion_loss,
    guided_p_sample_loop,
    make_start_goal_hard_conds,
    predict_start_from_noise,
    q_posterior_mean,
    q_sample,
    run_inference,
    run_local_inference,
)
from mmd_tpu.models.schedules import make_schedule
from mmd_tpu.models.temporal_unet import init_unet


def test_schedule_values_match_reference_math():
    s = make_schedule("exponential", 25)
    # exponential betas: beta_0 = 1e-4; x spans [0, 25] over 25 points so
    # beta[24] -> 1.0 (clipped just below 1 for finiteness).
    np.testing.assert_allclose(float(s.betas[0]), 1e-4, rtol=1e-5)
    a = np.log(1.0 / 1e-4) / 25
    np.testing.assert_allclose(float(s.betas[12]), 1e-4 * np.exp(a * 12.5), rtol=1e-3)
    assert 0.999 < float(s.betas[24]) < 1.0
    assert np.isfinite(np.asarray(s.sqrt_recip_alphas_cumprod)).all()
    # alphas_cumprod_prev[0] == 1, posterior mean coefs sum behavior.
    np.testing.assert_allclose(float(s.alphas_cumprod_prev[0]), 1.0)
    # Posterior mean coefficients at any t satisfy c1 + c2*sqrt(ac_t/ac_{t-1}) ~ weights
    assert np.all(np.asarray(s.posterior_variance) >= 0)


def test_q_sample_and_x0_prediction_roundtrip():
    s = make_schedule("exponential", 25)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 8, 4)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(4, 8, 4)).astype(np.float32))
    # At t=24 the exponential schedule's 1/sqrt(ac) is ~1e6, so float32
    # roundoff dominates; test the identity over the usable range.
    t = jnp.array([0, 5, 12, 18])
    xt = q_sample(s, x0, t, noise)
    x0_hat = predict_start_from_noise(s, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-3)


def test_hard_conds_apply():
    hc = make_start_goal_hard_conds(jnp.array([1.0, 2.0, 0.0, 0.0]),
                                    jnp.array([-1.0, -2.0, 0.0, 0.0]), horizon=8)
    x = jnp.zeros((3, 8, 4)) + 0.5
    y = hc.apply(x)
    np.testing.assert_allclose(np.asarray(y[:, 0]), [[1, 2, 0, 0]] * 3)
    np.testing.assert_allclose(np.asarray(y[:, -1]), [[-1, -2, 0, 0]] * 3)
    np.testing.assert_allclose(np.asarray(y[:, 3]), 0.5)


def _tiny_setup(horizon=16, guided=True):
    cfg = DiffusionConfig(horizon=horizon, n_samples=8, n_diffusion_steps=6,
                          t_start_guide=3, n_guide_steps=2, unet_dim=8)
    model, params = init_unet(jax.random.PRNGKey(0), horizon=horizon,
                              unet_input_dim=8)
    schedule = make_schedule("exponential", 6)
    guide_cfg = GuideConfig()
    env = make_env("EnvEmpty2D")
    norm = LimitsNormalizer.from_limits([-1, -1, -2, -2], [1, 1, 2, 2])
    gd = GuideData(scene=env.scene, normalizer=norm,
                   constraints=empty_constraint_set(2, 2))
    hard = make_start_goal_hard_conds(jnp.array([-0.5, -0.5, 0.0, 0.0]),
                                      jnp.array([0.5, 0.5, 0.0, 0.0]), horizon)
    return cfg, model, params, schedule, guide_cfg, gd, hard


def test_sampler_shapes_and_hard_conditioning():
    cfg, model, params, schedule, guide_cfg, gd, hard = _tiny_setup()
    chain = run_inference(model.apply, params, schedule, hard, gd,
                          jax.random.PRNGKey(1), cfg, guide_cfg)
    # chain: n_steps + n_no_noise + 1 snapshots.
    assert chain.shape == (6 + 1 + 1, 8, 16, 4)
    final = np.asarray(chain[-1])
    np.testing.assert_allclose(final[:, 0], [[-0.5, -0.5, 0, 0]] * 8, atol=1e-6)
    np.testing.assert_allclose(final[:, -1], [[0.5, 0.5, 0, 0]] * 8, atol=1e-6)
    assert np.isfinite(final).all()


def test_sampler_deterministic_given_key():
    cfg, model, params, schedule, guide_cfg, gd, hard = _tiny_setup()
    c1 = run_inference(model.apply, params, schedule, hard, gd,
                       jax.random.PRNGKey(7), cfg, guide_cfg)
    c2 = run_inference(model.apply, params, schedule, hard, gd,
                       jax.random.PRNGKey(7), cfg, guide_cfg)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    c3 = run_inference(model.apply, params, schedule, hard, gd,
                       jax.random.PRNGKey(8), cfg, guide_cfg)
    assert np.abs(np.asarray(c1[-1]) - np.asarray(c3[-1])).max() > 1e-6


def test_local_inference_stays_near_seed():
    cfg, model, params, schedule, guide_cfg, gd, hard = _tiny_setup()
    t = np.linspace(0, 1, 16, dtype=np.float32)[:, None]
    seed = np.concatenate([
        (-0.5 + t) * np.ones((16, 1)), (-0.5 + t) * np.ones((16, 1)),
        np.zeros((16, 2))], axis=-1)
    seed_b = jnp.asarray(np.tile(seed[None], (8, 1, 1)))
    chain = run_local_inference(model.apply, params, schedule, hard, gd,
                                seed_b, jax.random.PRNGKey(2), cfg, guide_cfg,
                                n_noising_steps=2, n_denoising_steps=2)
    assert chain.shape == (2 + 1 + 1, 8, 16, 4)
    # Low-noise local inference keeps the result in the seed's vicinity
    # far more than a fresh sample would be.
    drift = np.abs(np.asarray(chain[-1][..., :2]) - seed[None, :, :2]).mean()
    assert drift < 0.5


def test_unguided_loop_via_none_guide():
    cfg, model, params, schedule, guide_cfg, gd, hard = _tiny_setup()
    x, chain = guided_p_sample_loop(model.apply, params, schedule, hard,
                                    jax.random.PRNGKey(3), cfg, gd=None)
    assert x.shape == (8, 16, 4)
    assert chain.shape == (8, 8, 16, 4)


def test_diffusion_loss_finite_and_conditioned_rows_ignored():
    cfg, model, params, schedule, guide_cfg, gd, hard = _tiny_setup()
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 16, 4)).astype(np.float32))
    loss = diffusion_loss(model.apply, params, schedule, x0, hard,
                          jax.random.PRNGKey(4), 6)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: diffusion_loss(model.apply, p, schedule, x0, hard,
                                          jax.random.PRNGKey(4), 6))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_unet_context_conditioning_modes():
    """Reference conditioning surface (temporal_unet.py:44-62, 121-152):
    'concatenate', 'attention', and 'default' modes accept a (B, E) context
    and the output depends on it."""
    import jax

    from mmd_tpu.models.temporal_unet import init_unet

    B, H, D, E = 2, 32, 4, 16
    x = jnp.linspace(-1, 1, B * H * D).reshape(B, H, D)
    t = jnp.zeros((B,), jnp.int32)
    ctx0 = jnp.zeros((B, E))
    ctx1 = jnp.ones((B, E))
    for mode in ("concatenate", "attention", "default"):
        model, params = init_unet(jax.random.PRNGKey(0), horizon=H,
                                  state_dim=D, unet_input_dim=16,
                                  dim_mults=(1, 2), conditioning_type=mode,
                                  context_dim=E)
        y0 = model.apply(params, x, t, ctx0)
        y1 = model.apply(params, x, t, ctx1)
        assert y0.shape == (B, H, D), (mode, y0.shape)
        assert not np.allclose(np.asarray(y0), np.asarray(y1)), mode

    # Unconditional stays the default and its param structure is unchanged
    # (committed checkpoints keep loading).
    model, params = init_unet(jax.random.PRNGKey(0), horizon=H, state_dim=D,
                              unet_input_dim=16, dim_mults=(1, 2))
    y = model.apply(params, x, t)
    assert y.shape == (B, H, D)


def test_ddim_dispatch_via_cfg_sampler():
    """cfg.sampler='ddim' routes FRESH full-denoise loops through
    ddim_sample_loop ((n_steps//5 + 1) forwards, reference
    diffusion_model_base.py:214-291) while warm-started / shortened loops
    (XCBS local inference) keep the DDPM path."""
    import dataclasses

    from mmd_tpu.models.diffusion import ddim_sample_loop

    cfg, model, params, schedule, guide_cfg, gd, hard = _tiny_setup()
    cfg_ddim = dataclasses.replace(cfg, sampler="ddim")

    x, chain = guided_p_sample_loop(model.apply, params, schedule, hard,
                                    jax.random.PRNGKey(5), cfg_ddim, gd=gd,
                                    guide_cfg=guide_cfg)
    # n_steps=6 -> sub=1 -> times [5, 0, -1] -> 2 pairs -> chain 1+2.
    assert chain.shape == (3, 8, 16, 4)
    assert x.shape == (8, 16, 4)
    final = np.asarray(x)
    np.testing.assert_allclose(final[:, 0], [[-0.5, -0.5, 0, 0]] * 8,
                               atol=1e-6)
    np.testing.assert_allclose(final[:, -1], [[0.5, 0.5, 0, 0]] * 8,
                               atol=1e-6)
    assert np.isfinite(final).all()

    # Identical to calling ddim_sample_loop directly (same key).
    x2, chain2 = ddim_sample_loop(model.apply, params, schedule, hard,
                                  jax.random.PRNGKey(5), cfg_ddim, gd=gd,
                                  guide_cfg=guide_cfg)
    np.testing.assert_array_equal(np.asarray(chain), np.asarray(chain2))

    # Warm-started loops ignore the ddim flag: DDPM chain length
    # n_denoise + n_no_noise + 1.
    warm = jnp.zeros((8, 16, 4))
    _, chain3 = guided_p_sample_loop(model.apply, params, schedule, hard,
                                     jax.random.PRNGKey(6), cfg_ddim, gd=gd,
                                     guide_cfg=guide_cfg,
                                     n_diffusion_steps=2, warm_start=warm)
    assert chain3.shape == (2 + 1 + 1, 8, 16, 4)


def test_ddim_matches_reference_structure():
    """Reference quirks (diffusion_model_base.py:214-291): x0 is NOT
    clamped on the DDIM path, guidance gates on t_next, and the final
    (0, -1) pair applies NO guidance — the last chain snapshot is exactly
    hard-conditioned x0(x_1)."""
    import dataclasses

    from mmd_tpu.models.diffusion import ddim_sample_loop

    cfg, model, params, schedule, guide_cfg, gd, hard = _tiny_setup()
    cfg_ddim = dataclasses.replace(cfg, sampler="ddim")
    _, chain = ddim_sample_loop(model.apply, params, schedule, hard,
                                jax.random.PRNGKey(9), cfg_ddim, gd=gd,
                                guide_cfg=guide_cfg)
    # Reproduce the final step by hand from the penultimate snapshot.
    x_prev = chain[-2]
    tb = jnp.zeros((x_prev.shape[0],), jnp.int32)
    eps = model.apply(params, x_prev, tb)
    x0 = predict_start_from_noise(schedule, x_prev, tb, eps)
    expect = hard.apply(x0)
    np.testing.assert_allclose(np.asarray(chain[-1]), np.asarray(expect),
                               atol=1e-6)


def test_loop_unet_evals_accounting():
    """FLOP-accounting helper matches the sampler structure (bench.py's
    MFU numerator depends on it)."""
    from mmd_tpu.utils.baked import loop_unet_evals

    cfg = DiffusionConfig(n_diffusion_steps=25,
                          n_diffusion_steps_without_noise=1)
    assert loop_unet_evals(cfg, False, 0) == 26          # DDPM fresh
    assert loop_unet_evals(cfg, True, 3) == 4            # XCBS local
    import dataclasses
    cfg_d = dataclasses.replace(cfg, sampler="ddim")
    assert loop_unet_evals(cfg_d, False, 0) == 6         # 25//5 + 1
    assert loop_unet_evals(cfg_d, True, 3) == 4          # local stays DDPM

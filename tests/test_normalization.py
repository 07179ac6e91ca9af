import jax.numpy as jnp
import numpy as np

import pytest

from mmd_tpu.datasets.normalization import (
    GaussianNormalizer,
    LimitsNormalizer,
    fixed_limits_normalizer,
    make_normalizer,
    safe_limits_from_data,
)


def test_limits_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-3, 7, size=(100, 4)).astype(np.float32))
    n = LimitsNormalizer.from_data(x)
    y = n.normalize(x)
    assert float(y.min()) >= -1.0 and float(y.max()) <= 1.0
    np.testing.assert_allclose(np.asarray(n.unnormalize(y)), np.asarray(x), atol=1e-3)


def test_limits_unnormalize_clips():
    n = LimitsNormalizer.from_limits([-1.0, -1.0], [1.0, 1.0])
    out = n.unnormalize(jnp.array([[5.0, -5.0]]))
    assert float(out[0, 0]) <= 1.0 and float(out[0, 1]) >= -1.0


def test_gaussian_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(3.0, 2.0, size=(500, 2)).astype(np.float32))
    n = GaussianNormalizer.from_data(x)
    y = n.normalize(x)
    assert abs(float(y.mean())) < 0.05
    np.testing.assert_allclose(np.asarray(n.unnormalize(y)), np.asarray(x), atol=1e-4)


def test_safe_limits_degenerate_dim():
    x = jnp.stack([jnp.linspace(0, 1, 10), jnp.full((10,), 0.5)], axis=-1)
    n = safe_limits_from_data(x)
    y = n.normalize(x)
    assert np.isfinite(np.asarray(y)).all()


def test_safe_limits_golden_reference_semantics():
    """Golden values mirroring the reference SafeLimitsNormalizer
    (mmd/datasets/normalization.py:171-186): ONE degenerate dim widens
    EVERY dim's limits by eps=1 (the reference's `self.mins -= eps` /
    `self.maxs += eps` are whole-array ops inside its per-dim loop)."""
    x = jnp.stack([jnp.linspace(0.0, 1.0, 10), jnp.full((10,), 0.5)], axis=-1)
    n = safe_limits_from_data(x)
    np.testing.assert_allclose(np.asarray(n.mins), [-1.0, -0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n.maxs), [2.0, 1.5], atol=1e-6)
    # normalize: dim0 value 0 -> 2*(0-(-1))/3 - 1 = -1/3; dim1 0.5 -> 0.
    y = n.normalize(jnp.array([[0.0, 0.5]]))
    np.testing.assert_allclose(np.asarray(y), [[-1.0 / 3.0, 0.0]], atol=1e-6)
    # No degenerate dims -> identical to plain LimitsNormalizer.
    x2 = jnp.asarray(np.random.default_rng(2).uniform(-2, 3, (50, 3)),
                     jnp.float32)
    n2, plain = safe_limits_from_data(x2), LimitsNormalizer.from_data(x2)
    np.testing.assert_array_equal(np.asarray(n2.mins), np.asarray(plain.mins))
    np.testing.assert_array_equal(np.asarray(n2.maxs), np.asarray(plain.maxs))


def test_fixed_limits_golden():
    """FixedLimitsNormalizer: constant [-1, 1] limits independent of data
    (reference normalization.py:188-196)."""
    x = jnp.asarray(np.random.default_rng(3).uniform(-7, 7, (20, 2)),
                    jnp.float32)
    n = fixed_limits_normalizer(x.shape[-1])
    np.testing.assert_array_equal(np.asarray(n.mins), [-1.0, -1.0])
    np.testing.assert_array_equal(np.asarray(n.maxs), [1.0, 1.0])
    # Identity map on in-range values: 2*(v-(-1))/2 - 1 = v.
    v = jnp.array([[0.25, -0.75]])
    np.testing.assert_allclose(np.asarray(n.normalize(v)), np.asarray(v),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(n.unnormalize(v)), np.asarray(v),
                               atol=1e-6)


def test_make_normalizer_name_surface():
    """All four reference normalizer names resolve; unknown names raise
    (reference kwarg surface: trajectories.py:28)."""
    x = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (30, 4)),
                    jnp.float32)
    for name, cls in [("LimitsNormalizer", LimitsNormalizer),
                      ("GaussianNormalizer", GaussianNormalizer),
                      ("SafeLimitsNormalizer", LimitsNormalizer),
                      ("FixedLimitsNormalizer", LimitsNormalizer)]:
        n = make_normalizer(name, x)
        assert isinstance(n, cls)
        roundtrip = n.unnormalize(n.normalize(x))
        np.testing.assert_allclose(np.asarray(roundtrip), np.asarray(x),
                                   atol=1e-2)
    with pytest.raises(ValueError):
        make_normalizer("NopeNormalizer", x)


def test_dataset_normalizer_kwarg():
    from mmd_tpu.datasets.trajectories import TrajectoryDataset

    trajs = np.random.default_rng(5).uniform(-0.4, 0.4, (8, 16, 4)).astype(
        np.float32)
    ds_g = TrajectoryDataset(trajs, "EnvEmpty2D",
                             normalizer="GaussianNormalizer")
    assert isinstance(ds_g.normalizer, GaussianNormalizer)
    ds_default = TrajectoryDataset(trajs, "EnvEmpty2D")
    assert isinstance(ds_default.normalizer, LimitsNormalizer)

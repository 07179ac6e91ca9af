import jax.numpy as jnp
import numpy as np

from mmd_tpu.datasets.normalization import (
    GaussianNormalizer,
    LimitsNormalizer,
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

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.utils.interp import (
    finite_difference_vector,
    interpolate_points,
    interpolate_traj_via_points,
    savgol_matrix,
    smooth_trajs,
)


def test_interpolate_points_matches_torch_linear_align_corners():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 64, 4)).astype(np.float32)
    ours = np.asarray(interpolate_points(jnp.asarray(x), 96))
    theirs = (
        F.interpolate(torch.tensor(x).transpose(-2, -1), size=96,
                      mode="linear", align_corners=True)
        .transpose(-2, -1).numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_interpolate_points_identity():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    np.testing.assert_allclose(np.asarray(interpolate_points(x, 3)), np.asarray(x))


def test_interpolate_traj_via_points_endpoints_and_shape():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10, 4)).astype(np.float32))
    out = interpolate_traj_via_points(x, 5)
    assert out.shape == (2, 9 * 6 + 1, 4)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    np.testing.assert_allclose(np.asarray(out[:, -1]), np.asarray(x[:, -1]))
    # Midpoints of each segment present.
    np.testing.assert_allclose(np.asarray(out[:, 3]), np.asarray(0.5 * (x[:, 0] + x[:, 1])), atol=1e-6)


def test_savgol_matrix_matches_scipy():
    from scipy.signal import savgol_filter

    rng = np.random.default_rng(2)
    y = rng.normal(size=(64,)).astype(np.float32)
    S = savgol_matrix(64, 10, 2)
    np.testing.assert_allclose(S @ y, savgol_filter(y, 10, 2, mode="interp"), atol=1e-4)


def test_smooth_trajs_matches_scipy_even_window():
    # The reference uses window 10 (even), which scipy evaluates with a
    # half-sample shift; parity means matching scipy, not preserving lines.
    from scipy.signal import savgol_filter

    t = np.linspace(0, 1, 64, dtype=np.float32)
    traj = np.stack([t, 2 * t, -t, 0.5 * t], axis=-1)[None]
    out = np.asarray(smooth_trajs(jnp.asarray(traj)))
    ref = savgol_filter(traj, 10, 2, axis=1, mode="interp")
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_smooth_trajs_odd_window_preserves_lines():
    t = np.linspace(0, 1, 64, dtype=np.float32)
    traj = np.stack([t, 2 * t, -t, 0.5 * t], axis=-1)[None]
    out = np.asarray(smooth_trajs(jnp.asarray(traj), window=11))
    np.testing.assert_allclose(out, traj, atol=2e-3)


def test_finite_difference_central():
    t = jnp.linspace(0, 1, 11)[:, None]
    x = t**2
    d = finite_difference_vector(x, dt=0.1, method="central")
    np.testing.assert_allclose(np.asarray(d[1:-1, 0]), np.asarray(2 * t[1:-1, 0]), atol=1e-5)

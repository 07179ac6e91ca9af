import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.envs.envs import make_env
from mmd_tpu.envs.grid_sdf import _lookup, grid_sdf
from mmd_tpu.ops.sdf_kernel import grid_lookup_pallas


def test_pallas_sdf_lookup_matches_xla_gather_interpret():
    env = make_env("EnvConveyor2D")
    grid = env.grid
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.1, 1.1, (300, 2)).astype(np.float32))

    val_ref, grad_ref = _lookup(grid, pts)
    val_k, grad_k = grid_lookup_pallas(pts, grid.values, grid.grads,
                                       grid.lower, grid.upper, interpret=True)
    np.testing.assert_allclose(np.asarray(val_k), np.asarray(val_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad_k), np.asarray(grad_ref), atol=1e-6)


def test_pallas_sdf_lookup_batch_shapes():
    env = make_env("EnvEmptyNoWait2D")
    grid = env.grid
    pts = jnp.zeros((4, 7, 2))
    val, grad = grid_lookup_pallas(pts, grid.values, grid.grads,
                                   grid.lower, grid.upper, interpret=True)
    assert val.shape == (4, 7)
    assert grad.shape == (4, 7, 2)
    # Empty env: BIG values, zero grads.
    assert float(val.min()) > 100.0
    np.testing.assert_allclose(np.asarray(grad), 0.0)

"""Micro-benchmark: Pallas one-hot-matmul SDF lookup vs the XLA gather.

Run on the TPU to decide whether to flip the kernel on for the guidance hot
path (see mmd_tpu/ops/sdf_kernel.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.envs.envs import make_env
from mmd_tpu.envs.grid_sdf import _lookup
from mmd_tpu.ops.sdf_kernel import grid_lookup_pallas


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    env = make_env("EnvConveyor2D")
    grid = env.grid
    rng = np.random.default_rng(0)
    for n_pts in (4096, 65536):
        pts = jnp.asarray(rng.uniform(-1, 1, (n_pts, 2)).astype(np.float32))
        f_xla = jax.jit(lambda p: _lookup(grid, p))
        f_pl = jax.jit(lambda p: grid_lookup_pallas(
            p, grid.values, grid.grads, grid.lower, grid.upper))
        t_xla = timeit(f_xla, pts)
        t_pl = timeit(f_pl, pts)
        v1, g1 = f_xla(pts)
        v2, g2 = f_pl(pts)
        ok = bool(jnp.allclose(v1, v2, atol=1e-5) and jnp.allclose(g1, g2, atol=1e-5))
        print(f"n={n_pts}: xla_gather {t_xla * 1e6:.1f}us  "
              f"pallas_onehot {t_pl * 1e6:.1f}us  match={ok}")


if __name__ == "__main__":
    main()

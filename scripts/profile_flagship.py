"""Analytic breakdown of the flagship (10-robot XECBS) device time.

The whole search is ONE fused device call (fused.root_greedy), so host-side
phase timers can't see inside it. This script times the unit programs the
fused call is built from — one UNet apply, one guide-gradient evaluation
(with the bench team's soft-path rows), one full guided single-agent plan —
and prints the implied composition of the sequential soft root
(A plans = A * (n_steps UNet evals + (t_start_guide * n_guide_steps) guide
evals)) next to the measured fused total. Run on the TPU:

    python scripts/profile_flagship.py            # f32
    MMD_BENCH_BF16=1 python scripts/profile_flagship.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mmd_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from mmd_tpu.costs.guide import guide_gradient
    from mmd_tpu.models.diffusion import guided_p_sample_loop
    from mmd_tpu.parallel.team import (
        plan_team_roots_sequential_soft_device,
        team_soft_paths,
    )

    planners, starts, goals = bench.build_planners(seed=0)
    p0 = planners[0]
    A = len(planners)
    cfg = p0.cfg
    B, H, D = cfg.n_samples, cfg.horizon, cfg.state_dim

    # --- unit: one UNet apply ------------------------------------------
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, D))
    t = jnp.zeros((B,), jnp.int32)
    unet = jax.jit(lambda p, x, t: p0.model.apply(p, x, t))
    t_unet = timeit(unet, p0.params, x, t, n=100)

    # --- unit: one guide gradient (flagship root shape: empty constraint
    # buckets + (A, H) soft-path rows) -----------------------------------
    pos = jnp.stack([jnp.asarray(np.linspace(s, g, H), jnp.float32)
                     for s, g in zip(starts, goals)])
    spc = team_soft_paths(np.asarray(pos), p0.robot.radius)
    cset, _ = p0._pack(None)
    from mmd_tpu.costs.guide import GuideData
    from mmd_tpu.costs.constraints import SoftPathConstraints
    spc_one = SoftPathConstraints(
        points=spc.points[0], mask=spc.mask[0], radius=spc.radius[0],
        weight=spc.weight[0])
    gd = GuideData(scene=p0.task.scene, normalizer=p0.dataset.normalizer,
                   constraints=cset, soft_paths=spc_one)
    gg = jax.jit(lambda x: guide_gradient(x, gd, p0.guide_cfg))
    t_guide = timeit(gg, x, n=100)

    # --- unit: one full guided single-agent plan (fresh, root shape) ----
    def one_plan(key):
        _, chain = guided_p_sample_loop(
            p0.model.apply, p0.params, p0.schedule, p0.hard_conds, key, cfg,
            gd=gd, guide_cfg=p0.guide_cfg)
        return chain
    plan_j = jax.jit(one_plan)
    t_plan = timeit(plan_j, jax.random.PRNGKey(1), n=10)

    # --- whole sequential soft root ------------------------------------
    def root():
        out = plan_team_roots_sequential_soft_device(
            planners, summary_margin=p0.robot.rr_margin)
        jax.block_until_ready(out[0])
    root()
    t0 = time.perf_counter()
    root()
    t_root = time.perf_counter() - t0

    n_unet = cfg.n_diffusion_steps + cfg.n_diffusion_steps_without_noise
    n_guide = (cfg.t_start_guide + cfg.n_diffusion_steps_without_noise) \
        * cfg.n_guide_steps
    implied = n_unet * t_unet + n_guide * t_guide
    print(json.dumps({
        "bf16": bench.BF16,
        "unet_apply_us": round(t_unet * 1e6, 1),
        "guide_gradient_us": round(t_guide * 1e6, 1),
        "per_plan": {
            "unet_evals": n_unet, "guide_evals": n_guide,
            "implied_s": round(implied, 4),
            "measured_s": round(t_plan, 4),
        },
        "root": {
            "agents": A,
            "implied_s": round(A * t_plan, 4),
            "measured_s": round(t_root, 4),
        },
    }))


if __name__ == "__main__":
    main()

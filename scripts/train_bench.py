"""Training-throughput / MFU benchmark for the reference recipe.

Measures the jitted+scanned train step (train/trainer.py make_train_chunk)
on the reference training configuration — batch 128, H=64, D=4, UNet dim
32 x (1,2,4), 25 diffusion steps, Adam + clip + EMA (reference:
scripts/train_diffusion/launch_train_01.py:74-121, mmd/trainer/trainer.py:
119-335) — in both f32 and bf16 mixed precision, and reports steps/s,
wall-clock for a fixed step count, XLA-counted FLOPs per optimizer step
(fwd + bwd + optimizer/EMA), the jitted forward pass's FLOPs alone, and
MFU against the chip's bf16 MXU peak (utils/profiling.tpu_peak_flops;
both precisions are quoted against the bf16 peak — the TPU MXU is a
bf16-multiply/f32-accumulate array, so that is the hardware ceiling for
either numerics).

Writes TRAIN_BENCH.json at the repo root and prints it.

Usage: python scripts/train_bench.py [--steps 500] [--chunk 100]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def measure(bf16: bool, n_steps: int, chunk: int, n_trajs: int,
            horizon: int, state_dim: int) -> dict:
    from mmd_tpu.models.diffusion import HardConds
    from mmd_tpu.models.temporal_unet import init_unet
    from mmd_tpu.models.schedules import make_schedule
    from mmd_tpu.train.trainer import (TrainConfig, init_train_state,
                                       make_optimizer, make_train_chunk,
                                       make_train_step)
    from mmd_tpu.utils.baked import xla_flops

    cfg = TrainConfig(bf16=bf16)
    key = jax.random.PRNGKey(0)
    model, params = init_unet(key, horizon=horizon, state_dim=state_dim,
                              unet_input_dim=32, dim_mults=(1, 2, 4))
    schedule = make_schedule(cfg.variance_schedule, cfg.n_diffusion_steps)
    optimizer = make_optimizer(cfg)
    state = init_train_state(params, optimizer)
    # Synthetic normalized data: throughput is content-independent; shapes
    # match the reference datasets ((N, 64, 4) normalized to [-1, 1]).
    data = jax.device_put(jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (n_trajs, horizon, state_dim)),
        jnp.float32))
    apply_fn = (model.clone(dtype=jnp.bfloat16).apply if bf16
                else model.apply)
    chunk_fn = make_train_chunk(apply_fn, schedule, optimizer, cfg, chunk)
    n_val = jnp.asarray(0)

    # FLOPs of ONE optimizer step, measured on the scan-free single-step
    # program (XLA's cost analysis counts a while/scan BODY once regardless
    # of trip count, so the chunk program cannot be used here — verified:
    # its reported flops equal exactly one step's). NOTE: XLA counts a bf16
    # and an f32 matmul as the same FLOPs, so the bf16 MFU gain shows up
    # through steps/s, not through this number.
    key, k0 = jax.random.split(key)
    H = horizon
    mask = jnp.zeros((H, 1)).at[0].set(1.0).at[H - 1].set(1.0)
    batch0 = data[: cfg.batch_size]
    step_fn = make_train_step(apply_fn, schedule, optimizer, cfg)
    step_flops = xla_flops(step_fn, state, batch0,
                           HardConds(mask=mask, values=batch0), k0)

    # Forward pass alone, batch 128 (the planner-side compute unit).
    x = data[: cfg.batch_size]
    t = jnp.zeros((cfg.batch_size,), jnp.int32)
    fwd = jax.jit(lambda p, x, t: apply_fn(p, x, t))
    fwd_flops = xla_flops(fwd, params, x, t)

    # Warmup (compile + first execution), then the measured calls.
    state, loss = chunk_fn(state, data, n_val, k0)
    jax.block_until_ready(loss)
    n_calls = max(1, n_steps // chunk)
    keys = jax.random.split(key, n_calls)
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, loss = chunk_fn(state, data, n_val, keys[i])
    jax.block_until_ready(loss)
    wall = time.perf_counter() - t0

    steps = n_calls * chunk
    steps_per_sec = steps / wall
    flops_per_step = step_flops
    out = {
        "precision": "bf16" if bf16 else "f32",
        "steps_measured": steps,
        "wall_s": round(wall, 4),
        "steps_per_sec": round(steps_per_sec, 2),
        "train_step_flops": flops_per_step,
        "train_step_gflops": round(flops_per_step / 1e9, 3),
        "fwd_batch128_gflops": round(fwd_flops / 1e9, 3),
        "achieved_tflops": round(flops_per_step * steps_per_sec / 1e12, 3),
        "final_loss": round(float(loss), 5),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--n_trajs", type=int, default=10000)
    ap.add_argument("--horizon", type=int, default=64)
    ap.add_argument("--state_dim", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TRAIN_BENCH.json"))
    args = ap.parse_args()

    from mmd_tpu.utils.profiling import tpu_peak_flops

    dev = jax.devices()[0]
    peak = tpu_peak_flops(dev)
    result = {
        "device": dev.device_kind,
        "peak_bf16_tflops": peak / 1e12 if peak else None,
        "recipe": {
            "batch_size": 128, "horizon": args.horizon,
            "state_dim": args.state_dim, "unet_input_dim": 32,
            "dim_mults": [1, 2, 4], "n_diffusion_steps": 25,
            "optimizer": "adam(3e-4) + global-norm clip 1.0 + EMA(0.995)",
            "chunk": args.chunk,
            "reference": "scripts/train_diffusion/launch_train_01.py:74-121",
        },
    }
    for bf16 in (False, True):
        row = measure(bf16, args.steps, args.chunk, args.n_trajs,
                      args.horizon, args.state_dim)
        if peak:
            row["mfu_pct"] = round(
                100.0 * row["train_step_flops"] * row["steps_per_sec"] / peak,
                3)
        result[row.pop("precision")] = row
    # Reference-scale context: the 500k-step recipe's projected wall-clock.
    for prec in ("f32", "bf16"):
        sps = result[prec]["steps_per_sec"]
        result[prec]["projected_500k_steps_hours"] = round(
            500_000 / sps / 3600, 2)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Velocity-diversity augmentation: time-reparameterized trajectory variants.

Attacks the Conveyor density wall measured in PARITY.md ("Round 3 decides
the ceiling's mechanism"): the H=128 experiment proved the ceiling is
throughput-bound — doubling the horizon halves traversal speed and
*doubles* every robot's corridor occupancy-time, making dense cells worse.
The complementary lever is schedule diversity at CONSTANT traversal speed:
teach the model trajectories that hold still at the start ("wait-then-
sprint") or at the goal ("sprint-then-park") and compress the motion into
the remaining steps, so a constraint-guided sampler can serialize agents
through the one-way corridors without increasing anyone's exposure time.

This is a beyond-reference capability: the reference trains only on raw
planner output at a fixed 5 s duration (launch_generate_trajectories.py,
mmd_params.py:34) and has no schedule-diversity mechanism.

Reparameterization is geometrically safe: every env map here is static
(envs.py), so any monotone time-warp of a collision-free path stays
collision-free. Speed is capped per-trajectory so compressed variants stay
inside the data manifold: a variant with total hold w gets speedup
(H-1)/(H-1-w), admitted only if peak speed * speedup <= --speed_cap.

Velocity convention matches the stored datasets (central differences at
dt = duration/(H-1), rest endpoints — see datasets/trajectories.py).

Usage:
  python scripts/augment_velocity_diversity.py --env EnvConveyor2D \
      --out_dir data_trajectories_vd --variants 3
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Host-only numpy work, but TrajectoryDataset's robot object touches jnp —
# force the CPU backend (MMD_CPU_DEVICES convention; jax.config beats the
# sitecustomize-exported JAX_PLATFORMS, same trick as inference CLI) so the
# augmentation runs even when the tunneled TPU is unavailable.
if int(os.environ.get("MMD_CPU_DEVICES", "1")):
    import jax
    jax.config.update("jax_platforms", "cpu")

from mmd_tpu.datasets.trajectories import TrajectoryDataset, model_id


def central_diff_velocities(pos: np.ndarray, dt: float) -> np.ndarray:
    """(..., H, q) positions -> central-difference velocities, rest endpoints."""
    vel = np.zeros_like(pos)
    vel[..., 1:-1, :] = (pos[..., 2:, :] - pos[..., :-2, :]) / (2.0 * dt)
    return vel


def time_reparam(pos: np.ndarray, w_start: int, w_goal: int) -> np.ndarray:
    """Hold at start for w_start steps and at goal for w_goal steps, with the
    original motion linearly arc-time-compressed into the remaining steps."""
    H = pos.shape[0]
    t = np.arange(H, dtype=np.float64)
    # Source time for each output step: clamped affine map.
    u = (t - w_start) * (H - 1) / (H - 1 - w_start - w_goal)
    u = np.clip(u, 0.0, H - 1)
    i0 = np.floor(u).astype(np.int64)
    i1 = np.minimum(i0 + 1, H - 1)
    a = (u - i0)[:, None]
    return (1.0 - a) * pos[i0] + a * pos[i1]


def augment(trajs: np.ndarray, duration: float, variants: int, speed_cap: float,
            holds: tuple, seed: int) -> np.ndarray:
    """Return original + up to `variants` reparameterized copies per traj."""
    N, H, D = trajs.shape
    q = D // 2
    dt = duration / (H - 1)
    pos = trajs[..., :q].astype(np.float64)
    peak = np.max(np.linalg.norm(
        central_diff_velocities(pos, dt), axis=-1), axis=1)  # (N,)
    rng = np.random.default_rng(seed)
    out = [trajs]
    n_skipped = 0
    for v in range(variants):
        w = rng.choice(holds, size=N)
        # Cap each trajectory's hold so compressed peak speed <= speed_cap.
        w_max = np.floor((H - 1) * np.maximum(
            0.0, 1.0 - peak / speed_cap)).astype(np.int64)
        w_eff = np.minimum(w, w_max)
        n_skipped += int(np.sum(w_eff == 0))
        # Split the hold between start and goal (all-start / all-goal /
        # random split, one mode per variant pass for coverage).
        frac = {0: 1.0, 1: 0.0}.get(v % 3, rng.uniform(size=N))
        ws = np.round(w_eff * frac).astype(np.int64)
        wg = w_eff - ws
        new_pos = np.stack([
            time_reparam(pos[i], int(ws[i]), int(wg[i])) for i in range(N)])
        new = np.concatenate(
            [new_pos, central_diff_velocities(new_pos, dt)],
            axis=-1).astype(trajs.dtype)
        out.append(new)
    aug = np.concatenate(out, axis=0)
    print(f"augmented {N} -> {aug.shape[0]} trajs "
          f"({n_skipped} variant slots fell back to w=0: no speed headroom)")
    return aug


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True)
    ap.add_argument("--data_dir", default="data_trajectories")
    ap.add_argument("--out_dir", default="data_trajectories_vd")
    ap.add_argument("--variants", type=int, default=3)
    ap.add_argument("--speed_cap", type=float, default=2.8,
                    help="max allowed peak speed after compression "
                         "(dataset peak is ~2.7 on Conveyor)")
    ap.add_argument("--holds", type=int, nargs="+", default=[8, 16, 24],
                    help="total hold-step choices per variant")
    ap.add_argument("--duration", type=float, default=5.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    mid = model_id(args.env)
    ds = TrajectoryDataset.load(args.data_dir, mid)
    aug = augment(np.asarray(ds.trajs), args.duration, args.variants,
                  args.speed_cap, tuple(args.holds), args.seed)
    out = TrajectoryDataset(aug, args.env)
    out.save(args.out_dir, mid)
    print(f"saved to {os.path.join(args.out_dir, mid)}")


if __name__ == "__main__":
    main()

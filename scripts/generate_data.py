"""Generate training datasets for the obstacle environments.

Equivalent of scripts/generate_data/launch_generate_trajectories.py
(reference scale: 500 contexts x 20 trajs per map on CPU workers).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True)
    ap.add_argument("--contexts", type=int, default=100)
    ap.add_argument("--trajs_per_context", type=int, default=20)
    ap.add_argument("--gpmp_iters", type=int, default=300)
    ap.add_argument("--horizon", type=int, default=64)
    ap.add_argument("--duration", type=float, default=None,
                    help="trajectory duration in s; default keeps the "
                         "reference dt=5/64 (i.e. horizon * 5 / 64)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="data_trajectories")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (keep the TPU free)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from mmd_tpu.datagen.generate import generate_dataset
    from mmd_tpu.datagen.synthetic import generate_linear_dataset

    duration = args.duration if args.duration else args.horizon * 5.0 / 64.0
    if "Empty" in args.env:
        ds = generate_linear_dataset(args.env, n_contexts=args.contexts,
                                     horizon=args.horizon, seed=args.seed)
    else:
        ds = generate_dataset(args.env, n_contexts=args.contexts,
                              n_trajectories_per_context=args.trajs_per_context,
                              horizon=args.horizon, duration=duration,
                              gpmp_opt_iters=args.gpmp_iters, seed=args.seed)
    ds.save(args.out)
    print(f"saved {ds.n_trajs} trajectories for {args.env} to {args.out}")


if __name__ == "__main__":
    main()

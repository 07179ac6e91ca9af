"""Train the flagship EnvEmptyNoWait2D diffusion model.

Reference recipe (launch_train_01.py): UNet dim 32 mults (1,2,4), 25
exponential diffusion steps, batch 128, lr 3e-4, EMA 0.995. The reference
trains 500k steps on RRT+GPMP2 data; the empty-map model trains on linear
trajectories (generate_trajectories.py:559), which converge much faster.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mmd_tpu.datagen.synthetic import generate_linear_dataset
from mmd_tpu.datasets.trajectories import model_id
from mmd_tpu.train.trainer import TrainConfig, train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="EnvEmptyNoWait2D")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--contexts", type=int, default=2000)
    ap.add_argument("--out", default="data_trained_models")
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args()

    ds = generate_linear_dataset(args.env, n_contexts=args.contexts, seed=7)
    print(f"dataset: {ds.n_trajs} trajectories for {args.env}")
    ds.save("data_trajectories")

    cfg = TrainConfig(batch_size=128, n_diffusion_steps=25, lr=args.lr)
    model_dir = os.path.join(args.out, model_id(args.env))
    train(ds, cfg, num_train_steps=args.steps, unet_dim=32,
          dim_mults=(1, 2, 4), model_dir=model_dir, log_every=1000,
          steps_til_checkpoint=None)
    print(f"saved checkpoint to {model_dir}")


if __name__ == "__main__":
    main()

"""Train a diffusion model for one environment (CLI).

Equivalent of scripts/train_diffusion/train.py + launch_train_01.py in the
reference: UNet dim 32 mults (1,2,4), 25 exponential steps, batch 128,
lr 3e-4, EMA 0.995, periodic validation/summaries/checkpoints.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mmd_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from mmd_tpu.datasets.trajectories import TrajectoryDataset, model_id
from mmd_tpu.train.trainer import TrainConfig, train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True)
    ap.add_argument("--steps", type=int, default=50000)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--n_diffusion_steps", type=int, default=25)
    ap.add_argument("--unet_dim", type=int, default=32)
    ap.add_argument("--data_dir", default="data_trajectories")
    ap.add_argument("--out", default="data_trained_models")
    ap.add_argument("--validate_every", type=int, default=5000)
    ap.add_argument("--summary_every", type=int, default=0)
    ap.add_argument("--checkpoint_every", type=int, default=0)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16-compute train step (TrainConfig.bf16)")
    args = ap.parse_args()

    mid = model_id(args.env)
    ds = TrajectoryDataset.load(args.data_dir, mid)
    print(f"dataset {mid}: {ds.n_trajs} trajectories")
    cfg = TrainConfig(batch_size=args.batch_size, lr=args.lr,
                      n_diffusion_steps=args.n_diffusion_steps,
                      bf16=args.bf16)
    train(ds, cfg, num_train_steps=args.steps, unet_dim=args.unet_dim,
          model_dir=os.path.join(args.out, mid), log_every=1000,
          validate_every=args.validate_every or None,
          summary_every=args.summary_every or None,
          steps_til_checkpoint=args.checkpoint_every or None)
    print(f"saved to {os.path.join(args.out, mid)}")


if __name__ == "__main__":
    main()

import os

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.datagen.synthetic import generate_linear_dataset
from mmd_tpu.datasets.trajectories import model_id
from mmd_tpu.train.losses import GaussianDiffusionLoss
from mmd_tpu.train.train_loaders import get_dataset, get_loss, get_model
from mmd_tpu.train.trainer import TrainConfig, train


def test_train_resume_continues_step_count(tmp_path):
    ds = generate_linear_dataset("EnvEmptyNoWait2D", n_contexts=48, seed=0)
    cfg = TrainConfig(batch_size=32, n_diffusion_steps=4, lr=1e-3)
    model_dir = os.path.join(tmp_path, "m")
    _, state1, _, _ = train(ds, cfg, num_train_steps=30, unet_dim=8,
                            model_dir=model_dir, log_every=30,
                            log_fn=lambda m: None)
    assert int(state1.step) == 30
    _, state2, _, _ = train(ds, cfg, num_train_steps=10, unet_dim=8,
                            model_dir=model_dir, log_every=10,
                            log_fn=lambda m: None, resume=True)
    assert int(state2.step) == 40  # resumed from 30 and added 10


def test_loaders_and_loss(tmp_path):
    ds = generate_linear_dataset("EnvEmptyNoWait2D", n_contexts=32, seed=1)
    ds.save(str(tmp_path))
    ds2 = get_dataset("TrajectoryDataset", model_id("EnvEmptyNoWait2D"),
                      trajectories_dir=str(tmp_path))
    assert ds2.n_trajs == ds.n_trajs

    model, params = get_model("TemporalUnet", unet_input_dim=8)
    assert params is None
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 4)),
                        jnp.zeros((2,), jnp.int32))

    from mmd_tpu.models.schedules import make_schedule
    batch, hard = ds.sample_batch(jax.random.PRNGKey(1), 8)
    loss_cls = get_loss("GaussianDiffusionLoss")
    out = loss_cls.loss_fn(model.apply, params, make_schedule("exponential", 4),
                           {"traj_normalized": batch, "hard_conds": hard},
                           jax.random.PRNGKey(2), 4)
    assert "diffusion_loss" in out and np.isfinite(float(out["diffusion_loss"]))


def test_profiling_trace_region(capsys):
    from mmd_tpu.utils.profiling import trace_region

    msgs = []
    with trace_region("unit", log_fn=msgs.append):
        jnp.zeros(4).sum()
    assert msgs and "unit" in msgs[0]

import os

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.datagen.synthetic import generate_linear_dataset
from mmd_tpu.datasets.trajectories import TrajectoryDataset, model_id
from mmd_tpu.train.trainer import TrainConfig, load_checkpoint, train


def test_linear_dataset_generation():
    ds = generate_linear_dataset("EnvEmptyNoWait2D", n_contexts=32, seed=1)
    assert ds.trajs.shape[1:] == (64, 4)
    assert ds.n_trajs > 16
    # Trajectories start/end where positions say and are straight.
    t0 = np.asarray(ds.trajs[0])
    d = t0[-1, :2] - t0[0, :2]
    assert np.linalg.norm(d) > 1.0
    # Normalized data is within [-1, 1].
    tn = np.asarray(ds.trajs_normalized)
    assert tn.min() >= -1.0 - 1e-5 and tn.max() <= 1.0 + 1e-5


def test_wait_at_goal_dataset_dwells():
    ds = generate_linear_dataset("EnvEmpty2D", n_contexts=16, seed=2)
    t0 = np.asarray(ds.trajs[0])
    # The tail should dwell at the goal (repeated final position).
    np.testing.assert_allclose(t0[-1, :2], t0[-2, :2], atol=1e-6)


def test_train_loss_decreases_and_checkpoint_roundtrip(tmp_path):
    ds = generate_linear_dataset("EnvEmptyNoWait2D", n_contexts=64, seed=3)
    cfg = TrainConfig(batch_size=32, n_diffusion_steps=8, lr=1e-3)
    model_dir = os.path.join(tmp_path, model_id("EnvEmptyNoWait2D"))
    model, state, schedule, losses = train(
        ds, cfg, num_train_steps=150, unet_dim=8, model_dir=model_dir,
        log_every=50, log_fn=lambda m: None)
    first, last = losses[0][1], losses[-1][1]
    assert last < first, (first, last)

    model2, params2, schedule2, info = load_checkpoint(model_dir)
    assert info["env_name"] == "EnvEmptyNoWait2D"
    # EMA params loaded and usable.
    out = model2.apply(params2, jnp.zeros((2, 64, 4)), jnp.zeros((2,), jnp.int32))
    assert out.shape == (2, 64, 4)
    # Normalizer persisted.
    np.testing.assert_allclose(info["normalizer_mins"],
                               np.asarray(ds.normalizer.mins), rtol=1e-5)


def test_dataset_save_load_roundtrip(tmp_path):
    ds = generate_linear_dataset("EnvEmptyNoWait2D", n_contexts=16, seed=4)
    ds.save(str(tmp_path))
    ds2 = TrajectoryDataset.load(str(tmp_path), model_id("EnvEmptyNoWait2D"))
    np.testing.assert_allclose(np.asarray(ds2.trajs), np.asarray(ds.trajs))
    assert ds2.env_name == ds.env_name


def test_hard_conditions_normalized():
    ds = generate_linear_dataset("EnvEmptyNoWait2D", n_contexts=16, seed=5)
    hc = ds.get_hard_conditions(jnp.array([-0.5, -0.5]), jnp.array([0.5, 0.5]))
    v = np.asarray(hc.values)
    assert np.abs(v[0]).max() <= 1.0 + 1e-5
    assert float(hc.mask[0, 0]) == 1.0 and float(hc.mask[-1, 0]) == 1.0
    assert float(hc.mask[5, 0]) == 0.0

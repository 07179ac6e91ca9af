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


def test_bf16_train_step_parity():
    """Mixed-precision train step (TrainConfig.bf16): bfloat16 compute with
    float32 master params must track the float32 run — finite losses, f32
    param dtypes, and a final loss in the same ballpark after a short run
    (the reference trains under AMP, trainer.py:149,278-295)."""
    ds = generate_linear_dataset("EnvEmpty2D", n_contexts=64, seed=3)

    def run(bf16):
        cfg = TrainConfig(batch_size=32, n_diffusion_steps=8, lr=2e-3,
                          bf16=bf16)
        _, state, _, losses = train(ds, cfg, num_train_steps=200,
                                    unet_dim=16, log_every=50,
                                    log_fn=lambda m: None)
        return state, [l for _, l in losses]

    state32, losses32 = run(False)
    state16, losses16 = run(True)
    assert all(np.isfinite(losses16)), losses16
    # Master params stay float32 under bf16 compute.
    for leaf in jax.tree_util.tree_leaves(state16.params):
        assert leaf.dtype == jnp.float32
    # Same-ballpark convergence (identical data/seeds; only compute
    # precision differs).
    assert losses16[-1] < 2.0 * max(losses32[-1], 1e-3) + 0.05

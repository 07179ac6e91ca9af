import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.common.constraints import MultiPointConstraint
from mmd_tpu.common.experiences import PathBatchExperience
from mmd_tpu.config import DiffusionConfig
from mmd_tpu.datagen.synthetic import generate_linear_dataset
from mmd_tpu.models.ensemble import CrossConds, apply_cross_conditioning, stack_params
from mmd_tpu.planners.single_agent.mpd_ensemble import MPDEnsemble
from mmd_tpu.train.trainer import TrainConfig, train


@pytest.fixture(scope="module")
def trained_setup():
    ds = generate_linear_dataset("EnvEmptyNoWait2D", n_contexts=128, seed=0)
    cfg = TrainConfig(batch_size=64, n_diffusion_steps=8, lr=2e-3)
    model, state, schedule, _ = train(ds, cfg, num_train_steps=400,
                                      unet_dim=16, log_every=200,
                                      log_fn=lambda m: None)
    return ds, model, state, schedule


def test_cross_conds_from_transforms():
    cc = CrossConds.from_transforms(np.array([[0.0, 0.0], [2.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(cc.rel), [[2, 0, 0, 0]])
    np.testing.assert_allclose(np.asarray(cc.boundary), [[1, 1e6, 1e6, 1e6]])


def test_apply_cross_conditioning_ties_seam():
    cc = CrossConds.from_transforms(np.array([[0.0, 0.0], [2.0, 0.0]]))
    x = jnp.zeros((2, 3, 4, 4))
    # Tile 1 starts at local (-0.6, 0.2).
    x = x.at[1, :, 0, 0].set(-0.6).at[1, :, 0, 1].set(0.2)
    y = apply_cross_conditioning(x, cc)
    # Tile 0's end = min(tile1_start + rel, boundary) = min(1.4, 1) = 1.0 in x.
    np.testing.assert_allclose(np.asarray(y[0, :, -1, 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[0, :, -1, 1]), 0.2, atol=1e-6)
    # Tile 1's start = max(end - rel, -boundary) = max(-1.0, -1.0) = -1.0.
    np.testing.assert_allclose(np.asarray(y[1, :, 0, 0]), -1.0, atol=1e-6)


def _make_ensemble(trained_setup, start, goal, transforms, n_samples=16):
    ds, model, state, schedule = trained_setup
    n_tiles = len(transforms)
    dcfg = DiffusionConfig(horizon=64, n_samples=n_samples,
                           n_diffusion_steps=8, t_start_guide=4,
                           n_guide_steps=5, unet_dim=16)
    return MPDEnsemble([model] * n_tiles, [state.ema_params] * n_tiles,
                       schedule, [ds] * n_tiles, transforms,
                       np.asarray(start), np.asarray(goal), cfg=dcfg)


def test_two_tile_plan_crosses_seam(trained_setup):
    transforms = np.array([[0.0, 0.0], [2.0, 0.0]], np.float32)
    ens = _make_ensemble(trained_setup, [-0.5, 0.0], [2.5, 0.0], transforms)
    out = ens()
    assert out.trajs_final.shape == (16, 128, 4)
    best = np.asarray(out.trajs_iters[-1])[int(out.idx_best_traj)
                                           if out.idx_best_traj is not None else 0]
    # Global endpoints.
    np.testing.assert_allclose(best[0, :2], [-0.5, 0.0], atol=0.15)
    np.testing.assert_allclose(best[-1, :2], [2.5, 0.0], atol=0.15)
    # Seam continuity: tile 0's last waypoint ~ tile 1's first (global frame).
    seam_gap = np.linalg.norm(best[63, :2] - best[64, :2])
    assert seam_gap < 0.2, seam_gap
    # The path monotonically progresses through both tiles.
    assert best[:64, 0].max() > 0.5 and best[64:, 0].min() < 1.5


def test_ensemble_constraint_routing(trained_setup):
    transforms = np.array([[0.0, 0.0], [2.0, 0.0]], np.float32)
    ens = _make_ensemble(trained_setup, [-0.5, 0.0], [2.5, 0.0], transforms)
    # A global constraint in tile 1's time range (t in [70, 90]) at global
    # x=2.0 (tile-1 local x=0).
    c = MultiPointConstraint(q_l=[np.array([2.0, 0.0])],
                             t_range_l=[(70, 90)], radius_l=[0.3])
    stacked, spc = ens._route_constraints([c])
    assert spc is None  # single ball constraint stays on the generic path
    # Tile 0 slot inactive, tile 1 active with shifted q/time.
    assert float(stacked.active[0].sum()) == 0.0
    assert float(stacked.active[1].sum()) == 1.0
    np.testing.assert_allclose(np.asarray(stacked.q[1, 0, 0]), [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(stacked.t_range[1, 0, 0]), [6.0, 26.0])
    out = ens(constraints_l=[c])
    assert out.trajs_final.shape == (16, 128, 4)


def test_ensemble_local_inference(trained_setup):
    transforms = np.array([[0.0, 0.0], [2.0, 0.0]], np.float32)
    ens = _make_ensemble(trained_setup, [-0.5, 0.0], [2.5, 0.0], transforms)
    out1 = ens()
    exp = PathBatchExperience(path_b=np.asarray(out1.trajs_final))
    out2 = ens(experience=exp)
    assert out2.trajs_final.shape == out1.trajs_final.shape


def test_stack_params_shapes(trained_setup):
    _, model, state, _ = trained_setup
    sp = stack_params([state.ema_params, state.ema_params])
    leaf = jax.tree_util.tree_leaves(sp)[0]
    single = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert leaf.shape == (2,) + single.shape

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


def test_pad_team_positions_matches_global_pad():
    from mmd_tpu.common.multi_agent_utils import global_pad_paths
    from mmd_tpu.planners.multi_agent.conflict_detection import (
        pad_team_positions,
    )

    rng = np.random.default_rng(3)
    paths = [rng.normal(size=(10, 2)).astype(np.float32) for _ in range(3)]
    start_times = [0, 4, 7]
    ref = global_pad_paths([p.copy() for p in paths], start_times)
    T_out = max(len(p) for p in ref)
    got = np.asarray(pad_team_positions(
        jnp.asarray(np.stack(paths)), jnp.asarray(start_times, jnp.int32),
        T_out))
    for i in range(3):
        np.testing.assert_allclose(got[i], ref[i][:, :2], atol=1e-6)


def test_fused_ensemble_expansion_matches_generic(trained_setup):
    """expand_child_ensemble (CBS variant: no soft, no warm start) must
    reproduce the generic two-call path: same plan under the same key, same
    least-collisions pick, same conflict summary — with staggered starts."""
    from mmd_tpu.planners.multi_agent.conflict_detection import (
        pad_team_positions, select_candidate_and_conflicts,
    )
    from mmd_tpu.planners.multi_agent.fused import expand_child_ensemble

    transforms = np.array([[0.0, 0.0], [2.0, 0.0]], np.float32)
    # Two agents crossing head-on through both tiles.
    p0 = _make_ensemble(trained_setup, [-0.5, 0.05], [2.5, 0.05], transforms,
                        n_samples=8)
    p1 = _make_ensemble(trained_setup, [2.5, -0.05], [-0.5, -0.05], transforms,
                        n_samples=8)
    out0, out1 = p0(), p1()
    paths_all = jnp.stack([jnp.asarray(out0.trajs_final),
                           jnp.asarray(out1.trajs_final)])
    ix_best = jnp.asarray([int(out0.idx_best_traj), int(out1.idx_best_traj)],
                          jnp.int32)
    start_times = jnp.asarray([0, 3], jnp.int32)
    A, B, L, D = paths_all.shape
    T_out = 3 + L
    margin = p0.robot.rr_margin
    c = MultiPointConstraint(q_l=[np.array([1.0, 0.0])],
                             t_range_l=[(60, 68)], radius_l=[0.24])

    key_before = p0._key
    gds = p0._guide_data(*p0._route_constraints([c]))
    key_fused, _ = jax.random.split(key_before)  # what _next_key() yields
    new_paths, scalars = expand_child_ensemble(
        p0.model.apply, p0.stacked_params, p0.schedule, p0.hard_conds,
        p0.cc, gds, jax.random.split(key_before)[1], p0.cfg, p0.guide_cfg,
        jnp.asarray(p0.transforms), p0.task.stacked_scenes, p0.robot.radius,
        p0.robot.q_min, p0.robot.q_max, p0._savgol, paths_all, ix_best,
        0, start_times, margin, jnp.asarray(0.12), jnp.asarray(2e-2),
        n_tiles=2, use_soft=False, local=False, n_noise=0, n_denoise=0,
        T_out=T_out)
    any_free, ix_f, count_f, t_f, a_f, b_f, mid_f = jax.device_get(scalars)
    assert bool(any_free)

    # Generic path with the same key: plan, pad on host, select.
    p0._key = key_before
    res = p0._run([c], None)
    np.testing.assert_allclose(np.asarray(new_paths[0]),
                               np.asarray(res.trajs_final), atol=1e-5)
    others_pad = pad_team_positions(paths_all[jnp.arange(A), ix_best][..., :2],
                                    start_times, T_out)
    idx = np.clip(np.arange(T_out) - 0, 0, L - 1)
    cand_pad = jnp.asarray(np.asarray(res.trajs_final[..., :2])[:, idx, :])
    ix_g, count_g, t_g, a_g, b_g, mid_g = jax.device_get(
        select_candidate_and_conflicts(cand_pad, res.free_mask, 0,
                                       others_pad, margin))
    assert int(ix_f) == int(ix_g)
    assert int(count_f) == int(count_g)
    if int(count_g):
        assert (int(t_f), int(a_f), int(b_f)) == (int(t_g), int(a_g), int(b_g))


def test_fused_ensemble_branch_engages_in_xecbs(trained_setup, monkeypatch):
    """A staggered 2-agent multi-tile XECBS search must route every CT
    expansion through the one-call fused program."""
    import mmd_tpu.planners.multi_agent.fused as fused_mod
    from mmd_tpu.planners.multi_agent.cbs import CBS

    calls = {"n": 0}
    orig = fused_mod.expand_child_ensemble

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(fused_mod, "expand_child_ensemble", counting)

    transforms = np.array([[0.0, 0.0], [2.0, 0.0]], np.float32)
    p0 = _make_ensemble(trained_setup, [-0.5, 0.05], [2.5, 0.05], transforms,
                        n_samples=8)
    p1 = _make_ensemble(trained_setup, [2.5, -0.05], [-0.5, -0.05], transforms,
                        n_samples=8)
    cbs = CBS([p0, p1], [[-0.5, 0.05], [2.5, -0.05]],
              [[2.5, 0.05], [-0.5, -0.05]], start_time_l=[0, 3],
              is_xcbs=True, is_ecbs=True)
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=300.0)
    assert len(paths) == 2 and paths[0].shape[0] == 3 + 128
    if n_exp:
        assert calls["n"] == 2 * n_exp or calls["n"] >= 1

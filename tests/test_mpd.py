import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.common.constraints import MultiPointConstraint
from mmd_tpu.common.experiences import PathBatchExperience
from mmd_tpu.config import DiffusionConfig
from mmd_tpu.datagen.synthetic import generate_linear_dataset
from mmd_tpu.planners.single_agent.mpd import MPD
from mmd_tpu.train.trainer import TrainConfig, train


@pytest.fixture(scope="module")
def trained_setup():
    ds = generate_linear_dataset("EnvEmptyNoWait2D", n_contexts=128, seed=0)
    cfg = TrainConfig(batch_size=64, n_diffusion_steps=8, lr=2e-3)
    model, state, schedule, _ = train(ds, cfg, num_train_steps=400,
                                      unet_dim=16, log_every=200,
                                      log_fn=lambda m: None)
    return ds, model, state, schedule


def _make_mpd(trained_setup, start, goal, n_samples=16):
    ds, model, state, schedule = trained_setup
    dcfg = DiffusionConfig(horizon=64, n_samples=n_samples,
                           n_diffusion_steps=8, t_start_guide=4,
                           n_guide_steps=5, unet_dim=16)
    return MPD(model, state.ema_params, schedule, ds,
               jnp.asarray(start), jnp.asarray(goal), cfg=dcfg)


def test_mpd_plans_free_trajectory(trained_setup):
    mpd = _make_mpd(trained_setup, [-0.6, -0.6], [0.6, 0.6])
    out = mpd()
    assert out.success_free_trajs == 1
    assert out.fraction_free_trajs > 0.3
    best = np.asarray(out.traj_final_free_best)
    np.testing.assert_allclose(best[0, :2], [-0.6, -0.6], atol=0.1)
    np.testing.assert_allclose(best[-1, :2], [0.6, 0.6], atol=0.1)
    assert out.t_total > 0


def test_mpd_respects_constraint(trained_setup):
    start, goal = [-0.7, 0.0], [0.7, 0.0]
    mpd_unc = _make_mpd(trained_setup, start, goal)
    out_unc = mpd_unc()
    # Block the straight-line midpoint for the middle of the horizon.
    c = MultiPointConstraint(q_l=[np.array([0.0, 0.0])],
                             t_range_l=[(16, 48)], radius_l=[0.3])
    mpd_con = _make_mpd(trained_setup, start, goal)
    out_con = mpd_con(constraints_l=[c])
    assert out_con.success_free_trajs == 1

    def min_center_dist(traj):
        mid = np.asarray(traj)[16:48, :2]
        return np.linalg.norm(mid, axis=-1).min()

    # The constrained best path clears the keep-out region far better than
    # the unconstrained one.
    assert min_center_dist(out_con.traj_final_free_best) > \
        min_center_dist(out_unc.traj_final_free_best) - 0.05
    assert min_center_dist(out_con.traj_final_free_best) > 0.15


def test_mpd_local_inference_with_experience(trained_setup):
    mpd = _make_mpd(trained_setup, [-0.6, 0.0], [0.6, 0.0])
    out1 = mpd()
    exp = PathBatchExperience(path_b=np.asarray(out1.trajs_final))
    c = MultiPointConstraint(q_l=[np.array([0.0, 0.0])],
                             t_range_l=[(20, 44)], radius_l=[0.2])
    out2 = mpd(constraints_l=[c], experience=exp)
    assert out2.trajs_final.shape == out1.trajs_final.shape
    assert out2.success_free_trajs == 1


def test_mpd_start_goal_mismatch_raises(trained_setup):
    mpd = _make_mpd(trained_setup, [-0.6, 0.0], [0.6, 0.0])
    with pytest.raises(AssertionError):
        mpd(start_state_pos=jnp.array([0.0, 0.0]))


def test_mpd_constraint_swap_reuses_compile(trained_setup):
    from mmd_tpu.planners.single_agent.mpd import _plan_fresh

    mpd = _make_mpd(trained_setup, [-0.5, -0.5], [0.5, 0.5])
    mpd()
    n0 = _plan_fresh._cache_size()
    c = MultiPointConstraint(q_l=[np.array([0.2, 0.2])],
                             t_range_l=[(10, 20)], radius_l=[0.1])
    c2 = MultiPointConstraint(q_l=[np.array([-0.2, 0.2])],
                              t_range_l=[(12, 22)], radius_l=[0.15])
    mpd(constraints_l=[c])
    mpd(constraints_l=[c, c2])
    # Single-point constraints share the smallest (K=4, P=1) bucket with the
    # empty set -> constrained replans never recompile.
    assert _plan_fresh._cache_size() == n0

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.config import DiffusionConfig
from mmd_tpu.datagen.synthetic import generate_linear_dataset
from mmd_tpu.parallel.sharding import make_mesh, replicate, shard_leading_axis
from mmd_tpu.parallel.team import (
    plan_team_roots_device,
    stack_hard_conds,
    team_select_by_conflicts,
    team_soft_paths,
)
from mmd_tpu.planners.multi_agent.cbs import CBS
from mmd_tpu.planners.single_agent.mpd import MPD
from mmd_tpu.train.trainer import TrainConfig, train
from mmd_tpu.common.multi_agent_utils import get_start_goal_pos_circle


@pytest.fixture(scope="module")
def trained_setup():
    ds = generate_linear_dataset("EnvEmptyNoWait2D", n_contexts=128, seed=0)
    cfg = TrainConfig(batch_size=64, n_diffusion_steps=8, lr=2e-3)
    model, state, schedule, _ = train(ds, cfg, num_train_steps=300,
                                      unet_dim=16, log_every=300,
                                      log_fn=lambda m: None)
    return ds, model, state, schedule


def _planners(trained_setup, n_agents=4):
    ds, model, state, schedule = trained_setup
    starts, goals = get_start_goal_pos_circle(n_agents)
    dcfg = DiffusionConfig(horizon=64, n_samples=8, n_diffusion_steps=8,
                           t_start_guide=4, n_guide_steps=3, unet_dim=16)
    planners = [MPD(model, state.ema_params, schedule, ds, jnp.asarray(s),
                    jnp.asarray(g), cfg=dcfg, seed=i)
                for i, (s, g) in enumerate(zip(starts, goals))]
    return planners, starts, goals


def test_mesh_and_sharding_helpers():
    mesh = make_mesh(8)
    assert mesh.shape == {"dp": 8}
    x = jnp.arange(16.0).reshape(8, 2)
    xs = shard_leading_axis(x, mesh)
    assert len(set(d for d in xs.devices())) == 8
    xr = replicate(x, mesh)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x))


def test_plan_team_roots_device(trained_setup):
    planners, starts, goals = _planners(trained_setup)
    out = plan_team_roots_device(planners)
    assert out is not None
    trajs_all, free_any, idx_best, free_mask = out
    assert trajs_all.shape == (4, 8, 64, 4)
    assert free_any.shape == (4,)
    assert idx_best.shape == (4,)
    assert free_mask.shape == (4, 8)


def test_team_roots_not_batchable_mixed_params(trained_setup):
    planners, starts, goals = _planners(trained_setup)
    # Different params object -> fallback.
    import jax as _jax
    planners[1].params = _jax.tree_util.tree_map(lambda x: x + 0, planners[1].params)
    assert plan_team_roots_device(planners) is None


def test_team_soft_paths():
    pos = np.zeros((3, 10, 2), np.float32)
    pos[1] += 0.5
    pos[2] -= 0.5
    spc = team_soft_paths(pos, radius=0.12)
    assert spc.points.shape == (3, 2, 10, 2)
    # Agent 0's rows are agents 1 and 2, masked to t in [1, 9].
    assert float(spc.mask[0].sum()) == 18
    np.testing.assert_allclose(np.asarray(spc.points[0, 0, 1]), [0.5, 0.5])
    np.testing.assert_allclose(float(spc.radius[0]), 0.12)


def test_team_select_by_conflicts():
    # 2 agents; agent 1 has 2 candidates: one collides with agent 0, one not.
    prev = np.zeros((2, 5, 2), np.float32)
    prev[1] += 3.0
    cands = np.zeros((2, 2, 5, 2), np.float32)
    cands[1, 0] = 0.0          # collides with agent 0
    cands[1, 1] = 5.0          # far away
    free = np.ones((2, 2), bool)
    ix, new_counts, cur_counts = team_select_by_conflicts(
        jnp.asarray(cands), jnp.asarray(free), jnp.asarray(prev), 0.2)
    assert int(ix[1]) == 1
    assert int(new_counts[1]) == 0
    assert int(cur_counts[0]) == 0  # agents currently conflict-free


def test_cbs_with_root_repair(trained_setup):
    planners, starts, goals = _planners(trained_setup)
    cbs = CBS(planners, starts, goals, is_ecbs=False, is_xcbs=True,
              root_repair_rounds=1)
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=120)
    assert len(paths) == 4
    from mmd_tpu.experiments.status import TrialSuccessStatus
    if status == TrialSuccessStatus.SUCCESS:
        assert n_coll == 0


def test_graft_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 64, 4)


def test_graft_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_nd_mesh_factorization_and_sharding():
    from jax.sharding import PartitionSpec as P

    from mmd_tpu.parallel.sharding import _factor_mesh, shard_axes

    assert _factor_mesh(8, 2) in ((2, 4), (4, 2))
    assert _factor_mesh(8, 3) == (2, 2, 2)
    assert _factor_mesh(6, 2) in ((2, 3), (3, 2))
    assert _factor_mesh(7, 2) == (1, 7) or _factor_mesh(7, 2) == (7, 1)

    mesh = make_mesh(8, axis_names=("agent", "dp"))
    assert mesh.devices.size == 8 and len(mesh.axis_names) == 2
    x = jnp.zeros((mesh.devices.shape[0] * 2, mesh.devices.shape[1] * 4, 3))
    xs = shard_axes(x, mesh, P("agent", "dp"))
    assert xs.sharding.spec == P("agent", "dp")
    # A jitted reduction over the 2-D-sharded array runs and is correct.
    assert float(jax.jit(lambda a: a.sum())(xs)) == 0.0

    mesh_exp = make_mesh([4, 2], axis_names=("agent", "dp"))
    assert mesh_exp.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh([4, 4], axis_names=("agent", "dp"))  # 16 > 8 devices


def test_batchable_rejects_ensemble_planners():
    """Uniform-time ECBS roots must fall back to the host loop for
    MPDEnsemble planners (no .params attribute) instead of crashing."""
    from mmd_tpu.parallel.team import _batchable

    class FakeEnsemble:
        stacked_params = object()

    assert _batchable([FakeEnsemble(), FakeEnsemble()]) is False

"""Multi-chip CBS as a planner mode: `CBS(..., mesh=...)`.

The dryrun (`__graft_entry__.py`) proves the team primitives shard; these
tests prove the PLANNER wires them: with a mesh whose 'agent' axis divides
the team, `CBS.plan()` runs the batched root / repair rounds SPMD over the
(virtual 8-device CPU) mesh and returns the same solution as the
single-device run — real multi-chip is a flag flip (VERDICT round 2, item
4; reference is single-GPU, cbs.py:316-335 plans agents sequentially).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.common.multi_agent_utils import get_start_goal_pos_circle
from mmd_tpu.config import DiffusionConfig
from mmd_tpu.datagen.synthetic import generate_linear_dataset
from mmd_tpu.experiments.status import TrialSuccessStatus
from mmd_tpu.parallel.sharding import make_mesh
from mmd_tpu.planners.multi_agent.cbs import CBS
from mmd_tpu.planners.multi_agent.conflict_detection import count_conflicts
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


def _planners(trained_setup, starts, goals, n_samples=16):
    ds, model, state, schedule = trained_setup
    dcfg = DiffusionConfig(horizon=64, n_samples=n_samples,
                           n_diffusion_steps=8, t_start_guide=4,
                           n_guide_steps=5, unet_dim=16)
    return [MPD(model, state.ema_params, schedule, ds, jnp.asarray(s),
                jnp.asarray(g), cfg=dcfg, seed=100 + i)
            for i, (s, g) in enumerate(zip(starts, goals))]


def _cbs(trained_setup, mesh=None, **kw):
    starts, goals = get_start_goal_pos_circle(4, radius=0.4)
    planners = _planners(trained_setup, starts, goals)
    return CBS(planners, starts, goals, is_ecbs=False, is_xcbs=True,
               mesh=mesh, **kw)


def _solve(cbs):
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=600)
    assert status == TrialSuccessStatus.SUCCESS
    assert n_coll == 0
    assert count_conflicts(paths, cbs.margin) == 0
    return paths, n_exp


def test_mesh_cbs_matches_single_device(trained_setup):
    """Same instance + seeds, 4-agent team over a 4-device 'agent' mesh:
    identical solution to the single-device run (same program, different
    placement)."""
    paths_1dev, exp_1dev = _solve(_cbs(trained_setup))

    mesh = make_mesh([4], axis_names=("agent",))
    paths_mesh, exp_mesh = _solve(_cbs(trained_setup, mesh=mesh))

    assert exp_mesh == exp_1dev
    assert len(paths_mesh) == len(paths_1dev)
    for pm, p1 in zip(paths_mesh, paths_1dev):
        np.testing.assert_allclose(np.asarray(pm), np.asarray(p1),
                                   rtol=1e-5, atol=1e-5)


def test_mesh_cbs_repair_rounds(trained_setup):
    """The Jacobi root-repair rounds also run sharded (plan_fresh_team_soft
    with 'agent'-sharded soft-path constraints) and still solve."""
    mesh = make_mesh([4, 2], axis_names=("agent", "dp"))
    cbs = _cbs(trained_setup, mesh=mesh, root_repair_rounds=1)
    _solve(cbs)


def test_mesh_validation():
    from mmd_tpu.robots.disk import DiskRobot

    mesh_no_agent = make_mesh([8], axis_names=("dp",))
    mesh_5 = make_mesh([5], axis_names=("agent",))

    class _Stub:
        robot = DiskRobot.make()

    starts, goals = get_start_goal_pos_circle(4, radius=0.4)
    with pytest.raises(ValueError, match="agent"):
        CBS([_Stub()] * 4, starts, goals, validate_start_goal=False,
            reference_task=object(), mesh=mesh_no_agent)
    with pytest.raises(ValueError, match="divisible"):
        CBS([_Stub()] * 4, starts, goals, validate_start_goal=False,
            reference_task=object(), mesh=mesh_5)


def test_mesh_xecbs_matches_single_device(trained_setup):
    """Flagship coverage: XECBS (is_ecbs=True, is_xcbs=True) over a 4-device
    'agent' mesh returns the same solution as the single-device run. The
    fused root+greedy program consumes the sharded team inputs
    (cbs._plan_root_greedy -> shard_team_inputs); the ECBS sequential soft
    root inside it stays a lax.scan over agents — inherently serial
    semantics (each agent avoids the previously-CHOSEN paths,
    reference cbs.py:316-335) — while the per-agent plan bodies, greedy
    child expansions, and conflict summaries shard. The multi-chip-NATIVE
    flagship alternative is XECBS-R (is_ecbs=True + root_repair_rounds:
    Jacobi batched root, covered below)."""
    starts, goals = get_start_goal_pos_circle(4, radius=0.4)

    def build(mesh):
        planners = _planners(trained_setup, starts, goals)
        return CBS(planners, starts, goals, is_ecbs=True, is_xcbs=True,
                   mesh=mesh)

    paths_1dev, exp_1dev = _solve(build(None))
    mesh = make_mesh([4], axis_names=("agent",))
    paths_mesh, exp_mesh = _solve(build(mesh))

    assert exp_mesh == exp_1dev
    assert len(paths_mesh) == len(paths_1dev)
    for pm, p1 in zip(paths_mesh, paths_1dev):
        np.testing.assert_allclose(np.asarray(pm), np.asarray(p1),
                                   rtol=1e-5, atol=1e-5)


def test_mesh_xecbs_jacobi_root(trained_setup):
    """XECBS-R on a 2-D (agent, dp) mesh: the Jacobi batched root + repair
    round (the multi-chip-native ECBS root analog) solves sharded."""
    starts, goals = get_start_goal_pos_circle(4, radius=0.4)
    planners = _planners(trained_setup, starts, goals)
    mesh = make_mesh([4, 2], axis_names=("agent", "dp"))
    cbs = CBS(planners, starts, goals, is_ecbs=True, is_xcbs=True,
              mesh=mesh, root_repair_rounds=1)
    _solve(cbs)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.common.multi_agent_utils import (
    get_start_goal_pos_circle,
    global_pad_paths,
    is_multi_agent_start_goal_states_valid,
)
from mmd_tpu.config import DiffusionConfig
from mmd_tpu.datagen.synthetic import generate_linear_dataset
from mmd_tpu.experiments.status import TrialSuccessStatus
from mmd_tpu.planners.multi_agent.cbs import CBS
from mmd_tpu.planners.multi_agent.conflict_detection import (
    candidate_conflict_counts,
    count_conflicts,
    find_conflicts,
)
from mmd_tpu.planners.multi_agent.prioritized_planning import PrioritizedPlanning
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


def test_global_pad_paths():
    p0 = np.zeros((4, 4))
    p1 = np.ones((6, 4))
    out = global_pad_paths([p0, p1], [2, 0])
    assert out[0].shape == (6, 4) and out[1].shape == (6, 4)
    np.testing.assert_allclose(out[0][:2], 0)  # repeated start
    out2 = global_pad_paths([p0, p1], [0, 0])
    np.testing.assert_allclose(out2[0][4:], 0)  # repeated last state


def test_find_conflicts_ordering_and_count():
    # Two agents crossing at t=2; one far agent.
    a = np.stack([np.linspace(-1, 1, 5), np.zeros(5)], axis=-1)
    b = np.stack([np.zeros(5), np.linspace(-1, 1, 5)], axis=-1)
    c = np.full((5, 2), 5.0)
    conflicts = find_conflicts([a, b, c], margin=0.2)
    assert len(conflicts) == 2  # ordered pairs (0,1) and (1,0)
    assert conflicts[0].agent_ids == [0, 1]
    assert conflicts[0].t_from == 2
    assert count_conflicts([a, b, c], 0.2) == 2
    assert count_conflicts([a, c], 0.2) == 0


def test_candidate_conflict_counts_matches_bruteforce():
    rng = np.random.default_rng(0)
    paths = rng.uniform(-1, 1, (4, 10, 2)).astype(np.float32)
    cands = rng.uniform(-1, 1, (8, 10, 2)).astype(np.float32)
    margin = 0.4
    counts = np.asarray(candidate_conflict_counts(
        jnp.asarray(cands), 1, jnp.asarray(paths), margin))
    for b in range(8):
        sub = paths.copy()
        sub[1] = cands[b]
        assert counts[b] == count_conflicts(list(sub), margin), b


def test_validity_gate():
    from mmd_tpu.robots.disk import DiskRobot
    from mmd_tpu.tasks.task import make_task

    task = make_task("EnvEmpty2D")
    robot = DiskRobot.make()
    starts, goals = get_start_goal_pos_circle(4)
    assert is_multi_agent_start_goal_states_valid(robot, task, starts, goals)
    bad = [np.array([0.0, 0.0]), np.array([0.01, 0.0])]
    assert not is_multi_agent_start_goal_states_valid(
        robot, task, bad, [np.array([0.5, 0.5]), np.array([-0.5, -0.5])])


def test_prioritized_planning_circle_swap(trained_setup):
    starts, goals = get_start_goal_pos_circle(3)
    planners = _planners(trained_setup, starts, goals)
    pp = PrioritizedPlanning(planners, starts, goals)
    paths, n_exp, status, n_coll = pp.plan(runtime_limit=120)
    assert n_exp == 0
    assert len(paths) == 3
    for p, s, g in zip(paths, starts, goals):
        np.testing.assert_allclose(p[0, :2], s, atol=0.1)
        np.testing.assert_allclose(p[-1, :2], g, atol=0.1)
    if status == TrialSuccessStatus.SUCCESS:
        assert n_coll == 0
        assert count_conflicts(paths, planners[0].robot.rr_margin) == 0


def test_cbs_circle_swap(trained_setup):
    starts, goals = get_start_goal_pos_circle(3)
    planners = _planners(trained_setup, starts, goals)
    cbs = CBS(planners, starts, goals, is_ecbs=False, is_xcbs=False)
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=180)
    assert len(paths) == 3
    if status == TrialSuccessStatus.SUCCESS:
        assert n_coll == 0
        assert count_conflicts(paths, planners[0].robot.rr_margin) == 0


def test_xecbs_runs(trained_setup):
    starts, goals = get_start_goal_pos_circle(3)
    planners = _planners(trained_setup, starts, goals)
    cbs = CBS(planners, starts, goals, is_ecbs=True, is_xcbs=True)
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=180)
    assert len(paths) == 3
    assert status in (TrialSuccessStatus.SUCCESS,
                      TrialSuccessStatus.FAIL_RUNTIME_LIMIT,
                      TrialSuccessStatus.FAIL_COLLISION_AGENTS,
                      TrialSuccessStatus.FAIL_NO_SOLUTION)


def test_cbs_least_cost_strategy(trained_setup):
    starts, goals = get_start_goal_pos_circle(3)
    planners = _planners(trained_setup, starts, goals)
    cbs = CBS(planners, starts, goals, is_ecbs=False, is_xcbs=False,
              choose_path_strategy="least_cost")
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=120)
    assert len(paths) == 3

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


def test_edge_conflict_detection_crossing_paths():
    """Two agents swapping positions between consecutive waypoints collide
    only at the midpoint: integral-time detection misses it, x2-densified
    detection emits an EdgeConflict (reference cbs.py:185-245)."""
    from mmd_tpu.common.conflicts import (
        EdgeConflict, PointConflict, VertexConflict)

    a = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 0.0]], np.float32)
    b = np.array([[1.0, 0.0], [0.0, 0.0], [0.0, 0.0]], np.float32)
    # Default (PointConflict-only, factor 1): the swap goes undetected.
    assert find_conflicts([a, b], margin=0.2) == []
    conflicts = find_conflicts(
        [a, b], margin=0.2,
        conflict_types=(EdgeConflict, VertexConflict, PointConflict))
    edges = [c for c in conflicts if isinstance(c, EdgeConflict)]
    assert edges and edges[0].t_from == 0 and edges[0].t_to == 1
    np.testing.assert_allclose(edges[0].q_from_map[0], [0, 0], atol=1e-6)
    np.testing.assert_allclose(edges[0].q_to_map[0], [1, 0], atol=1e-6)
    # The fractional hit also yields a PointConflict at the midpoint.
    points = [c for c in conflicts if isinstance(c, PointConflict)]
    assert points and (points[0].t_from, points[0].t_to) == (0, 1)
    # No vertex conflicts (integral times are collision-free).
    assert not any(isinstance(c, VertexConflict) for c in conflicts)


def test_vertex_conflict_detection_and_conversion():
    from mmd_tpu.common.conflicts import (
        EdgeConflict, PointConflict, VertexConflict)
    from mmd_tpu.common.conflict_conversion import convert_conflicts_to_constraints
    from mmd_tpu.common.constraints import (
        EdgeConstraint, MultiPointConstraint, VertexConstraint)

    a = np.array([[0.0, 0.0], [0.5, 0.5]], np.float32)
    b = np.array([[1.0, 1.0], [0.5, 0.5]], np.float32)
    conflicts = find_conflicts(
        [a, b], margin=0.2,
        conflict_types=(EdgeConflict, VertexConflict, PointConflict))
    verts = [c for c in conflicts if isinstance(c, VertexConflict)]
    assert verts and verts[0].t == 1
    cons = convert_conflicts_to_constraints(verts[0])
    assert all(isinstance(c, VertexConstraint) for c in cons.values())
    mp = cons[0].shifted(0, 0, 1).as_multipoint()
    assert isinstance(mp, MultiPointConstraint)
    edge = EdgeConstraint(q_from=np.zeros(2), q_to=np.ones(2), t_from=0, t_to=1)
    mp2 = edge.shifted(1, 0, 10).as_multipoint()
    assert len(mp2.q_l) == 3 and mp2.t_range_l[0] == (1, 3)


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


def test_cbs_rejects_invalid_start_goal(trained_setup):
    """CBS/PP must raise on overlapping starts (reference cbs.py:155-163)."""
    starts, goals = get_start_goal_pos_circle(2)
    starts[1] = starts[0] + 0.01  # overlapping pair
    planners = _planners(trained_setup, starts, goals)
    with pytest.raises(ValueError):
        CBS(planners, starts, goals, validate_start_goal=True)
    with pytest.raises(ValueError):
        PrioritizedPlanning(planners, starts, goals, validate_start_goal=True)
    # And the gate can be disabled.
    CBS(planners, starts, goals, validate_start_goal=False)


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


class _StubPlanner:
    """Fixed candidate batch; enough surface for PP's selection loop."""

    def __init__(self, trajs, robot, task):
        self.trajs = jnp.asarray(trajs, jnp.float32)  # (B, H, 4)
        self.robot = robot
        self.task = task

    def _run(self, constraints_l, experience):
        from types import SimpleNamespace
        B = self.trajs.shape[0]
        return SimpleNamespace(trajs_final=self.trajs,
                               free_mask=jnp.ones((B,), bool),
                               idx_best=jnp.asarray(0, jnp.int32))


def test_prioritized_planning_stagger_alignment():
    """With nonzero start times, PP's fewest-conflicts selection must compare
    globally padded (time-aligned) paths (reference prioritized_planning.py:
    150-183). Candidate 'bad' is free in the MISALIGNED comparison but
    collides globally; candidate 'good' is the reverse."""
    from mmd_tpu.robots.disk import DiskRobot
    from mmd_tpu.tasks.task import make_task

    robot = DiskRobot.make()
    task = make_task("EnvEmpty2D")

    def traj(points):
        pos = np.asarray(points, np.float32)
        return np.concatenate([pos, np.zeros_like(pos)], axis=-1)[None]

    # Agent 0 (t0=0): passes the origin at global t=1,2, ends far away.
    p0 = np.repeat(traj([(5, 5), (0, 0), (0, 0), (5, 5)]), 2, axis=0)
    # Agent 1 (t0=2): bad candidate sits at the origin for its stagger pad
    # (global t=0..2, colliding with agent 0 at t=1,2); good candidate
    # crosses the origin at local t=1 (global t=3, agent 0 already gone).
    bad = traj([(0, 0), (9, 9), (9, 9), (9, 9)])[0]
    good = traj([(9, 9), (0, 0), (8, 8), (8, 8)])[0]
    cand = np.stack([bad, good])

    planners = [_StubPlanner(p0, robot, task),
                _StubPlanner(cand, robot, task)]
    starts = [np.array([5.0, 5.0]), np.array([0.0, 0.0])]
    goals = [np.array([5.0, 5.0]), np.array([8.0, 8.0])]
    pp = PrioritizedPlanning(planners, starts, goals, start_time_l=[0, 2],
                             validate_start_goal=False)
    paths, _, status, n_coll = pp.plan(runtime_limit=60)
    assert n_coll == 0
    assert status == TrialSuccessStatus.SUCCESS
    # The good candidate (index 1) must have been selected.
    np.testing.assert_allclose(np.asarray(paths[1][-1, :2]), [8, 8], atol=1e-5)


def test_cbs_least_cost_strategy(trained_setup):
    starts, goals = get_start_goal_pos_circle(3)
    planners = _planners(trained_setup, starts, goals)
    cbs = CBS(planners, starts, goals, is_ecbs=False, is_xcbs=False,
              choose_path_strategy="least_cost")
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=120)
    assert len(paths) == 3


def test_prioritized_planning_fused_scan_matches_host(trained_setup,
                                                      monkeypatch):
    """The one-call fused PP scan (team.plan_prioritized_scan) solves the
    same instance the host loop solves, collision-free, in ONE device
    round trip; the host loop remains the staggered/ensemble fallback."""
    starts, goals = get_start_goal_pos_circle(4, radius=0.4)

    pp_host = PrioritizedPlanning(_planners(trained_setup, starts, goals),
                                  starts, goals)
    monkeypatch.setattr(pp_host, "_scan_eligible", lambda: False)
    paths_h, _, status_h, coll_h = pp_host.plan(runtime_limit=300)

    pp_fused = PrioritizedPlanning(_planners(trained_setup, starts, goals),
                                   starts, goals)
    assert pp_fused._scan_eligible()
    paths_f, n_exp, status_f, coll_f = pp_fused.plan(runtime_limit=300)

    assert status_f == status_h == TrialSuccessStatus.SUCCESS
    assert coll_f == 0 and n_exp == 0
    assert count_conflicts(paths_f, pp_fused.margin) == 0
    assert pp_fused.timing["device_calls"] == 1
    assert len(paths_f) == len(paths_h) == 4


def test_anytime_returns_best_near_miss(trained_setup, monkeypatch):
    """Anytime mode (beyond-reference): a runtime-limited search returns the
    LEAST-CONFLICTED node seen anywhere (popped or still open) with its
    residual conflict count, so FAIL_RUNTIME_LIMIT trials are measurable
    near-misses. anytime=False keeps the reference's last-popped return."""
    starts, goals = get_start_goal_pos_circle(6, radius=0.3)
    planners = _planners(trained_setup, starts, goals)
    cbs = CBS(planners, starts, goals, is_ecbs=True, is_xcbs=True)
    # Force the host-driven paths (no fused root+greedy fast path, which
    # could solve the instance inside its single call) and cut the budget
    # after exactly one expansion round.
    monkeypatch.setattr(cbs, "_greedy_kbuf", lambda state: None)
    # A NEGATIVE budget makes the deadline fire on the first check even
    # under the compile-time exclusion (a 0.0 budget is not deterministic
    # on a cold backend: excluding compile seconds leaves ~0 s elapsed, so
    # the search can legitimately POP a 0-conflict node and win). The root
    # of this instance has conflicts, so exactly one expansion happens and
    # the search must report FAIL_RUNTIME_LIMIT — the round-5 semantics: a
    # 0-conflict node merely sitting in the OPEN list at the deadline never
    # promotes the status to SUCCESS.
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=-1.0)
    assert len(paths) == 6
    assert status == TrialSuccessStatus.FAIL_RUNTIME_LIMIT
    # The residual count is the minimum over every node still open —
    # even 0-conflict open nodes improve the residual, not the status.
    assert n_coll == min(
        [n.n_conflicts for n in cbs.open_l] + [n_coll])

    # Fresh planners => identical PRNG streams => the same search tree;
    # anytime's best-seen return can only improve on the last-popped node.
    planners2 = _planners(trained_setup, starts, goals)
    cbs2 = CBS(planners2, starts, goals, is_ecbs=True, is_xcbs=True)
    monkeypatch.setattr(cbs2, "_greedy_kbuf", lambda state: None)
    paths2, _, status2, n_coll2 = cbs2.plan(runtime_limit=-1.0,
                                            anytime=False)
    assert status2 == TrialSuccessStatus.FAIL_RUNTIME_LIMIT
    assert n_coll <= n_coll2


def test_mid_search_repair_lever(trained_setup, monkeypatch):
    """repair_period > 0 (beyond-reference dense-instance lever): a Jacobi
    repair round on a popped node never worsens it (repair_accept's global
    monotonicity), the repaired sibling enters the open list only on strict
    improvement, and the search still returns a collision-free solution."""
    starts, goals = get_start_goal_pos_circle(6)
    planners = _planners(trained_setup, starts, goals)
    cbs = CBS(planners, starts, goals, is_ecbs=True, is_xcbs=True,
              repair_period=1)
    assert cbs._repair_eligible()

    calls = {"n": 0}
    real_repair = cbs._repair_root

    def counting_repair(state, free_all=None):
        out = real_repair(state, free_all)
        # Accept-if-improved damping + global monotonicity: the repaired
        # node is never worse than its source.
        assert out[0].n_conflicts <= state.n_conflicts
        calls["n"] += 1
        return out

    monkeypatch.setattr(cbs, "_repair_root", counting_repair)
    monkeypatch.setattr(CBS, "GREEDY_ITERS", 3)
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=600)
    assert status == TrialSuccessStatus.SUCCESS
    assert n_coll == 0
    assert count_conflicts(paths, planners[0].robot.rr_margin) == 0
    # Repair fires iff the search needed at least `repair_period`
    # expansions past the root round.
    if n_exp > 3:
        assert calls["n"] >= 1


def test_greedy_iters_instance_override(trained_setup):
    """greedy_iters= shadows CBS.GREEDY_ITERS per instance; default
    instances keep the (monkeypatchable) class attribute."""
    starts, goals = get_start_goal_pos_circle(3)
    planners = _planners(trained_setup, starts, goals)
    cbs = CBS(planners, starts, goals, greedy_iters=5)
    assert cbs.GREEDY_ITERS == 5
    cbs2 = CBS(planners, starts, goals)
    assert cbs2.GREEDY_ITERS == CBS.GREEDY_ITERS


def test_search_state_lazy_path_updates():
    """Deferred paths_all row updates: children created by the speculative
    paths carry (array, index) refs that materialize only when paths_all
    is read; duplicate-agent updates are last-wins; copies are isolated."""
    from mmd_tpu.planners.multi_agent.cbs import SearchState

    base = jnp.zeros((3, 4, 8, 2))
    trajs = jnp.arange(2 * 4 * 8 * 2, dtype=jnp.float32).reshape(2, 4, 8, 2)

    s = SearchState(base, [0, 0, 0])
    s.add_path_update(1, (trajs, (0,)))
    assert s.has_paths and s._pending          # not yet materialized
    copy = s.get_copy()
    copy.add_path_update(1, (trajs, (1,)))     # same agent: last wins
    copy.add_path_update(2, trajs[0])          # plain-array ref form

    out = np.asarray(copy.paths_all)
    assert not copy._pending                   # materialized once
    np.testing.assert_allclose(out[1], np.asarray(trajs[1]))
    np.testing.assert_allclose(out[2], np.asarray(trajs[0]))
    np.testing.assert_allclose(out[0], 0.0)

    # the original state is unaffected by the copy's updates
    orig = np.asarray(s.paths_all)
    np.testing.assert_allclose(orig[1], np.asarray(trajs[0]))
    np.testing.assert_allclose(orig[2], 0.0)

    # setter clears pending
    s.add_path_update(0, trajs[1])
    s.paths_all = base
    assert not s._pending
    np.testing.assert_allclose(np.asarray(s.paths_all), 0.0)

    # best_paths gathers rows on device (a (n, H, D) transfer, not the
    # whole sample batch) and respects pending updates
    s2 = SearchState(base, [2, 1, 3])
    s2.add_path_update(0, trajs[1])
    bp = s2.best_paths()
    assert len(bp) == 3 and bp[0].shape == (8, 2)
    np.testing.assert_allclose(bp[0], np.asarray(trajs[1, 2]))

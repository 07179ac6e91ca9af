"""Equivalence + branch-coverage tests for the speculative greedy CT search.

The greedy program (`cbs.py:_expand_greedy` + `fused.greedy_expand`) runs k
best-first expansions in one device call and must preserve host-driven CBS
semantics (reference: mmd/planners/multi_agent/cbs.py:365-466):

1. fewest-conflicts-first order — every node the greedy path expands has a
   conflict count <= the minimum over the open list at that moment (the
   reference sorts on the count alone; insertion-order tie-breaks are not
   semantic);
2. identical solution quality on the same instance as a run with the greedy
   path force-disabled (success + collision-free);
3. the host-side recovery branches — speculation freeze (device `valid`
   mask drops) and both-children-starved ECBS re-expansion — recover
   without corrupting the search.

The audit trail comes from `CBS.greedy_audit` (a test hook recording one
event per speculative step / recovery branch).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.common.conflicts import EdgeConflict, PointConflict, VertexConflict
from mmd_tpu.common.constraints import MultiPointConstraint
from mmd_tpu.common.multi_agent_utils import get_start_goal_pos_circle
from mmd_tpu.config import DiffusionConfig
from mmd_tpu.datagen.synthetic import generate_linear_dataset
from mmd_tpu.experiments.status import TrialSuccessStatus
from mmd_tpu.planners.multi_agent import fused
from mmd_tpu.planners.multi_agent.cbs import CBS, SearchState
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


def _xecbs(trained_setup, n_agents=6, radius=0.3):
    """A conflict-rich instance: n agents swapping antipodally through the
    circle center (the bench instance shape, smaller radius => denser)."""
    starts, goals = get_start_goal_pos_circle(n_agents, radius=radius)
    planners = _planners(trained_setup, starts, goals)
    return CBS(planners, starts, goals, is_ecbs=True, is_xcbs=True)


def _assert_collision_free(cbs, paths, status, n_coll):
    assert status == TrialSuccessStatus.SUCCESS
    assert n_coll == 0
    assert count_conflicts(paths, cbs.margin) == 0


# --------------------------------------------------------------------------
# 1+2. Seed-matched equivalence and the best-first invariant
# --------------------------------------------------------------------------

def test_greedy_matches_host_driven_search(trained_setup, monkeypatch):
    """Same instance, greedy enabled vs force-disabled: identical solution
    quality (success + collision-free), and every node the greedy path
    expands respects fewest-conflicts-first order vs the live open list."""
    monkeypatch.setattr(CBS, "GREEDY_ITERS", 3)  # shrink the CPU program

    # Host-driven reference run: same construction (=> same per-planner
    # PRNG streams), greedy gate forced off.
    cbs_host = _xecbs(trained_setup)
    monkeypatch.setattr(cbs_host, "_greedy_kbuf", lambda state: None)
    paths_h, exp_h, status_h, coll_h = cbs_host.plan(runtime_limit=600)
    _assert_collision_free(cbs_host, paths_h, status_h, coll_h)

    # Greedy run with the audit trail on.
    cbs_g = _xecbs(trained_setup)
    cbs_g.greedy_audit = audit = []
    paths_g, exp_g, status_g, coll_g = cbs_g.plan(runtime_limit=600)
    _assert_collision_free(cbs_g, paths_g, status_g, coll_g)

    steps = [e for e in audit if e[0] == "step"]
    # The instance is dense enough that the greedy path actually ran.
    assert exp_g > 0 and len(steps) > 0
    # Best-first invariant: each expanded node is a minimum of the open list.
    for _, n_conflicts, min_open in steps:
        assert min_open is None or n_conflicts <= min_open, audit
    # Greedy stop decisions only trigger when continuing would break the
    # invariant (chosen strictly worse than an open node) or on a solution.
    for e in audit:
        if e[0] == "stop":
            _, chosen, min_open = e
            assert chosen == 0 or (min_open is not None and chosen > min_open)


def test_greedy_large_constraint_buffer(trained_setup, monkeypatch):
    """The K=48 compiled variant solves the same instance (the adaptive
    buffer choice normally reserves it for deep searches)."""
    monkeypatch.setattr(CBS, "GREEDY_ITERS", 3)
    monkeypatch.setattr(CBS, "GREEDY_KBUFS", (48,))
    cbs = _xecbs(trained_setup)
    cbs.greedy_audit = audit = []
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=600)
    _assert_collision_free(cbs, paths, status, n_coll)
    steps = [e for e in audit if e[0] == "step"]
    assert steps, "greedy path never engaged; instance too easy"
    for _, n_conflicts, min_open in steps:
        assert min_open is None or n_conflicts <= min_open


# --------------------------------------------------------------------------
# 3. Buffer selection logic (host gate, no device work)
# --------------------------------------------------------------------------

def _gate_state(planners, n_cons, *, soft=False, n_points=1,
                conflict=True):
    state = SearchState(jnp.zeros((len(planners), 2, 64, 4)),
                        [0] * len(planners))
    state.n_conflicts = 1 if conflict else 0
    if conflict:
        state.first_conflict = PointConflict(
            agent_ids=[0, 1], p_l=[np.zeros(2)] * 2, q_l=[np.zeros(2)] * 2,
            t_from=3, t_to=3)
    cons = [MultiPointConstraint(q_l=[np.zeros(2)] * n_points,
                                 t_range_l=[(1, 2)] * n_points,
                                 radius_l=[0.1] * n_points, is_soft=soft)
            for _ in range(n_cons)]
    if cons:
        state.constraints[0] = cons
    return state


def test_greedy_kbuf_adaptive_selection(trained_setup):
    starts, goals = get_start_goal_pos_circle(2)
    planners = _planners(trained_setup, starts, goals)
    cbs = CBS(planners, starts, goals, is_ecbs=True, is_xcbs=True)

    # Small buffer while max_cons + 1 <= 16; large to 48; None past it.
    assert cbs._greedy_kbuf(_gate_state(planners, 0)) == 16
    assert cbs._greedy_kbuf(_gate_state(planners, 15)) == 16
    assert cbs._greedy_kbuf(_gate_state(planners, 16)) == 48
    assert cbs._greedy_kbuf(_gate_state(planners, 47)) == 48
    assert cbs._greedy_kbuf(_gate_state(planners, 48)) is None

    # Ineligible constraint shapes: soft or multi-point constraints.
    assert cbs._greedy_kbuf(_gate_state(planners, 1, soft=True)) is None
    assert cbs._greedy_kbuf(_gate_state(planners, 1, n_points=3)) is None

    # Ineligible configurations fall back to the host-driven paths.
    cbs.choose_path_strategy = "least_cost"
    assert cbs._greedy_kbuf(_gate_state(planners, 0)) is None
    cbs.choose_path_strategy = "least_collisions"
    cbs.uniform_time = False
    assert cbs._greedy_kbuf(_gate_state(planners, 0)) is None
    cbs.uniform_time = True
    cbs._densify = 2
    assert cbs._greedy_kbuf(_gate_state(planners, 0)) is None
    cbs._densify = 1
    assert cbs._greedy_kbuf(_gate_state(planners, 0)) == 16

    # Edge-conflict-typed searches never take the greedy path end to end.
    cbs_edge = CBS(planners, starts, goals, is_ecbs=True, is_xcbs=True,
                   conflict_types=(EdgeConflict, VertexConflict,
                                   PointConflict))
    assert cbs_edge._greedy_kbuf(_gate_state(planners, 0)) is None


# --------------------------------------------------------------------------
# 4. Recovery branches, driven deterministically by doctoring the device
#    program's outputs (the host must recover from any (free, valid) mask).
# --------------------------------------------------------------------------

def _doctor_greedy(monkeypatch, mutate):
    """Wrap fused.greedy_expand; `mutate(arrays, call_index)` edits the
    host-visible scalar outputs (indices into outs[1:]: 0=agents, 1=free,
    2=ix, 3=counts, 4..7=conflict scalars, 8=chosen, 9=valid)."""
    real = fused.greedy_expand
    calls = []

    def wrapper(*args, **kwargs):
        outs = real(*args, **kwargs)
        arrays = [np.array(x) for x in jax.device_get(outs[1:])]
        mutate(arrays, len(calls))
        calls.append(1)
        return (outs[0], *arrays)

    monkeypatch.setattr(fused, "greedy_expand", wrapper)
    return calls


def test_greedy_immediate_freeze_falls_back(trained_setup, monkeypatch):
    """valid[0]=False on the first call: zero accepted expansions, so the
    caller must take the host-driven expand() path and still solve."""
    monkeypatch.setattr(CBS, "GREEDY_ITERS", 3)

    def mutate(arrays, call_idx):
        if call_idx == 0:
            arrays[9][:] = False

    _doctor_greedy(monkeypatch, mutate)
    cbs = _xecbs(trained_setup)
    monkeypatch.setattr(cbs, "_root_greedy_eligible", lambda: False)
    cbs.greedy_audit = audit = []
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=600)
    _assert_collision_free(cbs, paths, status, n_coll)
    assert ("freeze",) in audit


def test_greedy_mid_speculation_freeze_requeues_node(trained_setup,
                                                     monkeypatch):
    """valid[1:]=False: the step-0 child is accepted, then speculation
    freezes; the unexpanded greedy node must return to the open list (not
    be dropped) and the search must still finish collision-free."""
    monkeypatch.setattr(CBS, "GREEDY_ITERS", 3)

    def mutate(arrays, call_idx):
        if call_idx == 0:
            arrays[9][1:] = False

    _doctor_greedy(monkeypatch, mutate)
    cbs = _xecbs(trained_setup)
    monkeypatch.setattr(cbs, "_root_greedy_eligible", lambda: False)
    cbs.greedy_audit = audit = []
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=600)
    _assert_collision_free(cbs, paths, status, n_coll)
    kinds = [e[0] for e in audit]
    assert "step" in kinds and "freeze" in kinds
    # The freeze followed at least one accepted step in the same call.
    assert kinds.index("step") < kinds.index("freeze")


def test_greedy_both_children_starved_ecbs_reexpands(trained_setup,
                                                     monkeypatch):
    """free[0,:]=False with valid[0]=True: both children starved. Under
    ECBS the node must be re-expanded through the batched path (whose
    hard-only retry recovers the children) — the search still succeeds."""
    monkeypatch.setattr(CBS, "GREEDY_ITERS", 3)

    def mutate(arrays, call_idx):
        if call_idx == 0:
            arrays[1][0, :] = False

    _doctor_greedy(monkeypatch, mutate)
    cbs = _xecbs(trained_setup)
    monkeypatch.setattr(cbs, "_root_greedy_eligible", lambda: False)
    cbs.greedy_audit = audit = []

    expand_calls = []
    real_expand = cbs.expand

    def spy_expand(state):
        expand_calls.append(state)
        return real_expand(state)

    monkeypatch.setattr(cbs, "expand", spy_expand)
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=600)
    _assert_collision_free(cbs, paths, status, n_coll)
    assert ("starved",) in audit
    assert expand_calls, "starved ECBS node was not re-expanded"


# --------------------------------------------------------------------------
# 5. Fused root+greedy: root creation + summary + speculative descent in
#    ONE device call (fused.root_greedy).
# --------------------------------------------------------------------------

def test_root_greedy_matches_split_path(trained_setup, monkeypatch):
    """Root-greedy enabled vs force-disabled (split root + per-node greedy):
    identical solution quality, best-first invariant holds, and the fused
    path spends strictly fewer device round trips."""
    monkeypatch.setattr(CBS, "GREEDY_ITERS", 3)

    cbs_split = _xecbs(trained_setup)
    monkeypatch.setattr(cbs_split, "_root_greedy_eligible", lambda: False)
    paths_s, exp_s, status_s, coll_s = cbs_split.plan(runtime_limit=600)
    _assert_collision_free(cbs_split, paths_s, status_s, coll_s)

    cbs_fused = _xecbs(trained_setup)
    assert cbs_fused._root_greedy_eligible()
    cbs_fused.greedy_audit = audit = []
    paths_f, exp_f, status_f, coll_f = cbs_fused.plan(runtime_limit=600)
    _assert_collision_free(cbs_fused, paths_f, status_f, coll_f)

    steps = [e for e in audit if e[0] == "step"]
    assert exp_f > 0 and steps, "fused root+greedy path never engaged"
    for _, n_conflicts, min_open in steps:
        assert min_open is None or n_conflicts <= min_open, audit
    assert (cbs_fused.timing["device_calls"]
            < cbs_split.timing["device_calls"])


def test_root_greedy_conflict_free_root_skips_child_compute(trained_setup,
                                                            monkeypatch):
    """Regression: a conflict-free root must not pay ANY speculative child
    plans inside the fused root_greedy program (it used to run one full
    while_loop iteration — two complete guided replans — before the carry
    froze on count0==0, taxing every easy instance in every sweep table).

    Under jax.disable_jit() the while_loop runs as a Python loop, so every
    child plan is an observable call to the fused module's
    guided_p_sample_loop; the root's own plans route through
    parallel.team's separate import and are not counted."""
    monkeypatch.setattr(CBS, "GREEDY_ITERS", 3)
    child_plans = []
    real_loop = fused.guided_p_sample_loop
    monkeypatch.setattr(
        fused, "guided_p_sample_loop",
        lambda *a, **kw: child_plans.append(1) or real_loop(*a, **kw))

    # Two far-apart agents: the root is conflict-free.
    starts = [np.array([-0.7, -0.7], np.float32),
              np.array([0.7, 0.7], np.float32)]
    goals = [np.array([-0.7, 0.7], np.float32),
             np.array([0.7, -0.7], np.float32)]
    planners = _planners(trained_setup, starts, goals)
    cbs = CBS(planners, starts, goals, is_ecbs=True, is_xcbs=True)
    assert cbs._root_greedy_eligible()
    with jax.disable_jit():
        paths, n_exp, status, n_coll = cbs.plan(runtime_limit=600)
    _assert_collision_free(cbs, paths, status, n_coll)
    assert n_exp == 0
    assert not child_plans, (
        f"conflict-free root paid {len(child_plans)} speculative child plans")

    # Counter sanity: on a conflict-guaranteed instance the same wrapper
    # DOES observe child plans (two per greedy iteration). Head-on swap
    # with INDEPENDENT roots (is_ecbs=False): the vmapped fresh root can't
    # soft-avoid, so the root conflict survives into the greedy loop.
    # (An XECBS sequential-soft root resolves a 2-agent swap by itself —
    # which, post-fix, correctly skips all child compute.)
    starts2 = [np.array([-0.5, 0.0], np.float32),
               np.array([0.5, 0.0], np.float32)]
    goals2 = [starts2[1], starts2[0]]
    planners2 = _planners(trained_setup, starts2, goals2)
    cbs2 = CBS(planners2, starts2, goals2, is_ecbs=False, is_xcbs=True)
    assert cbs2._root_greedy_eligible()
    with jax.disable_jit():
        cbs2.plan(runtime_limit=600)
    assert child_plans, "counter never fired; the test hook is dead"


def test_frontier_child_matches_greedy_first_iteration(trained_setup):
    """Device-level equivalence of the two fused expansion programs: for the
    SAME node, buffers, and per-child PRNG keys, `fused.frontier_expand`
    (M=1) must reproduce `fused.greedy_expand`'s first-iteration child
    records EXACTLY (the host frontier path is sound only because each
    child is the identical single-node expansion)."""
    from mmd_tpu.config import params as default_params
    from mmd_tpu.models.diffusion import HardConds

    cbs = _xecbs(trained_setup)
    root, _ = cbs._plan_root_greedy()
    assert root is not None and root.n_conflicts > 0

    p0 = cbs.low_level_planner_l[0]
    A = cbs.num_agents
    K = cbs.GREEDY_KBUFS[0]
    hard_all = HardConds(
        mask=p0.hard_conds.mask,
        values=jnp.stack([p.hard_conds.values
                          for p in cbs.low_level_planner_l]))
    cons_q = jnp.zeros((A, K, 2), jnp.float32)
    cons_t = jnp.zeros((A, K, 2), jnp.float32)
    cons_n = jnp.zeros((A,), jnp.int32)
    fc = root.first_conflict
    conflict0 = (jnp.asarray(root.n_conflicts, jnp.int32),
                 jnp.asarray(fc.t_from, jnp.int32),
                 jnp.asarray(fc.agent_ids[0], jnp.int32),
                 jnp.asarray(fc.agent_ids[1], jnp.int32),
                 jnp.asarray(fc.q_l[0], jnp.float32)[:2])
    keys = jax.random.split(jax.random.PRNGKey(42), 2).reshape(1, 2, 2)
    common_tail = (cbs.margin,
                   jnp.asarray(default_params.vertex_constraint_radius),
                   jnp.asarray(default_params.weight_grad_cost_constraints),
                   jnp.asarray(default_params.vertex_constraint_radius),
                   jnp.asarray(default_params.weight_grad_cost_soft_constraints))
    static = dict(use_soft=True, local=True,
                  n_noise=default_params.n_local_inference_noising_steps,
                  n_denoise=default_params.n_local_inference_denoising_steps)
    shared = (p0.model.apply, p0.params, p0.schedule, hard_all, keys,
              p0.cfg, p0.guide_cfg, p0.task.scene, p0.dataset.normalizer,
              p0.robot.radius, p0.robot.q_min, p0.robot.q_max, p0._savgol)

    ixb = jnp.asarray(root.ix_best, jnp.int32)
    outs_g = fused.greedy_expand(
        *shared, root.paths_all, ixb, cons_q, cons_t, cons_n, conflict0,
        *common_tail, k_iters=1, **static)
    (gt, g_agents, g_free, g_ix, g_count, g_t, g_a, g_b, g_mid,
     _chosen, _valid) = (np.asarray(x) for x in outs_g)

    outs_f = fused.frontier_expand(
        *shared, root.paths_all[None], ixb[None], cons_q[None], cons_t[None],
        cons_n[None], tuple(c[None] for c in conflict0), *common_tail,
        **static)
    (ft, f_free, f_ix, f_count, f_t, f_a, f_b, f_mid, f_agents) = (
        np.asarray(x) for x in outs_f)

    np.testing.assert_array_equal(f_agents[0], g_agents[0])
    np.testing.assert_array_equal(f_free[0], g_free[0])
    np.testing.assert_array_equal(f_ix[0], g_ix[0])
    np.testing.assert_array_equal(f_count[0], g_count[0])
    np.testing.assert_array_equal(f_t[0], g_t[0])
    np.testing.assert_allclose(f_mid[0], g_mid[0], rtol=1e-6)
    np.testing.assert_allclose(ft[0], gt[0], rtol=1e-5, atol=1e-6)


def test_frontier_greedy_matches_per_node_greedy(trained_setup):
    """Device-level equivalence of the parallel-descent frontier: for the
    SAME nodes, buffers, and per-node PRNG keys,
    `fused.frontier_greedy_expand` (M=2) must reproduce
    `fused.greedy_expand`'s full k-iteration records for each node — the
    frontier is literally a vmap of the greedy program over the node axis,
    so throughput mode explores exactly the chains M sequential greedy
    calls would."""
    from mmd_tpu.config import params as default_params
    from mmd_tpu.models.diffusion import HardConds

    cbs = _xecbs(trained_setup)
    root, _ = cbs._plan_root_greedy()
    assert root is not None and root.n_conflicts > 0

    p0 = cbs.low_level_planner_l[0]
    A = cbs.num_agents
    K = cbs.GREEDY_KBUFS[0]
    k_iters = 2
    hard_all = HardConds(
        mask=p0.hard_conds.mask,
        values=jnp.stack([p.hard_conds.values
                          for p in cbs.low_level_planner_l]))
    cons_q = jnp.zeros((A, K, 2), jnp.float32)
    cons_t = jnp.zeros((A, K, 2), jnp.float32)
    cons_n = jnp.zeros((A,), jnp.int32)
    fc = root.first_conflict
    conflict0 = (jnp.asarray(root.n_conflicts, jnp.int32),
                 jnp.asarray(fc.t_from, jnp.int32),
                 jnp.asarray(fc.agent_ids[0], jnp.int32),
                 jnp.asarray(fc.agent_ids[1], jnp.int32),
                 jnp.asarray(fc.q_l[0], jnp.float32)[:2])
    keys_m = jax.random.split(jax.random.PRNGKey(7),
                              2 * k_iters * 2).reshape(2, k_iters, 2, 2)
    common_tail = (cbs.margin,
                   default_params.vertex_constraint_radius,
                   default_params.weight_grad_cost_constraints,
                   default_params.vertex_constraint_radius,
                   default_params.weight_grad_cost_soft_constraints)
    static = dict(use_soft=True, local=True,
                  n_noise=default_params.n_local_inference_noising_steps,
                  n_denoise=default_params.n_local_inference_denoising_steps,
                  k_iters=k_iters)
    shared = (p0.model.apply, p0.params, p0.schedule, hard_all)
    inv = (p0.cfg, p0.guide_cfg, p0.task.scene, p0.dataset.normalizer,
           p0.robot.radius, p0.robot.q_min, p0.robot.q_max, p0._savgol)

    ixb = jnp.asarray(root.ix_best, jnp.int32)
    # Two "nodes": the root twice, with different key streams.
    outs_f = fused.frontier_greedy_expand(
        *shared, keys_m, *inv, root.paths_all[None].repeat(2, 0),
        ixb[None].repeat(2, 0), cons_q[None].repeat(2, 0),
        cons_t[None].repeat(2, 0), cons_n[None].repeat(2, 0),
        tuple(jnp.stack([c, c]) for c in conflict0), *common_tail, **static)
    outs_f = [np.asarray(x) for x in outs_f]

    for m in range(2):
        outs_g = fused.greedy_expand(
            *shared, keys_m[m], *inv, root.paths_all, ixb, cons_q, cons_t,
            cons_n, conflict0, *common_tail, **static)
        outs_g = [np.asarray(x) for x in outs_g]
        for f_leaf, g_leaf in zip(outs_f, outs_g):
            np.testing.assert_allclose(f_leaf[m], g_leaf, rtol=2e-5,
                                       atol=1e-5)


def test_frontier_width_search_sound(trained_setup, monkeypatch):
    """End-to-end: frontier_width=4 on the dense instance reaches a
    collision-free solution with >= one genuinely multi-node frontier round.
    The fused root+greedy fast path and the greedy descent are forced off so
    the search deterministically routes expansions through the frontier
    (they would otherwise solve this instance before the open list ever
    holds two nodes)."""
    starts, goals = get_start_goal_pos_circle(6, radius=0.3)
    planners = _planners(trained_setup, starts, goals)
    cbs = CBS(planners, starts, goals, is_ecbs=True, is_xcbs=True,
              frontier_width=4)
    monkeypatch.setattr(cbs, "_root_greedy_eligible", lambda: False)
    monkeypatch.setattr(cbs, "_expand_greedy", lambda state: 0)
    rounds = []
    orig = CBS._expand_frontier

    def spy(self, st):
        r = orig(self, st)
        rounds.append(r)
        return r

    monkeypatch.setattr(CBS, "_expand_frontier", spy)
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=900)
    _assert_collision_free(cbs, paths, status, n_coll)
    assert any(r >= 2 for r in rounds), f"no multi-node round fired: {rounds}"
    assert n_exp >= sum(rounds)


def test_root_greedy_solved_root_and_infeasible_root(trained_setup,
                                                     monkeypatch):
    """Root with zero conflicts: success with 0 expansions in one device
    call. Root with an infeasible agent: FAIL_NO_SOLUTION, as the split
    path reports."""
    monkeypatch.setattr(CBS, "GREEDY_ITERS", 3)

    # Two far-apart agents: the root is conflict-free.
    starts = [np.array([-0.7, -0.7], np.float32),
              np.array([0.7, 0.7], np.float32)]
    goals = [np.array([-0.7, 0.7], np.float32),
             np.array([0.7, -0.7], np.float32)]
    planners = _planners(trained_setup, starts, goals)
    cbs = CBS(planners, starts, goals, is_ecbs=True, is_xcbs=True)
    assert cbs._root_greedy_eligible()
    paths, n_exp, status, n_coll = cbs.plan(runtime_limit=600)
    _assert_collision_free(cbs, paths, status, n_coll)
    assert n_exp == 0
    assert cbs.timing["device_calls"] == 1

    # Doctor the fused program to report a starved root agent
    # (`_plan_root_greedy` imports root_greedy from the fused module at
    # call time, so patching the module attribute intercepts it).
    real = fused.root_greedy

    def starved_root(*args, **kwargs):
        team_out, summary, outs = real(*args, **kwargs)
        free_any = np.array(jax.device_get(team_out[1]))
        free_any[0] = False
        return ((team_out[0], jnp.asarray(free_any), *team_out[2:]),
                summary, outs)

    monkeypatch.setattr(fused, "root_greedy", starved_root)
    cbs2 = _xecbs(trained_setup)
    paths2, n_exp2, status2, _ = cbs2.plan(runtime_limit=600)
    assert status2 == TrialSuccessStatus.FAIL_NO_SOLUTION
    assert paths2 == [] and n_exp2 == 0

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.common.constraints import MultiPointConstraint
from mmd_tpu.costs.constraints import (
    constraint_cost_single,
    empty_constraint_set,
    pack_constraint_set,
)
from mmd_tpu.costs.gp import gp_trajectory_cost
from mmd_tpu.costs.guide import (
    GuideConfig,
    GuideData,
    collision_cost_objects,
    guide_gradient,
)
from mmd_tpu.datasets.normalization import LimitsNormalizer
from mmd_tpu.envs.envs import make_env


def _const_vel_traj(start, vel, dt, h=64):
    t = np.arange(h, dtype=np.float32)[:, None]
    pos = np.asarray(start, np.float32) + t * dt * np.asarray(vel, np.float32)
    v = np.tile(np.asarray(vel, np.float32)[None], (h, 1))
    return np.concatenate([pos, v], axis=-1)


def test_gp_cost_zero_for_constant_velocity():
    dt = 5.0 / 64.0
    traj = jnp.asarray(_const_vel_traj([0, 0], [0.1, -0.05], dt)[None])
    c = gp_trajectory_cost(traj, dt)
    np.testing.assert_allclose(np.asarray(c), 0.0, atol=1e-3)


def test_gp_cost_positive_for_jerky():
    dt = 5.0 / 64.0
    rng = np.random.default_rng(0)
    traj = jnp.asarray(rng.normal(size=(1, 64, 4)).astype(np.float32))
    assert float(gp_trajectory_cost(traj, dt)[0]) > 1.0


def test_gp_cost_matches_reference_quadratic_form():
    # Hand-computed 2-step case, q_dim=1 (state [p, v]).
    dt = 0.5
    trajs = jnp.asarray(np.array([[[0.0, 1.0], [0.7, 1.0]]], np.float32))
    # e = s1 - Phi s0 = [0.7 - (0 + 0.5*1), 1 - 1] = [0.2, 0].
    # Q_inv = [[12/dt^3, -6/dt^2], [-6/dt^2, 4/dt]] = [[96, -24], [-24, 8]].
    expected = 0.2 * 96 * 0.2
    np.testing.assert_allclose(float(gp_trajectory_cost(trajs, dt)[0]), expected, rtol=1e-5)


def test_constraint_cost_value_and_masking():
    c = MultiPointConstraint(q_l=[np.array([0.5, 0.5])], t_range_l=[(10, 20)],
                             radius_l=[0.2])
    cset = pack_constraint_set([c], max_constraints=2, max_points=4)
    # Trajectory parked exactly at the constraint center.
    q_pos = jnp.tile(jnp.array([[0.5, 0.5]]), (64, 1))[None]
    cost0 = constraint_cost_single(q_pos, cset, 0)
    # 10 in-range waypoints, each contributing radius - 0 = 0.2.
    np.testing.assert_allclose(float(cost0[0]), 10 * 0.2, atol=1e-6)
    # Inactive padded constraint contributes zero.
    np.testing.assert_allclose(float(constraint_cost_single(q_pos, cset, 1)[0]), 0.0)
    # Far away: zero.
    far = jnp.tile(jnp.array([[-0.9, -0.9]]), (64, 1))[None]
    np.testing.assert_allclose(float(constraint_cost_single(far, cset, 0)[0]), 0.0)


def test_collision_cost_gradient_pushes_out_of_obstacle():
    env = make_env("EnvConveyor2D")
    cfg = GuideConfig()
    # Trajectory skimming the right edge of the middle box (x=0.4, y=0).
    traj = _const_vel_traj([0.42, 0.0], [0.0, 0.0], cfg.dt)[None]
    g = jax.grad(lambda u: collision_cost_objects(u, env.scene, cfg).sum())(
        jnp.asarray(traj))
    # d cost / dx < 0 at interior waypoints: moving +x reduces penetration.
    assert float(g[0, 30, 0]) < 0
    assert float(g[0, 0, 0]) == 0.0  # waypoint 0 excluded from collision range


def test_guide_gradient_endpoints_zero_and_direction():
    env = make_env("EnvConveyor2D")
    cfg = GuideConfig()
    norm = LimitsNormalizer.from_limits([-1, -1, -2, -2], [1, 1, 2, 2])
    gd = GuideData(scene=env.scene, normalizer=norm,
                   constraints=empty_constraint_set(4, 4))
    traj = _const_vel_traj([0.42, 0.0], [0.0, 0.0], cfg.dt)[None]
    x_norm = norm.normalize(jnp.asarray(traj))
    g = guide_gradient(x_norm, gd, cfg)
    assert g.shape == x_norm.shape
    np.testing.assert_allclose(np.asarray(g[0, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(g[0, -1]), 0.0)
    # Guide pushes +x (out of the obstacle) at interior waypoints.
    assert float(g[0, 30, 0]) > 0


def test_guide_gradient_respects_constraints():
    env = make_env("EnvEmpty2D")
    cfg = GuideConfig()
    norm = LimitsNormalizer.from_limits([-1, -1, -2, -2], [1, 1, 2, 2])
    c = MultiPointConstraint(q_l=[np.array([0.0, 0.0])], t_range_l=[(20, 40)],
                             radius_l=[0.3])
    cset = pack_constraint_set([c], max_constraints=4, max_points=4)
    gd = GuideData(scene=env.scene, normalizer=norm, constraints=cset)
    # Trajectory parked at the constraint center with zero velocity.
    traj = _const_vel_traj([0.01, 0.0], [0.0, 0.0], cfg.dt)[None]
    g = guide_gradient(norm.normalize(jnp.asarray(traj)), gd, cfg)
    # Constrained waypoints get pushed away (+x) much harder than
    # unconstrained ones (which only feel float-noise GP gradients).
    assert float(g[0, 30, 0]) > 1e-2
    assert abs(float(g[0, 10, 0])) < 1e-3


def test_guide_jit_and_constraint_swap_no_recompile():
    env = make_env("EnvEmpty2D")
    cfg = GuideConfig()
    norm = LimitsNormalizer.from_limits([-1, -1, -2, -2], [1, 1, 2, 2])
    f = jax.jit(guide_gradient, static_argnames=("cfg",))
    x = jnp.zeros((8, 64, 4))
    c1 = empty_constraint_set(4, 4)
    c2 = pack_constraint_set(
        [MultiPointConstraint(q_l=[np.zeros(2)], t_range_l=[(0, 10)], radius_l=[0.1])],
        max_constraints=4, max_points=4)
    g1 = f(x, GuideData(scene=env.scene, normalizer=norm, constraints=c1), cfg)
    g2 = f(x, GuideData(scene=env.scene, normalizer=norm, constraints=c2), cfg)
    assert f._cache_size() == 1
    assert g1.shape == g2.shape


def test_gp_prior_sampling_statistics():
    """MultiMPPrior analog: samples pin start/goal, scatter mid-horizon,
    and have near-zero mean deviation (mp_priors_multi.py:15-110)."""
    import jax

    from mmd_tpu.costs.gp import const_vel_trajectory, sample_gp_prior

    H, dt = 32, 0.1
    start = jnp.asarray([-0.5, -0.5, 0.0, 0.0])
    goal = jnp.asarray([0.5, 0.5, 0.0, 0.0])
    trajs = sample_gp_prior(jax.random.PRNGKey(0), start, goal, H, dt, 256)
    assert trajs.shape == (256, H, 4)
    mean = const_vel_trajectory(start, goal, H, dt)
    # Endpoints pinned by the tight start/goal factors.
    np.testing.assert_allclose(np.asarray(trajs[:, 0, :2]).mean(0),
                               [-0.5, -0.5], atol=5e-3)
    assert float(np.abs(np.asarray(trajs[:, 0, :2]) - (-0.5)).std()) < 5e-3
    np.testing.assert_allclose(np.asarray(trajs[:, -1, :2]).mean(0),
                               [0.5, 0.5], atol=5e-3)
    # Mid-horizon scatter well above endpoint scatter.
    mid_std = float(np.asarray(trajs[:, H // 2, :2]).std(0).mean())
    assert mid_std > 0.02
    # Sample mean tracks the const-vel mean.
    err = np.abs(np.asarray(trajs.mean(0)) - np.asarray(mean))[:, :2].max()
    assert err < 0.05, err


# ------------------------------------------------------------- cost zoo
def test_cost_max_velocity_hand_computed():
    from mmd_tpu.costs.zoo import cost_max_velocity

    dt, vmax = 0.5, 1.0
    pos = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]],
                   np.float32)
    traj = np.concatenate([pos, np.zeros_like(pos)], -1)[None]
    c = np.asarray(cost_max_velocity(jnp.asarray(traj), dt, vmax))
    # central diff: borders zero-padded -> vel (0,0), interior (2,0).
    # per-waypoint cost = sum_d (vel_d - 1)^2.
    expect = np.array([[2.0, 1.0 + 1.0, 1.0 + 1.0, 2.0]])
    np.testing.assert_allclose(c, expect, atol=1e-6)


def test_cost_smoothness_chomp_matches_bruteforce():
    from mmd_tpu.costs.zoo import chomp_precision, cost_smoothness_chomp

    rng = np.random.default_rng(0)
    dt, H = 0.1, 8
    trajs = rng.normal(size=(3, H, 4)).astype(np.float32)
    got = np.asarray(cost_smoothness_chomp(jnp.asarray(trajs), dt))
    # Brute force: build the backward-difference operator explicitly
    # (chomp.py:82-101) and sum x_d^T K^T K x_d over state dims.
    K = np.eye(H) - np.diag(np.ones(H - 1), -1)
    K = np.concatenate([K, np.zeros((1, H))], 0)
    K[-1, -1] = -1.0
    K = K / dt**2
    R = K.T @ K
    np.testing.assert_allclose(R, chomp_precision(H, dt), rtol=1e-6)
    expect = np.einsum("btd,ts,bsd->b", trajs, R, trajs)
    np.testing.assert_allclose(got, expect, rtol=2e-4)
    # Straight constant-velocity interior rows are annihilated by the
    # second-difference structure except the boundary rows.
    const = np.tile(np.array([[1.0, 2.0, 0, 0]], np.float32), (H, 1))[None]
    interior = np.asarray(cost_smoothness_chomp(jnp.asarray(const), dt))
    np.testing.assert_allclose(
        interior, np.einsum("btd,ts,bsd->b", const, R, const), rtol=1e-5)


def test_cost_joint_limits_hand_computed():
    from mmd_tpu.costs.zoo import cost_joint_limits

    q_min = jnp.array([-1.0, -1.0])
    q_max = jnp.array([1.0, 1.0])
    eps = 0.1
    inside = np.zeros((1, 5, 4), np.float32)
    np.testing.assert_allclose(
        np.asarray(cost_joint_limits(jnp.asarray(inside), q_min, q_max, eps)),
        [0.0])
    # One waypoint 0.05 past the shrunk upper limit in x, one 0.2 past the
    # shrunk lower limit in y: cost = 0.05^2 + 0.2^2.
    viol = np.zeros((1, 5, 4), np.float32)
    viol[0, 1, 0] = 0.95   # > 1 - 0.1 by 0.05
    viol[0, 3, 1] = -1.1   # < -1 + 0.1 by 0.2
    np.testing.assert_allclose(
        np.asarray(cost_joint_limits(jnp.asarray(viol), q_min, q_max, eps)),
        [0.05**2 + 0.2**2], atol=1e-7)


def test_cost_goal_prior_hand_computed():
    from mmd_tpu.costs.zoo import cost_goal_prior

    traj = np.zeros((2, 4, 4), np.float32)
    traj[1, -1] = [1.0, 2.0, 0.0, 0.0]
    goal = jnp.array([1.0, 0.0, 0.0, 0.0])
    got = np.asarray(cost_goal_prior(jnp.asarray(traj), goal, sigma=2.0))
    # err0 = goal - 0 -> |err|^2 = 1; err1 = (0,-2,0,0) -> 4; / sigma^2 = 4.
    np.testing.assert_allclose(got, [1.0 / 4.0, 4.0 / 4.0], atol=1e-6)


def test_cost_velocity_direction_alignment():
    from mmd_tpu.costs.zoo import cost_velocity_direction_alignment

    H, dt = 6, 0.5
    pos = np.stack([np.arange(H, dtype=np.float32),
                    np.zeros(H, np.float32)], -1)
    vel = np.tile(np.array([[1.0, 0.0]], np.float32), (H, 1))
    aligned = np.concatenate([pos, vel], -1)[None]
    # Interior waypoints contribute dot=1 (borders: zero-padded velocity).
    got = float(cost_velocity_direction_alignment(jnp.asarray(aligned), dt)[0])
    np.testing.assert_allclose(got, H - 2, atol=1e-4)
    # Anti-aligned state velocity flips the sign.
    anti = np.concatenate([pos, -vel], -1)[None]
    got2 = float(cost_velocity_direction_alignment(jnp.asarray(anti), dt)[0])
    np.testing.assert_allclose(got2, -(H - 2), atol=1e-4)


def test_guide_gradient_with_zoo_costs():
    """Nonzero zoo weights change the guide gradient; endpoints stay zero;
    the joint-limit term pushes out-of-box waypoints inward."""
    from mmd_tpu.costs.guide import GuideConfig, GuideData, guide_gradient

    env = make_env("EnvEmpty2D")
    norm = LimitsNormalizer.from_limits([-1, -1, -2, -2], [1, 1, 2, 2])
    gd = GuideData(scene=env.scene, normalizer=norm,
                   constraints=empty_constraint_set(4, 1))
    x = jnp.zeros((2, 8, 4)).at[0, 4, 0].set(0.999)  # near +x limit
    base_cfg = GuideConfig(dt=0.1)
    zoo_cfg = GuideConfig(dt=0.1, weight_joint_limits=1.0,
                          joint_limit_eps=0.2, weight_max_velocity=0.1,
                          max_velocity=0.5, weight_chomp_smoothness=1e-4)
    g0 = guide_gradient(x, gd, base_cfg)
    g1 = guide_gradient(x, gd, zoo_cfg)
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    np.testing.assert_allclose(np.asarray(g1[:, 0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g1[:, -1]), 0.0, atol=1e-7)
    # guide returns -grad: the limit violation at waypoint 4 must push -x.
    assert float(g1[0, 4, 0] - g0[0, 4, 0]) < 0.0


def test_dense_team_bucket_tiers():
    """Regression: a 25-agent CT node can accumulate >64 hard constraints on
    one agent (first hit: conveyor-vd-cpu n=25 trial 1 — '65 exceeds the
    largest bucket 64'). The K ladder must cover it, and packing must keep
    every constraint live."""
    from mmd_tpu.planners.single_agent.mpd import K_BUCKETS, P_BUCKETS, _bucket

    assert _bucket(65, K_BUCKETS) == 128
    assert _bucket(256, K_BUCKETS) == 256
    # 34-agent soft constraint: (34-1)*64 points passes the 2048 tier.
    assert _bucket(33 * 64, P_BUCKETS) == 4096

    cs = [MultiPointConstraint(q_l=[np.array([0.01 * i, 0.0])],
                               t_range_l=[(i % 60, i % 60 + 2)],
                               radius_l=[0.1]) for i in range(65)]
    cset = pack_constraint_set(cs, max_constraints=_bucket(65, K_BUCKETS),
                               max_points=1)
    assert cset.q.shape[0] == 128
    assert int(np.sum(np.asarray(cset.active))) == 65

import jax.numpy as jnp
import numpy as np
import pytest

from mmd_tpu.datagen.generate import generate_context_trajectories
from mmd_tpu.datagen.gpmp2 import GPMP2Config, gpmp2_optimize
from mmd_tpu.datagen.host_collision import HostCollisionChecker
from mmd_tpu.datagen.hybrid import smoothen_trajectory
from mmd_tpu.datagen.rrt import IdentityPlanner, InfRRTStar, RRTConnect, RRTStar
from mmd_tpu.envs.envs import make_env
from mmd_tpu.tasks.task import make_task


def test_host_collision_matches_device():
    env = make_env("EnvConveyor2D")
    task = make_task("EnvConveyor2D")
    checker = HostCollisionChecker(env, 0.05)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.9, 0.9, (128, 2)).astype(np.float32)
    host = checker.in_collision(pts, margin=0.05)
    dev = np.asarray(task.compute_collision(jnp.asarray(pts), margin=0.05))
    np.testing.assert_array_equal(host, dev)


def test_rrt_connect_finds_corridor_path():
    env = make_env("EnvConveyor2D")
    checker = HostCollisionChecker(env, 0.05)
    rrt = RRTConnect(checker, np.array([-0.8, -0.8]), np.array([0.8, 0.8]),
                     rng=np.random.default_rng(1), max_time=30.0)
    path = rrt.optimize()
    assert path is not None
    np.testing.assert_allclose(path[0], [-0.8, -0.8], atol=1e-5)
    np.testing.assert_allclose(path[-1], [0.8, 0.8], atol=1e-5)
    assert not checker.in_collision(path).any()


def test_rrt_star_finds_path():
    env = make_env("EnvHighways2D")
    checker = HostCollisionChecker(env, 0.05)
    rrt = RRTStar(checker, np.array([-0.5, -0.5]), np.array([0.5, 0.5]),
                  rng=np.random.default_rng(2), max_time=30.0)
    path = rrt.optimize()
    assert path is not None
    assert not checker.in_collision(path).any()


def test_identity_planner():
    skill = np.array([[0.0, 0.0], [0.1, 0.1]], np.float32)
    p = IdentityPlanner(skill)
    np.testing.assert_allclose(p.optimize(), skill)


def test_smoothen_trajectory_endpoints_and_shape():
    path = np.array([[-0.5, -0.5], [0.0, 0.3], [0.5, 0.5]], np.float32)
    out = smoothen_trajectory(path, 64, 5.0 / 64)
    assert out.shape == (64, 4)
    np.testing.assert_allclose(out[0, :2], path[0], atol=1e-5)
    np.testing.assert_allclose(out[-1, :2], path[-1], atol=1e-5)


def test_gpmp2_pulls_trajectory_out_of_collision():
    task = make_task("EnvConveyor2D")
    # Straight line through the middle box.
    t = np.linspace(0, 1, 64, dtype=np.float32)[:, None]
    start = np.array([-0.8, -0.02], np.float32)
    goal = np.array([0.8, -0.02], np.float32)
    pos = (1 - t) * start + t * goal
    init = np.concatenate([pos, np.zeros_like(pos)], axis=-1)[None]
    cfg = GPMP2Config(opt_iters=150)
    start_state = jnp.asarray(np.concatenate([start, np.zeros(2)]))
    goal_state = jnp.asarray(np.concatenate([goal, np.zeros(2)]))
    out = np.asarray(gpmp2_optimize(task.scene, start_state, goal_state,
                                    jnp.asarray(init), cfg))
    assert np.isfinite(out).all()
    # Endpoints pinned by the strong priors.
    np.testing.assert_allclose(out[0, 0, :2], start, atol=0.02)
    np.testing.assert_allclose(out[0, -1, :2], goal, atol=0.02)
    # Fewer colliding waypoints than the straight line.
    coll_before = int(np.asarray(task.compute_collision(jnp.asarray(init[0]))).sum())
    coll_after = int(np.asarray(task.compute_collision(jnp.asarray(out[0]))).sum())
    assert coll_after < coll_before


@pytest.mark.slow
def test_generate_context_conveyor():
    rng = np.random.default_rng(3)
    trajs = generate_context_trajectories("EnvConveyor2D", rng,
                                          n_trajectories=4,
                                          gpmp_opt_iters=150)
    assert trajs.ndim == 3 and trajs.shape[1:] == (64, 4)


def _path_len(p):
    return float(np.linalg.norm(np.diff(p, axis=0), axis=-1).sum())


def test_informed_rrt_star_refines_first_solution():
    """InfRRTStar shares the RNG stream with RRTStar until the first
    solution, then keeps refining inside the informed hyperspheroid — its
    returned path is never longer (reference rrt_star.py:197, 273-276)."""
    env = make_env("EnvHighways2D")
    checker = HostCollisionChecker(env, 0.05)
    args = (checker, np.array([-0.5, -0.5]), np.array([0.5, 0.5]))
    base = RRTStar(*args, rng=np.random.default_rng(3), max_time=30.0,
                   n_iters=4000)
    inf = InfRRTStar(*args, rng=np.random.default_rng(3), max_time=30.0,
                     n_iters=4000)
    p_base, p_inf = base.optimize(), inf.optimize()
    assert p_base is not None and p_inf is not None
    assert not checker.in_collision(p_inf).any()
    assert _path_len(p_inf) <= _path_len(p_base) + 1e-6

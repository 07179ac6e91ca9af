import jax.numpy as jnp
import numpy as np
import jax

from mmd_tpu.robots.disk import DiskRobot, check_rr_collisions
from mmd_tpu.tasks.task import PlanningTask, make_task


def _line_traj(a, b, h=64):
    t = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    pos = (1 - t) * np.asarray(a, np.float32) + t * np.asarray(b, np.float32)
    vel = np.gradient(pos, axis=0)
    return np.concatenate([pos, vel], axis=-1)


def test_classify_free_and_colliding():
    task = make_task("EnvConveyor2D")
    free_traj = _line_traj([-0.6, -0.2], [0.6, -0.2])     # bottom corridor
    coll_traj = _line_traj([-0.6, 0.0], [0.6, 0.0])       # straight through middle box
    trajs = jnp.asarray(np.stack([free_traj, coll_traj]))
    free_mask, wp_coll = task.get_trajs_collision_and_free(trajs)
    assert bool(free_mask[0]) is True
    assert bool(free_mask[1]) is False
    assert not bool(wp_coll[0].any())
    assert bool(wp_coll[1].any())


def test_out_of_limits_is_not_free():
    task = make_task("EnvEmpty2D")
    traj = _line_traj([-0.5, 0.0], [1.5, 0.0])  # exits the workspace
    free_mask, _ = task.get_trajs_collision_and_free(jnp.asarray(traj[None]))
    assert bool(free_mask[0]) is False


def test_boundary_margin_collision():
    task = make_task("EnvEmpty2D")
    # 1.08-scaled bounds: a point at 1.06 is within radius(0.05) of the wall.
    q = jnp.array([[1.06, 0.0], [0.0, 0.0]])
    coll = task.compute_collision(q)
    assert bool(coll[0]) and not bool(coll[1])


def test_random_coll_free_q():
    task = make_task("EnvConveyor2D")
    qs = task.random_coll_free_q(jax.random.PRNGKey(0), n_samples=16)
    assert qs.shape == (16, 2)
    assert not bool(task.compute_collision(qs).any())


def test_collision_cost_positive_inside_zero_far():
    task = make_task("EnvConveyor2D")
    inside = jnp.array([[0.0, 0.0, 0.0, 0.0]])
    far = jnp.array([[-0.8, -0.8, 0.0, 0.0]])
    assert float(task.compute_collision_cost(inside)[0]) > 0
    assert float(task.compute_collision_cost(far)[0]) == 0


def test_check_rr_collisions():
    pts = jnp.array([[0.0, 0.0], [0.05, 0.0], [0.9, 0.9]])
    coll, mid = check_rr_collisions(pts, margin=0.105)
    coll = np.asarray(coll)
    assert coll[0, 1] and coll[1, 0]
    assert not coll[0, 2] and not coll[0, 0]
    np.testing.assert_allclose(np.asarray(mid[0, 1]), [0.025, 0.0], atol=1e-6)
    assert np.isnan(np.asarray(mid[0, 2])).all()


def test_robot_accessors():
    r = DiskRobot.make()
    x = jnp.arange(8.0).reshape(2, 4)
    np.testing.assert_allclose(np.asarray(r.get_position(x)), [[0, 1], [4, 5]])
    np.testing.assert_allclose(np.asarray(r.get_velocity(x)), [[2, 3], [6, 7]])
    assert abs(r.rr_margin - 0.105) < 1e-9


def test_fraction_and_success_metrics():
    task = make_task("EnvEmpty2D")
    free_traj = _line_traj([-0.5, -0.5], [0.5, 0.5])
    oob_traj = _line_traj([-0.5, 0.0], [2.0, 0.0])
    trajs = jnp.asarray(np.stack([free_traj, oob_traj]))
    assert task.compute_fraction_free_trajs(trajs) == 0.5
    assert task.compute_success_free_trajs(trajs) == 1

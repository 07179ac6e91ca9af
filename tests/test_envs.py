import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.envs.envs import (
    EnvConveyor2D,
    EnvDropRegion2D,
    EnvEmpty2D,
    EnvHighways2D,
    make_env,
)
from mmd_tpu.envs.grid_sdf import grid_sdf
from mmd_tpu.envs.primitives import BoxField, SphereField


def test_sphere_sdf_closed_form():
    f = SphereField(centers=jnp.array([[0.0, 0.0]]), radii=jnp.array([0.5]))
    pts = jnp.array([[1.0, 0.0], [0.0, 0.0], [0.5, 0.0]])
    np.testing.assert_allclose(np.asarray(f.sdf(pts)), [0.5, -0.5, 0.0], atol=1e-6)


def test_box_sdf_reference_formula():
    # Reference box SDF: max over dims of |x-c|_d - h_d (primitives.py:223-226).
    f = BoxField(centers=jnp.array([[0.0, 0.0]]), half_sizes=jnp.array([[0.4, 0.05]]))
    pts = jnp.array([
        [0.0, 0.0],     # center: max(-0.4, -0.05) = -0.05
        [0.5, 0.0],     # outside x: 0.1
        [0.0, 0.15],    # outside y: 0.1
        [0.45, 0.1],    # corner: max(0.05, 0.05) = 0.05
    ])
    np.testing.assert_allclose(np.asarray(f.sdf(pts)), [-0.05, 0.1, 0.1, 0.05], atol=1e-6)


def test_grid_sdf_matches_exact_sdf_on_conveyor():
    env = EnvConveyor2D(sdf_cell_size=0.005)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, size=(256, 2)).astype(np.float32))
    approx = np.asarray(grid_sdf(env.grid, pts))
    exact = np.asarray(env.compute_sdf_exact(pts))
    # Floor-lookup granularity: one cell (0.005) plus gradient slack.
    assert np.max(np.abs(approx - exact)) < 0.02


def test_grid_sdf_gradient_is_precomputed_cell_gradient():
    env = EnvConveyor2D()
    p = jnp.array([0.55, 0.0])  # right of the middle box
    g = jax.grad(lambda q: grid_sdf(env.grid, q[None])[0])(p)
    # SDF increases moving away from the box in +x.
    assert g[0] > 0.5
    np.testing.assert_allclose(np.asarray(g[1]), 0.0, atol=1e-3)


def test_empty_env_grid_is_free_everywhere():
    env = EnvEmpty2D()
    pts = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (64, 2)).astype(np.float32))
    assert float(jnp.min(grid_sdf(env.grid, pts))) > 100.0
    g = jax.grad(lambda q: grid_sdf(env.grid, q[None])[0])(jnp.array([0.1, 0.2]))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_conveyor_geometry_inside_outside():
    env = EnvConveyor2D()
    # Inside the middle box (0,0) of size 0.8x0.1.
    assert float(env.compute_sdf_exact(jnp.array([[0.0, 0.0]]))[0]) < 0
    # In the bottom corridor (between y=-0.3 and y=-0.05 walls) at y=-0.2.
    assert float(env.compute_sdf_exact(jnp.array([[0.0, -0.2]]))[0]) > 0


def test_highways_geometry():
    env = EnvHighways2D()
    assert float(env.compute_sdf_exact(jnp.array([[0.0, 0.0]]))[0]) < 0  # central block
    assert float(env.compute_sdf_exact(jnp.array([[0.5, 0.5]]))[0]) > 0  # corner square is open
    assert float(env.compute_sdf_exact(jnp.array([[0.0, 0.35]]))[0]) > 0  # ring road


def test_empty_adherence_straight_vs_wiggly():
    env = EnvEmpty2D()
    t = np.linspace(0, 1, 64)
    straight = np.stack([t, t], axis=-1)
    assert env.compute_traj_data_adherence(straight) == 1.0
    wiggly = straight + np.stack([np.zeros_like(t), 0.5 * np.sin(8 * np.pi * t)], axis=-1)
    assert env.compute_traj_data_adherence(wiggly) < 0.8


def test_conveyor_adherence():
    env = EnvConveyor2D()
    t = np.linspace(-0.8, 0.8, 64)
    bottom = np.stack([t, np.full_like(t, -0.2)], axis=-1)  # left -> right: adheres
    assert env.compute_traj_data_adherence(bottom) == 1.0
    wrong_way = bottom[::-1]
    assert env.compute_traj_data_adherence(wrong_way) == 0.0


def test_highways_adherence_ccw():
    env = EnvHighways2D()
    ang = np.linspace(0, 1.5 * np.pi, 64)
    ccw = np.stack([0.7 * np.cos(ang), 0.7 * np.sin(ang)], axis=-1)
    assert env.compute_traj_data_adherence(ccw) == 1.0
    assert env.compute_traj_data_adherence(ccw[::-1]) == 0.0


def test_drop_region_adherence():
    env = EnvDropRegion2D()
    dwell = np.tile(np.array([[0.4, 0.75]]), (64, 1))
    assert env.compute_traj_data_adherence(dwell) == 1.0
    transit = np.stack([np.linspace(-0.9, 0.9, 64), np.zeros(64)], axis=-1)
    assert env.compute_traj_data_adherence(transit) == 0.0


def test_skills():
    conv = EnvConveyor2D().get_skill_pos_seq_l()
    assert len(conv) == 2 and conv[0].shape == (30, 2)
    hw = EnvHighways2D().get_skill_pos_seq_l(
        start_pos=np.array([-0.5, -0.5]), goal_pos=np.array([-0.5, 0.5]),
        rng=np.random.default_rng(0))
    assert len(hw) == 2 and hw[0].shape[0] > 5
    dr = EnvDropRegion2D().get_skill_pos_seq_l()
    assert len(dr) == 16 and dr[0].shape == (35, 2)
    assert EnvEmpty2D().get_skill_pos_seq_l() is None


def test_make_env_registry_and_cache():
    e1 = make_env("EnvConveyor2D")
    e2 = make_env("EnvConveyor2D")
    assert e1 is e2
    assert make_env("EnvEmptyNoWait2D").name == "EnvEmptyNoWait2D"

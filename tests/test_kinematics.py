"""FK tree tests: independent modified-DH oracle, jacobians, IK, vmap,
planar-arm scene collision."""
import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.robots.kinematics import (
    _PANDA_MDH,
    arm_scene_collision,
    fk,
    fk_collision_spheres,
    ik_position,
    link_positions,
    make_panda,
    make_planar_arm,
    position_jacobian,
)


def _mdh_full(a, alpha, d, theta):
    """Independent oracle: the full modified-DH matrix (Craig convention)."""
    ct, st = np.cos(theta), np.sin(theta)
    ca, sa = np.cos(alpha), np.sin(alpha)
    return np.array([
        [ct, -st, 0.0, a],
        [st * ca, ct * ca, -sa, -d * sa],
        [st * sa, ct * sa, ca, d * ca],
        [0.0, 0.0, 0.0, 1.0],
    ])


def test_panda_fk_matches_mdh_oracle():
    tree = make_panda()
    rng = np.random.default_rng(0)
    q = rng.uniform(np.asarray(tree.q_min), np.asarray(tree.q_max))
    got = np.asarray(fk(tree, jnp.asarray(q, jnp.float32)))
    T = np.eye(4)
    for j, (a, alpha, d) in enumerate(_PANDA_MDH):
        T = T @ _mdh_full(a, alpha, d, q[j])
        np.testing.assert_allclose(got[j], T, atol=1e-5)
    T = T @ _mdh_full(0.0, 0.0, 0.107, 0.0)  # fixed flange
    np.testing.assert_allclose(got[7], T, atol=1e-5)


def test_planar_arm_fk_trig():
    tree = make_planar_arm(2, link_length=0.5, n_spheres_per_link=1,
                           sphere_radius=0.05)
    q = jnp.asarray([np.pi / 2, -np.pi / 2])
    pos = np.asarray(link_positions(tree, q))
    # Joint 1 frame sits at the end of link 0 (rotated to +y).
    np.testing.assert_allclose(pos[1], [0.0, 0.5, 0.0], atol=1e-6)
    # Tip sphere: link 1 rotated back to +x direction.
    tip = np.asarray(fk_collision_spheres(tree, q))[-1]
    np.testing.assert_allclose(tip, [0.5, 0.5, 0.0], atol=1e-6)


def test_position_jacobian_matches_finite_differences():
    tree = make_panda()
    q = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, 7), jnp.float32)
    J = np.asarray(position_jacobian(tree, q, 7))
    eps = 1e-3
    for i in range(7):
        dq = jnp.zeros(7).at[i].set(eps)
        fd = (np.asarray(fk(tree, q + dq)[7, :3, 3])
              - np.asarray(fk(tree, q - dq)[7, :3, 3])) / (2 * eps)
        np.testing.assert_allclose(J[:, i], fd, atol=1e-3)


def test_ik_reaches_reachable_target():
    tree = make_panda()
    rng = np.random.default_rng(2)
    q_true = jnp.asarray(rng.uniform(np.asarray(tree.q_min) * 0.6,
                                     np.asarray(tree.q_max) * 0.6), jnp.float32)
    target = fk(tree, q_true)[7, :3, 3]
    q0 = jnp.zeros(7).at[3].set(-1.5)  # elbow-bent neutral
    q_sol = ik_position(tree, target, q0, n_iters=120)
    err = float(jnp.linalg.norm(fk(tree, q_sol)[7, :3, 3] - target))
    assert err < 5e-3, err


def test_fk_vmaps_over_batches():
    tree = make_panda()
    qs = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (16, 7)),
                     jnp.float32)
    Ts = jax.vmap(lambda q: fk(tree, q))(qs)
    assert Ts.shape == (16, 8, 4, 4)
    spheres = jax.vmap(lambda q: fk_collision_spheres(tree, q))(qs)
    assert spheres.shape == (16, 8, 3)


def test_planar_arm_scene_collision():
    from mmd_tpu.envs.envs import make_env

    env = make_env("EnvConveyor2D")
    # Base in the bottom corridor (free band y in (-0.3, -0.05)).
    tree = make_planar_arm(3, link_length=0.25, base_xy=(-0.6, -0.2))
    # Straight along +x at y=-0.2: the whole arm stays inside the corridor.
    q_free = jnp.zeros(3)
    # Tilted up 0.6 rad: a mid-arm sphere lands inside the conveyor's
    # center box (x in [-0.4, 0.4], y in [-0.05, 0.05]).
    q_hit = jnp.asarray([0.6, 0.0, 0.0])
    hit, free = jax.device_get((
        arm_scene_collision(tree, env.scene, q_hit),
        arm_scene_collision(tree, env.scene, q_free)))
    assert bool(hit) and not bool(free)


def test_plan_arm_gpmp2_folds_through_drop_region():
    """GPMP2 over joint space with the FK-sphere collision factor: rotating
    a 3-link arm from +x to +y at the DropRegion center must fold around
    the (0.4, 0.4) box — the straight joint interpolation collides."""
    from mmd_tpu.envs.envs import make_env
    from mmd_tpu.robots.kinematics import plan_arm_gpmp2

    env = make_env("EnvDropRegion2D")
    tree = make_planar_arm(3, link_length=0.2)
    q_start = jnp.zeros(3)                      # along +x (free band |y|<0.2)
    q_goal = jnp.asarray([np.pi / 2, 0.0, 0.0])  # along +y (free band |x|<0.2)

    # The naive joint interpolation passes the diagonal and collides.
    mid = 0.5 * (q_start + q_goal)
    assert bool(arm_scene_collision(tree, env.scene, mid))

    trajs, free = plan_arm_gpmp2(tree, env.scene, q_start, q_goal,
                                 jax.random.PRNGKey(0), n_particles=16,
                                 horizon=64, opt_iters=400)
    assert trajs.shape == (16, 64, 6)
    assert bool(jnp.any(free)), "no collision-free arm plan found"
    best = np.asarray(trajs[int(np.argmax(np.asarray(free)))])
    np.testing.assert_allclose(best[0, :3], np.asarray(q_start), atol=2e-2)
    np.testing.assert_allclose(best[-1, :3], np.asarray(q_goal), atol=2e-2)

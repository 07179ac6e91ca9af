import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.datagen.classical import (
    CHOMPConfig,
    MPPIConfig,
    STOMPConfig,
    StochGPMPConfig,
    chomp_optimize,
    mppi_optimize,
    stomp_optimize,
    stoch_gpmp_optimize,
)
from mmd_tpu.envs.occupancy import build_occupancy_map
from mmd_tpu.envs.envs import make_env
from mmd_tpu.models.diffusion import ddim_sample_loop
from mmd_tpu.tasks.task import make_task


def _straight(start, goal, h=64):
    t = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    pos = (1 - t) * np.asarray(start, np.float32) + t * np.asarray(goal, np.float32)
    vel = np.gradient(pos, axis=0) / (5.0 / 64.0)
    return np.concatenate([pos, vel], axis=-1)


def _setup():
    task = make_task("EnvConveyor2D")
    start = np.array([-0.8, -0.02], np.float32)
    goal = np.array([0.8, -0.02], np.float32)
    init = jnp.asarray(_straight(start, goal)[None])
    s4 = jnp.asarray(np.concatenate([start, np.zeros(2)]).astype(np.float32))
    g4 = jnp.asarray(np.concatenate([goal, np.zeros(2)]).astype(np.float32))
    return task, s4, g4, init


def _coll_count(task, traj):
    return int(np.asarray(task.compute_collision(jnp.asarray(traj[..., :2]))).sum())


def test_chomp_reduces_collisions():
    task, s, g, init = _setup()
    out = chomp_optimize(task.scene, s, g, init, CHOMPConfig(opt_iters=150))
    assert np.isfinite(np.asarray(out)).all()
    assert _coll_count(task, np.asarray(out[0])) < _coll_count(task, np.asarray(init[0]))


def test_stomp_runs_and_improves():
    task, s, g, init = _setup()
    out = stomp_optimize(task.scene, s, g, init, jax.random.PRNGKey(0),
                         STOMPConfig(opt_iters=80))
    assert np.isfinite(np.asarray(out)).all()
    assert _coll_count(task, np.asarray(out[0])) <= _coll_count(task, np.asarray(init[0]))


def test_mppi_reaches_goal_region():
    task, s, g, init = _setup()
    out = np.asarray(mppi_optimize(task.scene, s, g, init,
                                   jax.random.PRNGKey(1), MPPIConfig()))
    assert np.isfinite(out).all()
    # Rollouts start exactly at the start position.
    np.testing.assert_allclose(out[0, 0, :2], np.asarray(s[:2]), atol=1e-5)


def test_stoch_gpmp_runs():
    task, s, g, init = _setup()
    out = stoch_gpmp_optimize(task.scene, s, g, init, jax.random.PRNGKey(2),
                              StochGPMPConfig(opt_iters=60))
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out[0, 0, :2]), np.asarray(s[:2]), atol=1e-5)


def test_occupancy_map():
    env = make_env("EnvConveyor2D")
    occ = build_occupancy_map(env, cell_size=0.02)
    pts = jnp.array([[0.0, 0.0], [0.0, -0.2], [5.0, 5.0]])
    hits = np.asarray(occ.get_collisions(pts))
    assert hits[0] and not hits[1] and hits[2]  # inside box / corridor / oob


def test_ddim_sampler_shapes():
    from mmd_tpu.config import DiffusionConfig
    from mmd_tpu.models.diffusion import make_start_goal_hard_conds
    from mmd_tpu.models.schedules import make_schedule
    from mmd_tpu.models.temporal_unet import init_unet

    cfg = DiffusionConfig(horizon=16, n_samples=4, n_diffusion_steps=10,
                          unet_dim=8)
    model, params = init_unet(jax.random.PRNGKey(0), horizon=16, unet_input_dim=8)
    schedule = make_schedule("exponential", 10)
    hard = make_start_goal_hard_conds(jnp.zeros(4), jnp.ones(4) * 0.5, 16)
    x, chain = ddim_sample_loop(model.apply, params, schedule, hard,
                                jax.random.PRNGKey(1), cfg)
    assert x.shape == (4, 16, 4)
    # 10 // 5 = 2 substeps + the final (0, -1) pair: pairs = len(times)-1.
    assert chain.shape[0] == 4  # initial + 3 pairs
    np.testing.assert_allclose(np.asarray(x[:, 0]), [[0, 0, 0, 0]] * 4, atol=1e-6)

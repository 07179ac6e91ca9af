import os

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.common.conflict_conversion import convert_conflicts_to_constraints
from mmd_tpu.common.conflicts import PointConflict
from mmd_tpu.common.constraints import MultiPointConstraint
from mmd_tpu.envs.envs import make_env
from mmd_tpu.tasks.task import make_task
from mmd_tpu.utils.misc import finite_difference_jacobian, one_hot
from mmd_tpu.viz.visualizer import PlanningVisualizer


def test_conflict_to_constraints_point():
    mid = np.array([0.1, 0.2], np.float32)
    c = PointConflict(agent_ids=[0, 2], p_l=[mid, mid], q_l=[mid, mid],
                      t_from=10, t_to=10)
    out = convert_conflicts_to_constraints(c, t_pad=2)
    assert set(out.keys()) == {0, 2}
    mpc = out[0]
    assert isinstance(mpc, MultiPointConstraint)
    assert mpc.t_range_l == [(8, 12)]  # padded +-2 (conflict_conversion.py:46-55)
    np.testing.assert_allclose(mpc.q_l[0], mid)
    np.testing.assert_allclose(mpc.radius_l[0], 0.12)  # 2.4 * 0.05


def test_constraint_shift_and_clamp():
    c = MultiPointConstraint(q_l=[np.zeros(2)], t_range_l=[(5, 70)])
    s = c.shifted(-10, 0, 63)
    assert s.t_range_l == [(0, 60)]


def test_visualizer_png_and_gif(tmp_path):
    env = make_env("EnvConveyor2D")
    task = make_task("EnvConveyor2D")
    viz = PlanningVisualizer(task=task)
    t = np.linspace(0, 1, 30, dtype=np.float32)[:, None]
    p1 = np.concatenate([(-0.8 + 1.6 * t), np.full_like(t, -0.2)], axis=-1)
    p2 = np.concatenate([(0.8 - 1.6 * t), np.full_like(t, 0.2)], axis=-1)
    png = viz.save_frame([p1, p2], [p1[0], p2[0]], [p1[-1], p2[-1]],
                         output_fpath=os.path.join(tmp_path, "f.png"))
    assert os.path.getsize(png) > 1000
    gif = viz.animate_multi_robot_trajectories(
        trajs_l=[p1, p2], start_state_l=[p1[0], p2[0]],
        goal_state_l=[p1[-1], p2[-1]],
        video_filepath=os.path.join(tmp_path, "t.gif"), n_frames=10,
        anim_time=1.0)
    assert os.path.getsize(gif) > 1000


def test_visualizer_tiled_env(tmp_path):
    envs = [make_env("EnvEmptyNoWait2D"), make_env("EnvConveyor2D")]
    transforms = np.array([[0.0, 0.0], [2.0, 0.0]], np.float32)
    viz = PlanningVisualizer(robot_radius=0.05)
    t = np.linspace(0, 1, 30, dtype=np.float32)[:, None]
    path = np.concatenate([(-0.5 + 3.0 * t), np.zeros_like(t)], axis=-1)
    png = viz.save_frame([path], output_fpath=os.path.join(tmp_path, "tiles.png"),
                         envs=envs, env_transforms=transforms)
    assert os.path.getsize(png) > 1000


def test_one_hot_and_fd_jacobian():
    np.testing.assert_allclose(np.asarray(one_hot(jnp.array(2), 4)),
                               [0, 0, 1, 0])
    J = finite_difference_jacobian(lambda x: x ** 2, np.array([1.0, 2.0]))
    np.testing.assert_allclose(J, np.diag([2.0, 4.0]), atol=1e-3)


def test_summary_trajectory_generation(tmp_path):
    from mmd_tpu.datagen.synthetic import generate_linear_dataset
    from mmd_tpu.models.schedules import make_schedule
    from mmd_tpu.models.temporal_unet import init_unet
    from mmd_tpu.train.summary import summary_trajectory_generation

    ds = generate_linear_dataset("EnvEmptyNoWait2D", n_contexts=32, seed=0)
    model, params = init_unet(jax.random.PRNGKey(0), horizon=64, unet_input_dim=8)
    schedule = make_schedule("exponential", 4)
    stats = summary_trajectory_generation(model, params, schedule, ds,
                                          jax.random.PRNGKey(1), n_samples=8,
                                          save_dir=str(tmp_path), step=100)
    assert 0.0 <= stats["fraction_free"] <= 1.0
    assert any(f.endswith(".png") for f in os.listdir(tmp_path))


def test_render_env_sdf_and_grad(tmp_path):
    from mmd_tpu.envs.envs import make_env
    from mmd_tpu.viz.visualizer import PlanningVisualizer

    env = make_env("EnvConveyor2D")
    viz = PlanningVisualizer(env=env)
    fig, ax = viz.render_env_sdf(n=40)
    fig.savefig(tmp_path / "sdf.png")
    fig2, ax2 = viz.render_env_grad_sdf(n=10)
    fig2.savefig(tmp_path / "grad.png")
    assert (tmp_path / "sdf.png").stat().st_size > 0
    assert (tmp_path / "grad.png").stat().st_size > 0


def test_joint_space_plot(tmp_path):
    from mmd_tpu.envs.envs import make_env
    from mmd_tpu.viz.visualizer import PlanningVisualizer

    viz = PlanningVisualizer(env=make_env("EnvEmpty2D"))
    trajs = np.random.default_rng(0).normal(size=(6, 32, 4)).astype(np.float32)
    free = np.array([1, 0, 1, 1, 0, 1], bool)
    p = viz.plot_joint_space_trajectories(
        trajs, free_mask=free, pos_start=np.zeros(2), pos_goal=np.ones(2),
        q_min=np.array([-1, -1]), q_max=np.array([1, 1]),
        output_fpath=str(tmp_path / "js.png"))
    assert (tmp_path / "js.png").stat().st_size > 0


def test_animate_opt_iters(tmp_path):
    from mmd_tpu.envs.envs import make_env
    from mmd_tpu.viz.visualizer import PlanningVisualizer

    viz = PlanningVisualizer(env=make_env("EnvEmpty2D"))
    chain = np.random.default_rng(1).normal(
        size=(5, 4, 16, 4)).astype(np.float32) * 0.3
    out = viz.animate_opt_iters(chain, idx_best=0, start_state=np.zeros(2),
                                goal_state=np.ones(2) * 0.5,
                                video_filepath=str(tmp_path / "oi.gif"),
                                n_frames=3, anim_time=1.0)
    assert (tmp_path / "oi.gif").stat().st_size > 0


def test_animation_trails_and_constraints(tmp_path):
    from mmd_tpu.common.constraints import MultiPointConstraint
    from mmd_tpu.envs.envs import make_env
    from mmd_tpu.viz.visualizer import PlanningVisualizer

    viz = PlanningVisualizer(env=make_env("EnvEmpty2D"))
    t = np.linspace(0, 1, 20)[:, None].astype(np.float32)
    paths = [np.concatenate([t - 0.5, t * 0, t * 0, t * 0], -1),
             np.concatenate([t * 0, t - 0.5, t * 0, t * 0], -1)]
    c = MultiPointConstraint(q_l=[np.zeros(2)], t_range_l=[(5, 10)],
                             radius_l=[0.2])
    out = viz.animate_multi_robot_trajectories(
        trajs_l=paths, start_state_l=[p[0] for p in paths],
        goal_state_l=[p[-1] for p in paths], constraints=[c],
        video_filepath=str(tmp_path / "anim.gif"), n_frames=4, anim_time=1.0)
    assert (tmp_path / "anim.gif").stat().st_size > 0


def test_cbs_render_paths_png_and_gif(tmp_path):
    """render_paths parity surface (reference cbs.py:248-300) on a stub CBS."""
    from mmd_tpu.planners.multi_agent.cbs import CBS
    from mmd_tpu.robots.disk import DiskRobot
    from mmd_tpu.tasks.task import make_task

    task = make_task("EnvEmpty2D")
    cbs = CBS.__new__(CBS)  # skip planner construction; render-only
    cbs.reference_task = task
    cbs.start_state_pos_l = [np.array([-0.5, 0.0]), np.array([0.5, 0.0])]
    cbs.goal_state_pos_l = [np.array([0.5, 0.0]), np.array([-0.5, 0.0])]
    t = np.linspace(0, 1, 16)[:, None].astype(np.float32)
    paths = [np.concatenate([t - 0.5, t * 0, t * 0, t * 0], -1),
             np.concatenate([0.5 - t, t * 0, t * 0, t * 0], -1)]
    png = cbs.render_paths(paths, animation_duration=0,
                           output_fpath=str(tmp_path / "sol.png"))
    gif = cbs.render_paths(paths, animation_duration=1.0, n_frames=3,
                           output_fpath=str(tmp_path / "sol.gif"))
    assert (tmp_path / "sol.png").stat().st_size > 0
    assert (tmp_path / "sol.gif").stat().st_size > 0

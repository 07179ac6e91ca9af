"""End-to-end multi-tile trial with tiny models (CPU)."""
import os

import numpy as np
import pytest

from mmd_tpu.config import DiffusionConfig
from mmd_tpu.datagen.synthetic import generate_linear_dataset
from mmd_tpu.datasets.trajectories import model_id
from mmd_tpu.experiments.experiments import MultiAgentPlanningSingleTrialConfig
from mmd_tpu.experiments.status import TrialSuccessStatus
from mmd_tpu.experiments.trial import ModelRegistry, run_multi_agent_trial
from mmd_tpu.train.trainer import TrainConfig, train


@pytest.fixture(scope="module")
def tiny_registry(tmp_path_factory):
    root = tmp_path_factory.mktemp("models")
    cfg = TrainConfig(batch_size=64, n_diffusion_steps=8, lr=2e-3)
    for env in ["EnvEmptyNoWait2D", "EnvEmpty2D"]:
        ds = generate_linear_dataset(env, n_contexts=96, seed=0)
        train(ds, cfg, num_train_steps=300, unet_dim=16,
              model_dir=os.path.join(root, "trained", model_id(env)),
              log_every=300, log_fn=lambda m: None)
        ds.save(os.path.join(root, "trajs"))
    return ModelRegistry(trained_models_dir=os.path.join(root, "trained"),
                         trajectories_dir=os.path.join(root, "trajs"))


def test_two_tile_trial_runs(tiny_registry, tmp_path):
    cfg = MultiAgentPlanningSingleTrialConfig(
        time_str="tile-test", num_agents=2, multi_agent_planner_class="PP",
        single_agent_planner_class="MPDEnsemble",
        instance_name="TwoTileTest", runtime_limit=300.0)
    # 1x2 tile grid: EmptyNoWait then Empty; both agents traverse both tiles.
    cfg.global_model_ids = [["EnvEmptyNoWait2D-RobotPlanarDisk",
                            "EnvEmpty2D-RobotPlanarDisk"]]
    cfg.agent_skeleton_l = [[[0, 0], [0, 1]], [[0, 0], [0, 1]]]
    # Local-frame starts (tile 0,0) and goals (tile 0,1).
    cfg.start_state_pos_l = [np.array([-0.5, 0.5], np.float32),
                             np.array([-0.5, -0.5], np.float32)]
    cfg.goal_state_pos_l = [np.array([0.5, 0.5], np.float32),
                            np.array([0.5, -0.5], np.float32)]
    dcfg = DiffusionConfig(horizon=64, n_samples=8, n_diffusion_steps=8,
                           t_start_guide=4, n_guide_steps=3, unet_dim=16)
    result = run_multi_agent_trial(cfg, registry=tiny_registry,
                                   results_root=str(tmp_path),
                                   diffusion_cfg=dcfg)
    assert len(result.agent_path_l) == 2
    # Global paths span both tiles: 128 waypoints, x from tile0 into tile1.
    p0 = result.agent_path_l[0]
    assert p0.shape[0] == 128
    if result.success_status == TrialSuccessStatus.SUCCESS:
        assert p0[:, 0].max() > 1.0  # reached the second tile
        assert result.data_adherence >= 0.0


def test_staggered_trial_runs(tiny_registry, tmp_path):
    from mmd_tpu.experiments.problems import get_planning_problem

    cfg = MultiAgentPlanningSingleTrialConfig(
        time_str="stagger-test", num_agents=2,
        multi_agent_planner_class="CBS",
        instance_name="EnvEmptyNoWait2DRobotPlanarDiskCircle",
        runtime_limit=120.0, stagger_start_time_dt=5)
    (cfg.start_state_pos_l, cfg.goal_state_pos_l,
     cfg.global_model_ids, cfg.agent_skeleton_l) = get_planning_problem(
        "EnvEmptyNoWait2DRobotPlanarDiskCircle", 2)
    dcfg = DiffusionConfig(horizon=64, n_samples=8, n_diffusion_steps=8,
                           t_start_guide=4, n_guide_steps=3, unet_dim=16)
    result = run_multi_agent_trial(cfg, registry=tiny_registry,
                                   results_root=str(tmp_path),
                                   diffusion_cfg=dcfg)
    assert len(result.agent_path_l) == 2
    # Staggered padding: both returned paths share the padded length 64+5.
    assert result.agent_path_l[0].shape[0] == 69
    assert result.agent_path_l[1].shape[0] == 69
    # Agent 1 dwells at its start for the stagger prefix.
    np.testing.assert_allclose(result.agent_path_l[1][0, :2],
                               result.agent_path_l[1][4, :2], atol=1e-5)

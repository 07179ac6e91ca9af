import os

import numpy as np
import pytest

from mmd_tpu.config import DiffusionConfig
from mmd_tpu.datagen.synthetic import generate_linear_dataset
from mmd_tpu.datasets.trajectories import model_id
from mmd_tpu.experiments.experiment_utils import (
    combine_and_save_results_for_experiment,
)
from mmd_tpu.experiments.experiments import (
    MultiAgentPlanningExperimentConfig,
    MultiAgentPlanningSingleTrialConfig,
    MultiAgentPlanningSingleTrialResult,
    get_result_dir_from_trial_config,
)
from mmd_tpu.experiments.launcher import Launcher
from mmd_tpu.experiments.problems import get_planning_problem
from mmd_tpu.experiments.status import TrialSuccessStatus
from mmd_tpu.experiments.trial import ModelRegistry, run_multi_agent_trial
from mmd_tpu.train.trainer import TrainConfig, train


def test_problem_registry_single_tile():
    s, g, mids, skels = get_planning_problem("EnvEmpty2DRobotPlanarDiskCircle", 4)
    assert len(s) == len(g) == 4
    assert mids == [["EnvEmpty2D-RobotPlanarDisk"]]
    assert skels == [[[0, 0]]] * 4


def test_problem_registry_multi_tile():
    s, g, mids, skels = get_planning_problem(
        "EnvTestTwoByTwoRobotPlanarDiskRandom", 3, seed=0)
    assert len(mids) == 2 and len(mids[0]) == 2
    assert len(skels) == 3 and len(skels[0]) == 3


def test_trial_status_truthiness():
    assert bool(TrialSuccessStatus.SUCCESS)
    assert not bool(TrialSuccessStatus.FAIL_RUNTIME_LIMIT)


def test_result_save_and_aggregate(tmp_path):
    cfg = MultiAgentPlanningExperimentConfig(
        time_str="test-run", instance_name="EnvEmpty2DRobotPlanarDiskCircle",
        num_agents_l=[2], multi_agent_planner_class_l=["PP"],
        num_trials_per_combination=2)
    for trial in range(2):
        tc = MultiAgentPlanningSingleTrialConfig(
            time_str="test-run", trial_number=trial, num_agents=2,
            multi_agent_planner_class="PP",
            instance_name="EnvEmpty2DRobotPlanarDiskCircle")
        r = MultiAgentPlanningSingleTrialResult(
            trial_config=tc,
            success_status=(TrialSuccessStatus.SUCCESS if trial == 0
                            else TrialSuccessStatus.FAIL_RUNTIME_LIMIT),
            planning_time=2.0, data_adherence=1.0, num_ct_expansions=4,
            num_collisions_in_solution=(0 if trial == 0 else 6),
            path_length_per_agent=1.5, mean_path_acceleration_per_agent=0.1)
        d = get_result_dir_from_trial_config(tc, "test-run", trial,
                                             root=str(tmp_path))
        r.save(d)
        assert os.path.exists(os.path.join(d, "results.pkl"))
        assert os.path.exists(os.path.join(d, "results.txt"))
    analyzed = combine_and_save_results_for_experiment(cfg, root=str(tmp_path))
    m = analyzed[2]["PP"]
    assert m["success_rate"] == 0.5
    assert m["fail_rate_runtime_limit"] == 0.5
    assert m["avg_planning_time"] == 2.0  # normalized over successful trials
    assert m["avg_ct_expansions"] == 4.0
    # Success-conditioned like the reference (experiment_utils.py:137-148):
    # the failed trial's 6 residual collisions don't enter this metric...
    assert m["avg_num_collisions_in_solution"] == 0.0
    # ...but do enter the all-trials extension metric.
    assert m["avg_collisions_all_trials"] == 3.0


def test_audit_solution_collisions_n50():
    """Device-side post-hoc audit at n=50 agents: exact pair counting on a
    constructed team where only known pairs ever touch."""
    from mmd_tpu.experiments.trial import audit_solution_collisions

    radius, T = 0.05, 12
    # 50 agents parked on a wide grid (spacing 1 >> 2r): zero contacts.
    base = np.stack(np.meshgrid(np.arange(10.0), np.arange(5.0)),
                    axis=-1).reshape(50, 1, 2)
    paths = np.repeat(base, T, axis=1).astype(np.float32)
    paths = np.concatenate([paths, np.zeros_like(paths)], axis=-1)
    paths_l = list(paths)
    assert audit_solution_collisions(paths_l, radius) == 0

    # Drive agents 3 and 4 into contact for exactly 2 timesteps, and agents
    # 10/11 for 1 timestep: 3 unordered (pair, t) contacts total.
    paths_l[3] = paths_l[3].copy()
    paths_l[3][5:7, :2] = paths_l[4][5:7, :2] + 0.5 * radius
    paths_l[10] = paths_l[10].copy()
    paths_l[10][0, :2] = paths_l[11][0, :2]
    assert audit_solution_collisions(paths_l, radius) == 3


def test_launcher_local_and_dry_run(tmp_path):
    calls = []

    def exp_fn(seed=0, results_dir=None, x=0):
        calls.append((seed, x))
        return x * 10

    launcher = Launcher("test_exp", exp_fn=exp_fn, n_seeds=2,
                        base_dir=str(tmp_path))
    launcher.add_experiment(x=1)
    launcher.add_experiment(x=2)
    launcher.run(test=True)
    assert calls == []
    results = launcher.run(local=True)
    assert sorted(calls) == [(0, 1), (0, 2), (1, 1), (1, 2)]
    assert sorted(results) == [10, 10, 20, 20]
    # args.yaml written per run.
    found = list__ = []
    for root, _, files in os.walk(tmp_path):
        found.extend(f for f in files if f == "args.yaml")
    assert len(found) == 4


def test_launcher_slurm_script(tmp_path):
    launcher = Launcher("test_exp", exp_file="run.py", n_seeds=3,
                        base_dir=str(tmp_path), partition="gpu",
                        gres="gpu:1")
    launcher.add_experiment(lr=0.1)
    path = launcher.generate_slurm({"lr": 0.1})
    content = open(path).read()
    assert "#SBATCH --array=0-2" in content
    assert "--partition=gpu" in content
    assert "--lr 0.1" in content


@pytest.fixture(scope="module")
def tiny_registry(tmp_path_factory):
    root = tmp_path_factory.mktemp("models")
    ds = generate_linear_dataset("EnvEmptyNoWait2D", n_contexts=96, seed=0)
    cfg = TrainConfig(batch_size=64, n_diffusion_steps=8, lr=2e-3)
    mid = model_id("EnvEmptyNoWait2D")
    model_dir = os.path.join(root, "trained", mid)
    train(ds, cfg, num_train_steps=400, unet_dim=16, model_dir=model_dir,
          log_every=400, log_fn=lambda m: None)
    ds.save(os.path.join(root, "trajs"))
    return ModelRegistry(trained_models_dir=os.path.join(root, "trained"),
                         trajectories_dir=os.path.join(root, "trajs"))


def test_run_multi_agent_trial_end_to_end(tiny_registry, tmp_path):
    cfg = MultiAgentPlanningSingleTrialConfig(
        time_str="e2e-test", num_agents=3, multi_agent_planner_class="PP",
        instance_name="EnvEmptyNoWait2DRobotPlanarDiskCircle",
        runtime_limit=120.0)
    (cfg.start_state_pos_l, cfg.goal_state_pos_l,
     cfg.global_model_ids, cfg.agent_skeleton_l) = get_planning_problem(
        "EnvEmptyNoWait2DRobotPlanarDiskCircle", 3)
    dcfg = DiffusionConfig(horizon=64, n_samples=16, n_diffusion_steps=8,
                           t_start_guide=4, n_guide_steps=5, unet_dim=16)
    result = run_multi_agent_trial(cfg, registry=tiny_registry,
                                   results_root=str(tmp_path),
                                   diffusion_cfg=dcfg)
    assert result.success_status in (TrialSuccessStatus.SUCCESS,
                                     TrialSuccessStatus.FAIL_COLLISION_AGENTS)
    assert len(result.agent_path_l) == 3
    if result.success_status == TrialSuccessStatus.SUCCESS:
        assert result.data_adherence > 0
        assert result.path_length_per_agent > 0
        # Artifacts written.
        found_png = []
        for root, _, files in os.walk(tmp_path):
            found_png.extend(f for f in files if f.endswith(".png"))
        assert found_png


def test_experiment_resume_skips_done_trials(tmp_path, monkeypatch):
    """Interrupted sweeps relaunched with the same time_str must skip trials
    whose results.pkl exists and run only the missing ones."""
    import scripts.launch_multi_agent_experiment as lma

    cfg = MultiAgentPlanningExperimentConfig(
        time_str="resume-test", instance_name="EnvEmpty2DRobotPlanarDiskCircle",
        num_agents_l=[2], multi_agent_planner_class_l=["PP"],
        num_trials_per_combination=3)

    ran = []

    def fake_trial(tc, results_root="./results", **kw):
        ran.append(tc.trial_number)
        r = MultiAgentPlanningSingleTrialResult(
            trial_config=tc, success_status=TrialSuccessStatus.SUCCESS,
            planning_time=1.0, data_adherence=1.0)
        d = get_result_dir_from_trial_config(tc, tc.time_str, tc.trial_number,
                                             root=results_root)
        r.save(d)
        return r

    monkeypatch.setattr(lma, "run_multi_agent_trial", fake_trial)
    lma.run_multi_agent_experiment(cfg, results_root=str(tmp_path))
    assert ran == [0, 1, 2]

    ran.clear()
    # Remove one trial's result; a resumed run must redo exactly that one.
    tc = MultiAgentPlanningSingleTrialConfig(
        time_str="resume-test", num_agents=2, multi_agent_planner_class="PP",
        instance_name="EnvEmpty2DRobotPlanarDiskCircle")
    os.remove(os.path.join(get_result_dir_from_trial_config(
        tc, "resume-test", 1, root=str(tmp_path)), "results.pkl"))
    lma.run_multi_agent_experiment(cfg, results_root=str(tmp_path))
    assert ran == [1]


def test_experiment_problem_seeds_deterministic():
    """The same experiment config must regenerate identical start/goal sets
    across invocations (paired design survives resume)."""
    cfg = MultiAgentPlanningExperimentConfig(
        time_str="x", instance_name="EnvEmpty2DRobotPlanarDiskRandom",
        num_agents_l=[3], multi_agent_planner_class_l=["PP", "CBS"],
        num_trials_per_combination=2)
    a = cfg.get_single_trial_configs_from_experiment_config()
    b = cfg.get_single_trial_configs_from_experiment_config()
    assert len(a) == 4  # 2 planners x 2 trials
    for ca, cb in zip(a, b):
        np.testing.assert_allclose(np.asarray(ca.start_state_pos_l),
                                   np.asarray(cb.start_state_pos_l))
    # Across planners within a trial number: identical problems (paired).
    pp0, pp1, cbs0, cbs1 = a
    np.testing.assert_allclose(np.asarray(pp0.start_state_pos_l),
                               np.asarray(cbs0.start_state_pos_l))
    # Across trial numbers: different problems.
    assert not np.allclose(np.asarray(pp0.start_state_pos_l),
                           np.asarray(pp1.start_state_pos_l))

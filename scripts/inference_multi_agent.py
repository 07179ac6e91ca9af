"""Single multi-agent planning trial CLI.

Equivalent of scripts/inference/inference_multi_agent.py in the reference:
pick an instance, agent count, and planner; run one trial; save results +
renderings.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# MMD_CPU_DEVICES=N forces an N-device virtual CPU backend (e.g. to exercise
# --mesh_agents without TPU hardware). Must run before any backend
# initialization; jax.config beats the sitecustomize-exported JAX_PLATFORMS
# (same trick as tests/conftest.py).
_n_cpu = int(os.environ.get("MMD_CPU_DEVICES", "0"))
if _n_cpu:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_n_cpu}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

from mmd_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from mmd_tpu.experiments.experiments import MultiAgentPlanningSingleTrialConfig
from mmd_tpu.experiments.problems import get_planning_problem
from mmd_tpu.experiments.trial import run_multi_agent_trial


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instance", default="EnvEmptyNoWait2DRobotPlanarDiskCircle")
    ap.add_argument("--num_agents", type=int, default=6)
    ap.add_argument("--planner", default="XECBS",
                    choices=["CBS", "ECBS", "XCBS", "XECBS", "PP"])
    ap.add_argument("--runtime_limit", type=float, default=180.0)
    ap.add_argument("--stagger_dt", type=int, default=0)
    ap.add_argument("--render_animation", action="store_true")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--mesh_agents", type=int, default=0,
                    help="shard CBS-family team programs over an 'agent' "
                         "mesh axis of this size (0 = single device); the "
                         "size must divide --num_agents")
    args = ap.parse_args()

    mesh = None
    if args.mesh_agents:
        from mmd_tpu.parallel.sharding import make_mesh
        mesh = make_mesh([args.mesh_agents], axis_names=("agent",))

    cfg = MultiAgentPlanningSingleTrialConfig(
        time_str=time.strftime("%y-%m-%d--%H-%M-%S"),
        num_agents=args.num_agents,
        multi_agent_planner_class=args.planner,
        runtime_limit=args.runtime_limit,
        stagger_start_time_dt=args.stagger_dt,
        instance_name=args.instance,
        render_animation=args.render_animation,
    )
    (cfg.start_state_pos_l, cfg.goal_state_pos_l,
     cfg.global_model_ids, cfg.agent_skeleton_l) = get_planning_problem(
        args.instance, args.num_agents, seed=args.seed)

    result = run_multi_agent_trial(cfg, mesh=mesh)
    print(result)


if __name__ == "__main__":
    main()

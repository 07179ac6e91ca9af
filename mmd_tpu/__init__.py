"""mmd-tpu: TPU-native multi-robot motion planning with diffusion models.

A from-scratch JAX/XLA re-design of the capabilities of yoraish/mmd
(ICLR 2025, "Multi-Robot Motion Planning with Diffusion Models"):
guided trajectory-denoising diffusion planners, multi-agent conflict
resolution (CBS/ECBS/XCBS/XECBS, prioritized planning), multi-tile skill
composition, SDF environments, data generation, training, experiments, and
visualization — with the entire plan-time hot path compiled into a handful
of jitted XLA programs.

Public API highlights:
    from mmd_tpu import MPD, MPDEnsemble, CBS, PrioritizedPlanning
    from mmd_tpu import make_task, make_env, TrajectoryDataset
"""

from mmd_tpu.config import DiffusionConfig, MMDParams, params
from mmd_tpu.datasets.trajectories import TrajectoryDataset, model_id
from mmd_tpu.envs.envs import ENV_REGISTRY, make_env
from mmd_tpu.experiments.status import TrialSuccessStatus
from mmd_tpu.robots.disk import DiskRobot
from mmd_tpu.tasks.task import PlanningTask, make_task

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports for the heavier planner/training modules.
    if name == "MPD":
        from mmd_tpu.planners.single_agent.mpd import MPD
        return MPD
    if name == "MPDEnsemble":
        from mmd_tpu.planners.single_agent.mpd_ensemble import MPDEnsemble
        return MPDEnsemble
    if name == "CBS":
        from mmd_tpu.planners.multi_agent.cbs import CBS
        return CBS
    if name == "PrioritizedPlanning":
        from mmd_tpu.planners.multi_agent.prioritized_planning import PrioritizedPlanning
        return PrioritizedPlanning
    raise AttributeError(name)

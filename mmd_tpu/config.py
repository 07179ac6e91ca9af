"""Central parameter hub for mmd-tpu.

TPU-native re-design of the reference's `MMDParams` static class
(reference: mmd/config/mmd_params.py:28-64). Values mirror the reference
defaults exactly; the structure is a frozen dataclass so configs are hashable
and can be passed as static args to `jax.jit`.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class MMDParams:
    """Global defaults (reference: mmd/config/mmd_params.py:28-64)."""

    # Robot.
    robot_planar_disk_radius: float = 0.05

    # Single-agent planning.
    use_guide_on_extra_objects_only: bool = False
    n_samples: int = 64            # trajectories denoised per plan call
    horizon: int = 64              # waypoints per trajectory
    n_local_inference_noising_steps: int = 3
    n_local_inference_denoising_steps: int = 3
    start_guide_steps_fraction: float = 0.5
    n_guide_steps: int = 20        # guide iterations per diffusion step
    n_diffusion_steps_without_noise: int = 1
    weight_grad_cost_collision: float = 2e-2
    weight_grad_cost_smoothness: float = 8e-2
    weight_grad_cost_constraints: float = 2e-1
    weight_grad_cost_soft_constraints: float = 2e-2
    factor_num_interpolated_points_for_collision: float = 1.5
    trajectory_duration: float = 5.0
    seed: int = 18
    results_dir: str = "logs"

    # Multi-agent planning.
    low_level_choose_path_from_batch_strategy: str = "least_collisions"

    # Evaluation.
    runtime_limit: float = 60.0
    data_adherence_linear_deviation_fraction: float = 0.1

    @property
    def vertex_constraint_radius(self) -> float:
        # reference: mmd/config/mmd_params.py:52
        return self.robot_planar_disk_radius * 2.4

    @property
    def robot_rr_margin(self) -> float:
        # robot-robot collision margin (reference: robot_planar_disk.py:186)
        return 2.1 * self.robot_planar_disk_radius


params = MMDParams()


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Static configuration of one guided diffusion sampler.

    Mirrors the knobs threaded through GaussianDiffusionModel + MPD
    (reference: mmd/models/diffusion_models/diffusion_model_base.py:48-105,
    mmd/planners/single_agent/mpd.py:267-304).
    """

    horizon: int = 64
    state_dim: int = 4             # [x, y, vx, vy]
    n_samples: int = 64
    n_diffusion_steps: int = 25
    n_diffusion_steps_without_noise: int = 1
    variance_schedule: str = "exponential"
    predict_epsilon: bool = True
    clip_denoised: bool = True
    n_guide_steps: int = 20
    t_start_guide: int = 13        # ceil(0.5 * 25)
    # 'ddpm' (default) or 'ddim': fast mode running ddim_substeps
    # deterministic substeps (reference diffusion_model_base.py:214-291).
    # Applies to FRESH full-denoise loops only; XCBS local inference (the
    # warm-start polish) always runs the DDPM path.
    sampler: str = "ddpm"
    # DDIM substep count; 0 = the reference's n_diffusion_steps//5. More
    # substeps trade speed back for data adherence (MODEL_EVAL.yaml holds
    # the measured ladder).
    ddim_substeps: int = 0
    noise_std_extra: float = 0.5   # constant extra noise-std schedule (mpd.py:303)
    unet_dim: int = 32
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    time_emb_dim: int = 32

    @property
    def q_dim(self) -> int:
        return self.state_dim // 2

"""Loss wrappers with the reference's dict interface.

Mirrors mmd/losses/gaussian_diffusion_loss.py:15-28: loss_fn pulls the
normalized trajectory + hard conditions from the batch dict and returns a
named loss dict.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax

from mmd_tpu.models.diffusion import HardConds, diffusion_loss
from mmd_tpu.models.schedules import DiffusionSchedule


class GaussianDiffusionLoss:
    """reference: gaussian_diffusion_loss.py:15."""

    @staticmethod
    def loss_fn(apply_fn, params, schedule: DiffusionSchedule,
                input_dict: Dict, key: jax.Array,
                n_diffusion_steps: int) -> Dict[str, jax.Array]:
        trajs = input_dict["traj_normalized"]
        hard: HardConds = input_dict["hard_conds"]
        loss = diffusion_loss(apply_fn, params, schedule, trajs, hard, key,
                              n_diffusion_steps)
        return {"diffusion_loss": loss}

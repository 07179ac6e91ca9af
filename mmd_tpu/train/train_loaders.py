"""Factory helpers mirroring the reference's reflection-based loaders
(mmd/trainer/train_loaders.py:14-90): get_model / get_loss / get_dataset by
string name.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax

from mmd_tpu.datasets.trajectories import TrajectoryDataset, model_id
from mmd_tpu.train.losses import GaussianDiffusionLoss

MODEL_REGISTRY = {}


def _models():
    from mmd_tpu.models.generic import MLPModel, NoModel, PointUnet
    from mmd_tpu.models.temporal_unet import TemporalUnet

    return {"TemporalUnet": TemporalUnet, "MLPModel": MLPModel,
            "NoModel": NoModel, "PointUnet": PointUnet}


def get_model(model_class: str = "TemporalUnet", checkpoint_dir: Optional[str] = None,
              **kwargs):
    """Build a model by class name, optionally restoring a checkpoint
    (reference: train_loaders.py:14-50)."""
    if checkpoint_dir is not None:
        from mmd_tpu.train.trainer import load_checkpoint

        model, params, schedule, info = load_checkpoint(checkpoint_dir)
        return model, params
    cls = _models()[model_class]
    model = cls(**kwargs)
    return model, None


def get_loss(loss_class: str = "GaussianDiffusionLoss"):
    """reference: train_loaders.py:52-57."""
    return {"GaussianDiffusionLoss": GaussianDiffusionLoss}[loss_class]


def get_dataset(dataset_class: str = "TrajectoryDataset",
                dataset_subdir: Optional[str] = None,
                trajectories_dir: str = "data_trajectories",
                **kwargs) -> TrajectoryDataset:
    """reference: train_loaders.py:59-82 (95/5 split happens in train())."""
    assert dataset_class == "TrajectoryDataset"
    return TrajectoryDataset.load(trajectories_dir, dataset_subdir)

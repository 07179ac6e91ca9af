"""Experiment logging: wandb when available, silent fallback otherwise.

The reference logs train losses and sampling summaries to wandb
(trainer.py:268, summary_trajectory_generation.py:48-88; tensorboard is in
requirements but unused). This wrapper keeps call sites identical whether
or not wandb exists in the environment.
"""
from __future__ import annotations

from typing import Optional


class ExperimentLogger:
    def __init__(self, project: Optional[str] = None, name: Optional[str] = None,
                 mode: str = "disabled", config: Optional[dict] = None):
        self._wandb = None
        if mode != "disabled":
            try:
                import wandb  # noqa: PLC0415

                wandb.init(project=project, name=name, mode=mode, config=config)
                self._wandb = wandb
            except ImportError:
                pass
        self.history = []

    def log(self, metrics: dict, step: Optional[int] = None):
        self.history.append((step, dict(metrics)))
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()

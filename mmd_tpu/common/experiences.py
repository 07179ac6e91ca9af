"""Experience records for XCBS warm starts.

Mirrors mmd/common/experiences.py:34-51: a PathBatchExperience carries the
(B, H, D) batch of a previous plan, fed to local inference (noise k steps,
denoise k steps) when replanning under new constraints.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class PathExperience:
    path: np.ndarray  # (H, D)


@dataclasses.dataclass
class PathBatchExperience:
    path_b: np.ndarray  # (B, H, D)

"""Small utilities mirrored from mmd/utils/.

- load_params_from_yaml (reference: mmd/utils/loading.py:7)
- one_hot (reference: mmd/utils/one_hot.py)
- finite-difference jacobian check (reference: mmd/utils/jacobian.py)
- results-path helpers (reference: mmd/utils/path_utils.py)
"""
from __future__ import annotations

import os
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import yaml


def load_params_from_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f)


def one_hot(idx: jax.Array, num_classes: int) -> jax.Array:
    return jax.nn.one_hot(idx, num_classes)


def finite_difference_jacobian(fn: Callable, x: np.ndarray,
                               eps: float = 1e-5) -> np.ndarray:
    """Numerical jacobian for gradient checks in tests."""
    x = np.asarray(x, np.float64)
    y0 = np.asarray(fn(x))
    J = np.zeros((*y0.shape, *x.shape))
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        dx = np.zeros_like(x)
        dx[it.multi_index] = eps
        J[(...,) + it.multi_index] = (np.asarray(fn(x + dx)) - y0) / eps
        it.iternext()
    return J


def get_timestamp_str() -> str:
    return time.strftime("%y-%m-%d--%H-%M-%S")


def create_results_dir(base: str = "./results", tag: str = "") -> str:
    d = os.path.join(base, f"{get_timestamp_str()}{('_' + tag) if tag else ''}")
    os.makedirs(d, exist_ok=True)
    return d

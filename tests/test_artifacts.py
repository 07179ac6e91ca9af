"""Integrity of the committed model/dataset artifacts.

Every checkpoint directory under the three model roots must deserialize
against its own args.yaml (catches checkpoint/schema rot), carry finite
parameters, and agree with its companion dataset's normalizer limits.
Plays the role of the reference's implicit load-at-plan-time check
(mpd.py:116-177) as an explicit fast test.
"""
import glob
import os

import numpy as np
import pytest
import jax

from mmd_tpu.train.trainer import load_checkpoint

REPO = os.path.join(os.path.dirname(__file__), "..")

MODEL_DIRS = sorted(
    d for root in ("data_trained_models", "data_trained_models_h128",
                   "data_trained_models_vd")
    for d in glob.glob(os.path.join(REPO, root, "*"))
    if os.path.isdir(d) and os.path.exists(os.path.join(d, "args.yaml"))
)


@pytest.mark.parametrize("model_dir", MODEL_DIRS,
                         ids=[os.path.relpath(d, REPO) for d in MODEL_DIRS])
def test_checkpoint_loads_and_is_finite(model_dir):
    model, params, schedule, info = load_checkpoint(model_dir)
    leaves = jax.tree_util.tree_leaves(params)
    assert leaves, model_dir
    for leaf in leaves:
        assert np.all(np.isfinite(np.asarray(leaf)))
    # Normalizer limits are the training-time contract the planner restores.
    assert len(info["normalizer_mins"]) == info["state_dim"]
    assert len(info["normalizer_maxs"]) == info["state_dim"]
    assert np.all(np.asarray(info["normalizer_maxs"]) >
                  np.asarray(info["normalizer_mins"]))
    assert info["step"] >= 500_000  # all committed models are full trainings


def test_expected_model_set_present():
    """The five reference envs plus the two beyond-reference Conveyor
    variants (H=128 long-horizon, velocity-diverse)."""
    rels = {os.path.relpath(d, REPO) for d in MODEL_DIRS}
    for env in ("EnvEmpty2D", "EnvEmptyNoWait2D", "EnvConveyor2D",
                "EnvHighways2D", "EnvDropRegion2D"):
        assert f"data_trained_models/{env}-RobotPlanarDisk" in rels
    assert "data_trained_models_h128/EnvConveyor2D-RobotPlanarDisk" in rels
    assert "data_trained_models_vd/EnvConveyor2D-RobotPlanarDisk" in rels

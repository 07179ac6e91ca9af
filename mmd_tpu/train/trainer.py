"""Training loop: Adam + grad clip + EMA, fully jitted steps.

TPU-native re-design of mmd/trainer/trainer.py:119-337. The reference's
per-step Python loop (AMP GradScaler, manual EMA over torch parameters)
becomes one jitted `train_step` (loss + grads + optax update + in-graph EMA)
— the host only feeds batch indices and logs.

Recipe mirrored: Adam (trainer.py:146), global-norm grad clip 1.0
(trainer.py:284-290), EMA decay 0.995 updated every 10 steps with a hard
reset while step < 1000 (trainer.py:70-87, 297-302; EMA class from diffuser).
Checkpoints: flax serialization of {params, ema_params} + a config yaml,
replacing the torch .pth state dicts (trainer.py:23-40).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml
from flax import serialization
from flax.struct import dataclass as pytree_dataclass

from mmd_tpu.datasets.trajectories import TrajectoryDataset
from mmd_tpu.models.diffusion import HardConds, diffusion_loss
from mmd_tpu.models.schedules import DiffusionSchedule, make_schedule
from mmd_tpu.models.temporal_unet import TemporalUnet, init_unet


@pytree_dataclass
class TrainState:
    params: dict
    ema_params: dict
    opt_state: tuple
    step: jax.Array  # int32 scalar


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 3e-4                    # launch_train_01.py recipe
    clip_grad_max_norm: float = 1.0     # trainer.py:289
    ema_decay: float = 0.995            # trainer.py:128
    step_start_ema: int = 1000          # trainer.py:128
    update_ema_every: int = 10          # trainer.py:128
    batch_size: int = 128
    n_diffusion_steps: int = 25
    variance_schedule: str = "exponential"
    # Mixed precision (the TPU-native analog of the reference's AMP
    # GradScaler path, trainer.py:149,278-295): forward/backward run in
    # bfloat16 compute (TemporalUnet.dtype), master params + optimizer
    # state + EMA + loss stay float32. bf16 needs no loss scaling (same
    # exponent range as f32), so there is no GradScaler analog to port.
    bf16: bool = False


class EarlyStopper:
    """Patience-based early stopping on validation loss
    (reference: trainer.py:48-67)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.counter = 0
        self.min_validation_loss = float("inf")

    def early_stop(self, validation_loss: float) -> bool:
        if validation_loss < self.min_validation_loss:
            self.min_validation_loss = validation_loss
            self.counter = 0
        elif validation_loss > self.min_validation_loss + self.min_delta:
            self.counter += 1
            if self.counter >= self.patience:
                return True
        return False


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_grad_max_norm),
        optax.adam(cfg.lr),
    )


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.array, params),
        opt_state=optimizer.init(params),
        step=jnp.asarray(0, jnp.int32),
    )


def _update(apply_fn: Callable, schedule: DiffusionSchedule, optimizer,
            cfg: TrainConfig, state: TrainState, batch: jax.Array,
            hard: HardConds, key: jax.Array):
    """One optimizer step (shared by the per-step and scanned programs)."""
    loss, grads = jax.value_and_grad(
        lambda p: diffusion_loss(apply_fn, p, schedule, batch, hard, key,
                                 cfg.n_diffusion_steps))(state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    step = state.step + 1

    def ema_update(ema):
        # Hard reset before step_start_ema, EMA blend after
        # (trainer.py:297-302).
        do_reset = step < cfg.step_start_ema
        return jax.tree_util.tree_map(
            lambda e, p: jnp.where(do_reset, p,
                                   e * cfg.ema_decay + p * (1 - cfg.ema_decay)),
            ema, params)

    ema_params = jax.lax.cond(
        step % cfg.update_ema_every == 0,
        ema_update, lambda e: e, state.ema_params)

    return TrainState(params=params, ema_params=ema_params,
                      opt_state=opt_state, step=step), loss


def make_train_step(apply_fn: Callable, schedule: DiffusionSchedule,
                    optimizer, cfg: TrainConfig):
    """Returns a jitted (state, batch, hard, key) -> (state, loss) step."""

    def step_fn(state: TrainState, batch: jax.Array, hard: HardConds,
                key: jax.Array):
        return _update(apply_fn, schedule, optimizer, cfg, state, batch,
                       hard, key)

    return jax.jit(step_fn, donate_argnums=(0,))


def make_train_chunk(apply_fn: Callable, schedule: DiffusionSchedule,
                     optimizer, cfg: TrainConfig, chunk: int):
    """Returns a jitted (state, data, key) -> (state, mean_loss) program
    running `chunk` optimizer steps as one lax.scan.

    The per-step host loop pays one device round trip per step — over the
    tunneled TPU that dominates wall clock (~100+ ms vs ~few ms of compute
    for the small UNet). Batch sampling moves IN-GRAPH: `data` is the
    device-resident normalized trajectory store and each scan iteration
    gathers its own random batch, so the host touches the device once per
    `chunk` steps. The held-out validation prefix [0, n_val) is excluded
    from the sampling range exactly as TrajectoryDataset.sample_batch does.
    """

    def chunk_fn(state: TrainState, data: jax.Array, n_val: jax.Array,
                 key: jax.Array):
        H = data.shape[1]
        mask = jnp.zeros((H, 1)).at[0].set(1.0).at[H - 1].set(1.0)

        def body(st, k):
            bkey, lkey = jax.random.split(k)
            idx = jax.random.randint(bkey, (cfg.batch_size,), n_val,
                                     data.shape[0])
            batch = data[idx]
            hard = HardConds(mask=mask, values=batch)
            return _update(apply_fn, schedule, optimizer, cfg, st, batch,
                           hard, lkey)

        keys = jax.random.split(key, chunk)
        state, losses = jax.lax.scan(body, state, keys)
        return state, losses.mean()

    return jax.jit(chunk_fn, donate_argnums=(0,))


def train(dataset: TrajectoryDataset,
          cfg: TrainConfig = TrainConfig(),
          num_train_steps: int = 5000,
          seed: int = 18,
          unet_dim: int = 32,
          dim_mults=(1, 2, 4),
          model_dir: Optional[str] = None,
          log_every: int = 500,
          steps_til_checkpoint: Optional[int] = None,
          log_fn: Optional[Callable] = None,
          val_fraction: float = 0.05,
          validate_every: Optional[int] = None,
          early_stop_patience: Optional[int] = None,
          summary_every: Optional[int] = None,
          resume: bool = False):
    """Train a TemporalUnet diffusion model on `dataset`.

    Mirrors the reference recipe (trainer.py:119-335): Adam + clip + EMA,
    periodic validation on a 95/5 split with optional early stopping
    (train_loaders.py:59-82, trainer.py:48-67, 224-251), periodic sampling
    summaries, loss-history .npy dumps, and checkpointing.
    Returns (model, final TrainState, schedule, losses list).
    """
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    model, params = init_unet(init_key, horizon=dataset.n_support_points,
                              state_dim=dataset.state_dim,
                              unet_input_dim=unet_dim, dim_mults=tuple(dim_mults))
    schedule = make_schedule(cfg.variance_schedule, cfg.n_diffusion_steps)
    optimizer = make_optimizer(cfg)
    state = init_train_state(params, optimizer)
    if resume and model_dir and os.path.exists(
            os.path.join(model_dir, "train_state.msgpack")):
        state = load_train_state(model_dir, state)
        (log_fn or print)(f"resumed from step {int(state.step)}")
    # Mixed precision: the train step's forward/backward use a bfloat16
    # compute clone (grads return float32 through the cast's transpose);
    # validation keeps the float32 apply so early stopping measures the
    # deployed precision.
    train_apply = (model.clone(dtype=jnp.bfloat16).apply if cfg.bf16
                   else model.apply)
    step_fn = make_train_step(train_apply, schedule, optimizer, cfg)

    # 95/5 train/validation split (train_loaders.py:59-82). The validation
    # prefix is excluded from the training sampling range so early stopping
    # is measured on held-out data.
    n_val = max(1, int(dataset.n_trajs * val_fraction)) if validate_every else 0
    val_batch = dataset.trajs_normalized[:n_val] if n_val else None
    stopper = EarlyStopper(patience=early_stop_patience) if early_stop_patience else None

    @jax.jit
    def val_loss_fn(params, key):
        H = dataset.n_support_points
        mask = jnp.zeros((H, 1)).at[0].set(1.0).at[H - 1].set(1.0)
        hard = HardConds(mask=mask, values=val_batch)
        return diffusion_loss(model.apply, params, schedule, val_batch, hard,
                              key, cfg.n_diffusion_steps)

    # Scanned multi-step training: run `chunk` steps per device call (the
    # largest chunk that still honors every host-side cadence), instead of
    # one tunnel round trip per step.
    cadences = [c for c in (log_every, validate_every, summary_every,
                            steps_til_checkpoint, num_train_steps) if c]
    chunk = max(1, min(cadences))
    if chunk > 1 and num_train_steps % chunk == 0 and all(
            c % chunk == 0 for c in cadences):
        chunk_fn = make_train_chunk(train_apply, schedule, optimizer, cfg,
                                    chunk)
    else:
        chunk, chunk_fn = 1, None

    losses, val_losses = [], []
    t0 = time.perf_counter()
    for i in range(chunk - 1, num_train_steps, chunk):
        key, bkey, lkey = jax.random.split(key, 3)
        if chunk_fn is not None:
            state, loss = chunk_fn(state, dataset.trajs_normalized,
                                   jnp.asarray(n_val), lkey)
        else:
            batch, hard = dataset.sample_batch(bkey, cfg.batch_size,
                                               start_idx=n_val)
            state, loss = step_fn(state, batch, hard, lkey)
        if (i + 1) % log_every == 0 or i + 1 == chunk:
            lv = float(loss)
            losses.append((i + 1, lv))
            msg = f"step {i + 1}/{num_train_steps} loss {lv:.5f} ({time.perf_counter() - t0:.1f}s)"
            (log_fn or print)(msg)
        if validate_every and (i + 1) % validate_every == 0:
            key, vkey = jax.random.split(key)
            vl = float(val_loss_fn(state.params, vkey))
            val_losses.append((i + 1, vl))
            (log_fn or print)(f"step {i + 1} val_loss {vl:.5f}")
            if stopper and stopper.early_stop(vl):
                (log_fn or print)(f"early stopped at step {i + 1}")
                break
        if summary_every and (i + 1) % summary_every == 0 and model_dir:
            from mmd_tpu.train.summary import summary_trajectory_generation
            key, skey = jax.random.split(key)
            stats = summary_trajectory_generation(
                model, state.ema_params, schedule, dataset, skey,
                save_dir=os.path.join(model_dir, "summaries"), step=i + 1)
            (log_fn or print)(f"summary {stats}")
        if model_dir and steps_til_checkpoint and (i + 1) % steps_til_checkpoint == 0:
            save_checkpoint(model_dir, model, state, dataset, cfg,
                            suffix=f"_step_{i + 1:07d}")

    if model_dir:
        save_checkpoint(model_dir, model, state, dataset, cfg)
        save_train_state(model_dir, state)
        # Loss-history dumps (trainer.py:43 save_losses_to_disk).
        np.save(os.path.join(model_dir, "train_losses.npy"), np.asarray(losses))
        if val_losses:
            np.save(os.path.join(model_dir, "val_losses.npy"), np.asarray(val_losses))
    return model, state, schedule, losses


# ------------------------------------------------------------- checkpoints
def save_train_state(model_dir: str, state: TrainState,
                     name: str = "train_state.msgpack"):
    """Full mid-run resume state (params + EMA + optimizer + step).

    The reference cannot resume mid-run (no optimizer-state save,
    SURVEY.md section 5); this adds it.
    """
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, name), "wb") as f:
        f.write(serialization.to_bytes(state))


def load_train_state(model_dir: str, template: TrainState,
                     name: str = "train_state.msgpack") -> TrainState:
    with open(os.path.join(model_dir, name), "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_checkpoint(model_dir: str, model: TemporalUnet, state: TrainState,
                    dataset: TrajectoryDataset, cfg: TrainConfig,
                    suffix: str = ""):
    """Save {model, ema_model} weights + reconstruction config + normalizer.

    Mirrors save_models_to_disk (trainer.py:23-40); 'current' checkpoint is
    the unsuffixed one, loaded by the planner (mpd.py:167-171).
    """
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, f"model{suffix}.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(state.params))
    with open(os.path.join(model_dir, f"ema_model{suffix}.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(state.ema_params))
    info = {
        "env_name": dataset.env_name,
        "horizon": int(dataset.n_support_points),
        "state_dim": int(dataset.state_dim),
        "unet_input_dim": int(model.unet_input_dim),
        "dim_mults": list(model.dim_mults),
        "n_diffusion_steps": int(cfg.n_diffusion_steps),
        "variance_schedule": cfg.variance_schedule,
        "step": int(state.step),
        "normalizer_mins": np.asarray(dataset.normalizer.mins).tolist(),
        "normalizer_maxs": np.asarray(dataset.normalizer.maxs).tolist(),
    }
    with open(os.path.join(model_dir, "args.yaml"), "w") as f:
        yaml.safe_dump(info, f)


def load_checkpoint(model_dir: str, use_ema: bool = True):
    """Returns (model, params, schedule, info dict)."""
    from mmd_tpu.models.temporal_unet import init_unet_abstract

    with open(os.path.join(model_dir, "args.yaml")) as f:
        info = yaml.safe_load(f)
    # Abstract init: only the params STRUCTURE is needed to deserialize —
    # running model.init would compile a throwaway forward pass.
    model, shapes = init_unet_abstract(horizon=info["horizon"],
                                       state_dim=info["state_dim"],
                                       unet_input_dim=info["unet_input_dim"],
                                       dim_mults=tuple(info["dim_mults"]))
    name = "ema_model.msgpack" if use_ema else "model.msgpack"
    with open(os.path.join(model_dir, name), "rb") as f:
        params = serialization.from_bytes(shapes, f.read())
    # from_bytes returns NUMPY leaves; left that way, every jit call taking
    # params as an argument re-uploads ~4 MB over the host<->TPU link.
    # Device-put once at load so planner calls pass device-resident buffers.
    params = jax.device_put(params)
    schedule = make_schedule(info["variance_schedule"], info["n_diffusion_steps"])
    return model, params, schedule, info

"""Device-resident epoch runner: one XLA program per epoch.

The reference dispatches every op from Python per batch (eager
``train_step``); even this framework's jitted per-batch loop pays one host
round-trip per step.  At reference scale (60k MNIST uint8 = 47 MB) the whole
dataset fits HBM, so the TPU-native endgame is:

  - stage the uint8 dataset on device once,
  - per epoch: device-side shuffle (``jax.random.permutation``), then one
    ``lax.scan`` over steps that gathers a batch, pads/normalizes/binarizes,
    and runs the train step — zero host involvement between steps,
  - return the new state + per-step metrics stacked on device.

Falls back to the per-batch iterator path (``Trainer.fit``) for datasets too
large to stage.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nvae_tpu.config import ModelConfig, TrainConfig
from nvae_tpu.models import NVAE
from nvae_tpu.train import losses
from nvae_tpu.train.optim import find_spectral_state, spectral_penalty
from nvae_tpu.train.state import TrainState


def make_epoch_runner(
    model: NVAE,
    tx: optax.GradientTransformation,
    train_cfg: TrainConfig,
    total_steps: int,
    steps_per_epoch: int,
    target_size: int = 32,
    donate: bool = True,
):
    """Returns ``run_epoch(state, data_u8, epoch_idx) -> (state, metrics)``.

    ``data_u8`` is the full (N, H, W, C) uint8 training set, device-resident.
    ``metrics`` are per-epoch means of the per-step dicts.
    """
    model_cfg: ModelConfig = model.cfg
    total_epochs = max(total_steps // max(steps_per_epoch, 1), 1)
    batch_size = train_cfg.batch_size

    def prepare(batch_u8: jax.Array, rng: jax.Array) -> jax.Array:
        x = batch_u8
        h = x.shape[1]
        if h < target_size:
            pad = target_size - h
            lo, hi = pad // 2, pad - pad // 2
            x = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
        x = x.astype(jnp.float32)
        if not train_cfg.binary:
            return x / 255.0
        if train_cfg.parity_binarize_255:
            return (x > 0).astype(jnp.float32)
        probs = x / 255.0
        return (jax.random.uniform(rng, probs.shape) < probs).astype(
            jnp.float32
        )

    def train_one(state: TrainState, batch: jax.Array):
        rng = jax.random.fold_in(state.rng, state.step)
        epoch = state.step // steps_per_epoch
        beta = losses.beta_schedule(
            state.step, epoch, train_cfg=train_cfg,
            total_steps=total_steps, total_epochs=total_epochs,
        )
        sn_u = None
        if model_cfg.spectral_mode == "penalty":
            sn_state = find_spectral_state(state.opt_state)
            sn_u = sn_state.u if sn_state is not None else None

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            mutable = ["batch_stats"]
            if state.spectral:
                variables["spectral"] = state.spectral
                mutable.append("spectral")
            out, mutated = model.apply(
                variables, batch, True, rngs={"sample": rng}, mutable=mutable
            )
            loss, metrics = losses.elbo_loss(out, batch, beta, model_cfg)
            bn_loss = losses.bn_gamma_penalty(params, model_cfg.sr_lambda)
            loss = loss + bn_loss
            metrics["bn_loss"] = bn_loss
            if sn_u is not None:
                sr = spectral_penalty(params, sn_u, model_cfg.sr_lambda)
                loss = loss + sr
                metrics["spectral_loss"] = sr
            return loss, (metrics, mutated)

        (loss, (metrics, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            epoch=epoch,
            params=new_params,
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            spectral=mutated.get("spectral", state.spectral),
            opt_state=new_opt_state,
        )
        return new_state, metrics

    def run_epoch(
        state: TrainState, data_u8: jax.Array, epoch_idx: jax.Array
    ) -> Tuple[TrainState, dict]:
        n = data_u8.shape[0]
        shuffle_rng = jax.random.fold_in(
            jax.random.fold_in(state.rng, 0x5EED), epoch_idx
        )
        perm = jax.random.permutation(shuffle_rng, n)
        # One big gather up front; the scan then consumes contiguous slices
        # as xs (cheaper than a dynamic gather inside every iteration).
        epoch_data = data_u8[perm[: steps_per_epoch * batch_size]]
        epoch_data = epoch_data.reshape(
            steps_per_epoch, batch_size, *data_u8.shape[1:]
        )

        def scan_body(st, batch_u8):
            data_rng = jax.random.fold_in(
                jax.random.fold_in(st.rng, 0xDA7A), st.step
            )
            batch = prepare(batch_u8, data_rng)
            st, metrics = train_one(st, batch)
            return st, metrics

        new_state, stacked = jax.lax.scan(scan_body, state, epoch_data)
        means = jax.tree.map(jnp.mean, stacked)
        return new_state, means

    return jax.jit(run_epoch, donate_argnums=(0,) if donate else ())


def stage_dataset(images: np.ndarray, sharding=None) -> jax.Array:
    """Move the uint8 dataset to device (optionally sharded) once."""
    return jax.device_put(np.ascontiguousarray(images), sharding)

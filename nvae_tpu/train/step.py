"""The jitted train step — the framework's hot loop.

One XLA program per step: forward, ELBO with KL warm-up/balancing, penalties,
backward, Adamax update, spectral projection — where the reference runs
op-by-op eager Python (``model.compile(run_eagerly=True)``, reference
``train.py:132``; 49-104 h wall-clock for 400 MNIST epochs, BASELINE.md).

Donated state, explicit RNG folding per step, metrics returned as a dict.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from nvae_tpu.config import ModelConfig, TrainConfig
from nvae_tpu.models import NVAE
from nvae_tpu.train import losses
from nvae_tpu.train.optim import find_spectral_state, spectral_penalty
from nvae_tpu.train.state import TrainState


def make_train_step(
    model: NVAE,
    tx: optax.GradientTransformation,
    train_cfg: TrainConfig,
    total_steps: int,
    steps_per_epoch: int,
    donate: bool = True,
    mesh=None,
):
    """Returns ``step_fn(state, batch) -> (state, metrics)``, jit-compiled.

    ``batch`` is a (B, H, W, C) float array in [0, 1] (already binarized for
    Bernoulli configs — binarization happens device-side in the data layer).

    ``mesh`` MUST be passed when ``grad_accum > 1`` runs on a multi-device
    mesh: the microbatch reshape ``(B, ...) -> (accum, B/accum, ...)`` is
    otherwise re-sharded by GSPMD across BOTH leading dims, and the jax 0.8
    SPMD partitioner then computes a wrong (double-counted) depthwise-conv
    gradient — one silently wrong leaf, caught by the SGD lockstep tests.
    With the mesh we pin the reshape to ``P(None, "data")`` (accumulation
    dim replicated, microbatch rows sharded exactly like the incoming
    batch), which restores exact agreement with single-device training
    (1.5e-8 over 3 steps) under every parameter layout.
    """
    model_cfg: ModelConfig = model.cfg
    total_epochs = max(total_steps // max(steps_per_epoch, 1), 1)
    grad_accum = max(int(getattr(train_cfg, "grad_accum", 1)), 1)
    mb_sharding = None
    if grad_accum > 1 and mesh is not None and mesh.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        mb_sharding = NamedSharding(mesh, PartitionSpec(None, "data"))

    def step_fn(state: TrainState, batch: jax.Array) -> Tuple[TrainState, dict]:
        rng = jax.random.fold_in(state.rng, state.step)
        epoch = state.step // steps_per_epoch
        beta = losses.beta_schedule(
            state.step,
            epoch,
            train_cfg=train_cfg,
            total_steps=total_steps,
            total_epochs=total_epochs,
        )

        sn_u = None
        if model_cfg.spectral_mode == "penalty":
            sn_state = find_spectral_state(state.opt_state)
            sn_u = sn_state.u if sn_state is not None else None

        # parity_frozen_norm: run the forward in inference mode inside the
        # loss — the genuine reference trains this way (its train_step calls
        # ``self(data)`` with no training flag; see TrainConfig and
        # tools/reference_oracle.py phase D/E1 for the executed proof).
        train_flag = not getattr(train_cfg, "parity_frozen_norm", False)

        def loss_fn(params, mb, bstats, spect, rng_mb):
            variables = {"params": params, "batch_stats": bstats}
            mutable = ["batch_stats"]
            if spect:
                variables["spectral"] = spect
                mutable.append("spectral")
            out, mutated = model.apply(
                variables,
                mb,
                train_flag,
                rngs={"sample": rng_mb},
                mutable=mutable,
            )
            loss, metrics = losses.elbo_loss(out, mb, beta, model_cfg)
            bn_loss = losses.bn_gamma_penalty(params, model_cfg.sr_lambda)
            loss = loss + bn_loss
            metrics["bn_loss"] = bn_loss
            if sn_u is not None:
                sr = spectral_penalty(params, sn_u, model_cfg.sr_lambda)
                loss = loss + sr
                metrics["spectral_loss"] = sr
            return loss, (metrics, mutated)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if grad_accum == 1:
            (loss, (metrics, mutated)), grads = grad_fn(
                state.params, batch, state.batch_stats, state.spectral, rng
            )
            new_bstats = mutated.get("batch_stats", state.batch_stats)
            new_spect = mutated.get("spectral", state.spectral)
        else:
            # Gradient accumulation: lax.scan over `grad_accum` microbatches
            # — activation memory scales with the MICRObatch while the
            # optimizer sees the mean gradient of the full batch (one Adamax
            # update per step, identical schedules).  BatchNorm normalizes
            # per microbatch (standard accumulation semantics) and its
            # running stats chain through the scan carry, as does the
            # per-forward spectral state in parity mode.  Each microbatch
            # folds its index into the step RNG for independent Bernoulli
            # binarization/sampling noise.
            if batch.shape[0] % grad_accum:
                raise ValueError(
                    f"batch size {batch.shape[0]} not divisible by "
                    f"grad_accum {grad_accum}"
                )
            mbs = batch.reshape(
                grad_accum, batch.shape[0] // grad_accum, *batch.shape[1:]
            )
            if mb_sharding is not None:
                # See the mesh note in the factory docstring: without this
                # pin, GSPMD re-shards the reshape across both leading dims
                # and miscompiles the depthwise-conv gradient.
                mbs = jax.lax.with_sharding_constraint(mbs, mb_sharding)

            def body(carry, xs):
                bstats, spect = carry
                i, mb = xs
                (l_i, (m_i, mut)), g_i = grad_fn(
                    state.params, mb, bstats, spect,
                    jax.random.fold_in(rng, i),
                )
                return (
                    mut.get("batch_stats", bstats),
                    mut.get("spectral", spect),
                ), (l_i, m_i, g_i)

            (new_bstats, new_spect), (ls, ms, gs) = jax.lax.scan(
                body,
                (state.batch_stats, state.spectral),
                (jnp.arange(grad_accum), mbs),
            )
            loss = jnp.mean(ls)
            metrics = jax.tree.map(jnp.mean, ms)
            grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), gs)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            epoch=epoch,
            params=new_params,
            batch_stats=new_bstats,
            spectral=new_spect,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    if donate:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(step_fn)


def make_eval_step(
    model: NVAE, train_cfg: TrainConfig, bn_batch_stats: bool = True
):
    """Jitted eval step: ELBO pieces on a batch without gradient/updates.

    ``bn_batch_stats=True`` (default) normalizes with the evaluation batch's
    own statistics (mutations discarded).  Hierarchical-VAE KL is
    pathologically sensitive to a BN-mode switch: deep-group priors sit near
    the sigma floor (1e-2), so the small feature shift from running-average
    BN inflates held-out KL by orders of magnitude while reconstruction stays
    fine (measured: train KL 83 vs running-stat eval KL 1.6e6 on the same
    checkpoint).  The reference never faces the switch — its Keras BN layers
    effectively run in one consistent mode on both paths (SURVEY §7
    "BatchNorm in a functional framework"; NVAE's own eval protocol
    re-estimates BN statistics before measuring).
    """
    model_cfg: ModelConfig = model.cfg

    @jax.jit
    def eval_fn(state: TrainState, batch: jax.Array, rng: jax.Array) -> dict:
        if bn_batch_stats:
            out, _ = model.apply(
                state.variables(), batch, True, rngs={"sample": rng},
                mutable=["batch_stats", "spectral"],
            )
        else:
            out = model.apply(
                state.variables(), batch, False, rngs={"sample": rng}
            )
        rl = losses.recon_loss(
            out.logits, batch, model_cfg.likelihood, model_cfg.n_mix
        )
        kl_all = losses.kl_per_group(out.latents)
        return {
            "reconstruction_loss": jnp.mean(rl),
            "kl_loss": jnp.mean(jnp.sum(kl_all, axis=0)),
            "elbo": jnp.mean(rl + jnp.sum(kl_all, axis=0)),
        }

    return eval_fn

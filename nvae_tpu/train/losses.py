"""ELBO, KL balancing/warm-up, and regularization penalties.

Reproduces the loss semantics of reference ``models.py:100-135`` and
``models.py:191-267`` as pure functions over :class:`ForwardOutput`, designed
to live inside a single jitted train step (the reference computes all of this
eagerly per batch — the dominant cost SURVEY §3.1 identifies).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from nvae_tpu.config import ModelConfig, TrainConfig
from nvae_tpu.models.nvae import LatentParams
from nvae_tpu.ops import bernoulli_log_prob, diagonal_gaussian_kl, dml_log_prob


def kl_per_group(latents: List[LatentParams]) -> jax.Array:
    """(G, B) KL summed over H, W, C per group (reference ``models.py:197-201``)."""
    return jnp.stack(
        [
            jnp.sum(
                diagonal_gaussian_kl(
                    g.enc_mu, g.enc_sigma, g.dec_mu, g.dec_sigma
                ),
                axis=(1, 2, 3),
            )
            for g in latents
        ],
        axis=0,
    )


def kl_alphas(n_scales: int, groups_per_scale: Sequence[int]) -> jax.Array:
    """Square-decay balancing coefficients, ordered to match the decoder's
    top-down latent ordering (reference ``calculate_kl_alphas``,
    ``models.py:227-237``: scale i gets ``(2^i)^2 / groups_per_scale[n-1-i]``,
    normalized by the minimum).  ``groups_per_scale`` is bottom-up (model
    config order), exactly like the reference call site ``models.py:207-208``.
    """
    coeffs = []
    for i in range(n_scales):
        g = groups_per_scale[n_scales - i - 1]
        coeffs.append(jnp.full((g,), float((2**i) ** 2) / g))
    alphas = jnp.concatenate(coeffs)
    return alphas / jnp.min(alphas)


def balanced_kl_loss(
    kl_all: jax.Array, alphas: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-sample KL with warm-up balancing (reference ``models.py:204-218``).

    ``kl_all`` is (G, B).  Coefficients are
    ``(mean_b |KL_g| + 0.01) / alpha_g * sum_g(...)``, normalized by their
    mean and applied under ``stop_gradient`` — re-weighting magnitudes without
    steering gradients.  Returns ``(loss_b, coeffs_g)``.
    """
    kl_coeff = jnp.mean(jnp.abs(kl_all), axis=1) + 0.01  # (G,)
    total_kl = jnp.sum(kl_coeff)
    kl_coeff = kl_coeff / alphas * total_kl
    kl_coeff = kl_coeff / jnp.mean(kl_coeff)
    kl_coeff = jax.lax.stop_gradient(kl_coeff)
    loss = jnp.sum(kl_all * kl_coeff[:, None], axis=0)  # (B,)
    return loss, kl_coeff


def unbalanced_kl_loss(kl_all: jax.Array) -> jax.Array:
    """Plain sum over groups (reference ``models.py:220-222``)."""
    return jnp.sum(kl_all, axis=0)


def recon_loss(
    logits: jax.Array,
    x: jax.Array,
    likelihood: str = "bernoulli",
    n_mix: int = 10,
    crop: int = 0,
) -> jax.Array:
    """Per-sample negative log-likelihood, summed over pixels.

    ``crop`` trims a border before scoring — the reference's IWAE NLL crops
    32x32 back to the 28x28 MNIST interior (``models.py:244``, crop=2 maps to
    ``[:, 2:30, 2:30, :]``).
    """
    if crop:
        x = x[:, crop:-crop, crop:-crop, :]
        logits = logits[:, crop:-crop, crop:-crop, :]
    if likelihood == "bernoulli":
        lp = bernoulli_log_prob(logits, x)
        return -jnp.sum(lp, axis=(1, 2, 3))
    lp = dml_log_prob(logits, x, n_mix=n_mix)  # (B, H, W)
    return -jnp.sum(lp, axis=(1, 2))


def bn_gamma_penalty(params, sr_lambda: float) -> jax.Array:
    """``sr_lambda * sum max|gamma|`` over every BatchNorm scale in the
    encoder and decoder towers only — not preprocess/postprocess/latent heads,
    matching the exact scope of reference ``calculate_bn_loss``
    (``models.py:252-267``, which walks ``encoder.groups``/``decoder.groups``).
    """
    total = 0.0
    for tower in ("encoder", "decoder"):
        subtree = params.get(tower, {})
        leaves_with_paths = jax.tree_util.tree_flatten_with_path(subtree)[0]
        for path, leaf in leaves_with_paths:
            names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
            if names and names[-1] == "scale":
                total = total + jnp.max(jnp.abs(leaf))
    return sr_lambda * total


def beta_schedule(
    step: jax.Array,
    epoch: jax.Array,
    *,
    train_cfg: TrainConfig,
    total_steps: int,
    total_epochs: int,
) -> jax.Array:
    """KL warm-up coefficient in [0, 1] (reference ``models.py:121-122``).

    - step-based: ``min(step / (frac * total_steps), 1)``
    - epoch-based (fixed): ``min(epoch / (frac * total_epochs), 1)``
    - epoch-based (parity): ``min(epoch / (frac * total_steps), 1)`` —
      bug-for-bug with the reference, which divides the epoch counter by total
      *iterations* (models.py:121-122 with train.py:124), warming up
      ~batches_per_epoch x slower than intended.
    """
    frac = train_cfg.warmup_fraction
    if train_cfg.step_based_warmup:
        metric, denom = step, frac * total_steps
    elif train_cfg.parity_epoch_warmup_in_steps:
        metric, denom = epoch, frac * total_steps
    else:
        metric, denom = epoch, frac * total_epochs
    return jnp.minimum(metric / jnp.maximum(denom, 1e-8), 1.0)


def elbo_loss(
    output,
    x: jax.Array,
    beta: jax.Array,
    model_cfg: ModelConfig,
) -> Tuple[jax.Array, dict]:
    """Training objective: ``mean(recon + beta * kl) + sr_lambda * bn_penalty``
    with balancing active while ``beta < 1`` (reference ``models.py:116-126``).

    Returns (scalar_loss_without_penalties, metrics). Penalties (BN-gamma,
    spectral) are added by the train step, which owns the params.
    """
    rl = recon_loss(
        output.logits, x, model_cfg.likelihood, model_cfg.n_mix
    )  # (B,)
    kl_all = kl_per_group(output.latents)  # (G, B)
    alphas = kl_alphas(model_cfg.n_latent_scales, model_cfg.n_groups_per_scale)
    balanced, coeffs = balanced_kl_loss(kl_all, alphas)
    plain = unbalanced_kl_loss(kl_all)
    kl = jnp.where(beta < 1.0, balanced, plain)  # (B,)
    loss = jnp.mean(rl + beta * kl)
    metrics = {
        "reconstruction_loss": jnp.mean(rl),
        "kl_loss": jnp.mean(kl),
        "kl_raw": jnp.mean(jnp.sum(kl_all, axis=0)),
        "beta": beta,
    }
    return loss, metrics

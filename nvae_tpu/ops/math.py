"""Core numerics for the NVAE framework.

Pure jnp functions, shape-polymorphic, safe under jit/vmap/shard_map.  Each op
documents the reference semantics it reproduces (file:line into
``/root/reference``) so parity can be audited.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def softclamp5(x: jax.Array) -> jax.Array:
    """Differentiable clamp to [-5, 5]: ``5 * tanh(x / 5)``.

    Applied to every mu / log-sigma head in the model (reference
    ``util.py:49-50``).
    """
    return 5.0 * jnp.tanh(x / 5.0)


def gaussian_log_prob(z: jax.Array, mu: jax.Array, sigma: jax.Array) -> jax.Array:
    """Elementwise diagonal-Gaussian log density (reference ``util.py:39-46``).

    Parameterized by standard deviation ``sigma`` (not log-sigma), matching the
    reference's post-``exp(softclamp5(.)) + 1e-2`` convention.
    """
    normalized = (z - mu) / sigma
    return -0.5 * normalized * normalized - 0.5 * _LOG_2PI - jnp.log(sigma)


def diagonal_gaussian_kl(
    enc_mu: jax.Array,
    enc_sigma: jax.Array,
    dec_mu: jax.Array,
    dec_sigma: jax.Array,
) -> jax.Array:
    """Elementwise KL( N(enc_mu, enc_sigma) || N(dec_mu, dec_sigma) ).

    Same closed form as reference ``models.py:197-201``:
    ``0.5 * (t1^2 + t2^2) - 0.5 - log(t2)`` with ``t1 = (mu_q - mu_p)/sigma_p``
    and ``t2 = sigma_q / sigma_p``.
    """
    term1 = (enc_mu - dec_mu) / dec_sigma
    term2 = enc_sigma / dec_sigma
    return 0.5 * (term1 * term1 + term2 * term2) - 0.5 - jnp.log(term2)


def bernoulli_log_prob(logits: jax.Array, x: jax.Array) -> jax.Array:
    """Elementwise Bernoulli log-likelihood of ``x`` under ``logits``.

    Numerically-stable equivalent of
    ``tfp.distributions.Bernoulli(logits=...).log_prob(x)`` used by the
    reference's reconstruction loss (``models.py:247-250``).
    """
    # log p = x * log sigmoid(l) + (1-x) * log sigmoid(-l)
    #       = -x * softplus(-l) - (1-x) * softplus(l)
    return -(x * jax.nn.softplus(-logits) + (1.0 - x) * jax.nn.softplus(logits))


def normalize_l2(v: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """L2-normalize along ``axis`` (reference ``perceptual_path_length.py:18-19``)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axis, keepdims=True) + eps)
    return v / norm


def slerp(a: jax.Array, b: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation of batches of (B, H, W, C) latents.

    Matches reference ``perceptual_path_length.py:23-30``: vectors are
    normalized along the channel axis, ``t`` has shape (B,) and broadcasts as
    (B, 1, 1, 1).
    """
    a = normalize_l2(a)
    b = normalize_l2(b)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    p = t.reshape(-1, 1, 1, 1) * jnp.arccos(d)
    c = normalize_l2(b - d * a)
    out = a * jnp.cos(p) + c * jnp.sin(p)
    return normalize_l2(out)


# ---------------------------------------------------------------------------
# Mixture of discretized logistics (CIFAR-10 / CelebA likelihood head,
# BASELINE.json config #4; replaces the Bernoulli head at reference
# postprocess.py:29).  Per-pixel K-component mixture with per-channel means and
# scales and mixture weights shared across channels:
#   head channels = K * (1 + 2*C)   [K weights, K*C means, K*C log-scales]
# ---------------------------------------------------------------------------


def _split_dml_params(params: jax.Array, n_channels: int, n_mix: int):
    *batch, h, w, ch = params.shape
    assert ch == n_mix * (1 + 2 * n_channels), (ch, n_mix, n_channels)
    logit_probs = params[..., :n_mix]
    rest = params[..., n_mix:].reshape(*batch, h, w, 2, n_mix, n_channels)
    means = rest[..., 0, :, :]
    log_scales = jnp.clip(rest[..., 1, :, :], -7.0, None)
    return logit_probs, means, log_scales  # (...,K), (...,K,C), (...,K,C)


def dml_log_prob(
    params: jax.Array, x: jax.Array, n_mix: int, n_bits: int = 8
) -> jax.Array:
    """Log-likelihood of ``x`` in [0, 1] under a discretized-logistic mixture.

    Returns a per-pixel (batch..., H, W) log-prob; callers sum over H, W.
    """
    n_channels = x.shape[-1]
    n_levels = float(2**n_bits - 1)
    logit_probs, means, log_scales = _split_dml_params(params, n_channels, n_mix)
    x = x * 2.0 - 1.0  # [-1, 1] like PixelCNN++ conventions
    x = x[..., None, :]  # (..., 1, C) broadcasting over mixtures

    inv_s = jnp.exp(-log_scales)
    centered = x - means
    plus_in = inv_s * (centered + 1.0 / n_levels)
    min_in = inv_s * (centered - 1.0 / n_levels)
    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)
    # Edge cases: x == 0 uses CDF(+) alone, x == 1 uses 1 - CDF(-).
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_s * centered
    # Fallback for tiny probability mass: continuous density approximation.
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)
    log_prob_mid = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.clip(cdf_delta, 1e-12, None)),
        log_pdf_mid - jnp.log(n_levels / 2.0),
    )
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, log_prob_mid),
    )  # (..., K, C)
    log_probs = jnp.sum(log_probs, axis=-1) + jax.nn.log_softmax(
        logit_probs, axis=-1
    )
    return jax.nn.logsumexp(log_probs, axis=-1)  # (..., H, W)


def dml_sample(
    params: jax.Array, rng: jax.Array, n_mix: int, n_channels: int
) -> jax.Array:
    """Draw a sample in [0, 1] from the discretized-logistic mixture."""
    logit_probs, means, log_scales = _split_dml_params(params, n_channels, n_mix)
    rng_mix, rng_log = jax.random.split(rng)
    mix = jax.random.categorical(rng_mix, logit_probs, axis=-1)  # (..., H, W)
    one_hot = jax.nn.one_hot(mix, n_mix, dtype=params.dtype)[..., :, None]
    mean = jnp.sum(means * one_hot, axis=-2)
    log_scale = jnp.sum(log_scales * one_hot, axis=-2)
    u = jax.random.uniform(rng_log, mean.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = mean + jnp.exp(log_scale) * (jnp.log(u) - jnp.log1p(-u))
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def dml_mean(params: jax.Array, n_mix: int, n_channels: int) -> jax.Array:
    """Mixture mean in [0, 1] (the greyscale/visualization analog of
    ``Bernoulli.probs`` at reference ``models.py:171-172``)."""
    logit_probs, means, _ = _split_dml_params(params, n_channels, n_mix)
    w = jax.nn.softmax(logit_probs, axis=-1)[..., :, None]
    mean = jnp.sum(means * w, axis=-2)
    return jnp.clip((mean + 1.0) / 2.0, 0.0, 1.0)

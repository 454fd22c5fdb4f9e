"""Frechet distance (FID) — fully on-device.

The reference computes activation statistics in a TF1 session and the matrix
square root with ``scipy.linalg.sqrtm`` on host (``fid_utils.py:320-394``).
Here the trace term uses the PSD identity

    tr sqrtm(S1 @ S2) = tr sqrtm(A @ S2 @ A),   A = sqrtm(S1),

whose right side is symmetric PSD, so two ``eigh`` factorizations (native XLA
ops, TPU-supported) give an exact, differentiable, device-resident answer —
no scipy, no host round-trip.  Numerical guards mirror the reference's
eps-jitter retry (``fid_utils.py:354-360``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def activation_statistics(feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mean and covariance of (N, D) activations (reference
    ``fid_utils.py:375-394``)."""
    feats = jnp.asarray(feats, dtype=jnp.float32)
    mu = jnp.mean(feats, axis=0)
    centered = feats - mu
    cov = centered.T @ centered / (feats.shape[0] - 1)
    return mu, cov


def _sqrtm_psd(mat: jax.Array, eps: float) -> jax.Array:
    vals, vecs = jnp.linalg.eigh(mat)
    vals = jnp.sqrt(jnp.clip(vals, 0.0, None))
    return (vecs * vals) @ vecs.T


@jax.jit
def frechet_distance(
    mu1: jax.Array, cov1: jax.Array, mu2: jax.Array, cov2: jax.Array
) -> jax.Array:
    """``|mu1-mu2|^2 + tr(S1 + S2 - 2 sqrtm(S1 S2))``
    (reference ``calculate_frechet_distance``, ``fid_utils.py:320-371``)."""
    eps = 1e-6
    d = mu1.shape[-1]
    jitter = eps * jnp.eye(d, dtype=cov1.dtype)
    c1 = cov1 + jitter
    c2 = cov2 + jitter
    a = _sqrtm_psd(c1, eps)
    inner = a @ c2 @ a
    inner_vals = jnp.linalg.eigvalsh(inner)
    tr_sqrt = jnp.sum(jnp.sqrt(jnp.clip(inner_vals, 0.0, None)))
    diff = mu1 - mu2
    return (
        jnp.dot(diff, diff) + jnp.trace(c1) + jnp.trace(c2) - 2.0 * tr_sqrt
    )


def fid_from_stats(mu1, sigma1, mu2, sigma2) -> float:
    """FID from precomputed (mu, sigma) pairs — fp64 host path via
    symmetric eigendecompositions (the PSD identity, same math as the
    device path)."""
    mu1 = np.asarray(mu1, dtype=np.float64)
    mu2 = np.asarray(mu2, dtype=np.float64)
    s1 = np.asarray(sigma1, dtype=np.float64)
    s2 = np.asarray(sigma2, dtype=np.float64)
    eps = 1e-6 * np.eye(s1.shape[0])
    s1, s2 = s1 + eps, s2 + eps
    vals1, vecs1 = np.linalg.eigh(s1)
    root1 = (vecs1 * np.sqrt(np.clip(vals1, 0, None))) @ vecs1.T
    inner_vals = np.linalg.eigvalsh(root1 @ s2 @ root1)
    tr_sqrt = np.sum(np.sqrt(np.clip(inner_vals, 0, None)))
    diff = mu1 - mu2
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * tr_sqrt)


def fid_from_features(feats1, feats2, precise: bool = True) -> float:
    """FID between two activation sets (each (N, D)).

    ``precise=True`` (default) runs the once-per-eval reported number in
    float64 on host via symmetric eigendecompositions; ``precise=False``
    uses the jitted fp32 device path (for in-training gating).
    """
    if not precise:
        mu1, c1 = activation_statistics(jnp.asarray(feats1))
        mu2, c2 = activation_statistics(jnp.asarray(feats2))
        return float(frechet_distance(mu1, c1, mu2, c2))
    a = np.asarray(feats1, dtype=np.float64)
    b = np.asarray(feats2, dtype=np.float64)
    return fid_from_stats(
        a.mean(0), np.cov(a, rowvar=False), b.mean(0), np.cov(b, rowvar=False)
    )

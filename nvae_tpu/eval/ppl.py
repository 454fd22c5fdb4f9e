"""Perceptual path length (StyleGAN2-style) over the last latent group.

Reference: slerp two extra draws (z1, z2) from the final group's prior at
``t`` and ``t + eps``, decode both through only the final decoder group
(``models.py:181-189``), and measure feature-space displacement / eps^2 with
1st/99th-percentile outlier rejection (``perceptual_path_length.py:36-45``).

Parity note: the reference norms over ``axis=0`` — the *batch* axis — giving
per-feature path lengths (``perceptual_path_length.py:37``), where StyleGAN2
norms per sample.  ``per_sample=False`` (default) is bit-parity with the
reference (the BASELINE.md PPL ~7e6 scale); ``per_sample=True`` gives the
textbook metric.
"""

from __future__ import annotations

import jax
import numpy as np

from nvae_tpu.ops import slerp


def slerp_pair(z1, z2, rng, epsilon: float = 1e-4):
    """(slerp(t), slerp(t+eps)) with t ~ U[0,1) per sample (reference
    ``perceptual_path_length_init``, ``evaluate.py:179-181``)."""
    t = jax.random.uniform(rng, (z1.shape[0],))
    return slerp(z1, z2, t), slerp(z1, z2, t + epsilon)


def evaluate(
    act1, act2, epsilon: float = 1e-4, per_sample: bool = False
) -> float:
    """Mean filtered path length (reference ``perceptual_path_length.py:36-45``)."""
    act1 = np.asarray(act1)
    act2 = np.asarray(act2)
    axis = -1 if per_sample else 0
    distances = np.linalg.norm(act1 - act2, axis=axis) / (epsilon**2)
    lo = np.percentile(distances, 1, method="lower")
    hi = np.percentile(distances, 99, method="higher")
    kept = distances[(distances >= lo) & (distances <= hi)]
    return float(np.mean(kept))

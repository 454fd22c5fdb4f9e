"""InceptionV3 feature trunk in Flax (pool features, 2048-d).

The reference uses InceptionV3 two ways: a frozen 2015 ``pool_3`` TF1 graph
for FID (``fid_utils.py:245-316``) and Keras ``InceptionV3(include_top=False,
pooling='avg')`` (``evaluate.py:200-205``).  This is a faithful Keras-topology
InceptionV3 trunk: conv stem, 3x mixed-35, 5x mixed-17, 2x mixed-8 blocks,
global average pool -> (B, 2048).

Weights: ImageNet weights load from a local npz (keys ``<layer>/kernel`` etc.
— convert once offline from any Keras checkpoint); without a weight file the
caller (:mod:`nvae_tpu.eval.features`) falls back with a warning.  BatchNorm
runs in inference mode with stored moving statistics (scale-less, like Keras
InceptionV3).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv (no bias) + frozen BN (no scale) + ReLU — Keras `conv2d_bn`."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel_size, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        mean = self.param(
            "bn_mean", nn.initializers.zeros_init(), (self.features,)
        )
        var = self.param(
            "bn_var", nn.initializers.ones_init(), (self.features,)
        )
        beta = self.param(
            "bn_beta", nn.initializers.zeros_init(), (self.features,)
        )
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) + beta
        return jax.nn.relu(x)


def _branch(x, spec: Sequence, prefix: str):
    for i, (f, k, s, p) in enumerate(spec):
        x = ConvBN(f, k, s, p, name=f"{prefix}_{i}")(x)
    return x


class InceptionV3Features(nn.Module):
    """Returns (B, 2048) pooled features for 299x299x3 inputs in [-1, 1]."""

    @nn.compact
    def __call__(self, x):
        v = "VALID"
        s = "SAME"
        # Stem.
        x = ConvBN(32, (3, 3), (2, 2), v, name="stem_0")(x)
        x = ConvBN(32, (3, 3), (1, 1), v, name="stem_1")(x)
        x = ConvBN(64, (3, 3), (1, 1), s, name="stem_2")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = ConvBN(80, (1, 1), (1, 1), v, name="stem_3")(x)
        x = ConvBN(192, (3, 3), (1, 1), v, name="stem_4")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        # 3x mixed-35 (Inception-A) with pool features 32, 64, 64.
        for bi, pool_f in enumerate((32, 64, 64)):
            n = f"mixed35_{bi}"
            b0 = _branch(x, [(64, (1, 1), (1, 1), s)], f"{n}_b0")
            b1 = _branch(
                x,
                [(48, (1, 1), (1, 1), s), (64, (5, 5), (1, 1), s)],
                f"{n}_b1",
            )
            b2 = _branch(
                x,
                [
                    (64, (1, 1), (1, 1), s),
                    (96, (3, 3), (1, 1), s),
                    (96, (3, 3), (1, 1), s),
                ],
                f"{n}_b2",
            )
            bp = nn.avg_pool(
                x, (3, 3), strides=(1, 1), padding=s,
                count_include_pad=False,  # TF divisor excludes padding
            )
            bp = ConvBN(pool_f, (1, 1), name=f"{n}_bp")(bp)
            x = jnp.concatenate([b0, b1, b2, bp], axis=-1)

        # Reduction-A (mixed 3).
        b0 = ConvBN(384, (3, 3), (2, 2), v, name="red_a_b0")(x)
        b1 = _branch(
            x,
            [
                (64, (1, 1), (1, 1), s),
                (96, (3, 3), (1, 1), s),
                (96, (3, 3), (2, 2), v),
            ],
            "red_a_b1",
        )
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jnp.concatenate([b0, b1, bp], axis=-1)

        # 4x mixed-17 (Inception-B) with 7x1/1x7 factorized convs.
        for bi, mid in enumerate((128, 160, 160, 192)):
            n = f"mixed17_{bi}"
            b0 = ConvBN(192, (1, 1), name=f"{n}_b0")(x)
            b1 = _branch(
                x,
                [
                    (mid, (1, 1), (1, 1), s),
                    (mid, (1, 7), (1, 1), s),
                    (192, (7, 1), (1, 1), s),
                ],
                f"{n}_b1",
            )
            b2 = _branch(
                x,
                [
                    (mid, (1, 1), (1, 1), s),
                    (mid, (7, 1), (1, 1), s),
                    (mid, (1, 7), (1, 1), s),
                    (mid, (7, 1), (1, 1), s),
                    (192, (1, 7), (1, 1), s),
                ],
                f"{n}_b2",
            )
            bp = nn.avg_pool(
                x, (3, 3), strides=(1, 1), padding=s,
                count_include_pad=False,  # TF divisor excludes padding
            )
            bp = ConvBN(192, (1, 1), name=f"{n}_bp")(bp)
            x = jnp.concatenate([b0, b1, b2, bp], axis=-1)

        # Reduction-B (mixed 8).
        b0 = _branch(
            x,
            [(192, (1, 1), (1, 1), s), (320, (3, 3), (2, 2), v)],
            "red_b_b0",
        )
        b1 = _branch(
            x,
            [
                (192, (1, 1), (1, 1), s),
                (192, (1, 7), (1, 1), s),
                (192, (7, 1), (1, 1), s),
                (192, (3, 3), (2, 2), v),
            ],
            "red_b_b1",
        )
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jnp.concatenate([b0, b1, bp], axis=-1)

        # 2x mixed-8 (Inception-C) with split 3x1/1x3 branches.
        for bi in range(2):
            n = f"mixed8_{bi}"
            b0 = ConvBN(320, (1, 1), name=f"{n}_b0")(x)
            b1 = ConvBN(384, (1, 1), name=f"{n}_b1")(x)
            b1a = ConvBN(384, (1, 3), name=f"{n}_b1a")(b1)
            b1b = ConvBN(384, (3, 1), name=f"{n}_b1b")(b1)
            b2 = _branch(
                x,
                [(448, (1, 1), (1, 1), s), (384, (3, 3), (1, 1), s)],
                f"{n}_b2",
            )
            b2a = ConvBN(384, (1, 3), name=f"{n}_b2a")(b2)
            b2b = ConvBN(384, (3, 1), name=f"{n}_b2b")(b2)
            bp = nn.avg_pool(
                x, (3, 3), strides=(1, 1), padding=s,
                count_include_pad=False,  # TF divisor excludes padding
            )
            bp = ConvBN(192, (1, 1), name=f"{n}_bp")(bp)
            x = jnp.concatenate([b0, b1a, b1b, b2a, b2b, bp], axis=-1)

        return jnp.mean(x, axis=(1, 2))  # (B, 2048)

"""NVAE building blocks as Flax modules.

Faithful re-implementations (not translations) of the reference module library
— ``common.py`` / ``preprocess.py`` / ``encoder.py`` / ``decoder.py`` /
``postprocess.py`` — as functional, jit-friendly Flax modules with NHWC layout
and static shapes.  Documented parity quirks preserved on purpose:

- BatchNorm momentum 0.05 / eps 1e-5 everywhere (reference ``encoder.py:91``).
- Residual skip scaling: stem & postprocess cells scale the *residual* branch
  by 0.1 (``preprocess.py:107``, ``postprocess.py:58``); encoder & generative
  cells scale the *identity* branch by 0.1 (``encoder.py:107``,
  ``decoder.py:147``) — inverted, but kept for output-distribution parity.
- Squeeze-excitation hidden width ``max(C/16, 4)`` (``common.py:125``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from nvae_tpu.nn.spectral import DepthwiseConv, SNConv


def swish(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


class BatchNorm(nn.Module):
    """BatchNorm with the reference's hyperparameters (momentum .05, eps 1e-5).

    Under data parallelism the train step runs under ``jit`` + GSPMD with the
    batch sharded over the mesh's ``data`` axis, so the batch-mean/variance
    reductions are *logically global* already — XLA inserts the cross-device
    ``psum`` itself (verified by the sharded-vs-unsharded trajectory test,
    ``tests/test_parallel.py``).  An ``axis_name`` would only be needed under
    ``shard_map``/``pmap``, which this framework does not use.

    ``apply_dtype``: dtype of the *normalization apply* (the elementwise
    ``x*mul+add``).  Statistics (batch mean/variance, running stats, params)
    are always fp32; with ``apply_dtype=bfloat16`` the output — and therefore
    the whole elementwise chain between convolutions — stays bf16, removing
    the fp32 islands that bracket every conv with converts (PROFILE.md
    finding 2).  Parameter/variable tree is identical to the fp32 path.
    """

    apply_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.apply_dtype == jnp.float32:
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.05,
                epsilon=1e-5,
                dtype=jnp.float32,
            )(x)
        return _SplitPrecisionBN(
            momentum=0.05, epsilon=1e-5, apply_dtype=self.apply_dtype,
            name="BatchNorm_0",
        )(x, train)


class _SplitPrecisionBN(nn.Module):
    """fp32-statistics / low-precision-apply BatchNorm.

    Same math, parameter names ('scale'/'bias') and batch_stats names
    ('mean'/'var') as ``flax.linen.BatchNorm`` — checkpoints interchange with
    the fp32 path (the wrapper pins ``name="BatchNorm_0"`` to keep the tree
    identical).  Variance via E[x^2]-E[x]^2 in fp32, like flax."""

    momentum: float = 0.05
    epsilon: float = 1e-5
    apply_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        feats = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (feats,))
        bias = self.param("bias", nn.initializers.zeros_init(), (feats,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feats,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feats,), jnp.float32)
        )
        reduce_axes = tuple(range(x.ndim - 1))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        dt = self.apply_dtype
        return x.astype(dt) * mul.astype(dt) + add.astype(dt)


class SqueezeExcitation(nn.Module):
    """Squeeze-and-excitation gate (Hu et al. 2019; reference ``common.py:110-142``)."""

    ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        hidden = int(max(c // self.ratio, 4))
        s = jnp.mean(x, axis=(1, 2))  # global average pool
        s = nn.Dense(
            hidden, dtype=self.dtype,
            kernel_init=nn.initializers.glorot_uniform(),
        )(s)
        s = jax.nn.relu(s)
        s = nn.Dense(
            c, dtype=self.dtype,
            kernel_init=nn.initializers.glorot_uniform(),
        )(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :].astype(x.dtype)


class Rescaler(nn.Module):
    """BN -> swish -> {UP: nearest x f + 3x3 conv | DOWN: strided 3x3 conv}
    (reference ``common.py:145-174``)."""

    features: int
    factor: int = 2
    up: bool = False
    mode: str = "projection"
    bn_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = BatchNorm(self.bn_dtype)(x, train)
        x = swish(x)
        if self.up:
            b, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, h * self.factor, w * self.factor, c), method="nearest"
            )
            x = SNConv(self.features, (3, 3), mode=self.mode, dtype=self.dtype)(
                x, train
            )
        else:
            x = SNConv(
                self.features,
                (3, 3),
                strides=(self.factor, self.factor),
                mode=self.mode,
                dtype=self.dtype,
            )(x, train)
        return x


class FactorizedDownsample(nn.Module):
    """Space-to-depth-style strided skip: four 1x1 stride-2 convs over
    pixel-shifted views, channel-concatenated (reference ``SkipScaler``,
    ``preprocess.py:42-74``).  Factor-2 only, like the reference."""

    features: int
    mode: str = "projection"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        quarter = self.features // 4
        rest = self.features - 3 * quarter
        out = swish(x)
        conv = lambda f: SNConv(  # noqa: E731
            f, (1, 1), strides=(2, 2), mode=self.mode, dtype=self.dtype
        )
        y1 = conv(quarter)(out, train)
        y2 = conv(quarter)(out[:, 1:, 1:, :], train)
        y3 = conv(quarter)(out[:, :, 1:, :], train)
        y4 = conv(rest)(out[:, 1:, :, :], train)
        return jnp.concatenate([y1, y2, y3, y4], axis=-1)


class StemCell(nn.Module):
    """Pre-process residual cell: n_nodes x (BN -> swish -> 3x3 conv) + SE,
    ``skip(x) + 0.1 * residual`` (reference ``BNSwishConv``,
    ``preprocess.py:77-107``)."""

    features: int
    n_nodes: int = 2
    downsample: bool = False
    se_ratio: int = 16
    mode: str = "projection"
    bn_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.downsample:
            skip = FactorizedDownsample(
                self.features, mode=self.mode, dtype=self.dtype
            )(x, train)
        else:
            skip = x
        y = x
        for i in range(self.n_nodes):
            y = BatchNorm(self.bn_dtype)(y, train)
            y = swish(y)
            stride = (2, 2) if (self.downsample and i == 0) else (1, 1)
            y = SNConv(
                self.features, (3, 3), strides=stride, mode=self.mode,
                dtype=self.dtype,
            )(y, train)
        y = SqueezeExcitation(self.se_ratio, dtype=self.dtype)(y)
        return skip + 0.1 * y


class EncoderResidualCell(nn.Module):
    """BN-swish-conv x2 + SE; ``0.1 * identity + residual`` (reference
    ``EncodingResidualCell``, ``encoder.py:86-107`` — note the inverted skip
    scaling, preserved for parity)."""

    features: int
    se_ratio: int = 16
    mode: str = "projection"
    bn_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = swish(BatchNorm(self.bn_dtype)(x, train))
        y = SNConv(self.features, (3, 3), mode=self.mode, dtype=self.dtype)(y, train)
        y = swish(BatchNorm(self.bn_dtype)(y, train))
        y = SNConv(self.features, (3, 3), mode=self.mode, dtype=self.dtype)(y, train)
        y = SqueezeExcitation(self.se_ratio, dtype=self.dtype)(y)
        return 0.1 * x + y


class GenerativeResidualCell(nn.Module):
    """MBConv-style generative cell: BN -> 1x1 expand (x6) -> BN-swish ->
    depthwise 5x5 -> BN-swish -> 1x1 project -> BN -> SE;
    ``0.1 * identity + residual`` (reference ``GenerativeResidualCell``,
    ``decoder.py:120-147``)."""

    features: int
    expansion_ratio: int = 6
    se_ratio: int = 16
    use_pallas: bool = False
    mode: str = "projection"
    bn_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = BatchNorm(self.bn_dtype)(x, train)
        y = SNConv(
            self.expansion_ratio * self.features, (1, 1), mode=self.mode,
            dtype=self.dtype,
        )(y, train)
        # The BN->swish->dw5x5 middle runs as ONE fused Pallas pass under
        # use_pallas (swish folded into the conv kernel's VMEM tile).
        y = BatchNorm(self.bn_dtype)(y, train)
        y = DepthwiseConv(
            (5, 5), use_pallas=self.use_pallas, fuse_swish=True,
            dtype=self.dtype,
        )(y)
        y = swish(BatchNorm(self.bn_dtype)(y, train))
        y = SNConv(self.features, (1, 1), mode=self.mode, dtype=self.dtype)(y, train)
        y = BatchNorm(self.bn_dtype)(y, train)
        y = SqueezeExcitation(self.se_ratio, dtype=self.dtype)(y)
        return 0.1 * x + y


class EncDecCombiner(nn.Module):
    """Bidirectional merge: ``enc_x + conv1x1(dec_x)`` (reference
    ``EncoderDecoderCombiner``, ``encoder.py:9-16``)."""

    features: int
    mode: str = "projection"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, enc_x: jax.Array, dec_x: jax.Array, train: bool = False
    ) -> jax.Array:
        return enc_x + SNConv(
            self.features, (1, 1), mode=self.mode, dtype=self.dtype
        )(dec_x, train)


class DecoderSampleCombiner(nn.Module):
    """``conv1x1(concat(x, z))`` (reference ``decoder.py:107-117``)."""

    features: int
    mode: str = "projection"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, z: jax.Array, train: bool = False) -> jax.Array:
        y = jnp.concatenate([x, z], axis=-1)
        return SNConv(self.features, (1, 1), mode=self.mode, dtype=self.dtype)(
            y, train
        )


class ConvBNSwish(nn.Module):
    """conv -> BN -> swish (reference ``postprocess.py:91-111``).

    ``emit_preact`` returns the BN output *before* the swish so a following
    fused Pallas kernel can apply it (same parameter tree either way)."""

    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    emit_preact: bool = False
    mode: str = "projection"
    bn_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = SNConv(
            self.features, self.kernel_size, use_bias=False, mode=self.mode,
            dtype=self.dtype,
        )(x, train)
        x = BatchNorm(self.bn_dtype)(x, train)
        return x if self.emit_preact else swish(x)


class PostprocessNode(nn.Module):
    """[optional up-rescale] -> BN -> 1x1 expand -> 5x5 -> 1x1 project -> BN -> SE
    (reference ``postprocess.py:61-88``).

    ``depthwise_5x5``: the reference ships a FULL 5x5 conv on the 6x-expanded
    hidden width — the single largest FLOPs sink in the whole model (~2/3 of
    step compute at the default config) — while its own commented-out
    ``groups=int(hidden_dim)`` (``postprocess.py:76``) shows a depthwise
    (MBConv-style) conv was intended.  False = bit-parity; True = the intended
    depthwise form (~2.5x faster steps).
    """

    features: int
    upscale: bool = False
    factor: int = 2
    expansion_ratio: int = 6
    se_ratio: int = 16
    depthwise_5x5: bool = False
    use_pallas: bool = False
    mode: str = "projection"
    bn_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.upscale:
            x = Rescaler(
                self.features, self.factor, up=True, mode=self.mode,
                bn_dtype=self.bn_dtype, dtype=self.dtype,
            )(x, train)
        x = BatchNorm(self.bn_dtype)(x, train)
        hidden = self.features * self.expansion_ratio
        use_pallas_dw = self.depthwise_5x5 and self.use_pallas
        x = ConvBNSwish(
            hidden, (1, 1), emit_preact=use_pallas_dw, mode=self.mode,
            bn_dtype=self.bn_dtype, dtype=self.dtype,
        )(x, train)
        if self.depthwise_5x5:
            x = DepthwiseConv(
                (5, 5), use_bias=False, use_pallas=use_pallas_dw,
                fuse_swish=use_pallas_dw, dtype=self.dtype,
            )(x)
            x = swish(BatchNorm(self.bn_dtype)(x, train))
        else:
            x = ConvBNSwish(
                hidden, (5, 5), mode=self.mode, bn_dtype=self.bn_dtype,
                dtype=self.dtype,
            )(x, train)
        x = SNConv(
            self.features, (1, 1), use_bias=False, mode=self.mode, dtype=self.dtype
        )(x, train)
        x = BatchNorm(self.bn_dtype)(x, train)
        x = SqueezeExcitation(self.se_ratio, dtype=self.dtype)(x)
        return x


class PostprocessCell(nn.Module):
    """``skip(x) + 0.1 * nodes(x)``; skip up-rescales when the cell upscales
    (reference ``postprocess.py:37-58``)."""

    features: int
    n_nodes: int = 1
    upscale: bool = False
    factor: int = 2
    se_ratio: int = 16
    depthwise_5x5: bool = False
    use_pallas: bool = False
    mode: str = "projection"
    bn_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.upscale:
            skip = Rescaler(
                self.features, self.factor, up=True, mode=self.mode,
                bn_dtype=self.bn_dtype, dtype=self.dtype,
            )(x, train)
        else:
            skip = x
        y = x
        up = self.upscale
        for _ in range(self.n_nodes):
            y = PostprocessNode(
                self.features, upscale=up, factor=self.factor,
                se_ratio=self.se_ratio, depthwise_5x5=self.depthwise_5x5,
                use_pallas=self.use_pallas, mode=self.mode,
                bn_dtype=self.bn_dtype, dtype=self.dtype,
            )(y, train)
            up = False
        return skip + 0.1 * y

"""Spectrally-normalized convolutions, TPU-first.

The TF reference wraps nearly every convolution in
``tfa.layers.SpectralNormalization`` (reference ``common.py:41``,
``encoder.py:92``, ``decoder.py:110`` …), which runs a power iteration inside
*every forward call* — including sampling and evaluation.  On TPU that is pure
overhead in the hot path, so this framework supports three strategies
(selected by ``ModelConfig.spectral_mode``):

- ``projection`` (default): convolutions use their parameters directly; after
  every optimizer step a single power iteration per tagged kernel re-estimates
  sigma and the kernel is rescaled to unit spectral norm
  (:func:`nvae_tpu.train.optim.spectral_projection`).  The forward pass is a
  plain conv — zero overhead for inference/sampling — and the weight invariant
  ``sigma(W) ~= 1`` matches what the per-forward normalization maintains.
- ``forward``: parity mode.  Power iteration in the forward pass with the
  ``u`` vector in a ``spectral`` variable collection, updated when the
  collection is mutable (training), exactly the TFA update-per-call semantics.
- ``penalty``: spectral *regularization* — ``lambda * sum sigma(W)`` added to
  the loss (the reference's un-mounted ``spectral_reg`` branch; BASELINE.md
  "Step+SR").  Power-iteration vectors live in the optimizer state.
- ``none``: raw convolutions.

Kernels that participate are tagged by parameter name ``sn_kernel`` so the
optimizer-side transforms can address them with no module introspection.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

SN_KERNEL = "sn_kernel"


def _l2norm(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v * jax.lax.rsqrt(jnp.sum(jnp.square(v)) + eps)


def power_iteration(w2d: jax.Array, u: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """One power-iteration step on ``w2d`` of shape (in_elems, out).

    Returns ``(sigma, u_new)`` with ``u`` the right-singular estimate of shape
    (out,).  ``u``/``v`` are treated as constants for differentiation (the
    gradient flows through ``W`` only), matching TFA's assign-then-use
    semantics.
    """
    u = jax.lax.stop_gradient(u)
    v = _l2norm(w2d @ u)  # (in_elems,)
    u_new = _l2norm(w2d.T @ v)  # (out,)
    v = jax.lax.stop_gradient(v)
    u_new = jax.lax.stop_gradient(u_new)
    sigma = jnp.einsum("i,io,o->", v, w2d, u_new)
    return sigma, u_new


def spectral_sigma(kernel: jax.Array, u: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sigma estimate for an arbitrary-rank kernel, reshaped (in_elems, out)."""
    w2d = kernel.reshape(-1, kernel.shape[-1])
    return power_iteration(w2d, u)


def is_sn_kernel_path(path: Sequence) -> bool:
    """True if a pytree key path addresses a spectrally-normalized kernel."""
    if not path:
        return False
    last = path[-1]
    name = getattr(last, "key", getattr(last, "name", last))
    return name == SN_KERNEL


class SNConv(nn.Module):
    """2-D convolution whose kernel is subject to spectral normalization.

    Declares its kernel as ``sn_kernel`` so optimizer-side strategies can find
    it.  Weight init is glorot-uniform / zero-bias for parity with TF's
    ``Conv2D`` defaults used throughout the reference.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    mode: str = "projection"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        kshape = (*self.kernel_size, in_ch, self.features)
        kernel = self.param(SN_KERNEL, nn.initializers.glorot_uniform(), kshape)

        if self.mode == "forward":
            u_var = self.variable(
                "spectral",
                "u",
                lambda: _l2norm(
                    jax.random.normal(self.make_rng("params"), (self.features,))
                ),
            )
            sigma, u_new = spectral_sigma(kernel, u_var.value)
            if train and not self.is_initializing():
                u_var.value = u_new
            kernel = kernel / sigma

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class DepthwiseConv(nn.Module):
    """Depthwise 2-D convolution (reference ``decoder.py:130`` uses a plain,
    *not* spectrally normalized, ``DepthwiseConv2D`` 5x5).

    ``use_pallas`` routes through the fused Pallas kernel
    (:func:`nvae_tpu.kernels.depthwise.fused_swish_depthwise5x5`) with an
    identical parameter tree; ``fuse_swish`` additionally folds the preceding
    swish activation into the same VMEM pass (the caller must then feed the
    *pre-activation* tensor)."""

    kernel_size: Tuple[int, int] = (5, 5)
    use_bias: bool = True
    use_pallas: bool = False
    fuse_swish: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kshape = (*self.kernel_size, 1, in_ch)
        kernel = self.param("dw_kernel", nn.initializers.glorot_uniform(), kshape)
        if self.use_pallas:
            from nvae_tpu.kernels.depthwise import fused_swish_depthwise5x5

            bias = (
                self.param("bias", nn.initializers.zeros_init(), (in_ch,))
                if self.use_bias
                else None
            )
            return fused_swish_depthwise5x5(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                bias,
                fuse_swish=self.fuse_swish,
            )
        if self.fuse_swish:
            x = jax.nn.silu(x)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=in_ch,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (in_ch,))
            y = y + bias.astype(self.dtype)
        return y

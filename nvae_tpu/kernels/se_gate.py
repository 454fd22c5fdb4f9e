"""Pallas TPU kernel: fused squeeze-excitation gate.

The SE block (reference ``common.py:110-142``) is four tiny ops — global
average pool, two dense layers, sigmoid gate — sandwiching a (B, H, W, C)
tensor.  As separate XLA ops the activations round-trip HBM between each; the
Pallas kernel keeps one batch row's feature map resident in VMEM, computes
pool -> dense(relu) -> dense(sigmoid) on the MXU/VPU in place, and writes the
gated map once.

The kernel is numerically identical to the module-library path
(:class:`nvae_tpu.nn.blocks.SqueezeExcitation`); tests compare both.  The
grid runs over the batch dimension — each program owns one sample, with
(H*W, C) laid out so C rides the 128-lane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _se_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[...]  # (1, H, W, C) block
    c = x.shape[-1]
    hw = x.shape[1] * x.shape[2]
    flat = x.reshape(hw, c)
    pooled = jnp.sum(flat, axis=0, keepdims=True) / hw  # (1, C)
    h = jnp.dot(pooled, w1_ref[...], preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + b1_ref[...])
    g = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    g = jax.nn.sigmoid(g + b2_ref[...])  # (1, C)
    out_ref[...] = (flat * g).reshape(x.shape).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def se_gate(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Fused SE gate: ``x * sigmoid(relu(mean(x) @ w1 + b1) @ w2 + b2)``.

    x: (B, H, W, C); w1: (C, Hd); w2: (Hd, C).
    """
    b, h, w, c = x.shape
    return pl.pallas_call(
        _se_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h, w, c), lambda i: (i, 0, 0, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def se_gate_reference(x, w1, b1, w2, b2):
    """Plain-XLA reference implementation (what the module library computes)."""
    pooled = jnp.mean(x, axis=(1, 2))
    h = jax.nn.relu(pooled @ w1 + b1)
    g = jax.nn.sigmoid(h @ w2 + b2)
    return x * g[:, None, None, :]

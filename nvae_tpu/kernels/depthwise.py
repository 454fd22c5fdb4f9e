"""Pallas TPU kernel: depthwise 5x5 convolution.

The generative cells run a depthwise 5x5 on the 6x-expanded hidden width
(reference ``decoder.py:130``) at tiny spatial extents (4x4 / 8x8) and large
channel counts (768/1536) — a pure VPU workload: channels ride the 128-lane
axis, the 5x5 taps are 25 shifted multiply-adds.  XLA lowers depthwise convs
through its grouped-convolution path; this kernel instead keeps one sample's
feature map resident in VMEM and does the taps directly.

Grid: one program per batch row.  'SAME' zero padding, NHWC, optional bias.
Numerically identical to :class:`nvae_tpu.nn.spectral.DepthwiseConv`
(validated in tests against ``lax.conv_general_dilated``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_ref, w_ref, out_ref, *, k: int):
    # Blocks: x (B, H, W, Cb); w (k*k, Cb); out (B, H, W, Cb).
    # Channels ride the 128-lane axis; the whole batch is in the block so
    # per-program overhead amortizes over B*H*W rows.
    x = x_ref[...]
    b, h, w, c = x.shape
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = xp[:, dy : dy + h, dx : dx + w, :].astype(jnp.float32)
            acc = acc + tap * w_ref[dy * k + dx, :].astype(jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "c_block"))
def depthwise_conv5x5(
    x: jax.Array, kernel: jax.Array, interpret: bool = False,
    c_block: int = 128,
) -> jax.Array:
    """x: (B, H, W, C); kernel: (5, 5, 1, C) (lax HWIO depthwise layout).

    2-D grid over (batch tiles, channel blocks): channels ride the lane axis;
    the batch tile is sized so in+out+padded-scratch stays under the ~16 MB
    VMEM scoped limit.
    """
    b, h, w, c = x.shape
    k = kernel.shape[0]
    w2d = kernel.reshape(k * k, c)
    cb = min(c_block, c)
    assert c % cb == 0, (c, cb)
    # ~4 copies of the tile live at once (in, padded, acc, out).
    budget_rows = max((14 * 1024 * 1024) // (4 * 4 * (h + 4) * (w + 4) * cb), 1)
    bt = b
    while bt > budget_rows or b % bt:
        bt -= 1
    return pl.pallas_call(
        functools.partial(_dw_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // bt, c // cb),
        in_specs=[
            pl.BlockSpec(
                (bt, h, w, cb), lambda i, j: (i, 0, 0, j),
                memory_space=pltpu.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k * k, cb), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bt, h, w, cb), lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(x, w2d)


def depthwise_conv5x5_reference(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """XLA grouped-conv path (what the module library uses)."""
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )

"""Pallas TPU kernels: depthwise 5x5 convolution (plain and fused-swish).

The generative cells run ``swish(BN(x))`` into a depthwise 5x5 on the
6x-expanded hidden width (reference ``decoder.py:130-140``), and the
depthwise-postprocess variant runs the same pattern at 16x16/32x32 spatial
extents (reference ``postprocess.py:76`` commented-out grouped conv).  These
are pure VPU workloads: channels ride the 128-lane axis, the 5x5 taps are 25
shifted multiply-adds.  An xplane trace of the 40M-param MNIST step shows
XLA's grouped-conv fusions touch ~4x the minimum HBM bytes here (PROFILE.md),
so these kernels keep a (batch-tile, H, W, channel-block) tile resident in
VMEM and do the taps directly — with the preceding swish fused into the same
pass (``fuse_swish``), eliminating one full read+write of the 6x-expanded
tensor.

Three kernels make the op fully Pallas in both directions:

- forward:   ``y = dwconv(swish(x)) [+ bias]``
- dx:        correlate ``dy`` with the spatially-flipped taps, times
             ``swish'(x)`` — same structure as the forward kernel
- dW/db:     per-tap reduction over (batch, H, W), accumulated across
             batch-tile grid steps into a VMEM-resident (k*k, C) block

'SAME' zero padding, NHWC, fp32 accumulation regardless of input dtype.
Numerically equal to the ``lax.conv_general_dilated`` composition (validated
in tests/test_kernels.py, interpret mode on CPU and compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_FALLBACK_LOGGED = False  # one-time notice when the VMEM guard trips


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_c_block(c: int) -> int:
    """Largest divisor of C that keeps lane padding small: prefer multiples
    of 128; otherwise take C itself (Pallas pads the lane axis once)."""
    for cb in (512, 384, 256, 128):
        if c % cb == 0:
            return cb
    return c


def _pick_batch_tile(b: int, tile_bytes_per_row: int, copies: int) -> int:
    """Largest batch tile that divides B and keeps ~copies live tiles under
    a conservative VMEM working budget.

    ``copies`` counts worst-case live tiles: double-buffered input/output
    blocks (2x each), the padded scratch copy, and the fp32 accumulator —
    the scoped-vmem limit is 16 MB and exceeding it is a compile error."""
    budget_rows = max((12 * 1024 * 1024) // (copies * tile_bytes_per_row), 1)
    bt = min(b, budget_rows)
    while b % bt:
        bt -= 1
    return bt


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
                memory_space=pl.ANY if interpret else pltpu.VMEM,
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


# ---------------------------------------------------------------------------
# Fused swish -> depthwise 5x5 with a full Pallas VJP.
# ---------------------------------------------------------------------------


def _swish_f32(x):
    x = x.astype(jnp.float32)
    return x * jax.nn.sigmoid(x)


def _swish_grad_f32(x):
    x = x.astype(jnp.float32)
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _fused_fwd_kernel(x_ref, w_ref, b_ref, out_ref, *, k, fuse_swish, has_bias):
    x = x_ref[...]
    if fuse_swish:
        x = _swish_f32(x)
    else:
        x = x.astype(jnp.float32)
    b, h, w, c = x.shape
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = xp[:, dy : dy + h, dx : dx + w, :]
            acc = acc + tap * w_ref[dy * k + dx, :].astype(jnp.float32)
    if has_bias:
        acc = acc + b_ref[...].astype(jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def _fused_dx_kernel(dy_ref, w_ref, x_ref, dx_ref, *, k, fuse_swish):
    # dL/dx = correlate(dy, flipped taps) * swish'(x)  (or *1 when unfused).
    g = dy_ref[...].astype(jnp.float32)
    b, h, w, c = g.shape
    pad = k // 2
    gp = jnp.pad(g, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = gp[:, dy : dy + h, dx : dx + w, :]
            # Tap (dy, dx) of the forward kernel contributes flipped here.
            acc = acc + tap * w_ref[
                (k - 1 - dy) * k + (k - 1 - dx), :
            ].astype(jnp.float32)
    if fuse_swish:
        acc = acc * _swish_grad_f32(x_ref[...])
    dx_ref[...] = acc.astype(dx_ref.dtype)


def _fused_dx_nox_kernel(dy_ref, w_ref, dx_ref, *, k):
    """dx kernel for the unfused case — no residual ``x`` operand at all."""
    _fused_dx_kernel(dy_ref, w_ref, None, dx_ref, k=k, fuse_swish=False)


def _fused_dw_kernel(x_ref, dy_ref, dw_ref, db_ref, *, k, fuse_swish):
    # Grid (c_blocks, batch_tiles): the (k*k, cb) / (1, cb) output blocks map
    # only to the first grid axis, so they stay VMEM-resident across the
    # inner batch-tile loop and accumulate.
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...]
    if fuse_swish:
        x = _swish_f32(x)
    else:
        x = x.astype(jnp.float32)
    g = dy_ref[...].astype(jnp.float32)
    b, h, w, c = x.shape
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    taps = []
    for dy in range(k):
        for dx in range(k):
            tap = xp[:, dy : dy + h, dx : dx + w, :]
            taps.append(jnp.sum(tap * g, axis=(0, 1, 2)))  # (cb,)
    dw_ref[...] += jnp.stack(taps, axis=0)
    db_ref[...] += jnp.sum(g, axis=(0, 1, 2))[None, :]


@functools.lru_cache(maxsize=None)
def _make_fused_dw(k: int, fuse_swish: bool, has_bias: bool, interpret: bool):
    """Build the custom_vjp'd fused op for a given static configuration.

    Signature of the returned fn: ``f(x, w2d, bias) -> y`` with
    x (B, H, W, C), w2d (k*k, C), bias (C,) (pass zeros when has_bias=False —
    the argument keeps the VJP signature uniform; its gradient is dropped).
    """

    def fwd_call(x, w2d, bias):
        bias = bias[None, :]  # (1, C): scalar rows need a sublane axis on TPU
        b, h, w, c = x.shape
        cb = _pick_c_block(c)
        lane_c = max(cb, 128)
        bt = _pick_batch_tile(b, 4 * (h + k - 1) * (w + k - 1) * lane_c, 8)
        return pl.pallas_call(
            functools.partial(
                _fused_fwd_kernel, k=k, fuse_swish=fuse_swish,
                has_bias=has_bias,
            ),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(b // bt, c // cb),
            in_specs=[
                pl.BlockSpec((bt, h, w, cb), lambda i, j: (i, 0, 0, j)),
                pl.BlockSpec((k * k, cb), lambda i, j: (0, j)),
                pl.BlockSpec((1, cb), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bt, h, w, cb), lambda i, j: (i, 0, 0, j)),
            interpret=interpret,
        )(x, w2d, bias)

    def dx_call(dy, w2d, x):
        b, h, w, c = dy.shape
        cb = _pick_c_block(c)
        lane_c = max(cb, 128)
        copies = 11 if fuse_swish else 8
        bt = _pick_batch_tile(b, 4 * (h + k - 1) * (w + k - 1) * lane_c, copies)
        # When swish is not fused the kernel never reads x — do not stream
        # the residual block into VMEM at all.
        tile_spec = pl.BlockSpec((bt, h, w, cb), lambda i, j: (i, 0, 0, j))
        in_specs = [tile_spec, pl.BlockSpec((k * k, cb), lambda i, j: (0, j))]
        operands = [dy, w2d]
        if fuse_swish:
            in_specs.append(tile_spec)
            operands.append(x)
        kern = (
            functools.partial(_fused_dx_kernel, k=k, fuse_swish=True)
            if fuse_swish
            else functools.partial(_fused_dx_nox_kernel, k=k)
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(b // bt, c // cb),
            in_specs=in_specs,
            out_specs=tile_spec,
            interpret=interpret,
        )(*operands)

    def dw_call(x, dy):
        b, h, w, c = x.shape
        cb = _pick_c_block(c)
        lane_c = max(cb, 128)
        bt = _pick_batch_tile(b, 4 * (h + k - 1) * (w + k - 1) * lane_c, 8)
        dw, db = pl.pallas_call(
            functools.partial(_fused_dw_kernel, k=k, fuse_swish=fuse_swish),
            out_shape=(
                jax.ShapeDtypeStruct((k * k, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ),
            grid=(c // cb, b // bt),
            in_specs=[
                pl.BlockSpec((bt, h, w, cb), lambda i, j: (j, 0, 0, i)),
                pl.BlockSpec((bt, h, w, cb), lambda i, j: (j, 0, 0, i)),
            ],
            out_specs=(
                pl.BlockSpec((k * k, cb), lambda i, j: (0, i)),
                pl.BlockSpec((1, cb), lambda i, j: (0, i)),
            ),
            interpret=interpret,
        )(x, dy)
        return dw, db[0]

    @jax.custom_vjp
    def f(x, w2d, bias):
        return fwd_call(x, w2d, bias)

    def f_fwd(x, w2d, bias):
        return fwd_call(x, w2d, bias), (x, w2d)

    def f_bwd(res, dy):
        x, w2d = res
        dx = dx_call(dy, w2d, x)
        dw, db = dw_call(x, dy)
        dw = dw.astype(w2d.dtype)
        return dx, dw, (db if has_bias else jnp.zeros_like(db))

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_swish_depthwise5x5(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    fuse_swish: bool = True,
    interpret: bool | None = None,
) -> jax.Array:
    """``dwconv5x5(swish(x)) + bias`` as one Pallas pass each way.

    x: (B, H, W, C); kernel: (5, 5, 1, C) (lax HWIO depthwise layout);
    bias: (C,) or None.  ``fuse_swish=False`` gives a plain depthwise conv
    with the same Pallas VJP.  ``interpret=None`` auto-selects interpret mode
    off-TPU so the same model code runs on CPU (tests) and TPU (production).
    """
    k = kernel.shape[0]
    b, h, w, c = x.shape
    w2d = kernel.reshape(k * k, c)
    if interpret is None:
        interpret = _auto_interpret()
    # Feasibility: if even a one-row batch tile cannot satisfy the scoped-
    # VMEM budget (large spatial extents, e.g. 64x64 at wide channels), the
    # kernels cannot compile — fall back to the numerically identical XLA
    # composition instead of erroring.  The VJP's accumulators are the worst
    # case: ~11 tile-sized live copies with the fused swish (the extra
    # pre-activation tile and its recompute), ~8 without.
    lane_c = max(_pick_c_block(c), 128)
    row_bytes = 4 * (h + k - 1) * (w + k - 1) * lane_c
    copies = 11 if fuse_swish else 8
    if row_bytes * copies > 12 * 1024 * 1024:
        global _FALLBACK_LOGGED
        if not _FALLBACK_LOGGED:
            _FALLBACK_LOGGED = True
            print(
                f"[nvae_tpu.kernels] depthwise5x5 Pallas kernel infeasible "
                f"for shape {x.shape} (tile {row_bytes * copies / 2**20:.1f}"
                f" MB > 12 MB VMEM budget) — using the XLA composition. "
                f"Benchmarks under use_pallas measure XLA for this shape.",
                flush=True,
            )
        s = jax.nn.silu(x) if fuse_swish else x
        y = depthwise_conv5x5_reference(s, kernel)
        return y + bias if bias is not None else y
    has_bias = bias is not None
    f = _make_fused_dw(k, bool(fuse_swish), has_bias, bool(interpret))
    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    return f(x, w2d, bias.astype(jnp.float32))

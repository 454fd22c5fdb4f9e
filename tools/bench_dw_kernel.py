#!/usr/bin/env python
"""Microbenchmark: depthwise-5x5 kernel variants vs XLA on the real chip.

Times the forward fused swish->dw op at the model's hot shapes.  Used to tune
nvae_tpu/kernels/depthwise.py (PROFILE.md records the findings).
"""

from __future__ import annotations

import functools
import os as _os
import sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=20):
    y = fn(*args)
    jax.block_until_ready(y)
    float(jnp.asarray(y).ravel()[0])  # force through the tunnel
    t0 = time.time()
    for _ in range(reps):
        y = fn(*args)
    float(jnp.asarray(y).ravel()[0])
    return (time.time() - t0) / reps * 1e3


def xla_fused(x, w, fuse_swish=True):
    s = jax.nn.silu(x) if fuse_swish else x
    return jax.lax.conv_general_dilated(
        s, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


# --- variant A: current kernel (in-kernel pad, fresh acc) -------------------
def _kern_a(x_ref, w_ref, o_ref, *, k, fuse):
    x = x_ref[...]
    if fuse:
        x = x.astype(jnp.float32)
        x = x * jax.nn.sigmoid(x)
    else:
        x = x.astype(jnp.float32)
    b, h, w, c = x.shape
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            acc = acc + xp[:, dy:dy + h, dx:dx + w, :] * w_ref[dy * k + dx, :]
    o_ref[...] = acc.astype(o_ref.dtype)


# --- variant B: hoist the 5 w-shifts, accumulate over free h-slices ---------
def _kern_b(x_ref, w_ref, o_ref, *, k, fuse):
    x = x_ref[...]
    if fuse:
        x = x.astype(jnp.float32)
        x = x * jax.nn.sigmoid(x)
    else:
        x = x.astype(jnp.float32)
    b, h, w, c = x.shape
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    cols = [xp[:, :, dx:dx + w, :] for dx in range(k)]  # k sublane shifts
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            acc = acc + cols[dx][:, dy:dy + h] * w_ref[dy * k + dx, :]
    o_ref[...] = acc.astype(o_ref.dtype)


def make_pallas(kern, bt, cb, shape, k=5, fuse=True):
    b, h, w, c = shape

    @jax.jit
    def f(x, w2d):
        return pl.pallas_call(
            functools.partial(kern, k=k, fuse=fuse),
            out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
            grid=(b // bt, c // cb),
            in_specs=[
                pl.BlockSpec((bt, h, w, cb), lambda i, j: (i, 0, 0, j)),
                pl.BlockSpec((k * k, cb), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bt, h, w, cb), lambda i, j: (i, 0, 0, j)),
        )(x, w2d)

    return f


def main():
    shapes = [(144, 32, 32, 192), (144, 16, 16, 192), (144, 4, 4, 1536)]
    for shape in shapes:
        b, h, w, c = shape
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, shape, jnp.float32)
        wk = jax.random.normal(key, (5, 5, 1, c), jnp.float32) * 0.1
        w2d = wk.reshape(25, c)

        t_xla = timeit(jax.jit(lambda x, w: xla_fused(x, w)), x, wk)
        log(f"{shape}  XLA fused swish+dw: {t_xla:.3f} ms")

        for name, kern in [("A(pad+acc)", _kern_a), ("B(hoist-w)", _kern_b)]:
            for bt in (1, 4, 16):
                if b % bt:
                    continue
                cb = 128 if c % 128 == 0 else c  # 128-lane blocks when divisible
                # VMEM estimate: skip configs that can't compile
                tile = 4 * bt * (h + 4) * (w + 4) * (256 if c == 192 else c)
                if tile * 8 > 100 * 1024 * 1024:
                    continue
                try:
                    f = make_pallas(kern, bt, cb, shape)
                    t = timeit(f, x, w2d)
                    log(f"  {name} bt={bt:3d} cb={cb}: {t:.3f} ms")
                except Exception as e:
                    log(f"  {name} bt={bt:3d}: FAIL {str(e)[:90]}")
                    break  # larger bt will also fail


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Whole-graph scheduling sweep: per-jit XLA compiler options on the TPU.

PROFILE.md finding 6: the best-config step (depthwise + bf16 + bf16-BN,
23.6 ms at b144) has no dominant op left — remaining headroom is
whole-graph scheduling, not hot-spot kills.  The axon tunnel client rejects
TPU backend flags in ``XLA_FLAGS`` (its local XLA parser doesn't know
them), but per-jit ``lowered.compile(compiler_options=...)`` ships the
overrides to the server-side compiler, which validates them (a bogus flag
is rejected with HTTP 500).

This tool lowers the scan-epoch program once, compiles it under each
candidate option set, and times sustained epochs.  Option sets that fail
to compile are reported and skipped (flag availability varies by libtpu
version).

Usage:
    python tools/sweep_compiler_options.py [--batch_size 288] [--parity]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

CANDIDATES = [
    ("baseline", {}),
    # Scoped VMEM limit: bounds the double-buffered working set XLA may
    # promote into VMEM per fusion; raising it allows larger fusions /
    # deeper prefetch (v5e has 128 MB VMEM; default limit is ~16 MB).
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    # Double-buffers while-loop (lax.scan) bodies: overlaps iteration i's
    # epilogue with i+1's prologue at the cost of 2x loop-carried buffers.
    ("scan_double_buffer",
     {"xla_tpu_enable_while_loop_double_buffering": "true"}),
    # Latency-hiding scheduler: reorders to overlap DMA with compute.
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("lhs+vmem_64m",
     {"xla_tpu_enable_latency_hiding_scheduler": "true",
      "xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("double_buffer+vmem_64m",
     {"xla_tpu_enable_while_loop_double_buffering": "true",
      "xla_tpu_scoped_vmem_limit_kib": "65536"}),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=288)
    ap.add_argument("--parity", action="store_true",
                    help="Sweep the parity fp32 config instead of the best")
    ap.add_argument("--epochs", type=int, default=3,
                    help="Timed epochs per option set (first is warmup)")
    ap.add_argument("--n_train", type=int, default=14976)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nvae_tpu.config import ModelConfig, TrainConfig
    from nvae_tpu.data import synthetic_dataset
    from nvae_tpu.train.epoch_runner import make_epoch_runner, stage_dataset
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    log(f"devices: {jax.devices()}")

    bs = args.batch_size
    model_cfg = ModelConfig() if args.parity else ModelConfig(
        compute_dtype="bfloat16",
        bn_apply_dtype="bfloat16",
        postprocess_5x5_depthwise=True,
    )
    train_cfg = TrainConfig(batch_size=bs, step_based_warmup=True)
    total_steps = 400 * (60000 // bs)

    model, state, tx = create_train_state(model_cfg, train_cfg, total_steps)
    n_train = args.n_train // bs * bs
    steps_per_epoch = n_train // bs
    bundle = synthetic_dataset(n_train=n_train, n_test=bs)
    data = stage_dataset(bundle.train_x)
    runner = make_epoch_runner(
        model, tx, train_cfg, total_steps, steps_per_epoch, donate=True
    )
    # Host-side master copy: each trial donates a fresh device put of it
    # (the compiled executables donate their state argument).
    host_state = jax.device_get(state)
    lowered = runner.lower(state, data, jnp.asarray(0))
    log(f"lowered: {steps_per_epoch} steps/epoch b{bs}, "
        f"{'parity fp32' if args.parity else 'best dw+bf16+bnbf16'}")

    results = []
    for name, opts in CANDIDATES:
        t0 = time.time()
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:
            log(f"[{name}] COMPILE FAILED ({time.time() - t0:.0f}s): "
                f"{str(e)[:160]}")
            results.append((name, None))
            continue
        log(f"[{name}] compiled in {time.time() - t0:.0f}s")
        st = jax.device_put(host_state)
        best_dt = float("inf")
        try:
            for e in range(args.epochs):
                t0 = time.time()
                st, metrics = compiled(st, data, jnp.asarray(e))
                loss = float(metrics["loss"])  # true sync through tunnel
                dt = time.time() - t0
                tag = " (warmup)" if e == 0 else ""
                log(f"[{name}] epoch {e}: {dt:.3f}s "
                    f"{n_train / dt:.0f} img/s loss={loss:.1f}{tag}")
                if e > 0:
                    best_dt = min(best_dt, dt)
        except Exception as e:
            log(f"[{name}] RUN FAILED: {str(e)[:160]}")
            results.append((name, None))
            continue
        results.append((name, n_train / best_dt))
        del st

    log("\n=== sweep results (best epoch img/s) ===")
    base = dict(results).get("baseline")
    for name, v in results:
        if v is None:
            log(f"{name:26s} FAILED")
        else:
            rel = f"  {v / base - 1:+.1%}" if base else ""
            log(f"{name:26s} {v:8.0f} img/s{rel}")


if __name__ == "__main__":
    main()

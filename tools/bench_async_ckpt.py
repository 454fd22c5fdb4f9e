#!/usr/bin/env python
"""Measure how much checkpoint time async writes hide during training.

The reference checkpoints synchronously from a Keras callback
(reference train.py:13-14,28 — `ModelCheckpoint` blocks the train loop
while the TF-format files are written).  The TPU-native trainer instead
uses `AsyncCheckpointWriter` (nvae_tpu/train/checkpoint.py): `save`
snapshots the state to host memory synchronously (donation-safe) and
serializes in a background thread, so the device keeps training while
the previous checkpoint is still being written.

This tool quantifies the difference on the real device with the
scan-epoch runner (one XLA program per epoch, the production fast path):

  baseline  E epochs, no checkpointing
  sync      E epochs, blocking save_checkpoint() after every epoch
  async     E epochs, AsyncCheckpointWriter.save() after every epoch,
            one wait() at the end (exactly the Trainer's discipline)

Prints one JSON line with per-epoch wall times and the exposed
checkpoint overhead per epoch for each mode.

Usage:  python tools/bench_async_ckpt.py [--epochs 4] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=144)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--n_train", type=int, default=14976)
    p.add_argument("--quick", action="store_true",
                   help="Tiny debug model, few steps (CPU-safe smoke); uses "
                        "the per-step train loop because jax 0.8's XLA:CPU "
                        "executes scan-epoch programs ~20x slower per step "
                        "than the identical per-step program (CLAUDE.md), "
                        "while the TPU path measured by the default mode "
                        "has the opposite profile")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from nvae_tpu.config import ModelConfig, TrainConfig, debug_config
    from nvae_tpu.data import synthetic_dataset
    from nvae_tpu.train import checkpoint as ckpt
    from nvae_tpu.train.epoch_runner import make_epoch_runner, stage_dataset
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    if args.quick:
        model_cfg = debug_config()
        args.batch_size, args.n_train = 16, 160
    else:
        model_cfg = ModelConfig()
    bs = args.batch_size
    n_train = args.n_train // bs * bs
    steps_per_epoch = n_train // bs
    train_cfg = TrainConfig(batch_size=bs, step_based_warmup=True)
    total_steps = 400 * (60000 // bs)

    t0 = time.time()
    model, state0, tx = create_train_state(model_cfg, train_cfg, total_steps)
    n_params = sum(p.size for p in jax.tree.leaves(state0.params))
    state_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(state0)
        if hasattr(x, "dtype")
    )
    log(f"init: {time.time() - t0:.1f}s, {n_params / 1e6:.2f}M params, "
        f"full train state {state_bytes / 1e6:.0f} MB")
    bundle = synthetic_dataset(n_train=n_train, n_test=bs)
    if args.quick:
        # Per-step loop: XLA:CPU runs scan-epoch programs ~20x slower per
        # step than the same step as its own program (CLAUDE.md).
        step_fn = make_train_step(
            model, tx, train_cfg, total_steps, steps_per_epoch, donate=True
        )
        x = bundle.train_x.astype("float32") / 255.0
        if x.shape[1] < model_cfg.image_size:  # center-pad like prepare()
            pad = model_cfg.image_size - x.shape[1]
            lo, hi = pad // 2, pad - pad // 2
            import numpy as np

            x = np.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
        batches = jnp.asarray(
            x.reshape(steps_per_epoch, bs, *x.shape[1:])
        )

        def run_one_epoch(state, e):
            metrics = None
            for i in range(steps_per_epoch):
                state, metrics = step_fn(state, batches[i])
            return state, metrics
    else:
        runner = make_epoch_runner(
            model, tx, train_cfg, total_steps, steps_per_epoch, donate=True
        )
        data = stage_dataset(bundle.train_x)

        def run_one_epoch(state, e):
            return runner(state, data, jnp.asarray(e))

    def run(mode: str):
        """E epochs under one checkpointing discipline; returns
        (per-epoch times, total wall incl. final durability wait)."""
        state = jax.tree.map(jnp.copy, state0)
        ckpt_dir = tempfile.mkdtemp(prefix=f"nvae_ckpt_{mode}_")
        writer = (
            ckpt.AsyncCheckpointWriter(ckpt_dir) if mode == "async" else None
        )
        times = []
        t_total = time.time()
        try:
            for e in range(args.epochs):
                t0 = time.time()
                state, metrics = run_one_epoch(state, e)
                if mode == "sync":
                    float(metrics["loss"])  # device sync before the save
                    ckpt.save_checkpoint(ckpt_dir, e + 1, state)
                elif mode == "async":
                    # Trainer discipline: snapshot+enqueue, keep stepping.
                    writer.save(e + 1, state)
                float(metrics["loss"])  # true device sync (tunnel-safe)
                times.append(time.time() - t0)
                log(f"  {mode} epoch {e}: {times[-1]:.2f}s")
            t_wait = time.time()
            if writer is not None:
                writer.close()
            wait_s = time.time() - t_wait
            if wait_s > 0.01:
                log(f"  {mode} final durability wait: {wait_s:.2f}s")
            return times, time.time() - t_total
        finally:
            shutil.rmtree(ckpt_dir, ignore_errors=True)

    # Warm the compile cache so mode 1 isn't charged for compilation.
    log("warmup epoch (compile)...")
    ws = jax.tree.map(jnp.copy, state0)
    ws, m = run_one_epoch(ws, 0)
    float(m["loss"])
    del ws

    results = {}
    for mode in ("baseline", "sync", "async"):
        times, total = run(mode)
        steady = times[1:] or times
        results[mode] = {
            "epoch_s": round(sum(steady) / len(steady), 3),
            "total_s": round(total, 2),
        }
        log(f"{mode}: {results[mode]['epoch_s']:.2f}s/epoch steady, "
            f"{total:.1f}s total")

    base = results["baseline"]["epoch_s"]
    report = {
        "metric": "async_ckpt_overlap",
        "state_mb": round(state_bytes / 1e6, 1),
        "epochs": args.epochs,
        "steps_per_epoch": steps_per_epoch,
        "batch_size": bs,
        "baseline_epoch_s": results["baseline"]["epoch_s"],
        "sync_epoch_s": results["sync"]["epoch_s"],
        "async_epoch_s": results["async"]["epoch_s"],
        "sync_overhead_s_per_epoch": round(
            results["sync"]["epoch_s"] - base, 3
        ),
        "async_overhead_s_per_epoch": round(
            results["async"]["epoch_s"] - base, 3
        ),
        "sync_total_s": results["sync"]["total_s"],
        "async_total_s": results["async"]["total_s"],
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Throughput + size of exported serving artifacts: bf16 vs int8 weights.

The int8 export (weight-only per-output-channel quantization,
nvae_tpu/serving.py) shrinks the artifact ~4x vs fp32 / ~2x vs bf16; the
dequantize multiply is traced inside the exported function so XLA fuses it
into the consumers.  This tool measures what that costs at serving time on
the real device: export the sampler at the serving saturation batch under
both weight dtypes, then time `exported.call` end to end (value-fetch sync
— `block_until_ready` is not a reliable barrier through remote tunnels).

Weight VALUES don't affect throughput, so the model is freshly initialized
(no checkpoint needed); pass --ckpt to bake trained weights instead.

Prints one JSON line:
  {"metric": "serving_artifact_int8_vs_bf16", "batch": N,
   "bf16": {"mb": ..., "img_per_s": ...}, "int8": {...}, ...}

Usage:  python tools/bench_serving_artifact.py [--batch 1152] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1152,
                   help="Serving batch (1152 = measured saturation on v5e)")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--ckpt", default="",
                   help="Optional orbax checkpoint to bake in")
    p.add_argument("--quick", action="store_true",
                   help="Tiny debug model + small batch (CPU-safe smoke)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jax import export as jexport

    from nvae_tpu.config import ModelConfig, TrainConfig, debug_config
    from nvae_tpu.serving import (
        build_sampler,
        cast_params,
        export_sampler,
        quantize_params_int8,
    )
    from nvae_tpu.train.state import create_train_state

    if args.quick:
        model_cfg = debug_config()
        args.batch, args.iters, args.warmup = 16, 3, 1
    else:
        # The serving-ladder best config (README): depthwise postprocess +
        # bf16 compute + bf16 BN apply.
        model_cfg = ModelConfig(
            compute_dtype="bfloat16",
            bn_apply_dtype="bfloat16",
            postprocess_5x5_depthwise=True,
        )

    t0 = time.time()
    model, state, _ = create_train_state(
        model_cfg, TrainConfig(batch_size=16), total_steps=100
    )
    variables = state.variables()
    if args.ckpt:
        from nvae_tpu.train.checkpoint import restore_checkpoint

        state = restore_checkpoint(args.ckpt, state)
        variables = state.variables()
    log(f"init: {time.time() - t0:.1f}s")

    backend = jax.default_backend()
    platform = "tpu" if backend in ("tpu", "axon") else backend
    key_data = jax.random.key_data(jax.random.PRNGKey(0))
    temp = jnp.float32(0.8)

    def bench(tag: str, params):
        vs = dict(variables)
        vs["params"] = params
        t0 = time.time()
        blob = export_sampler(model, vs, args.batch, platforms=[platform])
        log(f"{tag}: exported {len(blob) / 1e6:.1f} MB "
            f"in {time.time() - t0:.1f}s")
        exported = jexport.deserialize(bytearray(blob))
        try:
            call, via = jax.jit(exported.call), "exported_call"
            imgs = call(key_data, temp)
            float(imgs.mean())
        except Exception as e:  # experimental-platform name mismatch
            log(f"{tag}: exported.call unavailable on this backend "
                f"({type(e).__name__}); timing the identical sampler "
                f"under jit instead")
            call, via = (
                jax.jit(build_sampler(model, vs, args.batch)),
                "jit_fallback",
            )
        imgs = None
        for i in range(args.warmup):
            imgs = call(key_data, temp)
            float(imgs.mean())  # sync
        t0 = time.time()
        for i in range(args.iters):
            imgs = call(key_data, temp)
        float(imgs.mean())  # one sync at the end: pipelined dispatch
        dt = time.time() - t0
        ips = args.batch * args.iters / dt
        log(f"{tag}: {ips:.1f} img/s at b{args.batch} "
            f"({dt / args.iters * 1e3:.1f} ms/call)")
        return {
            "mb": round(len(blob) / 1e6, 1),
            "img_per_s": round(ips, 1),
            "ms_per_call": round(dt / args.iters * 1e3, 2),
            "ran_via": via,
        }, np.asarray(imgs)

    # At debug scale every kernel is tiny; drop the quantization threshold
    # so the quick smoke still exercises the int8 path.
    min_elems = 256 if args.quick else 4096
    r_bf16, img_bf16 = bench("bf16", cast_params(variables["params"],
                                                 jnp.bfloat16))
    r_int8, img_int8 = bench("int8", quantize_params_int8(
        cast_params(variables["params"], jnp.bfloat16),
        min_elems=min_elems))

    # Quality delta between the two artifacts on identical RNG: mean |Δp|
    # over the Bernoulli means (in [0,1]).
    mad = float(np.mean(np.abs(
        img_bf16.astype(np.float32) - img_int8.astype(np.float32)
    )))
    report = {
        "metric": "serving_artifact_int8_vs_bf16",
        "batch": args.batch,
        "platform": platform,
        "bf16": r_bf16,
        "int8": r_int8,
        "size_ratio": round(r_bf16["mb"] / max(r_int8["mb"], 1e-9), 2),
        "throughput_ratio": round(
            r_int8["img_per_s"] / max(r_bf16["img_per_s"], 1e-9), 3
        ),
        "mean_abs_pixel_delta": round(mad, 5),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()

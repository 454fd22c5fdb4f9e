#!/usr/bin/env python
"""Benchmark: jitted train-step throughput on the flagship MNIST NVAE.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec", "vs_baseline": N}

Baseline: the TF reference sustains ~136 images/sec on its single GPU
(60k images x 400 epochs / 49 h — BASELINE.md "derived train throughput";
the reference train step runs eagerly, reference train.py:132).

Runs on whatever jax.devices() provides (the real TPU under axon; CPU under
JAX_PLATFORMS=cpu).  All progress chatter goes to stderr; stdout carries only
the JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_IMAGES_PER_SEC = 136.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=144)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--quick", action="store_true",
                    help="Fewer steps for a fast smoke run")
    ap.add_argument("--mode", type=str, default="ladder",
                    choices=["ladder", "step", "epoch", "scan_epoch",
                             "sample", "pr"],
                    help="ladder (default): scan-epoch throughput of the "
                         "parity fp32 config AND the best trained-validated "
                         "config (depthwise + bf16 + bf16-BN, the 43x "
                         "config trained 60 epochs in round 2) — the final "
                         "JSON line carries the best number with the parity "
                         "one alongside; scan_epoch: device-resident "
                         "dataset, one XLA program per epoch for the flag-"
                         "selected config; epoch: per-batch host loop incl. "
                         "input pipeline; step: per-step sync timing (pays "
                         "tunnel RTT per step)")
    ap.add_argument("--preset", type=str, default="",
                    help="Benchmark a named preset (omniglot_deep, "
                         "cifar10_dml, celeba64, ... — nvae_tpu/presets.py) "
                         "instead of the default MNIST config: step / epoch "
                         "/ scan_epoch / sample modes use its architecture "
                         "and data shape (VERDICT r4 #3); dtype/depthwise "
                         "flags apply on top")
    ap.add_argument("--compute_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--bn_apply_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="BN apply in bf16 (stats fp32): removes the fp32 "
                         "islands between bf16 convs (PROFILE.md finding 2)")
    ap.add_argument("--postprocess_depthwise", action="store_true",
                    help="Use the depthwise postprocess 5x5 (the form the "
                         "reference intended; ~2.5x fewer step FLOPs)")
    ap.add_argument("--remat", type=str, default="default",
                    choices=["default", "on", "off"],
                    help="Override the config's activation-rematerialization "
                         "policy (celeba64 presets default on — the "
                         "remat-vs-not ladder point, VERDICT r4 #3)")
    ap.add_argument("--use_pallas", action="store_true",
                    help="Route the depthwise-5x5 hot spots through the fused "
                         "swish->dw Pallas kernels")
    ap.add_argument("--donate", dest="donate", action="store_true",
                    default=True,
                    help="Donate the train state into the step/epoch program "
                         "(in-place update, no state copy; default)")
    ap.add_argument("--no_donate", dest="donate", action="store_false",
                    help="Copy the state every step/epoch instead of "
                         "donating (the round-1 tunnel-stall workaround)")
    ap.add_argument("--pr_n", type=int, default=None,
                    help="P&R mode: rows per feature set (default 10000; "
                         "the streamed passes bound memory at any N)")
    ap.add_argument("--pr_dim", type=int, default=512,
                    help="P&R mode: feature dimensionality (512 = VGG16 "
                         "pooled, 2048 = Inception pool_3)")
    ap.add_argument("--time_budget", type=int, default=1200,
                    help="Hard wall-clock budget (s); on expiry the JSON line "
                         "is emitted with value 0 so callers never hang")
    args = ap.parse_args()
    if args.quick:
        args.steps, args.warmup = 8, 2

    # Global guard: remote-tunnel runtimes can stall a dispatch forever. On
    # budget expiry, emit a zero-valued JSON line instead of hanging.
    import signal

    bs = args.batch_size
    ladder_peak_bs = 2 * bs  # measured saturation for the best config (b288)
    tag = args.preset or "mnist_nvae"
    if args.preset and args.mode in ("ladder", "pr"):
        raise SystemExit("--preset applies to step/epoch/scan_epoch/sample")
    metric_name = {
        "ladder": f"train_scan_epoch_throughput_mnist_nvae_best_b{ladder_peak_bs}",
        "step": f"train_throughput_{tag}_b{bs}",
        "epoch": f"train_epoch_throughput_{tag}_b{bs}",
        "scan_epoch": f"train_scan_epoch_throughput_{tag}_b{bs}",
        "sample": f"sample_throughput_{tag}_b{bs}",
        "pr": "knn_precision_recall_seconds",
    }[args.mode]
    if args.mode == "pr" and args.pr_n and args.time_budget == 1200:
        # Scale the budget with the O(N^2) work (two full passes: compile
        # + timed), relative to the measured 10k baseline.
        args.time_budget = max(
            1200, min(7200, int((args.pr_n / 10000) ** 2 * 30))
        )
    if args.mode == "ladder" and args.time_budget == 1200:
        args.time_budget = 2700  # three configs = three full compiles
        # (warm persistent-cache reruns deserialize in ~20 s per config)

    def _global_alarm(signum, frame):
        log(f"FATAL: global time budget ({args.time_budget}s) expired")
        print(
            json.dumps(
                {
                    "metric": metric_name,
                    "value": 0.0,
                    "unit": "images/sec" if args.mode != "pr" else "seconds",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        import os

        os._exit(3)

    signal.signal(signal.SIGALRM, _global_alarm)
    signal.alarm(args.time_budget)

    import jax
    import jax.numpy as jnp

    from nvae_tpu.config import ModelConfig, TrainConfig
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step
    from nvae_tpu.utils.compile_cache import enable_compile_cache

    cache = enable_compile_cache()
    if cache:
        log(f"compile cache: {cache}")
    log(f"devices: {jax.devices()}")

    if args.mode == "pr":
        # k-NN precision/recall at reference scale: 10k vs 10k 512-d feature
        # sets (VGG16-pooled dimensionality). The reference's full P&R pass
        # took >10 hours (PDF 4.1.2, BASELINE.md).
        import numpy as np

        from nvae_tpu.eval.precision_recall import (
            knn_precision_recall_features,
        )

        n = args.pr_n or (2000 if args.quick else 10000)
        d_feat = args.pr_dim
        rng_np = np.random.RandomState(0)
        # Generate in 100k-row chunks: randn materializes float64 first,
        # which at 1M x 2048 would be a 16 GB temporary.
        def _chunked_randn(n_rows, scale=1.0, shift=0.0):
            outs = []
            for i in range(0, n_rows, 100_000):
                m = min(100_000, n_rows - i)
                outs.append(
                    (rng_np.randn(m, d_feat) * scale + shift).astype(
                        np.float32
                    )
                )
            return np.concatenate(outs) if len(outs) > 1 else outs[0]

        real = _chunked_randn(n)
        gen = _chunked_randn(n, 0.9, 0.1)
        # Stage the feature matrices on device ONCE, outside the timed
        # region — the metric is the P&R pass, not the host->device copy
        # (which the recorded baselines account separately; jax 0.9 no
        # longer caches repeat transfers of the same host array, so an
        # in-call conversion would re-pay ~25 s/400 MB tunnel staging on
        # every timed call).
        t0 = time.time()
        real = jnp.asarray(real, jnp.float32)
        gen = jnp.asarray(gen, jnp.float32)
        float(real[0, 0]) + float(gen[0, 0])  # transfer barrier
        log(f"staging {2 * n * d_feat * 4 / 1e9:.2f} GB: "
            f"{time.time() - t0:.1f}s")
        t0 = time.time()
        pr = knn_precision_recall_features(real, gen)  # includes compiles
        log(f"P&R compile+run: {time.time() - t0:.1f}s -> {pr}")
        t0 = time.time()
        pr = knn_precision_recall_features(real, gen)
        dt = time.time() - t0
        log(f"P&R {n}x{n}: {dt:.2f}s  precision={pr['precision']:.3f} "
            f"recall={pr['recall']:.3f}")
        # Baseline: >10 h = 36,000 s for the full pass (PDF 4.1.2).
        print(
            json.dumps(
                {
                    "metric": f"knn_precision_recall_{n}x{n}_seconds",
                    "value": round(dt, 2),
                    "unit": "seconds",
                    "vs_baseline": round(36000.0 / max(dt, 1e-9), 1),
                }
            )
        )
        return

    import dataclasses

    preset_model_cfg = None
    if args.preset:
        from nvae_tpu.presets import get_preset

        preset_model_cfg, preset_train_cfg = get_preset(args.preset)
        train_cfg = dataclasses.replace(
            preset_train_cfg, batch_size=args.batch_size,
            step_based_warmup=True,
        )
    else:
        train_cfg = TrainConfig(
            batch_size=args.batch_size, step_based_warmup=True
        )
    total_steps = 400 * (60000 // args.batch_size)  # reference-scale schedule

    def build(model_cfg, tcfg=None, tsteps=None):
        t0 = time.time()
        model, state, tx = create_train_state(
            model_cfg, tcfg or train_cfg, tsteps or total_steps
        )
        n_params = sum(p.size for p in jax.tree.leaves(state.params))
        log(f"init: {time.time() - t0:.1f}s, {n_params / 1e6:.2f}M params")
        return model, state, tx

    def step_flops_per_image(model, tx, tcfg, state, bs):
        """Analytic MXU flops (2 x MAC of every conv/matmul, fwd+bwd+update)
        per image — traced shape-only from the config (utils/flops.py), the
        roofline numerator for MFU (VERDICT r3 #2)."""
        from nvae_tpu.utils.flops import train_step_flops

        t0 = time.time()
        fl = train_step_flops(model, tx, tcfg, state, bs) / bs
        log(f"analytic step flops: {fl * bs / 1e9:.2f} GFLOP/step "
            f"({fl / 1e9:.3f} GFLOP/image, traced in "
            f"{time.time() - t0:.1f}s)")
        return fl

    def mfu_of(images_per_sec, flops_per_image):
        """Achieved MXU fraction of one v5e chip's 197 TFLOP/s bf16 peak
        (conservative for fp32 configs, whose true ceiling is ~half)."""
        from nvae_tpu.utils.flops import PEAK_FLOPS_BF16

        return images_per_sec * flops_per_image / PEAK_FLOPS_BF16

    def step_bytes_per_image(model, tx, tcfg, state, bs):
        """Analytic HBM bytes per image of one training step (conv/dot
        operand+result traffic under the fused-elementwise model, plus the
        optimizer state sweep — utils/flops.py:train_step_bytes), the
        roofline denominator side for bandwidth utilization (VERDICT r4
        #2)."""
        from nvae_tpu.utils.flops import train_step_bytes

        t0 = time.time()
        by = train_step_bytes(model, tx, tcfg, state, bs) / bs
        log(f"analytic step HBM bytes: {by * bs / 1e9:.2f} GB/step "
            f"({by / 1e6:.2f} MB/image, traced in {time.time() - t0:.1f}s)")
        return by

    def hbm_util_of(images_per_sec, bytes_per_image):
        """Achieved fraction of one v5e chip's 819 GB/s HBM bandwidth."""
        from nvae_tpu.utils.flops import PEAK_HBM_BYTES_PER_S

        return images_per_sec * bytes_per_image / PEAK_HBM_BYTES_PER_S

    def run_scan_epoch(model_cfg, tag="", bs=None):
        """Sustained scan-epoch throughput for one model config (the
        device-resident lax.scan training path)."""
        from nvae_tpu.data import synthetic_dataset
        from nvae_tpu.train.epoch_runner import (
            make_epoch_runner,
            stage_dataset,
        )

        bs = bs or args.batch_size
        tcfg = dataclasses.replace(
            train_cfg, batch_size=bs, step_based_warmup=True
        )
        tsteps = 400 * (60000 // bs)
        model, state, tx = build(model_cfg, tcfg, tsteps)
        flops_img = step_flops_per_image(model, tx, tcfg, state, bs)
        bytes_img = step_bytes_per_image(model, tx, tcfg, state, bs)
        n_train = (2080 if args.quick else 15000) // bs * bs
        bundle = synthetic_dataset(
            n_train=n_train, n_test=bs,
            image_size=model_cfg.image_size,
            channels=model_cfg.in_channels,
        )
        steps_per_epoch = n_train // bs
        runner = make_epoch_runner(
            model, tx, tcfg, tsteps, steps_per_epoch,
            donate=args.donate,
        )
        data = stage_dataset(bundle.train_x)
        log(f"scan_epoch{tag}: {steps_per_epoch} steps/epoch b{bs}, "
            f"device-resident")
        for e in range(3):
            t0 = time.time()
            state, metrics = runner(state, data, jnp.asarray(e))
            float(metrics["loss"])  # true device sync
            dt = time.time() - t0
            n_images = steps_per_epoch * bs
            log(f"epoch {e}{tag}: {dt:.2f}s, {n_images / dt:.1f} img/s "
                f"(MFU {mfu_of(n_images / dt, flops_img):.3f}, "
                f"HBM {hbm_util_of(n_images / dt, bytes_img):.3f})")
        # Diagnostic only: the backend's 'bytes accessed' for the epoch
        # program.  XLA's HLO cost analysis counts a while/scan BODY ONCE
        # (verified: 4x the trip count moves its flop count by 1%), so
        # this figure approximates ONE step + prologue, not the epoch —
        # and it counts op operands pre-fusion, so it lands ABOVE the
        # analytic fused lower bound per step.  The reported roofline
        # number stays the analytic model (utils/flops.py).
        try:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                               jnp.result_type(x)),
                (state, data),
            )
            ca = runner.lower(
                abstract[0], abstract[1], jnp.asarray(0)
            ).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            xla_body = float(ca.get("bytes accessed", 0.0))
            if xla_body > 0:
                log(f"XLA bytes accessed (scan body counted once): "
                    f"{xla_body / 1e9:.2f} GB vs analytic "
                    f"{bytes_img * bs / 1e9:.2f} GB/step")
        except Exception as exc:  # tunnel/backend-dependent surface
            log(f"backend cost_analysis unavailable ({exc!r})")
        return n_images / dt, flops_img, bytes_img

    if args.mode == "ladder":
        # Rung 1: the parity fp32 model (architecture- and numerics-faithful
        # to the reference).  Rung 2: the best trained-validated config —
        # depthwise postprocess + bf16 compute + bf16 BN apply (43x ladder,
        # PROFILE.md; trained 60 epochs at 5,527 img/s sustained in round 2).
        best_cfg = ModelConfig(
            compute_dtype="bfloat16",
            bn_apply_dtype="bfloat16",
            postprocess_5x5_depthwise=True,
        )
        parity, parity_fl, parity_by = run_scan_epoch(
            ModelConfig(), tag=" [parity-fp32]"
        )
        best, best_fl, best_by = run_scan_epoch(
            best_cfg, tag=" [best dw+bf16+bnbf16]"
        )
        # Rung 3: the same best config at its measured saturation batch
        # (2x the reference's 144; b576 regresses — HBM working-set bound).
        peak, peak_fl, peak_by = run_scan_epoch(
            best_cfg, tag=f" [best b{ladder_peak_bs}]", bs=ladder_peak_bs
        )
        log(f"ladder: parity fp32 {parity:.1f} img/s "
            f"({parity / BASELINE_IMAGES_PER_SEC:.1f}x, MFU "
            f"{mfu_of(parity, parity_fl):.3f}), best b{bs} "
            f"{best:.1f} img/s ({best / BASELINE_IMAGES_PER_SEC:.1f}x, MFU "
            f"{mfu_of(best, best_fl):.3f}), "
            f"peak b{ladder_peak_bs} {peak:.1f} img/s "
            f"({peak / BASELINE_IMAGES_PER_SEC:.1f}x, MFU "
            f"{mfu_of(peak, peak_fl):.3f})")
        final = max(best, peak)
        final_bs = ladder_peak_bs if peak >= best else bs
        final_fl = peak_fl if peak >= best else best_fl
        final_by = peak_by if peak >= best else best_by
        from nvae_tpu.utils.flops import PEAK_FLOPS_BF16

        print(
            json.dumps(
                {
                    "metric": ("train_scan_epoch_throughput_mnist_nvae_"
                               f"best_b{final_bs}"),
                    "value": round(final, 1),
                    "unit": "images/sec",
                    "vs_baseline": round(
                        final / BASELINE_IMAGES_PER_SEC, 2
                    ),
                    "mfu": round(mfu_of(final, final_fl), 4),
                    "flops_per_image": round(final_fl),
                    "peak_flops_bf16": PEAK_FLOPS_BF16,
                    "hbm_bytes_per_image": round(final_by),
                    "hbm_util": round(hbm_util_of(final, final_by), 4),
                    "parity_fp32_hbm_util": round(
                        hbm_util_of(parity, parity_by), 4
                    ),
                    f"best_b{bs}_value": round(best, 1),
                    f"best_b{bs}_vs_baseline": round(
                        best / BASELINE_IMAGES_PER_SEC, 2
                    ),
                    f"best_b{bs}_mfu": round(mfu_of(best, best_fl), 4),
                    "parity_fp32_value": round(parity, 1),
                    "parity_fp32_vs_baseline": round(
                        parity / BASELINE_IMAGES_PER_SEC, 2
                    ),
                    "parity_fp32_mfu": round(mfu_of(parity, parity_fl), 4),
                    "parity_fp32_flops_per_image": round(parity_fl),
                }
            )
        )
        return

    if preset_model_cfg is not None:
        model_cfg = dataclasses.replace(
            preset_model_cfg,
            compute_dtype=args.compute_dtype or "float32",
            bn_apply_dtype=args.bn_apply_dtype or "float32",
            postprocess_5x5_depthwise=(
                args.postprocess_depthwise
                or preset_model_cfg.postprocess_5x5_depthwise
            ),
            use_pallas_kernels=args.use_pallas,
        )
    else:
        model_cfg = ModelConfig(
            compute_dtype=args.compute_dtype or "float32",
            bn_apply_dtype=args.bn_apply_dtype or "float32",
            postprocess_5x5_depthwise=args.postprocess_depthwise,
            use_pallas_kernels=args.use_pallas,
        )
    if args.remat != "default":
        model_cfg = dataclasses.replace(model_cfg, remat=args.remat == "on")
    if args.mode == "scan_epoch":
        images_per_sec, flops_img, bytes_img = run_scan_epoch(model_cfg)
        print(
            json.dumps(
                {
                    "metric": metric_name,
                    "value": round(images_per_sec, 1),
                    "unit": "images/sec",
                    "vs_baseline": round(
                        images_per_sec / BASELINE_IMAGES_PER_SEC, 2
                    ),
                    "mfu": round(mfu_of(images_per_sec, flops_img), 4),
                    "flops_per_image": round(flops_img),
                    "hbm_bytes_per_image": round(bytes_img),
                    "hbm_util": round(
                        hbm_util_of(images_per_sec, bytes_img), 4
                    ),
                }
            )
        )
        return

    model, state, tx = build(model_cfg)
    flops_img = bytes_img = 0.0
    if args.mode in ("step", "epoch"):
        flops_img = step_flops_per_image(
            model, tx, train_cfg, state, args.batch_size
        )
        bytes_img = step_bytes_per_image(
            model, tx, train_cfg, state, args.batch_size
        )

    # Donation is on by default (re-validated on the chip in round 2: no
    # stalls over repeated step/epoch runs; the SIGALRM budget still guards
    # the intermittent tunnel stalls that motivated the round-1 copy mode).
    step_fn = make_train_step(
        model, tx, train_cfg, total_steps,
        steps_per_epoch=60000 // args.batch_size, donate=args.donate,
    )

    if args.mode == "sample":
        # Unconditional-generation throughput (feeds FID's 10k-sample dumps,
        # reference evaluate.py:156 — the reference generates eagerly).
        from nvae_tpu.models import NVAE

        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def sample_fn(v, key):
            images, *_ = model.apply(
                v, args.batch_size, 1.0, True, rngs={"sample": key},
                method=NVAE.sample,
            )
            return images

        sample_jit = jax.jit(sample_fn)
        key = jax.random.PRNGKey(0)
        # Generation-path MFU numerator: conv/matmul FLOPs of one sampling
        # dispatch (decoder+postprocess only — no encoder/backward).
        from nvae_tpu.utils.flops import traced_flops

        sample_flops_img = traced_flops(sample_fn, variables, key) / args.batch_size
        log(f"analytic sample flops: {sample_flops_img / 1e9:.3f} GFLOP/image")
        t0 = time.time()
        float(sample_jit(variables, key)[0, 0, 0, 0])
        log(f"sample compile: {time.time() - t0:.1f}s")
        reps = 5 if args.quick else 20
        t0 = time.time()
        for i in range(reps):
            out = sample_jit(variables, jax.random.fold_in(key, i))
        float(out[0, 0, 0, 0])  # true device sync
        dt = time.time() - t0
        images_per_sec = reps * args.batch_size / dt
        log(f"{reps} sample batches in {dt:.2f}s -> {images_per_sec:.1f} "
            f"img/s (MFU {mfu_of(images_per_sec, sample_flops_img):.3f})")
        print(
            json.dumps(
                {
                    "metric": metric_name,
                    "value": round(images_per_sec, 1),
                    "unit": "images/sec",
                    "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
                    "mfu": round(mfu_of(images_per_sec, sample_flops_img), 4),
                    "flops_per_image": round(sample_flops_img),
                }
            )
        )
        return

    if args.mode == "epoch":
        from nvae_tpu.data import make_iterators, synthetic_dataset

        n_train = 2080 if args.quick else 15000
        bundle = synthetic_dataset(
            n_train=n_train, n_test=args.batch_size,
            image_size=model_cfg.image_size,
            channels=model_cfg.in_channels,
        )
        train_iter, _ = make_iterators(
            bundle, args.batch_size, target_size=model_cfg.image_size,
            binarize=train_cfg.binary,
        )
        log(f"epoch mode: {len(train_iter)} batches/epoch")
        # Epoch 0 pays all compiles; epoch 1 is the measurement.
        for e in range(2):
            t0 = time.time()
            n_images = 0
            for batch in train_iter.epoch(e):
                state, metrics = step_fn(state, batch)
                n_images += args.batch_size
            # NOTE: block_until_ready is not a reliable barrier through
            # remote-tunnel runtimes; fetching the value is.
            loss = float(metrics["loss"])
            dt = time.time() - t0
            log(f"epoch {e}: {dt:.2f}s, {n_images / dt:.1f} img/s (loss {loss:.2f})")
        images_per_sec = n_images / dt
        print(
            json.dumps(
                {
                    "metric": metric_name,
                    "value": round(images_per_sec, 1),
                    "unit": "images/sec",
                    "vs_baseline": round(
                        images_per_sec / BASELINE_IMAGES_PER_SEC, 2
                    ),
                    "mfu": round(mfu_of(images_per_sec, flops_img), 4),
                    "flops_per_image": round(flops_img),
                    "hbm_bytes_per_image": round(bytes_img),
                    "hbm_util": round(
                        hbm_util_of(images_per_sec, bytes_img), 4
                    ),
                }
            )
        )
        return

    # Synthetic binarized batch (throughput is data-independent).
    rng = jax.random.PRNGKey(0)
    batch_shape = (
        args.batch_size, model_cfg.image_size, model_cfg.image_size,
        model_cfg.in_channels,
    )
    if train_cfg.binary:
        batch = (jax.random.uniform(rng, batch_shape) > 0.7).astype(
            jnp.float32
        )
    else:  # continuous-likelihood configs (DML) train on [0, 1] floats
        batch = jax.random.uniform(rng, batch_shape)

    # Remote-tunnel runtimes can stall a dispatch indefinitely; a SIGALRM
    # budget guarantees the JSON line is always emitted from whatever steps
    # completed (median per-step time).
    import signal

    class _Budget(Exception):
        pass

    def _on_alarm(signum, frame):
        raise _Budget()

    signal.signal(signal.SIGALRM, _on_alarm)
    # Budget covers compile (~3-4 min through a tunnel; the 710M celeba64
    # preset needs far more) plus the timed steps — a raised --time_budget
    # extends this phase too.
    signal.alarm(
        max(420 + args.steps * 30, args.time_budget - args.steps * 30)
    )

    times = []
    loss = float("nan")
    try:
        t0 = time.time()
        for _ in range(args.warmup):
            state, metrics = step_fn(state, batch)
        float(metrics["loss"])
        log(f"compile+warmup ({args.warmup} steps): {time.time() - t0:.1f}s")
        signal.alarm(max(60, args.steps * 30))  # re-arm for the timed loop

        for i in range(args.steps):
            t0 = time.time()
            state, metrics = step_fn(state, batch)
            # Fetch the value: block_until_ready alone is not a reliable
            # barrier through remote-tunnel runtimes.
            loss = float(metrics["loss"])
            times.append(time.time() - t0)
            log(f"step {i}: {times[-1] * 1e3:.1f} ms")
    except _Budget:
        log(f"time budget hit after {len(times)} timed steps")
    finally:
        signal.alarm(0)

    if not times:
        log("FATAL: no timed steps completed")
        print(
            json.dumps(
                {
                    "metric": metric_name,
                    "value": 0.0,
                    "unit": "images/sec",
                    "vs_baseline": 0.0,
                }
            )
        )
        return
    med = sorted(times)[len(times) // 2]
    images_per_sec = args.batch_size / med
    log(
        f"{len(times)} steps, median {med * 1e3:.1f} ms -> "
        f"{images_per_sec:.1f} img/s (loss {loss:.2f}, MFU "
        f"{mfu_of(images_per_sec, flops_img):.3f}, HBM "
        f"{hbm_util_of(images_per_sec, bytes_img):.3f})"
    )

    print(
        json.dumps(
            {
                "metric": metric_name,
                "value": round(images_per_sec, 1),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
                "mfu": round(mfu_of(images_per_sec, flops_img), 4),
                "flops_per_image": round(flops_img),
                "hbm_bytes_per_image": round(bytes_img),
                "hbm_util": round(hbm_util_of(images_per_sec, bytes_img), 4),
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measure the dynamic-batching serving runtime (nvae_tpu/serving_runtime.py).

Two workloads over the per-sample-temperature sampler:

- ``--workload closed``: a closed-loop burst of small mixed-temperature
  requests.  Compares the batching server against the naive discipline the
  reference implies (one dispatch per request, the rest of the batch wasted)
  — the gain is the occupancy ratio plus dispatch pipelining.
- ``--workload poisson``: open-loop Poisson arrivals at ``--qps``; reports
  p50/p95/p99 request latency and served throughput, the latency/throughput
  trade driven by ``--max_delay_ms``.

Prints one JSON line per measurement.  CPU-safe smoke: ``--quick``.
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


def _honor_env_platform():
    # Plugin sitecustomize files (axon) force jax_platforms at import and
    # silently override the JAX_PLATFORMS env var — re-assert it (same fix
    # as __graft_entry__._honor_env_platform) so --quick is CPU-safe.
    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)


def build_call(args):
    import jax
    import jax.numpy as jnp

    from nvae_tpu.models import NVAE

    if args.preset:
        from nvae_tpu.presets import get_preset

        model_cfg, _ = get_preset(args.preset)
        import dataclasses

        overrides = {}
        if args.compute_dtype:
            overrides["compute_dtype"] = args.compute_dtype
        if args.bn_apply_dtype:
            overrides["bn_apply_dtype"] = args.bn_apply_dtype
        if args.postprocess_depthwise:
            overrides["postprocess_5x5_depthwise"] = True
        if overrides:
            model_cfg = dataclasses.replace(model_cfg, **overrides)
    else:
        from nvae_tpu.config import debug_config

        model_cfg = debug_config()
    model = NVAE(model_cfg)
    B = args.batch

    log(f"init model ({'preset ' + args.preset if args.preset else 'debug'})")
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, model_cfg.image_size, model_cfg.image_size,
                       model_cfg.in_channels)),
            True,
        )
    )()
    if args.ckpt:
        from nvae_tpu.config import TrainConfig
        from nvae_tpu.train.checkpoint import restore_checkpoint
        from nvae_tpu.train.state import create_train_state
        import os

        _, state, _ = create_train_state(model_cfg, TrainConfig(), 1)
        state = restore_checkpoint(os.path.abspath(args.ckpt), state)
        variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            **({"spectral": state.spectral} if state.spectral else {}),
        }
        log(f"restored {args.ckpt}")

    @jax.jit
    def call(key_data, t_vec):
        images, *_ = model.apply(
            variables, B, t_vec,
            rngs={"sample": jax.random.wrap_key_data(key_data)},
            method=NVAE.sample,
        )
        return images

    # Warm the compile (and measure a reference per-dispatch time).
    kd = jax.random.key_data(jax.random.PRNGKey(9))
    tv = jnp.full((B,), 0.8, jnp.float32)
    t0 = time.monotonic()
    float(call(kd, tv).mean())
    log(f"compile+first dispatch: {time.monotonic() - t0:.1f}s")
    t0 = time.monotonic()
    reps = 3
    for _ in range(reps):
        out = call(kd, tv)
    float(out.mean())
    per_dispatch = (time.monotonic() - t0) / reps
    log(f"steady per-dispatch: {per_dispatch * 1e3:.1f} ms "
        f"({B / per_dispatch:.0f} img/s raw)")
    return call, per_dispatch


def run_closed(args, call, per_dispatch):
    import numpy as np

    from nvae_tpu.serving_runtime import BatchingSampler

    rng = np.random.RandomState(0)
    temps = rng.choice([0.6, 0.7, 0.8, 0.9, 1.0], size=args.requests)
    sizes = rng.randint(1, args.max_request + 1, size=args.requests)
    total_rows = int(sizes.sum())

    # Batching server: submit everything, drain.
    with BatchingSampler(call, args.batch, max_delay_ms=0) as srv:
        t0 = time.monotonic()
        futs = [srv.submit(int(n), float(t)) for n, t in zip(sizes, temps)]
        srv.flush()
        for f in futs:
            f.result(timeout=600)
        dt_batched = time.monotonic() - t0
        stats = srv.stats
    log(f"batched: {total_rows} rows in {dt_batched:.2f}s, "
        f"{stats.dispatches} dispatches, occupancy {stats.occupancy:.2f}")

    # Naive discipline: one dispatch per request (reference serving shape),
    # synchronous.  Estimated from the measured per-dispatch time to keep
    # the bench bounded: requests * per_dispatch.
    dt_naive = args.requests * per_dispatch
    result = {
        "metric": "serving_runtime_closed_loop",
        "value": round(total_rows / dt_batched, 1),
        "unit": "images/sec",
        "batch": args.batch,
        "requests": args.requests,
        "rows": total_rows,
        "dispatches": stats.dispatches,
        "occupancy": round(stats.occupancy, 3),
        "naive_images_per_sec_est": round(total_rows / dt_naive, 1),
        "speedup_vs_naive": round(dt_naive / dt_batched, 2),
    }
    print(json.dumps(result))
    return result


def run_poisson(args, call, per_dispatch):
    import numpy as np

    from nvae_tpu.serving_runtime import BatchingSampler

    rng = np.random.RandomState(1)
    n_req = args.requests
    gaps = rng.exponential(1.0 / args.qps, size=n_req)
    temps = rng.choice([0.6, 0.8, 1.0], size=n_req)
    sizes = rng.randint(1, args.max_request + 1, size=n_req)

    # Latency is stamped by a done-callback at COMPLETION time — polling
    # f.result() in submission order after the arrival loop would charge
    # early requests the rest of the submission window (p50 ~ window/2
    # artifact, observed before this fix).
    import threading

    lat = []
    lat_lock = threading.Lock()
    with BatchingSampler(
        call, args.batch, max_delay_ms=args.max_delay_ms
    ) as srv:
        t_start = time.monotonic()
        pending = []
        for i in range(n_req):
            time.sleep(gaps[i])
            t0 = time.monotonic()
            f = srv.submit(int(sizes[i]), float(temps[i]))

            def _stamp(fut, t0=t0):
                dt = time.monotonic() - t0
                with lat_lock:
                    lat.append(dt)

            f.add_done_callback(_stamp)
            pending.append(f)
        for f in pending:
            f.result(timeout=600)
        dt = time.monotonic() - t_start
        stats = srv.stats
    lat = np.asarray(sorted(lat))
    result = {
        "metric": "serving_runtime_poisson",
        "value": round(float(np.percentile(lat, 99)) * 1e3, 1),
        "unit": "ms_p99_latency",
        "qps": args.qps,
        "max_delay_ms": args.max_delay_ms,
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
        "throughput_images_per_sec": round(float(sizes.sum()) / dt, 1),
        "dispatches": stats.dispatches,
        "occupancy": round(stats.occupancy, 3),
    }
    print(json.dumps(result))
    return result


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--workload", choices=["closed", "poisson", "both"],
                    default="both")
    ap.add_argument("--preset", default="",
                    help="Model preset (default: tiny debug model)")
    ap.add_argument("--ckpt", default="", help="Checkpoint to serve")
    ap.add_argument("--compute_dtype", default="")
    ap.add_argument("--bn_apply_dtype", default="")
    ap.add_argument("--postprocess_depthwise", action="store_true",
                    help="Serve the depthwise-postprocess variant (the "
                         "best-config ladder entry)")
    ap.add_argument("--batch", type=int, default=144,
                    help="Static serving batch (the packing target)")
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--max_request", type=int, default=16,
                    help="Request sizes are uniform in [1, max_request]")
    ap.add_argument("--qps", type=float, default=50.0,
                    help="Poisson arrival rate (requests/sec)")
    ap.add_argument("--max_delay_ms", type=float, default=20.0,
                    help="Batching window for the poisson workload")
    ap.add_argument("--quick", action="store_true",
                    help="Tiny CPU-safe smoke (debug model, few requests)")
    args = ap.parse_args(argv)
    if args.quick:
        args.batch, args.requests, args.qps = 8, 12, 200.0
        args.max_request = 4

    _honor_env_platform()
    call, per_dispatch = build_call(args)
    out = []
    if args.workload in ("closed", "both"):
        out.append(run_closed(args, call, per_dispatch))
    if args.workload in ("poisson", "both"):
        out.append(run_poisson(args, call, per_dispatch))
    return out


if __name__ == "__main__":
    main()

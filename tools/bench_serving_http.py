#!/usr/bin/env python
"""End-to-end HTTP serving benchmark: concurrent clients over the dynamic-
batching runtime (nvae_tpu/serving_http.py + serving_runtime.py).

The dispatch-level ladder (tools/bench_serving_artifact.py, README) times
``exported.call`` back-to-back; this tool measures the full production path
a request actually takes: HTTP POST -> JSON parse -> BatchingSampler queue
-> fixed-batch packed dispatch -> device -> one device->host transfer per
dispatch -> row slice -> npy response.  Mixed request sizes and
temperatures exercise the packer (requests span dispatches, dispatches mix
temperatures), and the reported occupancy shows how full the launched
batches were — the number that decides whether the dynamic batcher is
feeding the chip at ladder throughput.

Weight values don't affect throughput, so the model is freshly initialized
(pass --ckpt to bake trained weights).

Prints one JSON line:
  {"metric": "serving_http", "batch": N, "clients": K,
   "img_per_s": ..., "req_per_s": ..., "p50_ms": ..., "p99_ms": ...,
   "occupancy": ..., "dispatches": ...}

Usage:  python tools/bench_serving_http.py [--batch 144] [--clients 32]
        [--seconds 20] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _client_loop(httpd, deadline, max_n, rng, latencies, counts, stop):
    # One persistent HTTP/1.1 connection per client (the shape a production
    # client pool has): the server keeps one handler thread per connection
    # alive instead of paying TCP handshake + thread spawn per request.
    import http.client

    host, port = httpd.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=120)
    temps = (0.6, 0.7, 0.8, 0.9, 1.0)
    try:
        while time.monotonic() < deadline and not stop.is_set():
            n = int(rng.integers(1, max_n + 1))
            t = float(temps[int(rng.integers(len(temps)))])
            body = json.dumps({"n": n, "temperature": t}).encode()
            t0 = time.monotonic()
            try:
                conn.request("POST", "/sample", body=body)
                r = conn.getresponse()
                payload = r.read()
                if r.status != 200:
                    raise RuntimeError(f"HTTP {r.status}: {payload[:120]!r}")
            except Exception as e:  # pragma: no cover - server gone / timeout
                log(f"client error: {type(e).__name__}: {e}")
                stop.set()
                return
            latencies.append((time.monotonic() - t0) * 1e3)
            counts.append((1, n, len(payload)))
    finally:
        conn.close()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, nargs="+", default=[144],
                   help="Server batch (the packing target); several values "
                        "= multi-shape serving (partial dispatches run the "
                        "smallest shape covering the backlog)")
    p.add_argument("--clients", type=int, default=32,
                   help="Concurrent HTTP clients")
    p.add_argument("--seconds", type=float, default=20.0,
                   help="Timed window after warm-up")
    p.add_argument("--max_n", type=int, default=16,
                   help="Requests draw n uniformly from [1, max_n]")
    p.add_argument("--max_delay_ms", type=float, default=10.0,
                   help="Batching window (0 = full batches only)")
    p.add_argument("--output_dtype", default="", choices=["", "uint8"],
                   help="Device-side uint8 pixel quantization (4x less "
                        "device->host transfer per dispatch)")
    p.add_argument("--fetch_workers", type=int, default=2,
                   help="Threads overlapping device->host result transfers")
    p.add_argument("--ckpt", default="",
                   help="Optional orbax checkpoint to bake in")
    p.add_argument("--quick", action="store_true",
                   help="Tiny debug model, short window (CPU-safe smoke)")
    args = p.parse_args(argv)

    import jax

    # The axon sitecustomize force-sets jax_platforms at import, overriding
    # the JAX_PLATFORMS env var — re-assert a non-plugin choice so CPU
    # smokes actually run on CPU (same fix as serving_http).
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    import jax.numpy as jnp
    import numpy as np

    from nvae_tpu.config import ModelConfig, TrainConfig, debug_config
    from nvae_tpu.serving import build_sampler
    from nvae_tpu.serving_http import serve
    from nvae_tpu.train.state import create_train_state

    if args.quick:
        model_cfg = debug_config()
        args.batch = [min(b, 16) for b in args.batch]
        args.clients = min(args.clients, 4)
        args.seconds = min(args.seconds, 3.0)
        args.max_n = min(args.max_n, 6)
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
    if args.ckpt:
        from nvae_tpu.train.checkpoint import restore_checkpoint

        state = restore_checkpoint(args.ckpt, state)
    variables = state.variables()
    log(f"init: {time.time() - t0:.1f}s")

    batches = sorted(set(args.batch))
    by_batch = {
        b: jax.jit(build_sampler(model, variables, b,
                                 output_dtype=args.output_dtype))
        for b in batches
    }
    call = (by_batch[batches[0]] if len(batches) == 1
            else lambda kd, t: by_batch[int(t.shape[0])](kd, t))
    # Compile + one sync per shape outside the timed window.
    kd = jax.random.key_data(jax.random.PRNGKey(0))
    t0 = time.time()
    for b in batches:
        float(jnp.asarray(
            call(kd, jnp.full((b,), 0.8, jnp.float32))).mean())
    log(f"compile+first dispatch: {time.time() - t0:.1f}s")

    httpd = serve(call, batches if len(batches) > 1 else batches[0],
                  port=0,
                  max_delay_ms=args.max_delay_ms, block=False,
                  fulfill_workers=args.fetch_workers)
    latencies: list = []
    counts: list = []
    stop = threading.Event()
    try:
        # HTTP warm-up (connection setup, first packed dispatch).
        warm = threading.Event()

        def _warm():
            _client_loop(httpd, time.monotonic() + 1.0, args.max_n,
                         np.random.default_rng(99), [], [], warm)

        w = threading.Thread(target=_warm)
        w.start()
        w.join()
        httpd.sampler.stats.dispatches = 0
        httpd.sampler.stats.rows_served = 0
        httpd.sampler.stats.rows_padded = 0
        httpd.sampler.stats.dispatch_shapes = {}

        deadline = time.monotonic() + args.seconds
        t_start = time.monotonic()
        threads = [
            threading.Thread(
                target=_client_loop,
                args=(httpd, deadline, args.max_n,
                      np.random.default_rng(1000 + i), latencies, counts,
                      stop),
            )
            for i in range(args.clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t_start
    finally:
        httpd.shutdown_and_close()

    if stop.is_set():
        raise SystemExit("bench aborted: client error (see stderr)")

    reqs = sum(c[0] for c in counts)
    imgs = sum(c[1] for c in counts)
    lat = np.sort(np.asarray(latencies))
    stats = httpd.sampler.stats
    report = {
        "metric": "serving_http",
        "platform": jax.default_backend(),
        "batch": batches if len(batches) > 1 else batches[0],
        "clients": args.clients,
        "max_n": args.max_n,
        "max_delay_ms": args.max_delay_ms,
        "output_dtype": args.output_dtype or "float32",
        "fetch_workers": args.fetch_workers,
        "seconds": round(wall, 2),
        "requests": reqs,
        "req_per_s": round(reqs / wall, 1),
        "img_per_s": round(imgs / wall, 1),
        "p50_ms": round(float(lat[len(lat) // 2]), 1) if len(lat) else None,
        "p99_ms": round(float(lat[int(len(lat) * 0.99)]), 1)
        if len(lat) else None,
        "dispatches": stats.dispatches,
        "dispatch_shapes": {str(k): v for k, v in
                            sorted(stats.dispatch_shapes.items())},
        "occupancy": round(stats.occupancy, 3),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()

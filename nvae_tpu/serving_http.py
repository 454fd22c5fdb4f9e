"""HTTP front end over the dynamic-batching sampler.

The reference's only serving surface is ``train.py --mode sample``
(``/root/reference/train.py:76-80``): load the model, loop over four fixed
temperatures, write PNGs to disk.  A production TPU deployment wants a
network service whose concurrent, mixed-temperature requests share compiled
dispatches.  This module is that last layer: a stdlib ``ThreadingHTTPServer``
where every request handler thread blocks on a
:class:`~nvae_tpu.serving_runtime.BatchingSampler` future, so concurrency at
the HTTP layer *is* the batching opportunity at the XLA layer — no extra
queueing tier.

Endpoints
---------
- ``POST /sample`` — body ``{"n": 16, "temperature": 0.8, "format": "npy"}``.
  ``format`` one of:

  - ``npy`` (default): the raw ``(n, H, W, C)`` array in the sampler's
    output dtype (float32 probabilities by default; uint8 pixel values
    when the server runs with ``--serve_output uint8``), ``np.save`` bytes
    (``application/octet-stream``) — the dtype rides in the npy header.
  - ``png``: one tiled uint8 grid image (``image/png``), the reference's
    ``tile_images`` layout.

- ``GET /healthz`` — liveness + the serving batch shape.
- ``GET /stats`` — dispatch/occupancy counters (``ServerStats``) plus the
  serving weights record (checkpoint step / reload generation) when the
  sampler is reloadable.
- ``POST /reload`` — hot-swap the serving weights with zero downtime
  (501 when the server was started without a reload source).  Body keys
  are optional: ``{"step": 1200, "use_ema": true}``; the default reloads
  the LATEST step from the checkpoint directory configured at startup —
  the trainer keeps writing checkpoints, the server follows.  Weights are
  only ever read from that startup-configured source, never from a
  client-supplied path.  ``SIGHUP`` triggers the same default reload.
  Live-model servers swap without recompiling (the weights are a jit
  argument — :class:`nvae_tpu.serving.ReloadableSampler`); artifact
  servers re-load the artifact file (new weights = newly exported bytes at
  the same path) and pay one compile while old weights keep serving.

Run ``python -m nvae_tpu.serving_http --preset mnist_step_sn --port 8000``
(add ``--ckpt`` for trained weights; without it the server serves
freshly-initialized weights, which is only useful for load testing).
Or serve a ``jax.export`` artifact — the host then needs only jax + the
file, no model code or checkpoint tree::

    python tools/export_serving.py --out sampler.shlo --batch 144 \
        --per_sample_temperature --ckpt models/...
    python -m nvae_tpu.serving_http --artifact sampler.shlo --port 8000

The server is intentionally stdlib-only: no web framework is baked into this
environment, and the hot path is one ``Future.result()`` per request — the
GIL is released inside XLA dispatch and the numpy copies, so handler threads
scale to the batching window.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from nvae_tpu.serving_runtime import BatchingSampler

MAX_REQUEST_ROWS = 4096  # one POST may span many dispatches, but not unbounded


class SamplerHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer owning a :class:`BatchingSampler`.

    ``daemon_threads`` so a hung client can't block process exit; the
    sampler itself is closed by :meth:`shutdown_and_close` (drains the
    backlog first, same contract as ``BatchingSampler.close``).

    ``request_queue_size`` raises the listen(2) backlog from http.server's
    default of 5: a dynamic-batching server EXPECTS bursts of concurrent
    connections (that's where full batches come from), and at the default a
    burst of ~50 clients gets connection-reset before accept() ever runs
    (measured live by tools/bench_serving_http.py on the v5e host).
    """

    daemon_threads = True
    request_queue_size = 512

    def __init__(self, address, sampler: BatchingSampler,
                 request_timeout_s: float = 600.0, reloader=None):
        super().__init__(address, _Handler)
        self.sampler = sampler
        self.request_timeout_s = float(request_timeout_s)
        # ``dict -> dict`` hot-reload hook (POST /reload, SIGHUP); None =
        # this server has no reload source (fixed weights).
        self.reloader = reloader
        self._reload_lock = threading.Lock()
        self._closing = threading.Event()

    def shutdown_and_close(self):
        self._closing.set()  # stop the checkpoint follower, if any
        self.shutdown()
        self.server_close()
        self.sampler.close()

    def start_follower(self, follow_seconds: float):
        """Deploy-follows-training: poll the reload source every
        ``follow_seconds`` and hot-swap when a NEWER checkpoint step (or
        artifact mtime) appears — the trainer keeps writing, the server
        keeps up, no operator in the loop.  Polling (not inotify) because
        orbax finalizes a step atomically via directory rename and the
        sources may sit on network filesystems."""
        if self.reloader is None:
            raise ValueError("start_follower needs a reloader")

        def run():
            while not self._closing.wait(follow_seconds):
                try:
                    with self._reload_lock:
                        info = self.reloader({"if_newer": True})
                    if not info.get("skipped"):
                        print(f"follow reload: {info}", flush=True)
                except Exception as e:  # keep serving current weights
                    print(f"follow reload failed ({e}); retrying in "
                          f"{follow_seconds}s", flush=True)

        t = threading.Thread(target=run, daemon=True,
                             name="ckpt-follower")
        t.start()
        return t


class _Handler(BaseHTTPRequestHandler):
    # HTTP/1.1 keep-alive: a client issuing back-to-back requests reuses one
    # connection (and therefore ONE handler thread) instead of paying a TCP
    # handshake + thread spawn per request — on the 1-core serving host that
    # per-request churn was a measurable slice of the dispatch cycle.  Safe
    # because every response path (_send) emits Content-Length.
    protocol_version = "HTTP/1.1"
    # Idle-connection reaping: without a socket timeout a keep-alive client
    # that goes quiet pins its handler thread forever.  handle_one_request
    # treats a read timeout as end-of-connection (close, thread exits).
    # Generous vs request_timeout_s=600 spent WAITING on a future — this
    # clock only runs between requests, while the line is idle.
    timeout = 120.0
    server: SamplerHTTPServer

    def log_message(self, fmt, *args):  # quiet by default; stats carry load
        pass

    # ---- helpers -------------------------------------------------------------

    def _send(self, code: int, body: bytes, content_type: str):
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        if self.close_connection:
            # Set by _error (and by HTTP/1.0 / Connection: close requests):
            # tell the client instead of silently dropping the line.
            self.send_header("Connection", "close")
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, obj):
        self._send(code, json.dumps(obj).encode(), "application/json")

    def _error(self, code: int, message: str):
        # Client errors can leave an unread request body on the socket
        # (e.g. a bad Content-Length parsed before the body was consumed);
        # under keep-alive the leftover bytes would be read as the NEXT
        # request line.  Close instead of risking a desynced connection.
        if code >= 400:
            self.close_connection = True
        self._send_json(code, {"error": message})

    # ---- GET -----------------------------------------------------------------

    def do_GET(self):
        if self.path == "/healthz":
            health = {
                "status": "ok",
                "batch_size": self.server.sampler.batch_size,
                "max_delay_ms": self.server.sampler.max_delay_ms,
            }
            shapes = self.server.sampler.batch_sizes
            if len(shapes) > 1:
                health["batch_sizes"] = list(shapes)
            self._send_json(200, health)
        elif self.path == "/stats":
            s = self.server.sampler.stats
            body = {
                "dispatches": s.dispatches,
                "rows_served": s.rows_served,
                "rows_padded": s.rows_padded,
                "requests": s.requests,
                "occupancy": round(s.occupancy, 4),
            }
            if len(self.server.sampler.batch_sizes) > 1:
                body["dispatch_shapes"] = {
                    str(k): v for k, v in sorted(s.dispatch_shapes.items())
                }
            info = getattr(self.server.sampler.call_fn, "info", None)
            if info is not None:
                body["weights"] = info
            self._send_json(200, body)
        else:
            self._error(404, f"unknown path {self.path!r}")

    # ---- POST ----------------------------------------------------------------

    def _do_reload(self):
        reloader = self.server.reloader
        if reloader is None:
            return self._error(
                501, "this server has no reload source (fixed weights)")
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            if not isinstance(req, dict):
                raise ValueError("body must be a JSON object")
        except (ValueError, json.JSONDecodeError):
            return self._error(400, "body must be a JSON object")
        try:
            # One reload at a time; /sample traffic keeps flowing on the
            # current weights meanwhile (other handler threads untouched).
            with self.server._reload_lock:
                info = reloader(req)
        except FileNotFoundError as e:
            return self._error(404, str(e))
        except ValueError as e:
            return self._error(400, str(e))
        except Exception as e:  # reload failed; old weights still serving
            return self._error(500, f"reload failed: {e}")
        self._send_json(200, info)

    def do_POST(self):
        if self.path == "/reload":
            return self._do_reload()
        if self.path != "/sample":
            return self._error(404, f"unknown path {self.path!r}")
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError):
            return self._error(400, "body must be a JSON object")
        if not isinstance(req, dict):
            return self._error(400, "body must be a JSON object")

        n = req.get("n", 1)
        temperature = req.get("temperature", 1.0)
        fmt = req.get("format", "npy")
        if not isinstance(n, int) or not 1 <= n <= MAX_REQUEST_ROWS:
            return self._error(
                400, f"n must be an int in [1, {MAX_REQUEST_ROWS}], got {n!r}")
        if not isinstance(temperature, (int, float)) or not temperature > 0:
            return self._error(
                400, f"temperature must be > 0, got {temperature!r}")
        if fmt not in ("npy", "png"):
            return self._error(400, f"format must be npy or png, got {fmt!r}")

        try:
            fut = self.server.sampler.submit(n, float(temperature))
        except RuntimeError as e:  # server closed
            return self._error(503, str(e))
        try:
            images = fut.result(timeout=self.server.request_timeout_s)
        except TimeoutError:
            return self._error(504, "sampling timed out")
        except Exception as e:  # sampler raised inside the dispatch
            return self._error(500, f"sampler failed: {e}")

        if fmt == "npy":
            # Preserve the sampler's output dtype (f32 probabilities, or u8
            # pixels under --serve_output uint8) — clients read it from the
            # npy header.
            buf = io.BytesIO()
            np.save(buf, np.asarray(images))
            self._send(200, buf.getvalue(), "application/octet-stream")
        else:
            from PIL import Image

            from nvae_tpu.utils.images import tile_images, to_uint8

            grid = to_uint8(tile_images(np.asarray(images)))
            if grid.shape[-1] == 1:
                grid = grid[..., 0]
            buf = io.BytesIO()
            Image.fromarray(grid).save(buf, format="PNG")
            self._send(200, buf.getvalue(), "image/png")


def drain_on_signals(httpd: SamplerHTTPServer, signals=None):
    """Install preemption-safe shutdown: on SIGTERM/SIGINT, stop accepting
    connections and drain every queued request before exiting (the
    ``BatchingSampler.close`` contract — no future is ever stranded).  The
    serving twin of the trainer's SIGTERM checkpoint-and-exit.  Returns the
    handler for direct invocation in tests (handlers only install from the
    main thread)."""
    import signal as _signal

    def handler(signum=None, frame=None):
        # shutdown() blocks until serve_forever exits, so run the drain on
        # a side thread and let the (possibly blocking) serve() caller's
        # finally-clause second call no-op.
        threading.Thread(target=httpd.shutdown_and_close).start()

    if signals is None:
        signals = (_signal.SIGTERM, _signal.SIGINT)
    for sig in signals:
        _signal.signal(sig, handler)
    return handler


def reload_on_sighup(httpd: SamplerHTTPServer):
    """SIGHUP → default hot reload (latest checkpoint step / re-read the
    artifact), the classic ops idiom.  Runs off the signal frame on a side
    thread; a failed reload logs and keeps the current weights serving.
    Returns the handler for direct invocation in tests (installing is
    main-thread-only)."""
    import signal as _signal

    def handler(signum=None, frame=None):
        def _reload():
            try:
                with httpd._reload_lock:
                    info = httpd.reloader({})
                print(f"SIGHUP reload: {info}", flush=True)
            except Exception as e:
                print(f"SIGHUP reload failed ({e}); keeping current "
                      "weights", flush=True)

        threading.Thread(target=_reload, daemon=True).start()

    if httpd.reloader is not None and hasattr(_signal, "SIGHUP"):
        _signal.signal(_signal.SIGHUP, handler)
    return handler


def serve(call_fn, batch_size: int, host: str = "127.0.0.1", port: int = 8000,
          max_delay_ms: float = 10.0, seed: int = 0,
          block: bool = True, drain_signals: bool = False,
          reloader_factory=None,
          follow_seconds: float = 0.0,
          fulfill_workers: int = 2) -> SamplerHTTPServer:
    """Start the HTTP server over ``call_fn`` (a ``(key_data, f32[B]) ->
    images`` sampler).  ``batch_size`` may be a sequence for multi-shape
    serving (see :class:`~nvae_tpu.serving_runtime.BatchingSampler`).
    ``block=False`` runs ``serve_forever`` on a daemon
    thread and returns the server (tests; call ``shutdown_and_close``).
    ``drain_signals`` installs the SIGTERM/SIGINT drain-then-exit handler
    (main thread only — the production entry points set it).
    ``reloader_factory`` (``BatchingSampler -> (dict -> dict)``) enables
    ``POST /reload`` and (with ``drain_signals``) the SIGHUP reload;
    ``follow_seconds > 0`` additionally polls the reload source at that
    period and swaps in newer checkpoints automatically.
    ``fulfill_workers`` overlaps device→host result transfers (see
    :class:`~nvae_tpu.serving_runtime.BatchingSampler`)."""
    sampler = BatchingSampler(
        call_fn, batch_size, max_delay_ms=max_delay_ms, seed=seed,
        fulfill_workers=fulfill_workers)
    httpd = SamplerHTTPServer(
        (host, port), sampler,
        reloader=reloader_factory(sampler) if reloader_factory else None,
    )
    if follow_seconds > 0 and httpd.reloader is not None:
        httpd.start_follower(follow_seconds)
    if drain_signals:
        drain_on_signals(httpd)
        reload_on_sighup(httpd)
    if block:
        try:
            httpd.serve_forever()
        finally:
            httpd.shutdown_and_close()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def _build_call(args):
    """Live per-sample-temperature sampler from a preset/checkpoint (the
    twin of the exported-artifact path in :mod:`nvae_tpu.serving`), as a
    hot-reloadable ``ReloadableSampler``.  Returns ``(call,
    reloader_factory)`` — the factory is None without ``--ckpt`` (nothing
    to reload from)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nvae_tpu.models import NVAE
    from nvae_tpu.serving import (
        ReloadableSampler,
        make_checkpoint_reloader,
        variables_from_state,
    )

    if args.preset:
        from nvae_tpu.presets import get_preset

        model_cfg, _ = get_preset(args.preset)
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
    reloader_factory = None

    if args.ckpt:
        import os

        from nvae_tpu.config import TrainConfig
        from nvae_tpu.train.checkpoint import restore_checkpoint
        from nvae_tpu.train.state import create_train_state

        # The restore template must match the checkpoint's opt_state
        # structure: --use_ema implies the EMA-bearing optimizer chain
        # (same rule as the CLI, nvae_tpu/cli.py).
        _, template, _ = create_train_state(
            model_cfg,
            TrainConfig(ema_decay=0.9999 if args.use_ema else 0.0), 1,
        )
        ckpt_dir = os.path.abspath(args.ckpt)
        state = restore_checkpoint(ckpt_dir, template)
        call = ReloadableSampler(
            model, variables_from_state(state, args.use_ema), B,
            serve_dtype=args.serve_dtype, output_dtype=args.output_dtype,
        )
        call.step = int(state.step)
        reloader_factory = lambda _sampler: make_checkpoint_reloader(  # noqa: E731
            call, ckpt_dir, template, use_ema=args.use_ema
        )
    else:
        variables = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "sample": jax.random.PRNGKey(1)},
                jnp.zeros((1, model_cfg.image_size, model_cfg.image_size,
                           model_cfg.in_channels)),
                True,
            )
        )()
        call = ReloadableSampler(model, variables, B,
                                 serve_dtype=args.serve_dtype,
                                 output_dtype=args.output_dtype)

    # Warm the compile before accepting traffic.
    kd = jax.random.key_data(jax.random.PRNGKey(9))
    float(jnp.asarray(call(kd, jnp.ones((B,), jnp.float32))).mean())
    return call, reloader_factory


def _build_call_from_artifact(path: str):
    """Load an exported StableHLO sampler and return ``(call, batch_size)``.

    The artifact must have been exported with ``--per_sample_temperature``
    (a ``f32[B]`` temperature input): the batching runtime packs mixed-
    temperature rows into one dispatch, which a scalar-temperature artifact
    cannot serve.  The static batch is read off the exported input aval —
    no side-channel config needed on the serving host."""
    import jax
    import jax.numpy as jnp

    from nvae_tpu.serving import load_artifact

    exported = load_artifact(path)
    avals = exported.in_avals
    if len(avals) != 2 or len(avals[1].shape) != 1:
        raise SystemExit(
            f"{path}: artifact temperature input has shape "
            f"{avals[1].shape if len(avals) == 2 else '?'}; the HTTP server "
            "needs a per-sample-temperature artifact (export with "
            "--per_sample_temperature)"
        )
    batch = int(avals[1].shape[0])
    call = jax.jit(exported.call)
    kd = jax.random.key_data(jax.random.PRNGKey(9))
    float(jnp.asarray(call(kd, jnp.ones((batch,), jnp.float32))).mean())
    return call, batch


def _build_calls_from_artifacts(paths):
    """One or more exported samplers as a single shape-dispatching call.

    Each artifact's static batch is read off its temperature aval; with
    several (different-batch exports of the same model), the returned
    callable routes on ``t_vec.shape[0]`` — the multi-shape serving
    contract (``BatchingSampler`` only ever calls configured shapes).
    Returns ``(call, batch)`` where ``batch`` is an int for one artifact
    or the sorted list of shapes for several."""
    pairs = [_build_call_from_artifact(p) for p in paths]
    if len(pairs) == 1:
        return pairs[0]
    by_batch = {}
    for (fn, b), path in zip(pairs, paths):
        if b in by_batch:
            raise SystemExit(
                f"duplicate artifact batch {b} ({path}); multi-shape "
                "serving needs distinct batch sizes")
        by_batch[b] = fn

    def call(key_data, t_vec):
        return by_batch[int(t_vec.shape[0])](key_data, t_vec)

    return call, sorted(by_batch)


def _honor_env_platform():
    # Plugin sitecustomize files (axon) force jax_platforms at import and
    # silently override the JAX_PLATFORMS env var — re-assert it so the
    # server can be pinned to CPU for local testing.
    import os

    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--artifact", action="append", default=None,
                    help="Serve an exported StableHLO sampler "
                         "(tools/export_serving.py --per_sample_temperature)"
                         "; batch size comes from the artifact and "
                         "--preset/--ckpt/--batch are ignored.  Repeat the "
                         "flag with DIFFERENT-batch exports of the same "
                         "model for multi-shape serving (partial "
                         "dispatches run the smallest artifact covering "
                         "the backlog)")
    ap.add_argument("--preset", default="",
                    help="Model preset (default: tiny debug model)")
    ap.add_argument("--ckpt", default="",
                    help="Checkpoint to serve (untrained weights otherwise)")
    ap.add_argument("--compute_dtype", default="")
    ap.add_argument("--bn_apply_dtype", default="")
    ap.add_argument("--postprocess_depthwise", action="store_true")
    ap.add_argument("--serve_dtype", default="",
                    choices=["", "bfloat16", "int8"],
                    help="Weight-only serving cast (applied on every "
                         "reload too)")
    ap.add_argument("--output_dtype", default="", choices=["", "uint8"],
                    help="Serve uint8 pixels quantized on the device (4x "
                         "less device->host transfer; npy responses carry "
                         "the dtype).  For --artifact servers, export the "
                         "artifact with --output_dtype uint8 instead")
    ap.add_argument("--use_ema", action="store_true",
                    help="Serve the EMA parameter average (checkpoint must "
                         "be trained with --ema_decay)")
    ap.add_argument("--batch", type=int, default=144,
                    help="Static serving batch (the packing target)")
    ap.add_argument("--max_delay_ms", type=float, default=10.0)
    ap.add_argument("--follow_s", type=float, default=0.0,
                    help="Poll the checkpoint dir / artifact file every N "
                         "seconds and hot-reload newer weights "
                         "automatically (deploy follows training)")
    ap.add_argument("--fetch_workers", type=int, default=2,
                    help="Threads overlapping device->host result "
                         "transfers (remote-runtime serving bottleneck)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    _honor_env_platform()
    if args.artifact:
        call, batch = _build_calls_from_artifacts(args.artifact)

        def reloader_factory(sampler):
            # Artifact reload: re-read the file(s) at the startup path(s)
            # (the deploy flow exports new bytes to the same paths).  Pays
            # the compiles inside the handler thread; the current weights
            # keep serving until swap_call.  ``if_newer`` (follow mode)
            # keys on the newest file mtime.
            import os

            def newest():
                return max(os.path.getmtime(p) for p in args.artifact)

            state = {"mtime": newest()}

            def reload(req: dict) -> dict:
                mtime = newest()
                if req.get("if_newer") and mtime <= state["mtime"]:
                    return {"artifact": args.artifact, "skipped": True}
                new_call, new_batch = _build_calls_from_artifacts(
                    args.artifact)
                if tuple(new_batch if isinstance(new_batch, list)
                         else [new_batch]) != sampler.batch_sizes:
                    raise ValueError(
                        f"artifact batches changed ({sampler.batch_sizes} "
                        f"-> {new_batch}); restart the server to change "
                        "the serving shapes")
                sampler.swap_call(new_call)
                state["mtime"] = mtime
                return {"artifact": args.artifact, "batch": new_batch}

            return reload
    else:
        call, reloader_factory = _build_call(args)
        batch = args.batch
    print(f"serving on http://{args.host}:{args.port} "
          f"(batch {batch}, max_delay {args.max_delay_ms} ms"
          f"{', reloadable' if reloader_factory else ''})",
          flush=True)
    serve(call, batch, host=args.host, port=args.port,
          max_delay_ms=args.max_delay_ms, seed=args.seed,
          drain_signals=True, reloader_factory=reloader_factory,
          follow_seconds=args.follow_s,
          fulfill_workers=args.fetch_workers)


if __name__ == "__main__":
    main()

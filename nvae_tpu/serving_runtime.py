"""Dynamic-batching serving runtime for the exported sampler.

The reference's serving story is the full Python/TF stack sampling one
scalar-temperature batch per eager call (``train.py:76-80``).  The TPU story
is different: XLA programs want ONE static batch shape, the chip wants that
batch *full*, and the dispatch latency through a remote runtime (~55 ms
measured, README) wants requests *pipelined*.  This module closes the gap
between "requests arrive one at a time with their own temperatures" and
"the artifact wants f32[B] temperature batches":

- **One compiled program.** The server owns a sampler with a static batch
  ``B`` and a per-sample temperature vector (``export_sampler(...,
  per_sample_temperature=True)`` or any ``(key_data, f32[B]) -> images``
  callable).  Mixed-temperature request batches share a dispatch — no
  per-temperature program fragmentation, no recompiles.
- **Dynamic batching.** A worker thread packs queued requests into
  fixed-``B`` dispatches: a dispatch launches as soon as ``B`` rows are
  waiting, or when the oldest queued request has waited ``max_delay_ms``
  (the classic latency/throughput knob).  Short batches are padded (padding
  rows are sampled at T=1 and dropped); requests larger than ``B`` span
  multiple dispatches transparently.
- **Pipelined dispatch.** The worker never blocks on device results — it
  enqueues the XLA call and hands each request a view of the dispatch's
  result; the fulfillment thread pays ONE device→host transfer per dispatch
  (memoized ``_DispatchResult``) and slices rows out in numpy.  Per-request
  *device* slices would be wrong twice over: every distinct ``(row, take)``
  compiles its own XLA gather (~125 ms each on the CPU probe; a fresh
  program per request-size × offset pair), and even warm slices pay a full
  dispatch round-trip.  Back-to-back dispatches therefore overlap exactly
  like the measured streaming ladder (21.8k img/s vs 9.8k per-batch-sync,
  README).
- **Deterministic replay.** Dispatch ``d`` uses
  ``fold_in(PRNGKey(seed), d)`` — a test can reconstruct any dispatch's
  key + packed temperature vector and verify the served rows bitwise.

Usage::

    server = BatchingSampler(exported.call, batch_size=144)
    fut = server.submit(n=16, temperature=0.8)   # non-blocking
    images = fut.result()                        # (16, H, W, C)
    server.close()
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

PAD_TEMPERATURE = 1.0


class _DispatchResult:
    """One dispatch's device result, converted to numpy exactly once.

    Requests sharing a dispatch share the conversion: the first ``numpy()``
    call (on the fulfillment thread) blocks on the device compute and pays
    the device→host transfer for the whole batch; later callers get the
    cached array.  Row extraction then happens in numpy — never as device
    slices, which compile one XLA gather per distinct ``(row, take)`` pair
    (measured ~125 ms per fresh shape on CPU) and pay a dispatch round-trip
    even when warm."""

    __slots__ = ("_images", "_np", "_err", "_lock", "_on_done")

    def __init__(self, images, on_done=None):
        self._images = images
        self._np = None
        self._err = None
        self._lock = threading.Lock()
        self._on_done = on_done

    def numpy(self) -> np.ndarray:
        with self._lock:
            if self._err is not None:
                # Fresh exception per rider, chained to the original:
                # re-raising the same instance from concurrent fulfiller
                # threads would mutate a shared __traceback__.
                raise RuntimeError(
                    f"dispatch transfer failed: {self._err}"
                ) from self._err
            if self._np is None:
                try:
                    self._np = np.asarray(self._images)
                except BaseException as e:
                    # Remember the failure for later riders, and still run
                    # on_done: the dispatch is no longer in flight, and the
                    # worker's partial-batch throttle must not count a dead
                    # dispatch forever.
                    self._err = e
                    raise
                finally:
                    self._images = None  # free the device buffer
                    done, self._on_done = self._on_done, None
                    if done is not None:
                        done()
            return self._np


@dataclass
class _Pending:
    """One request's unserved remainder."""

    future: Future
    temperature: float
    rows_left: int
    t_enqueue: float = 0.0
    # (dispatch_result, row, take) spans, concatenated at fulfillment time.
    parts: List = field(default_factory=list)

    def fulfill(self):
        """Materialize the dispatch results and resolve the future.  Runs on
        the fulfillment thread — ``_DispatchResult.numpy()`` blocks on the
        device compute, which must never happen on the dispatch thread."""
        try:
            arrays = [
                d.numpy()[row : row + take] for d, row, take in self.parts
            ]
            if len(arrays) == 1:
                # Plain copy so the (possibly shared) dispatch buffer isn't
                # pinned by a view held in the caller's result — must be
                # .copy(): ascontiguousarray returns contiguous row-slices
                # as views, which would keep the whole batch alive.  When
                # the single span IS the whole batch (n == B), the view
                # pins nothing extra — skip the full-batch memcpy.
                d, row, take = self.parts[0]
                whole = row == 0 and take == arrays[0].shape[0] == len(
                    d.numpy()
                )
                self.future.set_result(
                    arrays[0] if whole else arrays[0].copy()
                )
            else:
                self.future.set_result(np.concatenate(arrays, axis=0))
        except BaseException as e:  # never strand a waiter
            self.future.set_exception(e)


@dataclass
class ServerStats:
    dispatches: int = 0
    rows_served: int = 0
    rows_padded: int = 0
    requests: int = 0
    # Multi-shape serving: how many dispatches ran at each batch size.
    dispatch_shapes: dict = field(default_factory=dict)

    @property
    def occupancy(self) -> float:
        total = self.rows_served + self.rows_padded
        return self.rows_served / total if total else 0.0


class BatchingSampler:
    """Dynamic-batching front end over a ``(key_data, f32[B]) -> images``
    sampler (an ``exported.call`` from :func:`nvae_tpu.serving.export_sampler`
    with ``per_sample_temperature=True``, or any jitted equivalent).

    Parameters
    ----------
    call_fn:
        The compiled sampler.  Must accept ``(key_data uint32[2],
        temperature f32[B])`` and return ``images[B, ...]`` for every
        configured batch size (a shape-polymorphic jit like
        :class:`~nvae_tpu.serving.ReloadableSampler` compiles one program
        per shape; a fixed-shape artifact supports one).
    batch_size:
        The sampler's static batch — the packing target.  May be a
        SEQUENCE of batch sizes (multi-shape serving): full dispatches use
        the largest, while a partial dispatch (``max_delay_ms`` timeout or
        flush) runs the smallest configured shape that covers the backlog —
        XLA programs have static shapes, so "right-size the batch" means
        "pick among pre-compiled programs", the TPU-serving counterpart of
        a bucketed batch scheduler.  Light load then pays small-batch
        compute + transfer instead of padding the big program.
    max_delay_ms:
        Launch a partial batch once the oldest queued request has waited
        this long.  0 never launches partial batches except on ``flush``/
        ``close`` (pure-throughput mode).
    seed:
        Base PRNG seed; dispatch ``d`` samples with
        ``fold_in(PRNGKey(seed), d)``.
    partial_max_inflight:
        Launch a *partial* batch only while fewer than this many dispatches
        are in flight (launched but not yet materialized).  Every dispatch
        costs full-batch device time regardless of fill, so firing the
        ``max_delay_ms`` timer while earlier dispatches are still computing
        floods the device with mostly-empty batches — measured live on the
        v5e: occupancy 0.20 and 825 img/s at 48 clients without the
        throttle, vs near-full batches with it.  While throttled, arriving
        rows keep coalescing in the backlog (that wait is hidden behind the
        in-flight compute).  2 keeps one dispatch queued behind the running
        one, hiding the ~55 ms tunnel RTT.  FULL batches are never
        throttled, and neither are ``flush``/``close`` drains.
    fulfill_workers:
        Threads materializing device results (each ``numpy()`` pays that
        dispatch's device→host transfer).  Through a remote TPU runtime
        the transfer is comparable to the dispatch compute itself, so one
        fulfiller serializes transfers behind each other and caps
        throughput at ``1/transfer_time``; 2-3 overlap transfer with
        transfer (and with compute).  Per-dispatch results stay memoized
        (``_DispatchResult`` locks), and each request's future still
        resolves exactly once, so concurrency here never reorders rows
        within a request.
    """

    def __init__(
        self,
        call_fn: Callable,
        batch_size: int,
        max_delay_ms: float = 5.0,
        seed: int = 0,
        partial_max_inflight: int = 2,
        fulfill_workers: int = 2,
    ):
        self.call_fn = call_fn
        sizes = ([int(batch_size)] if isinstance(batch_size, (int, float))
                 else [int(b) for b in batch_size])
        if not sizes or any(b <= 0 for b in sizes):
            raise ValueError(f"bad batch sizes {sizes}")
        # Ascending; the largest is the packing target (`batch_size`).
        self.batch_sizes = tuple(sorted(set(sizes)))
        self.batch_size = self.batch_sizes[-1]
        self.max_delay_ms = float(max_delay_ms)
        self.partial_max_inflight = int(partial_max_inflight)
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        self.stats = ServerStats()
        self._base_key = jax.random.PRNGKey(seed)
        self._queue: "queue.Queue" = queue.Queue()
        self._flush = threading.Event()
        self._stop = threading.Event()
        # Fulfillment runs off the dispatch thread: resolving a future pays
        # the device->host transfer (np.asarray), which would serialize the
        # worker with device compute and break dispatch pipelining.
        from concurrent.futures import ThreadPoolExecutor

        self._fulfiller = ThreadPoolExecutor(
            max_workers=max(1, int(fulfill_workers)),
            thread_name_prefix="sampler-fulfill",
        )
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ---- client API ---------------------------------------------------------

    def submit(self, n: int, temperature: float) -> Future:
        """Enqueue a request for ``n`` images at ``temperature``; returns a
        Future resolving to a ``(n, H, W, C)`` array."""
        if n <= 0:
            raise ValueError(f"n must be positive, got {n}")
        if self._stop.is_set():
            raise RuntimeError("server is closed")
        fut = Future()
        self._queue.put(
            _Pending(fut, float(temperature), int(n), time.monotonic())
        )
        self.stats.requests += 1
        return fut

    def sample(self, n: int, temperature: float) -> np.ndarray:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(n, temperature).result()

    def flush(self) -> None:
        """Launch whatever is queued now without waiting for a full batch."""
        self._flush.set()

    def swap_call(self, call_fn: Callable) -> None:
        """Hot-swap the compiled sampler (same ``(key_data, f32[B]) ->
        images`` contract and batch size).  The worker reads the callable
        once per dispatch, so the assignment is the swap boundary:
        dispatches launched after it run the new program, in-flight ones
        finish on the old.  Queued requests never re-dispatch — a request
        spanning the swap gets rows from both weight generations (each row
        is served exactly once)."""
        self.call_fn = call_fn

    def close(self) -> None:
        """Serve everything queued, then stop the worker."""
        self._stop.set()
        self._flush.set()
        self._worker.join()
        self._fulfiller.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- worker -------------------------------------------------------------

    def _dispatch_done(self):
        """Fulfillment-side completion: a dispatch's device result has
        materialized.  Wakes the worker (None sentinel) so a throttled
        partial batch launches immediately instead of on the next poll."""
        with self._inflight_lock:
            self._inflight -= 1
        self._queue.put(None)

    def _inflight_count(self) -> int:
        with self._inflight_lock:
            return self._inflight

    def _key_data(self, dispatch_idx: int):
        return jax.random.key_data(
            jax.random.fold_in(self._base_key, dispatch_idx)
        )

    def pack(self, pendings: List[_Pending], batch: int = 0) -> np.ndarray:
        """The packed f32[B] temperature vector for one dispatch (row i of
        the dispatch belongs to the request whose rows cover i, in queue
        order; the tail is padding at ``PAD_TEMPERATURE``).  ``batch``
        defaults to the largest configured shape."""
        B = batch or self.batch_size
        temps = []
        for p in pendings:
            take = min(p.rows_left, B - len(temps))
            temps.extend([p.temperature] * take)
        temps.extend([PAD_TEMPERATURE] * (B - len(temps)))
        return np.asarray(temps, np.float32)

    def _pick_batch(self, rows: int) -> int:
        """Smallest configured shape covering ``rows`` (the largest if none
        does — the remainder rides the next dispatch)."""
        for b in self.batch_sizes:
            if b >= rows:
                return b
        return self.batch_size

    def _dispatch(self, pendings: List[_Pending]) -> None:
        """Launch one batch serving (prefixes of) ``pendings`` in order."""
        B = self._pick_batch(sum(p.rows_left for p in pendings))
        t_vec = self.pack(pendings, B)
        try:
            images = self.call_fn(
                self._key_data(self.stats.dispatches), jnp.asarray(t_vec)
            )
        except BaseException as e:  # fail every rider, keep the worker alive
            for p in pendings:
                if p.rows_left > 0 and not p.future.done():
                    p.future.set_exception(e)
                p.rows_left = 0
            self.stats.dispatches += 1
            return
        # ONE device->host conversion per dispatch, shared by every rider —
        # the consumer's first numpy() pays the sync on the fulfillment
        # thread, so this worker keeps dispatching (pipelined).
        with self._inflight_lock:
            self._inflight += 1
        result = _DispatchResult(images, on_done=self._dispatch_done)
        # Stats update BEFORE any fulfillment is submitted: a client whose
        # future resolved must see this dispatch in /stats.
        filled = min(sum(p.rows_left for p in pendings), B)
        self.stats.dispatches += 1
        self.stats.rows_served += filled
        self.stats.rows_padded += B - filled
        self.stats.dispatch_shapes[B] = (
            self.stats.dispatch_shapes.get(B, 0) + 1
        )
        row = 0
        for p in pendings:
            take = min(p.rows_left, B - row)
            if take <= 0:
                break
            p.parts.append((result, row, take))
            p.rows_left -= take
            row += take
            if p.rows_left == 0:
                self._fulfiller.submit(p.fulfill)

    def _run(self) -> None:
        B = self.batch_size
        backlog: List[_Pending] = []  # partially-served / waiting requests

        def rows_waiting():
            return sum(p.rows_left for p in backlog)

        def drain_nowait():
            while True:
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    return
                if item is not None:  # None = dispatch-done wake sentinel
                    backlog.append(item)

        while True:
            # Block for the next request (bounded so flush/close are seen),
            # then drain everything already queued — a flush must pack the
            # whole queue, never a partial view of it.
            timeout = 0.05
            if (
                backlog
                and self.max_delay_ms > 0
                and not self._flush.is_set()
                # While partials are throttled on in-flight dispatches the
                # deadline can't fire anyway — keep the 50 ms poll instead
                # of spinning at timeout 0 until a dispatch materializes
                # (the done sentinel wakes the get immediately regardless).
                and self._inflight_count() < self.partial_max_inflight
            ):
                deadline = backlog[0].t_enqueue + self.max_delay_ms / 1e3
                timeout = min(max(deadline - time.monotonic(), 0.0), 0.05)
            try:
                item = self._queue.get(timeout=timeout)
                if item is not None:
                    backlog.append(item)
            except queue.Empty:
                pass
            drain_nowait()

            flush = self._flush.is_set()
            # Launch every full batch; launch a partial one on timeout/flush.
            # Timeout partials are throttled on in-flight dispatches (see
            # partial_max_inflight) — every dispatch costs full-batch device
            # time, so while one is computing, let the backlog coalesce
            # instead of flooding the device with mostly-empty batches.
            # Flush/close drains and full batches are never throttled.
            while rows_waiting() >= B or (backlog and flush) or (
                backlog
                and self.max_delay_ms > 0
                and self._inflight_count() < self.partial_max_inflight
                and (time.monotonic() - backlog[0].t_enqueue) * 1e3
                >= self.max_delay_ms
            ):
                self._dispatch(backlog)
                backlog = [p for p in backlog if p.rows_left > 0]
            if flush and not backlog and self._queue.empty():
                self._flush.clear()
                if self._stop.is_set():
                    return

"""Dynamic-batching serving runtime: packing, padding, replay determinism."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvae_tpu.serving_runtime import PAD_TEMPERATURE, BatchingSampler


def _fake_sampler(batch):
    """A pure (key_data, t_vec) -> images stand-in: row i encodes its
    temperature and the dispatch key, so routing is verifiable bitwise."""

    def call(key_data, t_vec):
        assert t_vec.shape == (batch,)
        k = np.float32(np.asarray(key_data)[1] % 1000) * np.float32(1e-6)
        rows = np.asarray(t_vec, np.float32) + k
        return jnp.asarray(np.tile(rows[:, None, None, None], (1, 2, 2, 1)))

    return call


def _expected(batch, dispatch_idx, temps, seed=0):
    key = jax.random.fold_in(jax.random.PRNGKey(seed), dispatch_idx)
    t_vec = np.asarray(
        temps + [PAD_TEMPERATURE] * (batch - len(temps)), np.float32
    )
    return np.asarray(_fake_sampler(batch)(jax.random.key_data(key), t_vec))


def test_full_batches_pack_across_requests():
    with BatchingSampler(_fake_sampler(4), 4, max_delay_ms=0) as srv:
        f1 = srv.submit(5, 0.7)
        f2 = srv.submit(3, 0.9)
        a = f1.result(timeout=10)
        b = f2.result(timeout=10)
    assert a.shape == (5, 2, 2, 1)
    assert b.shape == (3, 2, 2, 1)
    # Dispatch 0: rows 0-3 of request 1.  Dispatch 1: row 4 of request 1 +
    # all of request 2.  No padding anywhere.
    d0 = _expected(4, 0, [0.7] * 4)
    d1 = _expected(4, 1, [0.7, 0.9, 0.9, 0.9])
    np.testing.assert_array_equal(a, np.concatenate([d0, d1[:1]]))
    np.testing.assert_array_equal(b, d1[1:])
    assert srv.stats.dispatches == 2
    assert srv.stats.rows_padded == 0
    assert srv.stats.rows_served == 8
    assert srv.stats.occupancy == 1.0


def test_partial_batch_padded_on_flush():
    srv = BatchingSampler(_fake_sampler(4), 4, max_delay_ms=0)
    f = srv.submit(3, 0.5)
    srv.flush()
    out = f.result(timeout=10)
    srv.close()
    np.testing.assert_array_equal(out, _expected(4, 0, [0.5] * 3)[:3])
    assert srv.stats.rows_padded == 1
    assert srv.stats.occupancy == 0.75


def test_max_delay_launches_partial_batch():
    with BatchingSampler(_fake_sampler(8), 8, max_delay_ms=20) as srv:
        t0 = time.monotonic()
        out = srv.submit(2, 1.0).result(timeout=10)
        dt = time.monotonic() - t0
    assert out.shape == (2, 2, 2, 1)
    assert dt < 5.0  # resolved by the delay timer, not a flush/close
    assert srv.stats.rows_padded == 6


def test_close_serves_backlog():
    srv = BatchingSampler(_fake_sampler(4), 4, max_delay_ms=0)
    futs = [srv.submit(1, float(t)) for t in (0.2, 0.4, 0.6)]
    srv.close()
    d0 = _expected(4, 0, [0.2, 0.4, 0.6])
    for i, f in enumerate(futs):
        np.testing.assert_array_equal(f.result(timeout=1), d0[i : i + 1])
    with pytest.raises(RuntimeError):
        srv.submit(1, 1.0)


def test_swap_call_is_dispatch_boundary():
    """swap_call: dispatches launched after the swap run the new sampler,
    results already served are untouched, and replay determinism holds per
    generation (the key schedule never resets)."""

    def v2(batch):
        base = _fake_sampler(batch)

        def call(key_data, t_vec):
            return base(key_data, t_vec) + np.float32(100.0)

        return call

    srv = BatchingSampler(_fake_sampler(4), 4, max_delay_ms=0)
    try:
        f1 = srv.submit(4, 0.7)
        np.testing.assert_array_equal(
            f1.result(timeout=10), _expected(4, 0, [0.7] * 4))
        srv.swap_call(v2(4))
        f2 = srv.submit(4, 0.7)
        # Same packing/key discipline (dispatch index 1), new weights.
        np.testing.assert_array_equal(
            f2.result(timeout=10), _expected(4, 1, [0.7] * 4) + 100.0)
    finally:
        srv.close()


def test_runtime_over_real_model_matches_direct_call():
    """End-to-end over the real debug model: the served rows are BITWISE a
    direct per-sample-temperature sampler call with the replayed dispatch
    key and packed temperature vector."""
    from nvae_tpu.config import debug_config
    from nvae_tpu.models import NVAE

    cfg = debug_config()
    model = NVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 1)), True,
    )
    B = 4

    @jax.jit
    def call(key_data, t_vec):
        images, *_ = model.apply(
            variables, B, t_vec,
            rngs={"sample": jax.random.wrap_key_data(key_data)},
            method=NVAE.sample,
        )
        return images

    with BatchingSampler(call, B, max_delay_ms=0, seed=7) as srv:
        f1 = srv.submit(3, 0.6)
        f2 = srv.submit(1, 1.2)
        a, b = f1.result(timeout=60), f2.result(timeout=60)

    key = jax.random.fold_in(jax.random.PRNGKey(7), 0)
    direct = np.asarray(call(
        jax.random.key_data(key),
        jnp.asarray([0.6, 0.6, 0.6, 1.2], jnp.float32),
    ))
    np.testing.assert_array_equal(a, direct[:3])
    np.testing.assert_array_equal(b, direct[3:])


class _SlowResult:
    """Stand-in for an async device result: np.asarray blocks like a
    device->host transfer behind pending compute."""

    def __init__(self, arr, delay_s):
        self._arr = arr
        self._delay = delay_s

    def __array__(self, dtype=None, copy=None):
        time.sleep(self._delay)
        return self._arr if dtype is None else self._arr.astype(dtype)

    @property
    def shape(self):
        return self._arr.shape


def test_partial_batches_throttled_while_dispatch_inflight():
    """The max_delay timer must NOT flood the device with mostly-empty
    batches while earlier dispatches are still computing (measured live:
    occupancy 0.20 at 48 HTTP clients pre-throttle).  With slow result
    materialization and requests trickling in faster than results return,
    rows coalesce: far fewer dispatches than requests, decent occupancy,
    every row still served correctly."""
    B = 8
    base = _fake_sampler(B)

    def slow_call(key_data, t_vec):
        return _SlowResult(np.asarray(base(key_data, t_vec)), 0.1)

    srv = BatchingSampler(slow_call, B, max_delay_ms=1.0,
                          partial_max_inflight=1)
    futs = []
    try:
        # Warm the jax ops on the worker path (fold_in/key_data compile
        # ~150 ms on first use) — a cold first dispatch would serialize the
        # whole request train behind it and mask the unthrottled behavior
        # (12 dispatches at 0.125 occupancy, measured with the throttle
        # disabled; 3 with it).
        srv.submit(1, 0.7).result(timeout=30)
        srv.stats.dispatches = 0
        srv.stats.rows_served = 0
        srv.stats.rows_padded = 0
        for i in range(12):
            futs.append(srv.submit(1, 0.7))
            time.sleep(0.01)  # > max_delay: pre-throttle, ~1 dispatch each
        outs = [f.result(timeout=30) for f in futs]
    finally:
        srv.close()
    for o in outs:
        assert o.shape == (1, 2, 2, 1)
        # row value = temperature + key tag (tag < 1e-3): right row routing.
        assert abs(float(o[0, 0, 0, 0]) - 0.7) < 1e-3
    # 12 spaced requests pre-throttle = ~12 dispatches at 1/8 occupancy;
    # with the throttle they coalesce while results materialize.
    assert srv.stats.dispatches <= 6, srv.stats
    assert srv.stats.occupancy >= 0.25, srv.stats
    assert srv.stats.rows_served == 12


def test_multi_shape_dispatch_picks_smallest_covering_batch():
    """batch_size=[4, 8]: full load dispatches the big shape; a partial
    (timeout) dispatch runs the smallest pre-compiled shape that covers
    the backlog — light load pays small-batch compute instead of padding
    the 8-wide program."""
    import numpy as np

    shapes_called = []

    def call(key_data, t_vec):
        b = int(t_vec.shape[0])
        shapes_called.append(b)
        return np.full((b, 2, 2, 1), b, np.float32)

    srv = BatchingSampler(call, [4, 8], max_delay_ms=5.0)
    try:
        assert srv.batch_sizes == (4, 8) and srv.batch_size == 8
        # 3 rows queued, then the delay timer fires: B=4 covers it.
        out = srv.submit(3, 0.7).result(timeout=10)
        assert out.shape == (3, 2, 2, 1) and float(out[0, 0, 0, 0]) == 4.0
        # 8 rows = one full big dispatch.
        out = srv.submit(8, 0.7).result(timeout=10)
        assert out.shape[0] == 8 and float(out[0, 0, 0, 0]) == 8.0
        # 5 rows: only the 8-shape covers it (4 < 5).
        out = srv.submit(5, 0.7).result(timeout=10)
        assert float(out[0, 0, 0, 0]) == 8.0
        assert srv.stats.dispatch_shapes == {4: 1, 8: 2}
        # Occupancy accounting uses the ACTUAL dispatched shape.
        assert srv.stats.rows_served == 16
        assert srv.stats.rows_padded == (4 - 3) + 0 + (8 - 5)
    finally:
        srv.close()


def test_multi_shape_request_spanning_shapes():
    """A request larger than the biggest shape spans dispatches, and the
    tail rides the smallest covering shape."""
    import numpy as np

    def call(key_data, t_vec):
        b = int(t_vec.shape[0])
        return np.full((b, 1), b, np.float32)

    srv = BatchingSampler(call, [2, 8], max_delay_ms=5.0)
    try:
        out = srv.submit(9, 1.0).result(timeout=10)  # 8 + 1 -> shapes 8, 2
        assert out.shape == (9, 1)
        assert list(out[:8, 0]) == [8.0] * 8 and out[8, 0] == 2.0
        assert srv.stats.dispatch_shapes == {8: 1, 2: 1}
    finally:
        srv.close()


class _FailingResult:
    """A device-result stand-in whose host materialization raises (the
    remote-runtime failure mode: dispatch enqueue succeeds, the transfer
    dies)."""

    def __array__(self, dtype=None):
        raise RuntimeError("transfer died")

    @property
    def shape(self):
        return (4, 1)


def test_failed_transfer_releases_inflight_slot():
    """A dispatch whose device->host transfer fails must (a) fail its
    riders' futures, and (b) still release its in-flight slot — otherwise
    `partial_max_inflight` failures would throttle partial dispatches
    forever (the worker would count dead dispatches as in flight)."""
    calls = {"n": 0}

    def flaky_call(key_data, t_vec):
        calls["n"] += 1
        if calls["n"] == 1:
            return _FailingResult()
        return np.full((int(t_vec.shape[0]), 1), 7.0, np.float32)

    srv = BatchingSampler(flaky_call, 4, max_delay_ms=1.0,
                          partial_max_inflight=1)
    try:
        bad = srv.submit(1, 0.7)
        with pytest.raises(RuntimeError, match="transfer died"):
            bad.result(timeout=10)
        # The dead dispatch must not occupy the single in-flight slot:
        # this partial (timeout-fired) dispatch has to launch and serve.
        out = srv.submit(1, 0.7).result(timeout=10)
        assert out.shape == (1, 1) and float(out[0, 0]) == 7.0
        assert srv._inflight_count() == 0
    finally:
        srv.close()


def test_single_part_result_does_not_pin_dispatch_buffer():
    """A request served from one span must get a COPY, not a view pinning
    the whole dispatch batch (ascontiguousarray returns contiguous slices
    as views)."""
    with BatchingSampler(_fake_sampler(4), 4, max_delay_ms=0) as srv:
        f1 = srv.submit(1, 0.7)
        f2 = srv.submit(3, 0.9)
        out = f1.result(timeout=10)
    assert out.base is None, "result must own its memory"
    assert f2.result(timeout=10).shape == (3, 2, 2, 1)

"""HTTP serving front end: routing, batching across connections, formats."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from nvae_tpu.serving_http import drain_on_signals, serve
from nvae_tpu.serving_runtime import PAD_TEMPERATURE


def _fake_sampler(batch):
    """Row i encodes its temperature + a key tag (same stand-in as
    test_serving_runtime) so served bytes are verifiable bitwise."""
    import jax.numpy as jnp

    def call(key_data, t_vec):
        assert t_vec.shape == (batch,)
        k = np.float32(np.asarray(key_data)[1] % 1000) * np.float32(1e-6)
        rows = np.asarray(t_vec, np.float32) + k
        return jnp.asarray(np.tile(rows[:, None, None, None], (1, 4, 4, 1)))

    return call


def _expected(batch, dispatch_idx, temps, seed=0):
    key = jax.random.fold_in(jax.random.PRNGKey(seed), dispatch_idx)
    t_vec = np.asarray(
        temps + [PAD_TEMPERATURE] * (batch - len(temps)), np.float32)
    return np.asarray(_fake_sampler(batch)(jax.random.key_data(key), t_vec))


@pytest.fixture()
def server():
    httpd = serve(_fake_sampler(4), 4, port=0, max_delay_ms=20.0, block=False)
    yield httpd
    httpd.shutdown_and_close()


def _url(httpd, path):
    host, port = httpd.server_address[:2]
    return f"http://{host}:{port}{path}"


def _post(httpd, body, path="/sample"):
    req = urllib.request.Request(
        _url(httpd, path), data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_healthz_and_stats(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=10) as r:
        health = json.loads(r.read())
    assert health == {"status": "ok", "batch_size": 4, "max_delay_ms": 20.0}
    with urllib.request.urlopen(_url(server, "/stats"), timeout=10) as r:
        stats = json.loads(r.read())
    assert stats["dispatches"] == 0 and stats["requests"] == 0


def test_npy_roundtrip_matches_dispatch_replay(server):
    status, ctype, body = _post(server, {"n": 3, "temperature": 0.7})
    assert status == 200 and ctype == "application/octet-stream"
    out = np.load(io.BytesIO(body))
    assert out.shape == (3, 4, 4, 1)
    np.testing.assert_array_equal(out, _expected(4, 0, [0.7] * 3)[:3])


def test_concurrent_requests_share_a_dispatch(server):
    """Two HTTP connections land in one packed batch: handler-thread
    concurrency IS the batching opportunity."""
    results = {}

    def post(name, n, t):
        results[name] = _post(server, {"n": n, "temperature": t})

    t1 = threading.Thread(target=post, args=("a", 2, 0.6))
    t2 = threading.Thread(target=post, args=("b", 2, 0.9))
    t1.start(); t2.start(); t1.join(); t2.join()
    a = np.load(io.BytesIO(results["a"][2]))
    b = np.load(io.BytesIO(results["b"][2]))
    with urllib.request.urlopen(_url(server, "/stats"), timeout=10) as r:
        stats = json.loads(r.read())
    assert stats["requests"] == 2
    # Either packed into one full dispatch (no padding) or, if the delay
    # timer fired between the two arrivals, two half-empty ones.
    assert stats["dispatches"] in (1, 2)
    if stats["dispatches"] == 1:
        assert stats["rows_padded"] == 0 and stats["occupancy"] == 1.0
        # Queue order decides row order; verify both possible packings.
        d0_ab = _expected(4, 0, [0.6, 0.6, 0.9, 0.9])
        d0_ba = _expected(4, 0, [0.9, 0.9, 0.6, 0.6])
        ok_ab = (np.array_equal(a, d0_ab[:2]) and np.array_equal(b, d0_ab[2:]))
        ok_ba = (np.array_equal(b, d0_ba[:2]) and np.array_equal(a, d0_ba[2:]))
        assert ok_ab or ok_ba


def test_png_format(server):
    from PIL import Image

    status, ctype, body = _post(
        server, {"n": 4, "temperature": 1.0, "format": "png"})
    assert status == 200 and ctype == "image/png"
    img = Image.open(io.BytesIO(body))
    assert img.size == (8, 8)  # 2x2 grid of 4x4 tiles


@pytest.mark.parametrize("body,frag", [
    ({"n": 0}, "n must be"),
    ({"n": "four"}, "n must be"),
    ({"n": 10**9}, "n must be"),
    ({"temperature": -1.0}, "temperature"),
    ({"format": "jpeg"}, "format"),
])
def test_bad_requests_rejected(server, body, frag):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, body)
    assert ei.value.code == 400
    assert frag in json.loads(ei.value.read())["error"]


def test_unknown_paths_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, {}, path="/nope")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(_url(server, "/nope"), timeout=10)
    assert ei.value.code == 404


class TestArtifactServing:
    """--artifact: the host serves an exported StableHLO sampler with only
    jax + the file; batch size is read off the exported input aval."""

    @pytest.fixture(scope="class")
    def artifact(self, tmp_path_factory):
        import jax.numpy as jnp

        from nvae_tpu.config import debug_config
        from nvae_tpu.models import NVAE
        from nvae_tpu.serving import export_sampler

        cfg = debug_config()
        model = NVAE(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, 32, 32, 1)), True,
        )
        d = tmp_path_factory.mktemp("artifact")
        blob = export_sampler(
            model, variables, 4, platforms=["cpu"],
            per_sample_temperature=True,
        )
        path = d / "sampler.shlo"
        path.write_bytes(blob)
        scalar = export_sampler(model, variables, 4, platforms=["cpu"])
        scalar_path = d / "scalar.shlo"
        scalar_path.write_bytes(scalar)
        return str(path), str(scalar_path), model, variables

    def test_batch_inferred_and_served(self, artifact):
        import jax.numpy as jnp

        from nvae_tpu.serving import build_sampler
        from nvae_tpu.serving_http import _build_call_from_artifact

        path, _, model, variables = artifact
        call, batch = _build_call_from_artifact(path)
        assert batch == 4
        kd = jax.random.key_data(jax.random.PRNGKey(3))
        t_vec = jnp.linspace(0.6, 1.0, 4).astype(jnp.float32)
        direct = np.asarray(
            jax.jit(build_sampler(model, variables, 4))(kd, t_vec))
        np.testing.assert_array_equal(np.asarray(call(kd, t_vec)), direct)

    def test_scalar_temperature_artifact_rejected(self, artifact):
        from nvae_tpu.serving_http import _build_call_from_artifact

        _, scalar_path, _, _ = artifact
        with pytest.raises(SystemExit, match="per_sample_temperature"):
            _build_call_from_artifact(scalar_path)

    def test_http_over_artifact(self, artifact):
        from nvae_tpu.serving_http import _build_call_from_artifact

        path, _, _, _ = artifact
        call, batch = _build_call_from_artifact(path)
        httpd = serve(call, batch, port=0, max_delay_ms=0.0, block=False)
        try:
            status, ctype, body = _post(httpd, {"n": 4, "temperature": 0.8})
            assert status == 200 and ctype == "application/octet-stream"
            out = np.load(io.BytesIO(body))
            assert out.shape == (4, 32, 32, 1)
        finally:
            httpd.shutdown_and_close()


def test_drain_on_signal_resolves_queued_requests():
    """The SIGTERM handler drains the backlog before exit: a partial batch
    queued in full-batches-only mode (max_delay 0) is still served, and the
    listener stops accepting."""
    httpd = serve(_fake_sampler(4), 4, port=0, max_delay_ms=0.0, block=False)
    fut = httpd.sampler.submit(2, 0.9)
    assert not fut.done()  # 2 < 4 rows and no delay timeout: stays queued
    handler = drain_on_signals(httpd, signals=())  # install-free handler
    handler()
    out = fut.result(timeout=30)
    np.testing.assert_array_equal(out, _expected(4, 0, [0.9] * 2)[:2])
    with pytest.raises(urllib.error.URLError):
        urllib.request.urlopen(_url(httpd, "/healthz"), timeout=5)


def test_keepalive_connection_reused():
    """HTTP/1.1 keep-alive: back-to-back requests on ONE connection all
    succeed (no per-request TCP handshake / handler-thread spawn), and the
    server advertises the persistent connection."""
    import http.client

    httpd = serve(_fake_sampler(4), 4, port=0, max_delay_ms=2.0, block=False)
    host, port = httpd.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=30)
    try:
        for i in range(3):
            body = json.dumps({"n": 2, "temperature": 0.8}).encode()
            conn.request("POST", "/sample", body=body)
            r = conn.getresponse()
            assert r.version == 11
            assert r.getheader("Connection", "keep-alive") != "close"
            out = np.load(io.BytesIO(r.read()))
            assert out.shape == (2, 4, 4, 1)
        # GET endpoints ride the same connection.
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["requests"] == 3
    finally:
        conn.close()
        httpd.shutdown_and_close()


def test_reload_endpoint_swaps_sampler():
    """POST /reload drives the reloader hook and later requests ride the
    swapped sampler; /stats surfaces the weights record; SIGHUP's handler
    performs the default reload."""
    from nvae_tpu.serving_http import reload_on_sighup

    base = _fake_sampler(4)

    class _Reloadable:
        def __init__(self):
            self.offset = 0.0
            self.info = {"step": -1, "generation": 0}

        def __call__(self, kd, t_vec):
            return base(kd, t_vec) + np.float32(self.offset)

    call = _Reloadable()

    def reloader_factory(sampler):
        def reload(req):
            step = req.get("step", 99)
            if not isinstance(step, int):
                raise ValueError("step must be an int")
            call.offset = float(step)
            call.info = {"step": step,
                         "generation": call.info["generation"] + 1}
            return dict(call.info)

        return reload

    httpd = serve(call, 4, port=0, max_delay_ms=2.0, block=False,
                  reloader_factory=reloader_factory)
    try:
        _, _, body = _post(httpd, {"n": 2, "temperature": 0.5})
        r0 = np.load(io.BytesIO(body))

        status, _, body = _post(httpd, {"step": 100}, path="/reload")
        assert status == 200
        assert json.loads(body) == {"step": 100, "generation": 1}
        _, _, body = _post(httpd, {"n": 2, "temperature": 0.5})
        r1 = np.load(io.BytesIO(body))
        assert float((r1 - r0).mean()) == pytest.approx(100.0, abs=1e-3)

        # /stats carries the weights record from the sampler's .info.
        with urllib.request.urlopen(_url(httpd, "/stats"), timeout=5) as r:
            stats = json.loads(r.read())
        assert stats["weights"]["step"] == 100

        # Validation errors map to 400; the old weights keep serving.
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(httpd, {"step": "latest"}, path="/reload")
        assert ei.value.code == 400

        # SIGHUP handler: default reload (empty request body).
        import time as _time

        reload_on_sighup(httpd)(None, None)
        deadline = _time.monotonic() + 5
        while (call.info["generation"] != 2
               and _time.monotonic() < deadline):
            _time.sleep(0.02)
        assert call.info == {"step": 99, "generation": 2}
    finally:
        httpd.shutdown_and_close()


def test_follower_polls_and_stops_on_shutdown():
    """follow_seconds: the server polls the reloader with if_newer=True on
    the configured period and the poller dies with shutdown_and_close."""
    import time

    calls = []

    def reloader_factory(sampler):
        def reload(req):
            calls.append(dict(req))
            return {"skipped": True}

        return reload

    httpd = serve(_fake_sampler(4), 4, port=0, max_delay_ms=2.0, block=False,
                  reloader_factory=reloader_factory, follow_seconds=0.05)
    try:
        deadline = time.monotonic() + 5
        while len(calls) < 3 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert len(calls) >= 3
        assert all(c == {"if_newer": True} for c in calls)
    finally:
        httpd.shutdown_and_close()
    n = len(calls)
    time.sleep(0.3)
    assert len(calls) == n  # poller stopped with the server


def test_reload_without_source_is_501(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, {}, path="/reload")
    assert ei.value.code == 501


def test_idle_keepalive_connection_reaped(monkeypatch):
    """A keep-alive client that goes quiet must not pin its handler thread
    forever: the idle socket timeout closes the connection (recv sees EOF),
    while fresh connections keep being served."""
    import http.client
    import socket

    from nvae_tpu import serving_http

    monkeypatch.setattr(serving_http._Handler, "timeout", 0.5)
    httpd = serve(_fake_sampler(4), 4, port=0, max_delay_ms=2.0, block=False)
    host, port = httpd.server_address[:2]
    try:
        s = socket.create_connection((host, port), timeout=10)
        s.settimeout(10)
        # One request proves the connection is live, then idle past the
        # server's keep-alive timeout.
        s.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
        first = b""
        while b'"max_delay_ms"' not in first:  # end of the JSON body
            chunk = s.recv(65536)
            assert chunk, f"connection closed mid-response: {first!r}"
            first += chunk
        assert b"200" in first
        assert s.recv(65536) == b""  # server closed the idle line
        s.close()

        # The server is still healthy for new connections.
        conn = http.client.HTTPConnection(host, port, timeout=10)
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
        conn.close()
    finally:
        httpd.shutdown_and_close()


def test_error_response_closes_connection():
    """4xx responses close the connection (and say so): a parse-stage error
    can leave unread body bytes that would desync the next request on a
    reused line."""
    import http.client

    httpd = serve(_fake_sampler(4), 4, port=0, max_delay_ms=2.0, block=False)
    host, port = httpd.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=10)
    try:
        conn.request("POST", "/sample", body=json.dumps({"n": 0}).encode())
        r = conn.getresponse()
        assert r.status == 400
        assert r.getheader("Connection") == "close"
        r.read()
    finally:
        conn.close()
        httpd.shutdown_and_close()


def test_connection_burst_not_reset():
    """A barrier-synchronized burst of concurrent connections must all be
    served: dynamic batching WANTS bursts (that's where full batches come
    from), but http.server's default listen backlog of 5 RSTs them before
    accept() runs (measured live at 48 clients on the v5e host —
    SamplerHTTPServer.request_queue_size pins the fix)."""
    n_clients = 64
    httpd = serve(_fake_sampler(8), 8, port=0, max_delay_ms=5.0, block=False)
    barrier = threading.Barrier(n_clients)
    errors, ok = [], []

    def client(i):
        body = json.dumps({"n": 1, "temperature": 0.8}).encode()
        barrier.wait()
        try:
            with urllib.request.urlopen(
                _url(httpd, "/sample"), data=body, timeout=60
            ) as r:
                ok.append(r.status)
        except Exception as e:  # ConnectionResetError pre-fix
            errors.append(e)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        httpd.shutdown_and_close()
    assert not errors, errors[:3]
    assert len(ok) == n_clients


def test_npy_response_preserves_sampler_dtype():
    """The npy payload carries the sampler's output dtype in its header —
    a uint8 sampler (--serve_output uint8) serves 1-byte pixels end to
    end, never upcast back to f32 by the HTTP layer."""
    import numpy as np

    def u8_call(key_data, t_vec):
        rng = np.random.default_rng(int(t_vec.shape[0]))
        return rng.integers(0, 256, (4, 8, 8, 1), dtype=np.uint8)

    httpd = serve(u8_call, 4, port=0, max_delay_ms=2.0, block=False)
    try:
        status, ctype, payload = _post(httpd, {"n": 3})
        assert status == 200
        arr = np.load(io.BytesIO(payload))
        assert arr.dtype == np.uint8 and arr.shape == (3, 8, 8, 1)
        # PNG path quantizes identically from either dtype.
        status, ctype, png = _post(httpd, {"n": 3, "format": "png"})
        assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        httpd.shutdown_and_close()


def test_multi_shape_http_serving():
    """serve() with batch_size=[4, 8]: healthz advertises the shapes, a
    light request dispatches the small program (visible in /stats
    dispatch_shapes), and a full batch uses the big one."""
    import numpy as np

    def call(key_data, t_vec):
        b = int(t_vec.shape[0])
        return np.full((b, 2, 2, 1), 0.5, np.float32)

    httpd = serve(call, [4, 8], port=0, max_delay_ms=3.0, block=False)
    try:
        with urllib.request.urlopen(_url(httpd, "/healthz"), timeout=10) as r:
            health = json.loads(r.read())
        assert health["batch_size"] == 8 and health["batch_sizes"] == [4, 8]

        status, _, body = _post(httpd, {"n": 2})
        assert status == 200
        arr = np.load(io.BytesIO(body))
        assert arr.shape == (2, 2, 2, 1)
        status, _, body = _post(httpd, {"n": 8})
        assert status == 200

        with urllib.request.urlopen(_url(httpd, "/stats"), timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["dispatch_shapes"] == {"4": 1, "8": 1}
    finally:
        httpd.shutdown_and_close()


def test_multi_artifact_standalone_serving(tmp_path):
    """Two different-batch exports of the same debug model served by one
    standalone server: requests route to the artifact whose shape covers
    them."""
    import importlib.util
    import os as _os

    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "export_serving",
        _os.path.join(_os.path.dirname(__file__), "..", "tools",
                      "export_serving.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    a2 = str(tmp_path / "s2.shlo")
    a6 = str(tmp_path / "s6.shlo")
    tool.main(["--out", a2, "--debug", "--batch", "2", "--platforms", "cpu",
               "--per_sample_temperature"])
    tool.main(["--out", a6, "--debug", "--batch", "6", "--platforms", "cpu",
               "--per_sample_temperature"])

    from nvae_tpu.serving_http import _build_calls_from_artifacts

    call, batches = _build_calls_from_artifacts([a6, a2])
    assert batches == [2, 6]
    httpd = serve(call, batches, port=0, max_delay_ms=3.0, block=False)
    try:
        status, _, body = _post(httpd, {"n": 2, "temperature": 0.8})
        assert status == 200
        arr = np.load(io.BytesIO(body))
        assert arr.shape[0] == 2
        status, _, body = _post(httpd, {"n": 5, "temperature": 0.8})
        assert status == 200
        assert np.load(io.BytesIO(body)).shape[0] == 5
        with urllib.request.urlopen(_url(httpd, "/stats"), timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["dispatch_shapes"] == {"2": 1, "6": 1}
    finally:
        httpd.shutdown_and_close()

"""HTTP serving front end: routing, batching across connections, formats."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from nvae_tpu.serving_http import serve
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

"""Smoke tests for the measurement tools (quick mode, debug model, CPU).

The tools themselves are TPU measurement harnesses; these tests pin their
mechanics — state copies, checkpoint disciplines, export/quantize plumbing,
and the one-JSON-line output contract — so a refactor can't silently break
the round's evidence generators.
"""

import importlib.util
import json
import os


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name,
        os.path.join(os.path.dirname(__file__), "..", "tools", f"{name}.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_async_ckpt_quick(capsys):
    """All three checkpoint disciplines run and the JSON report carries
    per-epoch times for each (baseline <= sync is NOT asserted — too noisy
    at debug scale; the field contract is)."""
    mod = _load_tool("bench_async_ckpt")
    mod.main(["--quick", "--epochs", "2"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(line)
    assert report["metric"] == "async_ckpt_overlap"
    for k in ("baseline_epoch_s", "sync_epoch_s", "async_epoch_s",
              "sync_total_s", "async_total_s", "state_mb"):
        assert report[k] > 0, k


def test_bench_serving_artifact_quick(capsys):
    """bf16 and int8 artifacts both export, run, and report size +
    throughput; int8 must actually be smaller and produce nearby pixels."""
    mod = _load_tool("bench_serving_artifact")
    mod.main(["--quick"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(line)
    assert report["metric"] == "serving_artifact_int8_vs_bf16"
    assert report["bf16"]["img_per_s"] > 0
    assert report["int8"]["img_per_s"] > 0
    assert report["int8"]["mb"] < report["bf16"]["mb"]
    # Bernoulli means live in [0,1]; int8 weight rounding shifts them only
    # slightly.
    assert report["mean_abs_pixel_delta"] < 0.25


def test_bench_serving_runtime_quick(capsys):
    """Both workloads run on the debug model; the closed-loop report's
    occupancy/dispatch accounting is internally consistent and the poisson
    report carries the latency percentiles."""
    mod = _load_tool("bench_serving_runtime")
    results = mod.main(["--quick"])
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert len(lines) == 2 and len(results) == 2
    closed, poisson = results
    assert closed["metric"] == "serving_runtime_closed_loop"
    assert closed["value"] > 0
    assert 0 < closed["occupancy"] <= 1
    # Dispatches cover all rows at the static batch size.
    assert closed["dispatches"] * 8 >= closed["rows"]
    assert poisson["metric"] == "serving_runtime_poisson"
    assert poisson["p50_ms"] <= poisson["p95_ms"] <= poisson["value"]
    assert poisson["throughput_images_per_sec"] > 0


def test_bench_serving_http_quick(capsys):
    """Concurrent HTTP clients drive the dynamic batcher end to end; the
    report carries throughput, latency percentiles, and batch occupancy."""
    mod = _load_tool("bench_serving_http")
    mod.main(["--quick", "--max_delay_ms", "5"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(line)
    assert report["metric"] == "serving_http"
    assert report["requests"] > 0
    assert report["img_per_s"] > 0
    assert report["dispatches"] > 0
    assert 0.0 < report["occupancy"] <= 1.0
    assert report["p50_ms"] > 0 and report["p99_ms"] >= report["p50_ms"]

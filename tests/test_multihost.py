"""Multi-controller (multi-host) execution tests.

The heavyweight test spawns TWO coordinated Python processes (gloo CPU
collectives over localhost — JAX's DCN stand-in) running the real jitted
train step with process-local data over a global mesh, and checks:

- both processes observe the identical loss trajectory and final params
  (SPMD consistency across the process boundary), and
- that trajectory matches a single-process run of the same global batch on
  the same device count (the multi-controller tier changes nothing
  numerically — same program, same reduction tree).

The cheap tests cover the process-local row partition algebra in-process.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_process_local_rows_single_process():
    from nvae_tpu.parallel import process_local_rows

    lo, hi = process_local_rows(144)
    assert (lo, hi) == (0, 144)  # single-process: owns everything
    # (the divisibility error path needs process_count>1 and is covered by
    # the spawned-run test below)


def test_initialize_single_process_is_noop():
    from nvae_tpu.parallel import multihost

    # No coordinator + 1 process: must not start a coordination service.
    multihost.initialize(num_processes=1)
    import jax

    assert jax.process_count() == 1


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    """2 processes x 2 CPU devices, gloo over localhost, real train step."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(TESTS_DIR, "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out[-4000:]}"
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r

    assert set(results) == {0, 1}
    assert results[0]["primary"] and not results[1]["primary"]
    # SPMD consistency: both controllers observe the same run.
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["csum"] == results[1]["csum"]

    # Single-process reference on the same device count (4 of the suite's
    # 8 virtual devices), same global data -> same trajectory.
    import jax
    import optax

    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.parallel import make_mesh, shard_batch, shard_state
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    model_cfg = debug_config(
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
        n_encoder_channels=8, n_decoder_channels=8,
    )
    tc = TrainConfig(batch_size=8, step_based_warmup=True, learning_rate=1e-5)
    tx = optax.sgd(1e-5)
    model, state, _ = create_train_state(model_cfg, tc, 10, tx=tx)
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    state = shard_state(state, mesh)
    step_fn = make_train_step(model, tx, tc, 10, 5, mesh=mesh, donate=False)
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(3):
        full = (rng.random((8, 32, 32, 1)) > 0.5).astype("float32")
        state, metrics = step_fn(state, shard_batch(full, mesh))
        losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(
        losses, results[0]["losses"], rtol=2e-6, atol=0
    )

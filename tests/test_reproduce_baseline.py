"""End-to-end rehearsal of the absolute-parity path (VERDICT r4 #4).

``tools/reproduce_baseline.py`` is the ready-to-fire command for the
reference's headline numbers, but real MNIST + ImageNet backbone weights
don't exist in this no-egress environment.  This test fabricates a tiny
``mnist.npz`` with the exact keras schema the loader reads
(``data/datasets.py:_load_mnist_like`` — x_train/x_test uint8 + labels)
and drives the WHOLE tool end-to-end in a subprocess: dataset discovery ->
train (2 debug epochs) -> both evaluation protocols (corrected +
bug-for-bug) -> comparison table + artifacts.  If real data ever lands,
the same command with real paths is a zero-debug fire.

``--tiny_model`` swaps in the debug architecture so this runs in the CI
quick tier; everything else (loaders, trainer, eval, report) is the real
path.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fabricate_mnist_npz(path: str, n_train: int = 128, n_test: int = 64):
    """Keras-schema mnist.npz: x_* uint8 (N, 28, 28), y_* uint8 (N,)."""
    rng = np.random.RandomState(0)
    np.savez(
        path,
        x_train=(rng.rand(n_train, 28, 28) * 255).astype(np.uint8),
        y_train=rng.randint(0, 10, n_train).astype(np.uint8),
        x_test=(rng.rand(n_test, 28, 28) * 255).astype(np.uint8),
        y_test=rng.randint(0, 10, n_test).astype(np.uint8),
    )


def test_reproduce_baseline_end_to_end_on_fabricated_mnist(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    fabricate_mnist_npz(str(data_dir / "mnist.npz"))
    out = tmp_path / "out"

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools",
                                         "reproduce_baseline.py"),
            "--debug", "--tiny_model", "--dataset", "mnist",
            "--data_dir", str(data_dir), "--batch_size", "16",
            "--out", str(out),
        ],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"reproduce_baseline failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-3000:]}"
    )
    # The comparison table printed and flagged itself non-comparable.
    assert "vs reference" in proc.stdout
    assert "NOT comparable" in proc.stdout

    with open(out / "comparison.json") as f:
        comparison = json.load(f)
    assert comparison["comparable"] is False
    assert comparison["variant"] == "step_sn"
    assert len(comparison["rows"]) == 6

    # Both protocol artifacts exist and are self-describing about their
    # random-init/fixed-seed backbones (VERDICT r4 #7).
    for name in ("corrected", "parity"):
        with open(out / f"evaluation_{name}.json") as f:
            ev = json.load(f)
        assert ev["feature_backbone_weights"] == "fixed-seed"
        assert ev["sample_metrics"], ev
        nll = ev["nll"]["mean"]
        assert np.isfinite(nll) and nll > 0

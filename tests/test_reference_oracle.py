"""Parity against the GENUINE reference code (VERDICT r4 #1).

``tools/reference_oracle.py`` imports the actual reference sources from
``/root/reference`` (models.py + the four stage modules) under tf_keras,
with TFA/TFP shimmed, and compares forward / losses / SGD training steps
against nvae_tpu with shared weights and zeroed sampling noise.  The
comparison target here is reference-AUTHORED code, not the builder-authored
mimic — closing the self-referential-oracle gap.

The oracle needs ``TF_USE_LEGACY_KERAS=1`` before tensorflow's first
import, so it runs in a subprocess.  One subprocess, all phases asserted
from its JSON report (~3 min; not in the quick tier).

Key assertion: the genuine ``train_step`` is reproduced EXACTLY (phase E1)
by ``spectral_mode="none"`` + ``TrainConfig.parity_frozen_norm=True`` —
the reference trains with BatchNorm/SpectralNorm in inference mode because
``models.py:117`` calls ``self(data)`` with no training flag (phase D
proves those variables stay frozen).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("NVAE_REFERENCE_DIR", "/root/reference")


@pytest.fixture(scope="module")
def oracle_report(tmp_path_factory):
    if not os.path.exists(os.path.join(REFERENCE, "models.py")):
        pytest.skip("reference sources not available")
    pytest.importorskip("tensorflow")
    pytest.importorskip("tf_keras")
    out = tmp_path_factory.mktemp("oracle") / "report.json"
    env = dict(
        os.environ,
        TF_USE_LEGACY_KERAS="1",
        JAX_PLATFORMS="cpu",
        TF_CPP_MIN_LOG_LEVEL="3",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "reference_oracle.py"),
         "--out", str(out)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (
        f"oracle failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )
    with open(out) as f:
        return json.load(f)


def test_phase_a_importer_reads_genuine_checkpoint(oracle_report):
    assert oracle_report["phases"]["A_import_strict"]["ok"]


def test_phase_b_forward_parity(oracle_report):
    b = oracle_report["phases"]["B_forward"]
    assert b["logits_max_abs"] < 1e-4, b
    assert b["latent_params_max_abs"] < 1e-4, b
    assert b["log_p_rel"] < 1e-5, b
    assert b["log_q_rel"] < 1e-5, b


def test_phase_c_loss_decomposition(oracle_report):
    c = oracle_report["phases"]["C_losses"]
    assert c["recon_rel"] < 1e-5, c
    assert c["kl_balanced_rel"] < 1e-5, c
    assert c["kl_plain_rel"] < 1e-5, c
    assert c["bn_rel"] < 1e-6, c


def test_phase_d_reference_trains_with_frozen_norm(oracle_report):
    """The parity discovery this oracle exists to pin: the genuine
    train_step (models.py:100-135) resolves its missing training flag to
    inference mode — BN moving statistics and the SN power-iteration state
    never move during training.  If a future tf_keras changes this
    resolution, E1's comparison basis changes with it — revisit both."""
    d = oracle_report["phases"]["D_genuine_semantics"]
    assert d["bn_moving_stats_frozen_in_train_step"] is True
    assert d["sn_power_iteration_frozen_in_train_step"] is True


def test_phase_e1_genuine_train_step_exact(oracle_report):
    e1 = oracle_report["phases"]["E1_genuine_train_step_lockstep"]
    assert e1["loss_rel"] < 1e-6, e1
    assert e1["params_max_abs"] < 1e-6, e1
    assert e1["batch_stats_max_abs"] < 1e-6, e1


def test_phase_e2_intended_semantics_tracks(oracle_report):
    """training=True (counterfactual — the reference never passes it):
    TFA normalizes in place so its SGD gradient is plain dL/dW_normalized,
    while forward-mode nvae_tpu differentiates through W/sigma(W) (the
    Miyato formulation, which keeps the quotient-rule projection term).
    The trajectories therefore agree to ~1e-3 rel over 3 steps at lr 1e-5,
    not to fp32 exactness — measured 1.0e-3 (see PARITY.md)."""
    e2 = oracle_report["phases"]["E2_training_true_lockstep"]
    assert e2["loss_rel"] < 5e-3, e2
    # Step 1 has identical forward semantics on both sides (the divergence
    # is representational, appearing only through the parameter update).
    first_rel = abs(e2["ref_losses"][0] - e2["our_losses"][0]) / abs(
        e2["ref_losses"][0]
    )
    assert first_rel < 1e-6, e2

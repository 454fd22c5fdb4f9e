"""End-to-end evaluation-orchestrator smoke test (scaled-down protocol)."""

import jax
import numpy as np
import pytest

from nvae_tpu.config import TrainConfig, debug_config
from nvae_tpu.data import make_iterators, synthetic_dataset
from nvae_tpu.eval.evaluate import evaluate_model
from nvae_tpu.train.trainer import Trainer


@pytest.mark.slow
def test_evaluate_model_end_to_end(tmp_path):
    model_cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    train_cfg = TrainConfig(
        epochs=1, batch_size=8, model_save_dir=str(tmp_path / "m"),
        tensorboard_log_dir=str(tmp_path / "l"),
    )
    bundle = synthetic_dataset(n_train=32, n_test=16, seed=0)
    train_iter, test_iter = make_iterators(bundle, 8, seed=0)
    trainer = Trainer(model_cfg, train_cfg, steps_per_epoch=len(train_iter))

    evaluation = evaluate_model(
        trainer,
        test_iter,
        batch_size=8,
        n_attempts=1,
        temperatures=(1.0,),
        fid_sample_size=8,
        feature_backbone="random_conv",
        fid_backbone="random_conv",
    )
    assert evaluation.nll is not None
    assert np.isfinite(evaluation.nll.mean) and evaluation.nll.mean > 0
    assert len(evaluation.sample_metrics) == 1
    m = evaluation.sample_metrics[0]
    assert m.temperature == 1.0
    assert np.isfinite(m.fid) and m.fid >= 0
    assert 0.0 <= m.precision.mean <= 1.0
    assert 0.0 <= m.recall.mean <= 1.0
    assert np.isfinite(m.ppl.mean)
    # JSON export round-trips.
    d = evaluation.to_dict()
    assert d["feature_backbone"] == "random_conv"
    assert d["fid_backbone"] == "random_conv"
    assert d["sample_metrics"][0]["fid"] == m.fid


@pytest.mark.slow
def test_evaluate_model_splits_fid_backbone(tmp_path, monkeypatch):
    """FID features must come from ``fid_backbone`` while P&R/PPL come from
    ``feature_backbone`` (reference evaluate.py:161 Inception vs :209 VGG16).
    Verified by recording which backbone names the orchestrator requests and
    which extractor produced the FID inputs."""
    import nvae_tpu.eval.evaluate as ev_mod
    from nvae_tpu.eval.features import get_extractor

    requested = []
    real_get = get_extractor

    def recording_get(name, **kw):
        requested.append(name)
        base = real_get("random_conv", **kw)

        def tagged(x):
            feats = base(x)
            # Tag the feature space by DIMENSION: "inception" features are
            # 7-d, "vgg16" features full-width.  Any cross-space mixing
            # (e.g. real FID feats from one backbone, generated from the
            # other) would crash on shape mismatch inside FID / P&R / PPL.
            return feats[:, :7] if name == "inception" else feats

        return tagged

    monkeypatch.setattr(ev_mod, "get_extractor", recording_get)

    model_cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    train_cfg = TrainConfig(
        epochs=1, batch_size=8, model_save_dir=str(tmp_path / "m"),
        tensorboard_log_dir=str(tmp_path / "l"),
    )
    bundle = synthetic_dataset(n_train=32, n_test=16, seed=0)
    train_iter, test_iter = make_iterators(bundle, 8, seed=0)
    trainer = Trainer(model_cfg, train_cfg, steps_per_epoch=len(train_iter))

    evaluation = evaluate_model(
        trainer, test_iter, batch_size=8, n_attempts=1,
        temperatures=(1.0,), fid_sample_size=8,
        feature_backbone="vgg16", fid_backbone="inception",
    )
    assert set(requested) == {"vgg16", "inception"}
    assert evaluation.feature_backbone == "vgg16"
    assert evaluation.fid_backbone == "inception"
    # Shape-mismatch would have crashed if any FID input came from the
    # P&R backbone (or vice versa); all metrics computed in their own space.
    assert np.isfinite(evaluation.sample_metrics[0].fid)
    assert np.isfinite(evaluation.sample_metrics[0].ppl.mean)

"""Data subsystem tests: synthetic dataset, device-side binarization, iterators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvae_tpu.data import (
    DatasetUnavailable,
    load_dataset,
    make_iterators,
    prepare_batch,
    synthetic_dataset,
)


def test_synthetic_dataset_deterministic():
    a = synthetic_dataset(n_train=32, n_test=8, seed=3)
    b = synthetic_dataset(n_train=32, n_test=8, seed=3)
    np.testing.assert_array_equal(a.train_x, b.train_x)
    assert a.train_x.shape == (32, 28, 28, 1)
    assert a.train_x.dtype == np.uint8
    # Images have actual content (strokes), not blank.
    assert a.train_x.max() == 255
    frac_on = (a.train_x > 0).mean()
    assert 0.01 < frac_on < 0.5


def test_missing_dataset_raises_helpful_error(tmp_path):
    with pytest.raises(DatasetUnavailable, match="never downloads"):
        load_dataset("mnist", str(tmp_path))


def test_prepare_batch_pads_and_binarizes():
    x = np.full((2, 28, 28, 1), 128, dtype=np.uint8)
    out = prepare_batch(jnp.asarray(x), jax.random.PRNGKey(0), target_size=32)
    assert out.shape == (2, 32, 32, 1)
    vals = np.unique(np.asarray(out))
    assert set(vals).issubset({0.0, 1.0})
    # Padding ring must be zero.
    assert float(jnp.sum(out[:, :2, :, :])) == 0.0
    # probs=0.5 -> roughly half the interior pixels on.
    interior = np.asarray(out[:, 2:30, 2:30, :])
    assert 0.3 < interior.mean() < 0.7


def test_prepare_batch_parity_threshold():
    x = np.zeros((1, 28, 28, 1), dtype=np.uint8)
    x[0, 5, 5, 0] = 1  # even the faintest pixel -> 1 under parity mode
    out = prepare_batch(
        jnp.asarray(x), jax.random.PRNGKey(0), target_size=32,
        parity_binarize_255=True,
    )
    assert float(out[0, 7, 7, 0]) == 1.0  # (5 + pad 2)
    assert float(jnp.sum(out)) == 1.0


def test_prepare_batch_no_binarize_scales():
    x = np.full((1, 32, 32, 1), 255, dtype=np.uint8)
    out = prepare_batch(
        jnp.asarray(x), jax.random.PRNGKey(0), target_size=32, binarize=False
    )
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_iterator_epochs_reshuffle_and_rebinarize():
    bundle = synthetic_dataset(n_train=64, n_test=16, seed=0)
    train, test = make_iterators(bundle, batch_size=16, seed=0)
    assert len(train) == 4
    e0 = [np.asarray(b) for b in train.epoch(0)]
    e1 = [np.asarray(b) for b in train.epoch(1)]
    assert len(e0) == 4 and e0[0].shape == (16, 32, 32, 1)
    # Different epoch -> different shuffle/binarization.
    assert not np.array_equal(e0[0], e1[0])
    # Same epoch index -> identical stream (reproducibility).
    e0b = [np.asarray(b) for b in train.epoch(0)]
    np.testing.assert_array_equal(e0[0], e0b[0])


def test_debug_truncates_to_four_batches():
    bundle = synthetic_dataset(n_train=256, n_test=64, seed=0)
    train, test = make_iterators(bundle, batch_size=8, debug=True)
    assert len(train) == 4 and len(test) == 4


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.train import checkpoint as ckpt
    from nvae_tpu.train.state import create_train_state

    model_cfg = debug_config(n_groups_per_scale=(1, 1), n_latent_per_group=2,
                             n_encoder_channels=8, n_decoder_channels=8)
    model, state, tx = create_train_state(model_cfg, TrainConfig(), 10)
    d = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(d, 5, state)
    assert ckpt.latest_step(d) == 5
    restored = ckpt.restore_checkpoint(d, state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer state (Adamax moments + spectral u) round-trips too.
    assert len(jax.tree.leaves(restored.opt_state)) == len(
        jax.tree.leaves(state.opt_state)
    )


@pytest.mark.slow
def test_async_checkpoint_writer_snapshot_semantics(tmp_path):
    """AsyncCheckpointWriter.save snapshots the state BEFORE returning:
    mutating (or donating) the live train state while the background write
    is still in flight must not corrupt the checkpoint, and a re-save of
    the same step is an idempotent no-op (the trainer's final save)."""
    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.train import checkpoint as ckpt
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step

    model_cfg = debug_config(n_groups_per_scale=(1, 1), n_latent_per_group=2,
                             n_encoder_channels=8, n_decoder_channels=8)
    tc = TrainConfig(batch_size=8, step_based_warmup=True)
    model, state, tx = create_train_state(model_cfg, tc, 10)
    snapshot = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    d = str(tmp_path / "ckpt")
    step_fn = make_train_step(model, tx, tc, 10, 5)  # donates its input
    batch = np.random.default_rng(0).random((8, 32, 32, 1)).astype("float32")
    batch = (batch > 0.5).astype("float32")
    with ckpt.AsyncCheckpointWriter(d) as w:
        assert w.save(0, state)
        # Donate/overwrite the live state while the save may be in flight.
        state, _ = step_fn(state, batch)
        assert not w.save(0, state)  # same step: skipped, not clobbered
        w.wait()
    restored = ckpt.restore_checkpoint(d, state, step=0)
    for a, b in zip(jax.tree.leaves(snapshot),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_presets_all_valid():
    from nvae_tpu.presets import PRESETS, get_preset

    for name in PRESETS:
        model_cfg, train_cfg = get_preset(name)
        shapes = model_cfg.shapes()  # validates the shape algebra
        assert shapes.base_size >= 1
        assert train_cfg.dataset
    # Variant semantics spot-checks.
    m, t = get_preset("mnist_step_sr")
    assert m.spectral_mode == "penalty" and t.step_based_warmup
    m, t = get_preset("mnist_epoch_sn")
    assert not t.step_based_warmup
    m, t = get_preset("cifar10_dml")
    assert m.likelihood == "dml" and m.in_channels == 3 and not t.binary
    m, t = get_preset("celeba64")
    assert m.image_size == 64 and m.remat


def test_synthetic_rgb_registry_names():
    from nvae_tpu.data import load_dataset

    b = load_dataset("synthetic_rgb", n_train=8, n_test=4)
    assert b.train_x.shape == (8, 32, 32, 3)
    # Tinted: channels must differ (not three identical planes).
    assert (b.train_x[..., 0] != b.train_x[..., 1]).any()
    b64 = load_dataset("synthetic_rgb64", n_train=4, n_test=2)
    assert b64.train_x.shape == (4, 64, 64, 3)

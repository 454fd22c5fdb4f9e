"""Trainer-loop integration: fit, image hooks, checkpointing, resume."""

import os

import numpy as np
import pytest

from nvae_tpu.config import TrainConfig, debug_config
from nvae_tpu.data import make_iterators, synthetic_dataset
from nvae_tpu.train.trainer import Trainer
from nvae_tpu.utils.logging import MetricsLogger


def _tiny_cfg():
    return debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )


@pytest.mark.slow
def test_fit_resume_and_artifacts(tmp_path):
    model_cfg = _tiny_cfg()
    train_cfg = TrainConfig(
        epochs=2, batch_size=8, sample_frequency=1, model_save_frequency=1,
        log_frequency=1, step_based_warmup=True,
        model_save_dir=str(tmp_path / "models"),
        tensorboard_log_dir=str(tmp_path / "logs"),
    )
    bundle = synthetic_dataset(n_train=32, n_test=16, seed=0)
    train_iter, test_iter = make_iterators(bundle, 8, seed=0)
    logger = MetricsLogger(train_cfg.tensorboard_log_dir, tensorboard=False)
    trainer = Trainer(model_cfg, train_cfg, steps_per_epoch=len(train_iter),
                      logger=logger)
    result = trainer.fit(train_iter, test_iter)
    assert len(result.history) == 2
    assert int(trainer.state.step) == 2 * len(train_iter)
    # Artifacts: metrics.jsonl, sample + reconstruction PNG dumps, checkpoints.
    assert os.path.exists(tmp_path / "logs" / "metrics.jsonl")
    image_dirs = os.listdir(tmp_path / "logs" / "images")
    assert any(d.startswith("samples_t") for d in image_dirs)
    assert any(d.startswith("test_reconstruction") for d in image_dirs)

    # Resume into a fresh trainer: picks up from the final checkpoint.
    trainer2 = Trainer(model_cfg, train_cfg, steps_per_epoch=len(train_iter))
    start_epoch = trainer2.maybe_resume()
    assert start_epoch == 2
    import jax

    for x, y in zip(
        jax.tree.leaves(trainer.state.params),
        jax.tree.leaves(trainer2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_early_stopping_restores_best(tmp_path):
    model_cfg = _tiny_cfg()
    train_cfg = TrainConfig(
        epochs=50, batch_size=8, patience=1, sample_frequency=1000,
        model_save_frequency=1000, step_based_warmup=True,
        model_save_dir=str(tmp_path / "m"),
        tensorboard_log_dir=str(tmp_path / "l"),
    )
    bundle = synthetic_dataset(n_train=16, n_test=8, seed=1)
    train_iter, _ = make_iterators(bundle, 8, seed=1)
    trainer = Trainer(model_cfg, train_cfg, steps_per_epoch=len(train_iter))
    result = trainer.fit(train_iter)
    # Early stopping must have fired well before 50 epochs (beta warm-up makes
    # the total loss rise after the first epochs on a tiny fixed set).
    assert len(result.history) < 50
    assert np.isfinite(result.best_loss)


@pytest.mark.slow
def test_scan_epochs_path_matches_capability(tmp_path):
    """The scan-epoch fast path trains, logs, checkpoints like the batch path."""
    model_cfg = _tiny_cfg()
    train_cfg = TrainConfig(
        epochs=2, batch_size=8, sample_frequency=1000,
        model_save_frequency=1000, step_based_warmup=True, scan_epochs=True,
        model_save_dir=str(tmp_path / "m"),
        tensorboard_log_dir=str(tmp_path / "l"),
    )
    bundle = synthetic_dataset(n_train=32, n_test=8, seed=2)
    train_iter, _ = make_iterators(bundle, 8, seed=2)
    trainer = Trainer(model_cfg, train_cfg, steps_per_epoch=len(train_iter))
    result = trainer.fit(train_iter)
    assert len(result.history) == 2
    assert int(trainer.state.step) == 2 * len(train_iter)
    for h in result.history:
        assert np.isfinite(h["loss"])
        assert np.isfinite(h["reconstruction_loss"])


@pytest.mark.slow
def test_sigterm_preemption_checkpoints_and_resumes(tmp_path):
    """A SIGTERM mid-run (TPU-pod preemption notice) stops training at the
    next step boundary, writes a full-state checkpoint, and returns
    interrupted=True; a fresh Trainer resumes from exactly that step."""
    import os
    import signal

    from nvae_tpu.train import checkpoint as ckpt

    model_cfg = _tiny_cfg()
    train_cfg = TrainConfig(
        epochs=50, batch_size=8, sample_frequency=1000,
        model_save_frequency=1000, step_based_warmup=True,
        model_save_dir=str(tmp_path / "m"),
        tensorboard_log_dir=str(tmp_path / "l"),
    )
    bundle = synthetic_dataset(n_train=16, n_test=8, seed=3)
    train_iter, _ = make_iterators(bundle, 8, seed=3)
    trainer = Trainer(model_cfg, train_cfg, steps_per_epoch=len(train_iter))

    def preempt_at_epoch_1(epoch, tr, means):
        if epoch == 1:
            os.kill(os.getpid(), signal.SIGTERM)

    prev_handler = signal.getsignal(signal.SIGTERM)
    result = trainer.fit(train_iter, on_epoch_end=preempt_at_epoch_1)
    assert result.interrupted
    assert len(result.history) < 50  # stopped early, not at the horizon
    # The previous SIGTERM disposition is restored after fit().
    assert signal.getsignal(signal.SIGTERM) is prev_handler
    # Full state at the interrupt step is durable on disk...
    assert ckpt.latest_step(trainer.ckpt_dir) == int(result.state.step)
    # ...and a fresh Trainer picks it up and continues.
    trainer2 = Trainer(model_cfg, train_cfg, steps_per_epoch=len(train_iter))
    start = trainer2.maybe_resume()
    assert start == int(result.state.step) // len(train_iter)
    assert int(trainer2.state.step) == int(result.state.step)


def test_sample_images_sweep_matches_per_temperature_semantics(tmp_path):
    """The batched sweep helper returns one n_per_t block per temperature,
    and a single-temperature sweep is BITWISE the per-sample-vector call
    (same rng) — the batching changes the dispatch count, not the math."""
    import jax
    import jax.numpy as jnp

    model_cfg = _tiny_cfg()
    train_cfg = TrainConfig(
        epochs=1, batch_size=8, model_save_dir=str(tmp_path / "m"),
        tensorboard_log_dir=str(tmp_path / "l"),
    )
    trainer = Trainer(model_cfg, train_cfg, steps_per_epoch=1)
    rng = jax.random.PRNGKey(3)
    sweep = trainer.sample_images_sweep(2, (0.7, 1.0), rng=rng)
    assert set(sweep) == {0.7, 1.0}
    for block in sweep.values():
        assert block.shape == (2, 32, 32, 1)
    direct, *_ = trainer.sample_images(
        4, jnp.asarray([0.7, 0.7, 1.0, 1.0], jnp.float32), rng=rng
    )
    np.testing.assert_array_equal(
        np.asarray(direct[:2]), np.asarray(sweep[0.7])
    )
    np.testing.assert_array_equal(
        np.asarray(direct[2:]), np.asarray(sweep[1.0])
    )

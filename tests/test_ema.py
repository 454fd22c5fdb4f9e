"""EMA parameter averaging (train/optim.py track_ema).

A capability beyond the reference (no EMA anywhere in stevensdavid/nvae-tf;
the NVAE paper itself evaluates with EMA weights at decay 0.9999).  The
average lives INSIDE the optimizer state, so these tests pin the three
properties that placement buys: exact closed-form tracking of the
post-update params, free checkpoint round-trips, and the --use_ema swap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nvae_tpu.config import TrainConfig, debug_config
from nvae_tpu.train.optim import (
    EmaState,
    find_ema_params,
    make_optimizer,
    track_ema,
)
from nvae_tpu.train.state import create_train_state
from nvae_tpu.train.step import make_train_step


def _tiny_cfg():
    return debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )


def test_track_ema_closed_form():
    """ema_0 = params_0; ema_{t+1} = d*ema_t + (1-d)*params_{t+1}, exactly."""
    decay = 0.75
    tx = track_ema(decay)
    params = {"w": jnp.arange(4.0), "b": jnp.ones((2,))}
    state = tx.init(params)
    np.testing.assert_array_equal(state.ema["w"], params["w"])

    expected = jax.tree.map(np.asarray, params)
    for t in range(3):
        updates = jax.tree.map(lambda p: jnp.full_like(p, 0.1 * (t + 1)),
                               params)
        updates, state = tx.update(updates, state, params)
        params = optax.apply_updates(params, updates)
        expected = jax.tree.map(
            lambda e, p: decay * e + (1 - decay) * np.asarray(p),
            expected, params,
        )
        assert int(state.count) == t + 1
    np.testing.assert_allclose(np.asarray(state.ema["w"]), expected["w"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(state.ema["b"]), expected["b"],
                               rtol=0, atol=0)


def test_track_ema_rejects_bad_decay():
    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            track_ema(bad)


def test_find_ema_params_absent_without_flag():
    tc = TrainConfig(seed=0)  # ema_decay = 0
    tx = make_optimizer(tc, 10)
    state = tx.init({"w": jnp.ones((3,))})
    assert find_ema_params(state) is None


def test_ema_tracks_model_training_exactly():
    """Three real train steps: the in-optimizer EMA equals the average
    recomputed from the (post-spectral-projection) param trajectory."""
    decay = 0.5
    model_cfg = _tiny_cfg()
    tc = TrainConfig(batch_size=4, seed=0, step_based_warmup=True,
                     ema_decay=decay)
    model, state, tx = create_train_state(model_cfg, tc, 6)
    step_fn = make_train_step(model, tx, tc, 6, 2, donate=False)

    ema = find_ema_params(state.opt_state)
    assert ema is not None
    for x, p in zip(jax.tree.leaves(ema), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(p))

    expected = jax.tree.map(np.asarray, state.params)
    rng = jax.random.PRNGKey(3)
    for i in range(3):
        batch = jax.random.uniform(
            jax.random.fold_in(rng, i), (4, 32, 32, 1))
        state, _ = step_fn(state, batch)
        expected = jax.tree.map(
            lambda e, p: (decay * e + (1 - decay) * np.asarray(p)).astype(
                np.asarray(p).dtype),
            expected, state.params,
        )
    got = find_ema_params(state.opt_state)
    for g, e in zip(jax.tree.leaves(got), jax.tree.leaves(expected)):
        # fp32 elementwise recurrence recomputed on host: exact up to one
        # rounding of the final fma ordering.
        np.testing.assert_allclose(np.asarray(g), e, rtol=0, atol=1e-6)
    # EMA lags the raw params (it still remembers the init).
    diffs = [
        float(np.max(np.abs(np.asarray(g) - np.asarray(p))))
        for g, p in zip(jax.tree.leaves(got), jax.tree.leaves(state.params))
    ]
    assert max(diffs) > 0.0


@pytest.mark.slow
def test_use_ema_checkpoint_roundtrip_and_swap(tmp_path):
    """EMA rides the orbax checkpoint (it's opt_state) and swap_in_ema
    serves/samples on the averaged weights."""
    from nvae_tpu.data import make_iterators, synthetic_dataset
    from nvae_tpu.train.trainer import Trainer

    model_cfg = _tiny_cfg()
    train_cfg = TrainConfig(
        epochs=1, batch_size=8, sample_frequency=0, model_save_frequency=1,
        log_frequency=1, step_based_warmup=True, ema_decay=0.9,
        model_save_dir=str(tmp_path / "models"),
        tensorboard_log_dir=str(tmp_path / "logs"),
    )
    bundle = synthetic_dataset(n_train=16, n_test=8, seed=0)
    train_iter, test_iter = make_iterators(bundle, 8, seed=0)
    trainer = Trainer(model_cfg, train_cfg, steps_per_epoch=len(train_iter))
    trainer.fit(train_iter, test_iter)
    ema_trained = trainer.ema_params()
    assert ema_trained is not None

    trainer2 = Trainer(model_cfg, train_cfg, steps_per_epoch=len(train_iter))
    assert trainer2.maybe_resume() == 1
    ema_restored = trainer2.ema_params()
    for a, b in zip(jax.tree.leaves(ema_trained),
                    jax.tree.leaves(ema_restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    trainer2.swap_in_ema()
    for a, b in zip(jax.tree.leaves(ema_restored),
                    jax.tree.leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    imgs, *_ = trainer2.sample_images(2, 0.8)
    assert imgs.shape == (2, 32, 32, 1)


def test_swap_in_ema_without_ema_raises(tmp_path):
    from nvae_tpu.train.trainer import Trainer

    train_cfg = TrainConfig(
        epochs=1, batch_size=8, step_based_warmup=True,
        model_save_dir=str(tmp_path / "models"),
        tensorboard_log_dir=str(tmp_path / "logs"),
    )
    trainer = Trainer(_tiny_cfg(), train_cfg, steps_per_epoch=2)
    with pytest.raises(ValueError, match="ema_decay"):
        trainer.swap_in_ema()


def test_ema_state_fsdp_shardable():
    """fsdp_sharding tree-maps over ANY opt_state leaf: EmaState's
    param-shaped leaves pick up the same split as the params."""
    from jax.sharding import Mesh
    from nvae_tpu.parallel.mesh import fsdp_sharding

    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("data",))
    big = jnp.zeros((8, 65536 // 8))
    state = EmaState(ema={"k": big}, count=jnp.zeros((), jnp.int32))
    shardings = fsdp_sharding(state, mesh, min_size=65536)
    spec = shardings.ema["k"].spec
    assert "data" in tuple(spec)


def test_use_ema_implies_ema_slot_in_restore_template():
    """--use_ema without --ema_decay must still build an optimizer chain
    WITH the EmaState slot, or the orbax restore template can't match an
    EMA checkpoint's opt_state tree (caught live: list-length 2 vs 3)."""
    from nvae_tpu.cli import build_configs, parse_args
    from nvae_tpu.data import synthetic_dataset

    bundle = synthetic_dataset(n_train=8, n_test=8, seed=0)
    args = parse_args(["--mode", "sample", "--dataset", "synthetic",
                       "--use_ema"])
    _, train_cfg = build_configs(args, bundle)
    assert train_cfg.ema_decay > 0.0
    args = parse_args(["--mode", "sample", "--dataset", "synthetic"])
    _, train_cfg = build_configs(args, bundle)
    assert train_cfg.ema_decay == 0.0

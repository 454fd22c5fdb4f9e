"""Hot-reloadable serving: swap weights with zero downtime, no recompile.

The reference redeploys by restarting ``train.py --mode sample`` with a new
checkpoint (full process + stack reload).  The TPU serving tier instead
treats weights as a jit ARGUMENT (nvae_tpu/serving.py ReloadableSampler):
swapping a checkpoint in is one host->device transfer against the same
compiled program.  These tests pin the full loop: checkpoint dir ->
make_checkpoint_reloader -> swapped outputs matching a fresh closure over
the same weights (fp32-ULP; bitwise within the one program), EMA
extraction included, zero jit cache growth across swaps.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvae_tpu.config import TrainConfig, debug_config
from nvae_tpu.serving import (
    ReloadableSampler,
    build_sampler,
    make_checkpoint_reloader,
    variables_from_state,
)
from nvae_tpu.train import checkpoint as ckpt
from nvae_tpu.train.state import create_train_state

B = 4


@pytest.fixture(scope="module")
def setup():
    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    model, state, _ = create_train_state(
        cfg, TrainConfig(epochs=1, batch_size=B, ema_decay=0.99),
        total_steps=4,
    )
    return model, state


def _closure_output(model, variables, kd, t_vec):
    return np.asarray(jax.jit(build_sampler(model, variables, B))(kd, t_vec))


def _close(a, b):
    # Same weights through the weights-as-ARGUMENT program vs the
    # weights-as-CONSTANT closure: XLA constant-folds/fuses differently, so
    # agreement is fp32-ULP, not bitwise.  Bitwise holds within one program
    # (asserted below on the rollback path).
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=0)


def test_reload_from_checkpoints_bitwise(setup, tmp_path):
    model, state = setup
    kd = jax.random.key_data(jax.random.PRNGKey(3))
    t = jnp.full((B,), 0.8, jnp.float32)

    # Two checkpoints with distinguishable weights: step 1 = init params,
    # step 2 = shifted params.  opt_state rides along so the EMA (still the
    # init-param average at step 0 of the chain) stays restorable.
    shifted = jax.tree.map(lambda x: x + 0.05, state.params)
    state2 = dataclasses.replace(
        state, params=shifted, step=jnp.asarray(2, jnp.int32)
    )
    d = str(tmp_path / "c")
    ckpt.save_checkpoint(d, 1, dataclasses.replace(
        state, step=jnp.asarray(1, jnp.int32)))
    ckpt.save_checkpoint(d, 2, state2)

    sampler = ReloadableSampler(model, variables_from_state(state), B)
    out_init = np.asarray(sampler(kd, t))
    _close(out_init, _closure_output(model, variables_from_state(state), kd, t))

    reload = make_checkpoint_reloader(sampler, d, state)
    info = reload({})  # default: latest step
    assert info["step"] == 2 and info["generation"] == 1
    out2 = np.asarray(sampler(kd, t))
    _close(out2, _closure_output(model, variables_from_state(state2), kd, t))
    assert np.abs(out2 - out_init).max() > 1e-3  # weights actually changed

    # Roll back to an explicit step.
    info = reload({"step": 1})
    assert info["step"] == 1 and info["generation"] == 2
    np.testing.assert_array_equal(np.asarray(sampler(kd, t)), out_init)

    # EMA extraction on reload: the chain's average is still the init
    # params (no update steps ran), so step 2 + use_ema == init outputs.
    info = reload({"step": 2, "use_ema": True})
    assert info["use_ema"] is True
    np.testing.assert_array_equal(np.asarray(sampler(kd, t)), out_init)

    # Zero recompiles across all swaps: same structure + avals, one cache
    # entry (the whole point of weights-as-argument).
    if hasattr(sampler._fn, "_cache_size"):
        assert sampler._fn._cache_size() == 1

    # Bad requests surface as ValueError (the HTTP layer maps it to 400);
    # a missing step is a clean FileNotFoundError (-> 404), not orbax's
    # cryptic Composite-args complaint.
    with pytest.raises(ValueError):
        reload({"step": "latest"})
    with pytest.raises(ValueError):
        reload({"use_ema": 1})
    with pytest.raises(FileNotFoundError, match="step 99"):
        reload({"step": 99})


def test_if_newer_follow_semantics(setup, tmp_path):
    """Follow mode: if_newer skips while the served step is current and
    swaps as soon as the trainer writes a newer one."""
    model, state = setup
    d = str(tmp_path / "c")
    ckpt.save_checkpoint(d, 1, dataclasses.replace(
        state, step=jnp.asarray(1, jnp.int32)))

    sampler = ReloadableSampler(model, variables_from_state(state), B)
    reload = make_checkpoint_reloader(sampler, d, state)
    assert reload({"if_newer": True})["step"] == 1  # first poll: -1 -> 1
    info = reload({"if_newer": True})
    assert info.get("skipped") is True and info["step"] == 1

    ckpt.save_checkpoint(d, 2, dataclasses.replace(
        state,
        params=jax.tree.map(lambda x: x + 0.05, state.params),
        step=jnp.asarray(2, jnp.int32),
    ))
    info = reload({"if_newer": True})
    assert "skipped" not in info and info["step"] == 2

    # An explicit step wins over if_newer (rollback through follow mode
    # isn't a thing; POST /reload {"step": N} is).
    assert reload({"if_newer": True, "step": 1})["step"] == 1


def test_reload_applies_serve_dtype(setup, tmp_path):
    """serve_dtype casts are re-applied on every swap: after a reload the
    served weights are still bf16 (footprint survives redeploys)."""
    model, state = setup
    d = str(tmp_path / "c")
    ckpt.save_checkpoint(d, 1, dataclasses.replace(
        state, step=jnp.asarray(1, jnp.int32)))

    sampler = ReloadableSampler(
        model, variables_from_state(state), B, serve_dtype="bfloat16"
    )
    make_checkpoint_reloader(sampler, d, state)({})
    dtypes = {
        x.dtype
        for x in jax.tree.leaves(sampler._variables["params"])
        if jnp.issubdtype(x.dtype, jnp.floating)
    }
    assert dtypes == {jnp.dtype(jnp.bfloat16)}

    kd = jax.random.key_data(jax.random.PRNGKey(3))
    out = np.asarray(sampler(kd, jnp.full((B,), 0.8, jnp.float32)))
    assert np.isfinite(out).all()


def test_unknown_serve_dtype_rejected(setup):
    model, state = setup
    with pytest.raises(ValueError):
        ReloadableSampler(model, variables_from_state(state), B,
                          serve_dtype="fp8")


def test_output_dtype_uint8_and_survives_swap(setup):
    """output_dtype="uint8" quantizes pixels on the device (4x less
    device->host transfer per dispatch) and, living in the jitted program
    rather than the weights, survives every swap.  Values match host-side
    quantization of the f32 path exactly (same program up to the cast)."""
    model, state = setup
    kd = jax.random.key_data(jax.random.PRNGKey(5))
    t_vec = jnp.full((B,), 0.9, jnp.float32)
    variables = variables_from_state(state)

    f32 = ReloadableSampler(model, variables, B)
    u8 = ReloadableSampler(model, variables, B, output_dtype="uint8")
    assert u8.info["output_dtype"] == "uint8"

    got = np.asarray(u8(kd, t_vec))
    ref = np.asarray(f32(kd, t_vec))
    assert got.dtype == np.uint8
    want = np.round(np.clip(ref, 0.0, 1.0) * 255.0).astype(np.uint8)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
    assert (got == want).mean() > 0.999

    # Swapped weights keep the quantized output path.
    bumped = jax.tree.map(lambda x: x + 0.01, variables["params"])
    u8.swap({**variables, "params": bumped})
    f32.swap({**variables, "params": bumped})
    got2 = np.asarray(u8(kd, t_vec))
    assert got2.dtype == np.uint8
    ref2 = np.asarray(f32(kd, t_vec))
    want2 = np.round(np.clip(ref2, 0.0, 1.0) * 255.0).astype(np.uint8)
    assert (got2 == want2).mean() > 0.999
    assert np.abs(got2.astype(np.int32) - got.astype(np.int32)).max() > 0


def test_reloadable_sampler_is_shape_polymorphic(setup):
    """One ReloadableSampler serves several batch shapes (jit specializes
    per shape) and ONE swap updates all of them — the multi-shape serving
    contract.  Rows are bitwise-equal across shapes? No — threefry bits
    depend on the sampled array's shape; what must hold is that each shape
    runs, returns its own batch, and serves the swapped weights."""
    model, state = setup
    variables = variables_from_state(state)
    s = ReloadableSampler(model, variables, B)
    kd = jax.random.key_data(jax.random.PRNGKey(2))
    small = np.asarray(s(kd, jnp.full((2,), 0.8, jnp.float32)))
    big = np.asarray(s(kd, jnp.full((B,), 0.8, jnp.float32)))
    assert small.shape[0] == 2 and big.shape[0] == B
    # Scalar temperature keeps the constructor batch (back-compat).
    scalar = np.asarray(s(kd, jnp.float32(0.8)))
    assert scalar.shape[0] == B

    s.swap({**variables,
            "params": jax.tree.map(lambda x: x + 0.05, variables["params"])})
    small2 = np.asarray(s(kd, jnp.full((2,), 0.8, jnp.float32)))
    big2 = np.asarray(s(kd, jnp.full((B,), 0.8, jnp.float32)))
    assert np.abs(small2 - small).max() > 0  # both shapes see new weights
    assert np.abs(big2 - big).max() > 0

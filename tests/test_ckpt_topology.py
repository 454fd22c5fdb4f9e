"""Cross-topology checkpoint restore: elastic resume across mesh shapes.

A production FSDP run must survive topology changes — save on an 8-device
slice, resume on 4 (shrunk quota) or 1 (debug/serving host).  Orbax restores
into whatever sharding the target template carries, resharding from the
on-disk representation; these tests pin that the full train state
round-trips VALUE-exactly across layouts in both directions (the reference
has no story here at all: weights-only Keras files, single device).
"""

import dataclasses

import jax
import numpy as np
import pytest

from nvae_tpu.config import TrainConfig, debug_config
from nvae_tpu.parallel import make_mesh
from nvae_tpu.parallel.mesh import shard_state_fsdp
from nvae_tpu.train import checkpoint as ckpt
from nvae_tpu.train.state import create_train_state


def _tiny_state(seed=0):
    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    _, state, _ = create_train_state(
        cfg, TrainConfig(seed=seed), total_steps=4
    )
    return state


def _values(state):
    return jax.tree.map(lambda x: np.asarray(x), state)


def _assert_states_equal(a, b):
    fa, _ = jax.tree.flatten(_values(a))
    fb, _ = jax.tree.flatten(_values(b))
    assert len(fa) == len(fb)
    for xa, xb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


@pytest.mark.slow
def test_fsdp8_checkpoint_restores_on_fewer_devices(tmp_path):
    """Save sharded over 8 devices (FSDP, min_size=0 so even tiny leaves
    shard), restore onto 4 devices and onto a single device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    state = _tiny_state()
    mesh8 = make_mesh(n_data=8)
    sharded8 = shard_state_fsdp(state, mesh8, min_size=0)
    ckpt.save_checkpoint(str(tmp_path / "c"), 3, sharded8)

    # Shrink: 4-device template (different shard counts per leaf).
    mesh4 = make_mesh(n_data=4, devices=jax.devices()[:4])
    template4 = shard_state_fsdp(_tiny_state(seed=1), mesh4, min_size=0)
    restored4 = ckpt.restore_checkpoint(str(tmp_path / "c"), template4, 3)
    _assert_states_equal(restored4, state)
    # The restored leaves actually carry the 4-device layout.
    some = jax.tree.leaves(restored4.params)[0]
    assert len(some.sharding.device_set) in (1, 4)

    # Collapse: plain single-device template.
    template1 = _tiny_state(seed=2)
    restored1 = ckpt.restore_checkpoint(str(tmp_path / "c"), template1, 3)
    _assert_states_equal(restored1, state)


@pytest.mark.slow
def test_single_device_checkpoint_restores_sharded(tmp_path):
    """The opposite direction: a single-device checkpoint (the common
    dev-box artifact) restores straight into an 8-device FSDP layout."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    state = _tiny_state()
    ckpt.save_checkpoint(str(tmp_path / "c"), 5, state)
    mesh8 = make_mesh(n_data=8)
    template8 = shard_state_fsdp(
        dataclasses.replace(_tiny_state(seed=3)), mesh8, min_size=0
    )
    restored = ckpt.restore_checkpoint(str(tmp_path / "c"), template8, 5)
    _assert_states_equal(restored, state)
    some = jax.tree.leaves(restored.params)[0]
    assert len(some.sharding.device_set) in (1, 8)

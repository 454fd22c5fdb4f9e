"""Mesh-sharded (data-parallel) serving: bitwise parity with single-device.

The DP sampler (serving.build_mesh_sampler) must serve the SAME bytes as the
single-device sampler — partitionable threefry makes per-row random bits
mesh-independent — so the batching runtime's replay guarantee survives
scale-out.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvae_tpu.config import debug_config
from nvae_tpu.models import NVAE
from nvae_tpu.parallel import make_mesh
from nvae_tpu.serving import build_mesh_sampler, build_sampler


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = debug_config()
    model = NVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 1)), True,
    )
    return model, variables


def test_mesh_sampler_bitwise_matches_single_device(model_and_vars):
    model, variables = model_and_vars
    B = 8
    mesh = make_mesh(n_data=8)
    kd = jax.random.key_data(jax.random.PRNGKey(3))

    single = jax.jit(build_sampler(model, variables, B))
    sharded = build_mesh_sampler(model, variables, B, mesh)

    t = jnp.float32(0.8)
    a = np.asarray(single(kd, t))
    b = np.asarray(sharded(kd, t))
    assert a.shape == b.shape == (B, 32, 32, 1)
    np.testing.assert_array_equal(a, b)


def test_mesh_sampler_per_sample_temperature(model_and_vars):
    model, variables = model_and_vars
    B = 8
    mesh = make_mesh(n_data=4)  # rows split 2-per-device
    kd = jax.random.key_data(jax.random.PRNGKey(5))
    t_vec = jnp.linspace(0.5, 1.2, B).astype(jnp.float32)

    single = jax.jit(build_sampler(model, variables, B))
    sharded = build_mesh_sampler(
        model, variables, B, mesh, per_sample_temperature=True)

    np.testing.assert_array_equal(
        np.asarray(single(kd, t_vec)), np.asarray(sharded(kd, t_vec)))


def test_mesh_sampler_rejects_indivisible_batch(model_and_vars):
    model, variables = model_and_vars
    with pytest.raises(ValueError, match="not divisible"):
        build_mesh_sampler(model, variables, 6, make_mesh(n_data=4))


def test_batching_runtime_over_mesh_sampler(model_and_vars):
    """The dynamic-batching server runs unchanged over the DP sampler, and
    its served rows replay bitwise against a direct sharded call."""
    from nvae_tpu.serving_runtime import BatchingSampler

    model, variables = model_and_vars
    B = 8
    mesh = make_mesh(n_data=8)
    sharded = build_mesh_sampler(
        model, variables, B, mesh, per_sample_temperature=True)

    with BatchingSampler(sharded, B, max_delay_ms=0, seed=11) as srv:
        f1 = srv.submit(5, 0.7)
        f2 = srv.submit(3, 1.0)
        a, b = f1.result(timeout=120), f2.result(timeout=120)

    key = jax.random.fold_in(jax.random.PRNGKey(11), 0)
    direct = np.asarray(sharded(
        jax.random.key_data(key),
        jnp.asarray([0.7] * 5 + [1.0] * 3, jnp.float32),
    ))
    np.testing.assert_array_equal(a, direct[:5])
    np.testing.assert_array_equal(b, direct[5:])
    assert srv.stats.dispatches == 1 and srv.stats.occupancy == 1.0

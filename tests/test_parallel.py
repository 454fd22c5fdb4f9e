"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvae_tpu.parallel import data_sharding, make_mesh, replicated, shard_batch


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_batch_sharded_across_devices():
    mesh = make_mesh()
    n = mesh.shape["data"]
    batch = jnp.arange(n * 4 * 2, dtype=jnp.float32).reshape(n * 4, 2)
    sharded = shard_batch(batch, mesh)
    assert len(sharded.sharding.device_set) == n
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(batch))


def test_global_reduction_over_sharded_batch():
    """A jitted global mean over a data-sharded batch equals the host value —
    XLA inserts the cross-device reduction (the framework's 'communication
    backend', SURVEY §2.7)."""
    mesh = make_mesh()
    n = mesh.shape["data"]
    batch = jax.random.normal(jax.random.PRNGKey(0), (n * 8, 16))
    sharded = shard_batch(batch, mesh)
    f = jax.jit(lambda x: jnp.mean(x * 2.0 + 1.0))
    np.testing.assert_allclose(
        float(f(sharded)), float(np.mean(np.asarray(batch) * 2 + 1)), rtol=1e-5
    )


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(len(jax.devices()))

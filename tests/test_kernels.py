"""Pallas kernel correctness tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nvae_tpu.kernels import se_gate, se_gate_reference


def test_se_gate_matches_reference():
    rng = jax.random.PRNGKey(0)
    b, h, w, c, hd = 4, 8, 8, 128, 8
    x = jax.random.normal(rng, (b, h, w, c))
    w1 = jax.random.normal(jax.random.fold_in(rng, 1), (c, hd)) * 0.1
    b1 = jax.random.normal(jax.random.fold_in(rng, 2), (hd,)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(rng, 3), (hd, c)) * 0.1
    b2 = jax.random.normal(jax.random.fold_in(rng, 4), (c,)) * 0.1
    got = se_gate(x, w1, b1, w2, b2, interpret=True)
    want = se_gate_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_depthwise5x5_matches_lax():
    from nvae_tpu.kernels import depthwise_conv5x5, depthwise_conv5x5_reference

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (3, 8, 8, 256))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (5, 5, 1, 256)) * 0.2
    got = depthwise_conv5x5(x, k, interpret=True)
    want = depthwise_conv5x5_reference(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

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


def _fused_case(shape, fuse_swish, with_bias, seed=0):
    from nvae_tpu.kernels.depthwise import (
        depthwise_conv5x5_reference,
        fused_swish_depthwise5x5,
    )

    rng = np.random.RandomState(seed)
    b, h, w, c = shape
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    k = jnp.asarray(rng.randn(5, 5, 1, c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32) if with_bias else None

    def ref(x, k, bias):
        s = jax.nn.silu(x) if fuse_swish else x
        y = depthwise_conv5x5_reference(s, k)
        return y + bias if with_bias else y

    def pal(x, k, bias):
        return fused_swish_depthwise5x5(
            x, k, bias, fuse_swish=fuse_swish, interpret=True
        )

    args = (x, k, bias) if with_bias else (x, k, None)
    np.testing.assert_allclose(
        np.asarray(pal(*args)), np.asarray(ref(*args)), atol=2e-5
    )

    # Gradients through a nonlinear scalarization exercise dx, dW (and db).
    diff_args = (x, k, bias) if with_bias else (x, k)

    def loss_ref(a):
        return jnp.sum(jnp.sin(ref(*a, *(() if with_bias else (None,)))))

    def loss_pal(a):
        return jnp.sum(jnp.sin(pal(*a, *(() if with_bias else (None,)))))

    g_ref = jax.grad(loss_ref)(diff_args)
    g_pal = jax.grad(loss_pal)(diff_args)
    for a, b_ in zip(g_ref, g_pal):
        denom = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b_) / denom, np.asarray(a) / denom, atol=3e-5
        )


def test_fused_dw_fwd_and_grads():
    _fused_case((4, 8, 8, 128), fuse_swish=True, with_bias=True)


def test_fused_dw_plain_no_bias():
    _fused_case((3, 8, 8, 128), fuse_swish=False, with_bias=False)


def test_fused_dw_nonmultiple_lane_channels():
    # The postprocess hidden width is 192 = 1.5 x 128 lanes.
    _fused_case((2, 16, 16, 192), fuse_swish=True, with_bias=False, seed=3)


def test_fused_dw_tiny_spatial():
    # Generative-cell shapes: 4x4 spatial, wide channels.
    _fused_case((6, 4, 4, 256), fuse_swish=True, with_bias=True, seed=4)


def test_model_pallas_flag_equivalence():
    """use_pallas_kernels must not change model math (same params, same
    forward output) — interpret mode on CPU."""
    from nvae_tpu.config import debug_config
    from nvae_tpu.models import NVAE

    cfg_off = debug_config(postprocess_5x5_depthwise=True)
    cfg_on = debug_config(
        postprocess_5x5_depthwise=True, use_pallas_kernels=True
    )
    model_off, model_on = NVAE(cfg_off), NVAE(cfg_on)
    rng = jax.random.PRNGKey(0)
    x = (jax.random.uniform(jax.random.fold_in(rng, 1), (2, 32, 32, 1)) > 0.5
         ).astype(jnp.float32)
    keys = {"params": rng, "sample": jax.random.fold_in(rng, 2)}
    v_off = model_off.init(keys, x, train=False)
    out_off = model_off.apply(
        v_off, x, train=False, rngs={"sample": jax.random.fold_in(rng, 3)}
    )
    out_on = model_on.apply(
        v_off, x, train=False, rngs={"sample": jax.random.fold_in(rng, 3)}
    )
    # Identical param tree (the flag must not move parameters around).
    assert jax.tree_util.tree_structure(v_off) == jax.tree_util.tree_structure(
        model_on.init(keys, x, train=False)
    )
    np.testing.assert_allclose(
        np.asarray(out_on.logits), np.asarray(out_off.logits), atol=1e-4
    )

"""Shape/dtype and behavioral tests for the NN block library."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvae_tpu.nn import (
    DecoderSampleCombiner,
    DepthwiseConv,
    EncDecCombiner,
    EncoderResidualCell,
    FactorizedDownsample,
    GenerativeResidualCell,
    PostprocessCell,
    Rescaler,
    SNConv,
    SqueezeExcitation,
    StemCell,
    spectral_sigma,
)


def _init_apply(module, *args, train=True, rng=0):
    key = jax.random.PRNGKey(rng)
    variables = module.init({"params": key}, *args, train)
    out, mutated = module.apply(
        variables, *args, train, mutable=["batch_stats", "spectral"]
    )
    return out, variables, mutated


class TestSNConv:
    def test_shapes_and_stride(self):
        x = jnp.ones((2, 8, 8, 3))
        out, variables, _ = _init_apply(SNConv(16, (3, 3)), x)
        assert out.shape == (2, 8, 8, 16)
        out2, _, _ = _init_apply(SNConv(16, (3, 3), strides=(2, 2)), x)
        assert out2.shape == (2, 4, 4, 16)
        assert "sn_kernel" in variables["params"]

    def test_forward_mode_normalizes_spectrum(self):
        """In forward (parity) mode, repeated applications drive the effective
        kernel toward unit spectral norm."""
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        mod = SNConv(8, (3, 3), mode="forward")
        variables = mod.init({"params": jax.random.PRNGKey(1)}, x, True)
        # Scale the kernel up by 10x; sigma should track it.
        params = jax.tree.map(lambda p: p * 10.0, variables["params"])
        spectral = variables["spectral"]
        for _ in range(20):
            _, m = mod.apply(
                {"params": params, "spectral": spectral}, x, True,
                mutable=["spectral"],
            )
            spectral = m["spectral"]
        kernel = params["sn_kernel"]
        u = jax.tree.leaves(spectral)[0]
        sigma, _ = spectral_sigma(kernel, u)
        # True largest singular value via SVD of the reshaped kernel.
        true_sigma = np.linalg.svd(
            np.asarray(kernel).reshape(-1, 8), compute_uv=False
        )[0]
        np.testing.assert_allclose(float(sigma), true_sigma, rtol=1e-3)

    def test_projection_mode_is_plain_conv(self):
        x = jnp.ones((1, 4, 4, 2))
        mod = SNConv(4, (1, 1), mode="projection")
        variables = mod.init({"params": jax.random.PRNGKey(0)}, x, True)
        assert "spectral" not in variables  # no per-forward state


def test_depthwise_conv_is_per_channel():
    x = jnp.zeros((1, 8, 8, 6)).at[:, :, :, 0].set(1.0)
    mod = DepthwiseConv((5, 5), use_bias=False)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x)
    out = mod.apply(variables, x)
    assert out.shape == (1, 8, 8, 6)
    # Channels 1.. receive nothing from channel 0 (no cross-channel mixing).
    np.testing.assert_allclose(out[..., 1:], 0.0, atol=1e-6)


def test_squeeze_excitation_gates_channels():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 32))
    mod = SqueezeExcitation()
    variables = mod.init({"params": jax.random.PRNGKey(1)}, x)
    out = mod.apply(variables, x)
    assert out.shape == x.shape
    # Gate is in (0, 1): output magnitude never exceeds input magnitude.
    assert float(jnp.max(jnp.abs(out) - jnp.abs(x))) <= 1e-6
    # Hidden width = max(32//16, 4) = 4.
    assert variables["params"]["Dense_0"]["kernel"].shape == (32, 4)


class TestRescaler:
    def test_down(self):
        x = jnp.ones((2, 8, 8, 4))
        out, _, _ = _init_apply(Rescaler(8, 2, up=False), x)
        assert out.shape == (2, 4, 4, 8)

    def test_up(self):
        x = jnp.ones((2, 4, 4, 8))
        out, _, _ = _init_apply(Rescaler(4, 2, up=True), x)
        assert out.shape == (2, 8, 8, 4)


def test_factorized_downsample():
    x = jnp.ones((2, 16, 16, 8))
    out, _, _ = _init_apply(FactorizedDownsample(10), x)
    assert out.shape == (2, 8, 8, 10)


class TestCells:
    def test_stem_cell_identity_skip(self):
        x = jnp.ones((2, 8, 8, 8))
        out, _, _ = _init_apply(StemCell(8, n_nodes=2, downsample=False), x)
        assert out.shape == x.shape

    def test_stem_cell_downsample(self):
        x = jnp.ones((2, 8, 8, 4))
        out, _, _ = _init_apply(StemCell(8, n_nodes=2, downsample=True), x)
        assert out.shape == (2, 4, 4, 8)

    def test_encoder_cell(self):
        x = jnp.ones((2, 8, 8, 16))
        out, _, _ = _init_apply(EncoderResidualCell(16), x)
        assert out.shape == x.shape

    def test_generative_cell(self):
        x = jnp.ones((2, 4, 4, 16))
        out, variables, _ = _init_apply(GenerativeResidualCell(16), x)
        assert out.shape == x.shape
        # Expansion conv has 6x16 output features.
        k = variables["params"]["SNConv_0"]["sn_kernel"]
        assert k.shape == (1, 1, 16, 96)

    def test_combiners(self):
        enc = jnp.ones((2, 4, 4, 16))
        dec = jnp.ones((2, 4, 4, 16))
        out, _, _ = _init_apply(EncDecCombiner(16), enc, dec)
        assert out.shape == enc.shape
        z = jnp.ones((2, 4, 4, 5))
        out2, _, _ = _init_apply(DecoderSampleCombiner(16), enc, z)
        assert out2.shape == (2, 4, 4, 16)

    def test_postprocess_cell_upscale(self):
        x = jnp.ones((2, 4, 4, 16))
        out, _, _ = _init_apply(PostprocessCell(8, n_nodes=1, upscale=True), x)
        assert out.shape == (2, 8, 8, 8)


def test_batchnorm_updates_stats_in_train_only():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 3)) * 3 + 1
    cell = EncoderResidualCell(3)
    variables = cell.init({"params": jax.random.PRNGKey(1)}, x, True)
    _, m = cell.apply(variables, x, True, mutable=["batch_stats"])
    stats0 = jax.tree.leaves(variables["batch_stats"])
    stats1 = jax.tree.leaves(m["batch_stats"])
    changed = any(
        not np.allclose(a, b) for a, b in zip(stats0, stats1)
    )
    assert changed
    # Eval mode: no mutation needed.
    out_eval = cell.apply(variables, x, False)
    assert out_eval.shape == x.shape


def test_split_precision_bn_matches_flax():
    """bf16-apply BatchNorm: identical variable tree to the fp32 path, same
    running-stat update semantics, and outputs equal within bf16 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nvae_tpu.nn.blocks import BatchNorm

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 4, 4, 16)) * 3.0 + 1.5

    bn32 = BatchNorm(jnp.float32)
    bn16 = BatchNorm(jnp.bfloat16)
    v32 = bn32.init(rng, x, True)
    v16 = bn16.init(rng, x, True)
    assert jax.tree_util.tree_structure(v32) == jax.tree_util.tree_structure(
        v16
    )

    y32, m32 = bn32.apply(v32, x, True, mutable=["batch_stats"])
    y16, m16 = bn16.apply(v32, x, True, mutable=["batch_stats"])
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y16, np.float32), np.asarray(y32), atol=0.05
    )
    # Running stats update identically (both computed in fp32).
    for a, b in zip(
        jax.tree.leaves(m32["batch_stats"]), jax.tree.leaves(m16["batch_stats"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)

    # Eval mode uses the running stats.
    v16_run = {"params": v32["params"], "batch_stats": m16["batch_stats"]}
    y_eval = bn16.apply(v16_run, x, False)
    assert y_eval.dtype == jnp.bfloat16
    y_eval32 = bn32.apply(
        {"params": v32["params"], "batch_stats": m32["batch_stats"]}, x, False
    )
    np.testing.assert_allclose(
        np.asarray(y_eval, np.float32), np.asarray(y_eval32), atol=0.05
    )


def test_bn_apply_dtype_model_config():
    """Model builds and runs with bn_apply_dtype=bfloat16; same param tree."""
    import jax
    import jax.numpy as jnp

    from nvae_tpu.config import debug_config
    from nvae_tpu.models import NVAE

    cfg32 = debug_config(compute_dtype="bfloat16")
    cfg16 = debug_config(compute_dtype="bfloat16", bn_apply_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    x = (jax.random.uniform(jax.random.fold_in(rng, 1), (2, 32, 32, 1)) > 0.5
         ).astype(jnp.float32)
    keys = {"params": rng, "sample": jax.random.fold_in(rng, 2)}
    v32 = NVAE(cfg32).init(keys, x, train=False)
    out = NVAE(cfg16).apply(
        v32, x, train=False, rngs={"sample": jax.random.fold_in(rng, 3)}
    )
    assert jnp.isfinite(out.logits).all()
    assert jax.tree_util.tree_structure(v32) == jax.tree_util.tree_structure(
        NVAE(cfg16).init(keys, x, train=False)
    )

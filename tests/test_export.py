"""Serving-export round trip: jax.export StableHLO artifact == live model."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "export_serving",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "export_serving.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_export_roundtrip_matches_live_model(tmp_path):
    """Export the debug sampler (weights baked in), reload from the file,
    and compare outputs to the live model bitwise-closely — the artifact
    must be a faithful standalone copy of the sampling program."""
    mod = _load_tool()
    out = str(tmp_path / "sampler.shlo")
    mod.main(["--out", out, "--debug", "--batch", "4",
              "--platforms", "cpu", "--check"])
    assert os.path.exists(out) and os.path.getsize(out) > 0
    assert os.path.exists(out + ".json")

    # Standalone load path (no model/config objects in scope).
    from jax import export as jexport

    with open(out, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    kd = jax.random.key_data(jax.random.PRNGKey(7))
    images = np.asarray(exported.call(kd, jnp.float32(0.7)))
    assert images.shape[0] == 4
    assert np.isfinite(images).all()
    # Temperature is traced, not baked: different temperatures produce
    # different outputs from the same artifact and the same key.
    hot = np.asarray(exported.call(kd, jnp.float32(10.0)))
    assert np.abs(images - hot).max() > 0


def test_export_load_and_run_cli(tmp_path):
    """The --load --run path runs an artifact with only jax + the file."""
    mod = _load_tool()
    out = str(tmp_path / "sampler.shlo")
    mod.main(["--out", out, "--debug", "--batch", "2",
              "--platforms", "cpu"])
    images = mod.main(["--load", out, "--run", "--temperature", "0.9"])
    assert images.shape[0] == 2
    assert np.isfinite(images).all()


def test_export_cross_platform_lowering(tmp_path):
    """One artifact lowered for BOTH cpu and tpu from a CPU-only host —
    jax.export's multi-platform lowering is what lets the artifact be
    produced anywhere and served on the TPU fleet."""
    mod = _load_tool()
    out = str(tmp_path / "sampler_xplat.shlo")
    mod.main(["--out", out, "--debug", "--batch", "2",
              "--platforms", "cpu,tpu"])
    from jax import export as jexport

    with open(out, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    assert set(exported.platforms) == {"cpu", "tpu"}
    kd = jax.random.key_data(jax.random.PRNGKey(1))
    images = np.asarray(exported.call(kd, jnp.float32(1.0)))
    assert images.shape[0] == 2


def test_export_bf16_weights_smaller_and_finite(tmp_path):
    """--weights_dtype bfloat16 bakes half-width weight constants: the
    artifact shrinks materially and still produces finite images."""
    mod = _load_tool()
    f32 = str(tmp_path / "f32.shlo")
    bf16 = str(tmp_path / "bf16.shlo")
    mod.main(["--out", f32, "--debug", "--batch", "2", "--platforms", "cpu"])
    mod.main(["--out", bf16, "--debug", "--batch", "2", "--platforms", "cpu",
              "--weights_dtype", "bfloat16"])
    assert os.path.getsize(bf16) < 0.8 * os.path.getsize(f32)

    from jax import export as jexport

    with open(bf16, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    kd = jax.random.key_data(jax.random.PRNGKey(3))
    images = np.asarray(exported.call(kd, jnp.float32(1.0)))
    assert np.isfinite(images).all()


def test_export_int8_weights_quality_and_size(tmp_path):
    """--weights_dtype int8: weight-only quantized serving.  The artifact
    shrinks vs fp32, outputs stay finite and close to the full-precision
    sampler (per-output-channel symmetric quantization of the large
    kernels only)."""
    mod = _load_tool()
    f32 = str(tmp_path / "f32.shlo")
    i8 = str(tmp_path / "int8.shlo")
    # min_elems=4096 keeps the tiny debug model's kernels float — use the
    # library path to force quantization of everything eligible, then the
    # CLI path for the end-to-end flow.
    mod.main(["--out", f32, "--debug", "--batch", "2", "--platforms", "cpu"])
    mod.main(["--out", i8, "--debug", "--batch", "2", "--platforms", "cpu",
              "--weights_dtype", "int8", "--check"])
    assert os.path.getsize(i8) <= os.path.getsize(f32)

    from jax import export as jexport

    with open(i8, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    kd = jax.random.key_data(jax.random.PRNGKey(5))
    images = np.asarray(exported.call(kd, jnp.float32(1.0)))
    assert np.isfinite(images).all()


def test_quantize_params_int8_library():
    """quantize/dequantize round trip: large leaves become int8 + scales
    with bounded error; small leaves untouched; sampler outputs with
    quantized weights track the full-precision outputs."""
    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.serving import (
        QuantizedLeaf,
        build_sampler,
        dequantize_params,
        quantize_params_int8,
    )
    from nvae_tpu.train.state import create_train_state

    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    model, state, _ = create_train_state(
        cfg, TrainConfig(epochs=1, batch_size=4), total_steps=1
    )
    qparams = quantize_params_int8(state.params, min_elems=64)
    q_leaves = [
        x for x in jax.tree.leaves(
            qparams, is_leaf=lambda x: isinstance(x, QuantizedLeaf)
        )
        if isinstance(x, QuantizedLeaf)
    ]
    assert q_leaves, "nothing was quantized at min_elems=64"
    assert all(l.q.dtype == jnp.int8 for l in q_leaves)

    # Elementwise error bound: |w - q*s| <= s/2 per output channel.
    deq = dequantize_params(qparams)
    for (pa, orig), (pb, back) in zip(
        jax.tree_util.tree_leaves_with_path(state.params),
        jax.tree_util.tree_leaves_with_path(deq),
    ):
        assert pa == pb
        if orig.ndim >= 2 and orig.size >= 64:
            absmax = np.abs(np.asarray(orig)).max()
            assert np.abs(np.asarray(orig) - np.asarray(back)).max() <= (
                absmax / 127.0
            ) * 0.51 + 1e-8

    # Behavioral closeness of the quantized sampler.
    kd = jax.random.key_data(jax.random.PRNGKey(0))
    t = jnp.float32(0.9)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    qvariables = {"params": qparams, "batch_stats": state.batch_stats}
    full = np.asarray(jax.jit(build_sampler(model, variables, 4))(kd, t))
    quant = np.asarray(jax.jit(build_sampler(model, qvariables, 4))(kd, t))
    assert np.isfinite(quant).all()
    # Outputs are probabilities in [0,1]; weight-only int8 shifts them a
    # little but must not change the picture.
    assert np.abs(full - quant).mean() < 0.05


def test_serving_library_api(tmp_path):
    """nvae_tpu.serving as a library: build_sampler/cast_params/
    export_sampler/load_artifact round-trip without the CLI wrapper."""
    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.serving import (
        build_sampler,
        cast_params,
        export_sampler,
        load_artifact,
    )
    from nvae_tpu.train.state import create_train_state

    cfg = debug_config(
        n_encoder_channels=8, n_decoder_channels=8,
        n_groups_per_scale=(1, 1), n_latent_per_group=2,
    )
    model, state, _ = create_train_state(
        cfg, TrainConfig(epochs=1, batch_size=4), total_steps=1
    )
    variables = {
        "params": cast_params(state.params, "bfloat16"),
        "batch_stats": state.batch_stats,
    }
    blob = export_sampler(model, variables, 4, platforms=("cpu",))
    path = tmp_path / "lib.shlo"
    path.write_bytes(blob)

    kd = jax.random.key_data(jax.random.PRNGKey(0))
    live = jax.jit(build_sampler(model, variables, 4))(kd, jnp.float32(0.9))
    served = load_artifact(str(path)).call(kd, jnp.float32(0.9))
    np.testing.assert_allclose(
        np.asarray(live), np.asarray(served), atol=1e-5
    )


def test_export_per_sample_temperature(tmp_path):
    """--per_sample_temperature exports an f32[batch] temperature input:
    a uniform vector matches the scalar artifact bitwise (same key), and a
    mixed vector gives each served row its own temperature."""
    mod = _load_tool()
    scalar_out = str(tmp_path / "scalar.shlo")
    vec_out = str(tmp_path / "vec.shlo")
    mod.main(["--out", scalar_out, "--debug", "--batch", "4",
              "--platforms", "cpu"])
    mod.main(["--out", vec_out, "--debug", "--batch", "4",
              "--platforms", "cpu", "--per_sample_temperature", "--check"])

    from jax import export as jexport

    with open(scalar_out, "rb") as f:
        scalar_art = jexport.deserialize(bytearray(f.read()))
    with open(vec_out, "rb") as f:
        vec_art = jexport.deserialize(bytearray(f.read()))
    assert vec_art.in_avals[1].shape == (4,)
    kd = jax.random.key_data(jax.random.PRNGKey(11))
    a = np.asarray(scalar_art.call(kd, jnp.float32(0.8)))
    b = np.asarray(vec_art.call(kd, jnp.full((4,), 0.8, jnp.float32)))
    np.testing.assert_array_equal(a, b)
    # Mixed batch: hot rows differ from the uniform-0.8 call, and the
    # load_and_run CLI broadcasts its scalar --temperature to the vector.
    mixed = np.asarray(
        vec_art.call(kd, jnp.asarray([0.8, 0.8, 5.0, 5.0], jnp.float32))
    )
    np.testing.assert_array_equal(mixed[:2], b[:2])
    assert np.abs(mixed[2:] - b[2:]).max() > 0
    images = mod.main(["--load", vec_out, "--run", "--temperature", "0.9"])
    assert images.shape[0] == 4


def test_export_uint8_output(tmp_path):
    """--output_dtype uint8 bakes device-side pixel quantization into the
    artifact: outputs are uint8 round(p*255), equal to quantizing the f32
    artifact's output on the host (within one u8 level at rounding
    boundaries).  This is the 4x-smaller device->host transfer the serving
    tier uses (serving.quantize_output)."""
    mod = _load_tool()
    f32_out = str(tmp_path / "sampler_f32.shlo")
    u8_out = str(tmp_path / "sampler_u8.shlo")
    mod.main(["--out", f32_out, "--debug", "--batch", "4",
              "--platforms", "cpu"])
    mod.main(["--out", u8_out, "--debug", "--batch", "4",
              "--platforms", "cpu", "--output_dtype", "uint8", "--check"])

    import json

    meta = json.load(open(u8_out + ".json"))
    assert meta["output_dtype"] == "uint8"

    from jax import export as jexport

    with open(u8_out, "rb") as f:
        u8 = jexport.deserialize(bytearray(f.read()))
    with open(f32_out, "rb") as f:
        f32 = jexport.deserialize(bytearray(f.read()))
    kd = jax.random.key_data(jax.random.PRNGKey(3))
    t = jnp.float32(0.8)
    got = np.asarray(u8.call(kd, t))
    assert got.dtype == np.uint8
    ref = np.asarray(f32.call(kd, t))
    want = np.round(np.clip(ref, 0.0, 1.0) * 255.0).astype(np.uint8)
    # Same program up to the output cast: off-by-one only at exact .5
    # rounding boundaries (and none expected on identical arithmetic).
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
    assert (got == want).mean() > 0.999

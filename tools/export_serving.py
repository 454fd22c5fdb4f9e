"""Export the sampler as a self-contained StableHLO serving artifact.

The reference has no deployment story: serving means dragging the whole
TF2/Keras model code plus a Python process around (``train.py --mode
sample``).  The TPU-native equivalent is ``jax.export``: the jitted
sampling function — weights baked in as constants — is lowered ONCE to
versioned StableHLO and written to a single file.  A serving host then
needs only that file and jax (no model code, no config, no checkpoint
tree) and can run it on CPU or TPU: the artifact is cross-lowered for
both platforms by default.

Shapes are static by design (XLA serving discipline): one artifact per
(batch, temperature-schedule) serving shape; temperature itself stays a
*traced scalar* argument, so one artifact serves any temperature without
recompilation — same rule as the live model (CLAUDE.md).

Produce (fresh-init demo weights, or --ckpt for trained ones):

    python tools/export_serving.py --out sampler.shlo --batch 144 [--debug]
    python tools/export_serving.py --out sampler.shlo --ckpt /abs/path/ckpt

Serve (standalone — note: only jax + the file):

    python tools/export_serving.py --load sampler.shlo --run --temperature 0.8

The exported callable signature is ``(rng_key_data, temperature) ->
images`` with ``rng_key_data = jax.random.key_data(key)`` (uint32[2]) so
the artifact has no custom-PRNG-type surface.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _honor_env_platform():
    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


def export_artifact(args):
    import jax
    import jax.numpy as jnp

    from nvae_tpu.config import ModelConfig, TrainConfig
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    if args.preset:
        from nvae_tpu.presets import get_preset

        model_cfg, train_cfg = get_preset(args.preset)
    elif args.debug:
        from nvae_tpu.config import debug_config

        model_cfg = debug_config(
            n_encoder_channels=8, n_decoder_channels=8,
            n_groups_per_scale=(1, 1), n_latent_per_group=2,
        )
        train_cfg = TrainConfig(epochs=1, batch_size=16)
    else:
        model_cfg = ModelConfig()
        train_cfg = TrainConfig()

    model, state, _ = create_train_state(model_cfg, train_cfg, total_steps=1)
    if args.ckpt:
        from nvae_tpu.train.checkpoint import restore_checkpoint

        state = restore_checkpoint(os.path.abspath(args.ckpt), state)
        print(f"Restored checkpoint: {args.ckpt} (step {int(state.step)})")

    from nvae_tpu.serving import (
        build_sampler,
        cast_params,
        export_sampler,
        quantize_params_int8,
    )

    params = state.params
    if args.weights_dtype == "int8":
        # Weight-only int8: large kernels -> int8 + per-channel scales
        # (4x smaller constants than fp32), dequantized inside the traced
        # function; compute stays in the model's compute dtype.
        params = quantize_params_int8(params)
    elif args.weights_dtype:
        params = cast_params(params, args.weights_dtype)
    variables = {
        "params": params,
        "batch_stats": state.batch_stats,
        **({"spectral": state.spectral} if state.spectral else {}),
    }
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]
    blob = export_sampler(
        model, variables, args.batch, args.scale_temperatures, platforms,
        per_sample_temperature=args.per_sample_temperature,
        output_dtype=args.output_dtype,
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    meta = {
        "batch": args.batch,
        "image_size": model_cfg.image_size,
        "in_channels": model_cfg.in_channels,
        "platforms": platforms,
        "scale_temperatures": args.scale_temperatures,
        "weights_dtype": args.weights_dtype or "float32",
        "output_dtype": args.output_dtype or "float32",
        "per_sample_temperature": args.per_sample_temperature,
        "calling_convention": (
            "(rng_key_data_uint32, temperature_f32[batch]) -> images"
            if args.per_sample_temperature
            else "(rng_key_data_uint32, temperature_f32) -> images"
        ),
        "bytes": len(blob),
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps({"exported": args.out, **meta}))

    if args.check:
        # Round-trip: deserialize and compare against the live model.
        import numpy as np

        from nvae_tpu.serving import load_artifact

        sampler = build_sampler(
            model, variables, args.batch, args.scale_temperatures,
            output_dtype=args.output_dtype,
        )
        kd = jax.random.key_data(jax.random.PRNGKey(42))
        t = jnp.float32(0.8)
        if args.per_sample_temperature:
            t = jnp.full((args.batch,), 0.8, jnp.float32)
        live = np.asarray(jax.jit(sampler)(kd, t)).astype(np.float64)
        served = np.asarray(
            load_artifact(args.out).call(kd, t)).astype(np.float64)
        # uint8 output: a float delta of ~1e-7 at a round(p*255) boundary
        # legitimately flips one u8 level, so the bound there is 1 level.
        np.testing.assert_allclose(
            live, served, atol=1.0 if args.output_dtype == "uint8" else 1e-5
        )
        print(f"check OK: artifact == live model "
              f"(max |d| = {float(abs(live - served).max()):.2e})")
        if args.weights_dtype == "int8":
            # Quantization-quality report: int8 serving outputs vs the
            # full-precision weights, same key/temperature.
            full_vars = {**variables, "params": state.params}
            full = jax.jit(
                build_sampler(
                    model, full_vars, args.batch, args.scale_temperatures,
                    output_dtype=args.output_dtype,
                )
            )(kd, t)
            d = np.abs(np.asarray(full).astype(np.float64)
                       - np.asarray(served).astype(np.float64))
            print(json.dumps({
                "int8_vs_fp_max_abs": float(d.max()),
                "int8_vs_fp_mean_abs": float(d.mean()),
            }))
    return args.out


def load_and_run(args):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from nvae_tpu.serving import load_artifact

    exported = load_artifact(args.load)
    kd = jax.random.key_data(jax.random.PRNGKey(args.seed))
    t_aval = exported.in_avals[1]
    t = jnp.full(t_aval.shape, args.temperature, jnp.float32)  # () or (B,)
    images = exported.call(kd, t)
    images = np.asarray(images)
    print(json.dumps({
        "artifact": args.load,
        "images": list(images.shape),
        "mean": float(images.mean()),
        "min": float(images.min()),
        "max": float(images.max()),
    }))
    if args.save_png:
        from nvae_tpu.utils.images import save_images_to_dir

        os.makedirs(args.save_png, exist_ok=True)
        save_images_to_dir(images, args.save_png)
        print(f"wrote {images.shape[0]} PNGs to {args.save_png}")
    return images


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--out", default="sampler.shlo",
                   help="Artifact path to write")
    p.add_argument("--load", default="",
                   help="Load an existing artifact instead of exporting")
    p.add_argument("--run", action="store_true",
                   help="With --load: run the artifact once")
    p.add_argument("--ckpt", default="", help="Orbax checkpoint to bake in")
    p.add_argument("--preset", default="")
    p.add_argument("--debug", action="store_true",
                   help="Tiny debug model (fast; for tests/smoke)")
    p.add_argument("--batch", type=int, default=16,
                   help="Static serving batch size")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--scale_temperatures", type=float, nargs="*",
                   default=None,
                   help="Annealed sampling: one temperature per decoder "
                        "scale, baked into the artifact")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="Comma-separated lowering targets")
    p.add_argument("--weights_dtype", default="",
                   help="Cast baked-in weights: bfloat16 halves the "
                        "artifact and serving HBM (BN stats stay fp32); "
                        "int8 = weight-only per-channel quantization of "
                        "the large kernels (4x smaller constants, "
                        "dequantized on the fly; prints a quality report "
                        "with --check)")
    p.add_argument("--per_sample_temperature", action="store_true",
                   help="Export temperature as f32[batch] instead of a "
                        "scalar: each served row gets its own temperature "
                        "(mixed-temperature request batches share one "
                        "dispatch)")
    p.add_argument("--output_dtype", default="", choices=["", "uint8"],
                   help="Bake device-side pixel quantization into the "
                        "artifact: outputs round(p*255) as uint8 — 4x less "
                        "device->host transfer per dispatch (the serving "
                        "bottleneck through a remote TPU runtime)")
    p.add_argument("--check", action="store_true",
                   help="After export: deserialize + compare vs live model")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_png", default="",
                   help="With --load --run: write sampled PNGs here")
    args = p.parse_args(argv)

    _honor_env_platform()
    if args.load:
        return load_and_run(args)
    return export_artifact(args)


if __name__ == "__main__":
    main()

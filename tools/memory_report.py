"""Per-device memory accounting for a training configuration.

The reference has no memory tooling at all (single device, eager TF —
OOM is discovered by crashing).  Here the question "does this config fit,
and what does --fsdp / --grad_accum buy me?" is answered without touching
the accelerator:

- **State bytes (exact):** params / optimizer moments / BN+spectral stats
  are counted per-device from the chosen sharding layout's addressable
  shards — replicated DP stores every byte on every chip, FSDP
  (``shard_state_fsdp``) stores ~1/N of every large leaf.
- **Step working set (XLA):** the jitted train step is AOT-lowered and
  compiled (no execution), and XLA's ``memory_analysis()`` reports the
  compiler's own argument/output/temp/peak byte counts for one device.
  Works on the TPU backend; on CPU the analysis may be absent and is
  reported as null.

Usage (8 virtual devices, compare the two layouts):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/memory_report.py --layout replicated
    ... --layout fsdp
    ... --layout fsdp --grad_accum 4          # microbatched step
    ... --preset celeba64 --batch_size 64     # any preset

Prints ONE JSON object; pipe through `python -m json.tool` for pretty
output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _honor_env_platform():
    # Plugin sitecustomize files (axon) force jax_platforms at import and
    # silently override the JAX_PLATFORMS env var — re-assert it (same fix
    # as __graft_entry__._honor_env_platform).
    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


def _tree_bytes(tree) -> int:
    import jax

    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(tree)
        if hasattr(leaf, "size")
    )


def _device0_bytes(tree) -> int:
    """Bytes actually resident on device 0 (addressable shard sizes)."""
    import jax

    total = 0
    for leaf in jax.tree.leaves(tree):
        shards = getattr(leaf, "addressable_shards", None)
        if shards:
            d0 = [s for s in shards if s.device == jax.devices()[0]]
            if d0:
                total += d0[0].data.size * leaf.dtype.itemsize
        elif hasattr(leaf, "size"):
            total += leaf.size * leaf.dtype.itemsize
    return total


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--layout", default="replicated",
                   choices=["replicated", "fsdp", "tp", "single"],
                   help="Parameter layout: replicated DP, FSDP/ZeRO-3, "
                        "tensor-parallel wide kernels, or single device")
    p.add_argument("--preset", default="",
                   help="Named preset (nvae_tpu/presets.py); default is the "
                        "reference MNIST config")
    p.add_argument("--batch_size", type=int, default=0,
                   help="Global batch (0 = config default)")
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="Data-axis size (0 = all devices; tp uses half for "
                        "the model axis)")
    p.add_argument("--no_compile", action="store_true",
                   help="Skip the AOT step compile (state bytes only)")
    p.add_argument("--debug", action="store_true",
                   help="Tiny debug model (fast; for tests/smoke)")
    p.add_argument("--min_size", type=int, default=65536,
                   help="FSDP: leaves under this many elements stay "
                        "replicated (shard_state_fsdp default)")
    args = p.parse_args(argv)

    _honor_env_platform()
    import jax
    import jax.numpy as jnp

    from nvae_tpu.config import ModelConfig, TrainConfig
    from nvae_tpu.parallel import (
        data_sharding,
        make_mesh,
        shard_state,
        shard_state_fsdp,
        shard_state_tp,
    )
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step
    from nvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    n_dev = len(jax.devices())

    if args.preset:
        from nvae_tpu.presets import get_preset

        model_cfg, train_cfg = get_preset(args.preset)
    elif args.debug:
        from nvae_tpu.config import debug_config

        model_cfg = debug_config(
            n_encoder_channels=8, n_decoder_channels=8,
            n_groups_per_scale=(1, 1), n_latent_per_group=2,
        )
        train_cfg = TrainConfig(
            epochs=1, batch_size=16, step_based_warmup=True
        )
    else:
        model_cfg = ModelConfig()
        train_cfg = TrainConfig()
    if args.batch_size:
        import dataclasses as _dc

        train_cfg = _dc.replace(train_cfg, batch_size=args.batch_size)
    if args.grad_accum > 1:
        import dataclasses as _dc

        train_cfg = _dc.replace(train_cfg, grad_accum=args.grad_accum)

    model, state, tx = create_train_state(model_cfg, train_cfg, total_steps=100)

    mesh = None
    if args.layout == "single" or n_dev == 1:
        args.layout = "single"
    elif args.layout == "tp":
        n_data = args.data_parallel or max(n_dev // 2, 1)
        mesh = make_mesh(n_data=n_data, n_model=n_dev // n_data)
        state = shard_state_tp(state, mesh)
    else:
        mesh = make_mesh(n_data=args.data_parallel or n_dev, n_model=1)
        if args.layout == "fsdp":
            state = shard_state_fsdp(state, mesh, min_size=args.min_size)
        else:
            state = shard_state(state, mesh)

    report = {
        "layout": args.layout,
        "n_devices": n_dev,
        "preset": args.preset or "default_mnist",
        "batch_size": train_cfg.batch_size,
        "grad_accum": train_cfg.grad_accum,
        "state_bytes_total": {
            "params": _tree_bytes(state.params),
            "opt_state": _tree_bytes(state.opt_state),
            "batch_stats": _tree_bytes(state.batch_stats),
            "spectral": _tree_bytes(state.spectral),
        },
        "state_bytes_device0": {
            "params": _device0_bytes(state.params),
            "opt_state": _device0_bytes(state.opt_state),
            "batch_stats": _device0_bytes(state.batch_stats),
            "spectral": _device0_bytes(state.spectral),
        },
    }
    report["state_bytes_total"]["all"] = sum(
        report["state_bytes_total"].values()
    )
    report["state_bytes_device0"]["all"] = sum(
        report["state_bytes_device0"].values()
    )

    if not args.no_compile:
        step = make_train_step(
            model, tx, train_cfg, total_steps=100, steps_per_epoch=10,
            donate=False,
        )
        batch = jnp.zeros(
            (
                train_cfg.batch_size,
                model_cfg.image_size,
                model_cfg.image_size,
                model_cfg.in_channels,
            ),
            jnp.float32,
        )
        if mesh is not None:
            batch = jax.device_put(batch, data_sharding(mesh))
        compiled = jax.jit(step).lower(state, batch).compile()
        mem = None
        try:
            ma = compiled.memory_analysis()
            if ma is not None:
                mem = {
                    k: int(getattr(ma, k))
                    for k in (
                        "argument_size_in_bytes",
                        "output_size_in_bytes",
                        "temp_size_in_bytes",
                        "alias_size_in_bytes",
                        "generated_code_size_in_bytes",
                    )
                    if hasattr(ma, k)
                }
                if mem:
                    # peak ~= live args + outputs + XLA temp buffers, minus
                    # donated/aliased bytes counted twice.
                    mem["peak_estimate_in_bytes"] = (
                        mem.get("argument_size_in_bytes", 0)
                        + mem.get("output_size_in_bytes", 0)
                        + mem.get("temp_size_in_bytes", 0)
                        - mem.get("alias_size_in_bytes", 0)
                    )
        except Exception:
            mem = None
        report["step_memory_analysis"] = mem

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()

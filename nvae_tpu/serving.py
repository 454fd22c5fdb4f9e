"""Serving: export the sampler as a self-contained StableHLO artifact.

The reference's only "deployment" is ``train.py --mode sample`` — the full
TF2/Keras stack, model code, and checkpoint tree on every serving host.
The TPU-native replacement is ``jax.export``: lower the jitted sampling
function ONCE (weights baked in as constants) to versioned StableHLO,
cross-lowered for cpu+tpu, and ship a single file.  A serving host needs
only jax + that file.

Two properties fall out of the XLA serving discipline for free:

- **Dead-code elimination**: sampling never touches the encoder, so the
  exported constants are only the decoder + postprocess weights (the
  trained 40M parity checkpoint exports to a 49 MB bf16 artifact).
- **Traced temperature**: temperature stays a runtime scalar argument, so
  one artifact serves any temperature without recompilation — the same
  rule as the live model (see CLAUDE.md).

CLI wrapper: ``tools/export_serving.py``.  Round-trip equality and
cross-platform lowering are tested in ``tests/test_export.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def build_sampler(model, variables, n_samples: int,
                  scale_temperatures: Optional[Sequence[float]] = None):
    """Close model + weights into a pure ``(key_data, temperature) -> images``.

    ``key_data`` is ``jax.random.key_data(key)`` (uint32[2]) so the exported
    calling convention has no custom-PRNG-type surface; ``temperature`` is a
    traced f32 scalar.
    """

    def sampler(key_data: jax.Array, temperature: jax.Array) -> jax.Array:
        rng = jax.random.wrap_key_data(key_data)
        images, _, _, _ = model.apply(
            variables,
            n_samples,
            temperature,
            True,
            tuple(scale_temperatures) if scale_temperatures else None,
            method=type(model).sample,
            rngs={"sample": rng},
        )
        return images

    return sampler


def cast_params(params, dtype):
    """Cast floating param leaves (serving-memory lever: bf16 halves the
    artifact and serving HBM).  BatchNorm running stats should stay fp32 —
    they sit in tiny-epsilon arithmetic where bf16 visibly shifts outputs —
    so cast ``params`` only, not the full variables dict."""
    wd = jnp.dtype(dtype)
    return jax.tree.map(
        lambda x: x.astype(wd)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )


def export_sampler(model, variables, n_samples: int,
                   scale_temperatures: Optional[Sequence[float]] = None,
                   platforms: Sequence[str] = ("cpu", "tpu")) -> bytes:
    """Lower the sampler for ``platforms`` and serialize to bytes."""
    from jax import export as jexport

    sampler = build_sampler(model, variables, n_samples, scale_temperatures)
    key_data = jax.random.key_data(jax.random.PRNGKey(0))
    exported = jexport.export(jax.jit(sampler), platforms=list(platforms))(
        jax.ShapeDtypeStruct(key_data.shape, key_data.dtype),
        jax.ShapeDtypeStruct((), jnp.float32),
    )
    return exported.serialize()


def load_artifact(path: str):
    """Deserialize an exported artifact; returns the jax.export Exported
    object (``.call(key_data, temperature)`` runs it on the local backend)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))

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

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scale"],
    meta_fields=["orig_dtype"],
)
@dataclasses.dataclass
class QuantizedLeaf:
    """A weight tensor stored as int8 + per-output-channel fp32 scales.

    Weight-only symmetric quantization: ``w ≈ q * scale`` with
    ``q ∈ [-127, 127]``.  The artifact bakes the int8 constants (4x smaller
    than fp32, 2x smaller than bf16); dequantization is a single fused
    elementwise multiply at serving time, so the matmuls/convs still run in
    the model's compute dtype on the MXU.
    """

    q: jax.Array       # int8, original shape
    scale: jax.Array   # float32, broadcastable (per-output-channel)
    orig_dtype: str    # dequantization target dtype


def quantize_params_int8(params, min_elems: int = 4096):
    """Per-output-channel symmetric int8 quantization of large weight
    tensors (conv kernels / dense matrices); small leaves (biases, BN
    scales, spectral ``u`` vectors) stay in their float dtype — they are
    a rounding-error share of the bytes and the most precision-sensitive.
    """

    def leaf(x):
        if not (
            hasattr(x, "dtype")
            and jnp.issubdtype(x.dtype, jnp.floating)
            and x.size >= min_elems
            and x.ndim >= 2
        ):
            return x
        absmax = jnp.max(
            jnp.abs(x), axis=tuple(range(x.ndim - 1)), keepdims=True
        )
        scale = jnp.maximum(absmax.astype(jnp.float32), 1e-12) / 127.0
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale), -127, 127
        ).astype(jnp.int8)
        return QuantizedLeaf(q=q, scale=scale, orig_dtype=str(x.dtype))

    return jax.tree.map(leaf, params)


def dequantize_params(params):
    """Inverse of :func:`quantize_params_int8` (identity on float leaves).
    Traced inside the exported function, so the artifact carries the int8
    constants and XLA fuses the multiply into the consumers."""

    def leaf(x):
        if isinstance(x, QuantizedLeaf):
            return (x.q.astype(jnp.float32) * x.scale).astype(x.orig_dtype)
        return x

    return jax.tree.map(
        leaf, params, is_leaf=lambda x: isinstance(x, QuantizedLeaf)
    )


def build_sampler(model, variables, n_samples: int,
                  scale_temperatures: Optional[Sequence[float]] = None):
    """Close model + weights into a pure ``(key_data, temperature) -> images``.

    ``key_data`` is ``jax.random.key_data(key)`` (uint32[2]) so the exported
    calling convention has no custom-PRNG-type surface; ``temperature`` is a
    traced f32 scalar.  ``variables["params"]`` may contain
    :class:`QuantizedLeaf` entries (int8 weight-only serving) — they are
    dequantized inside the traced function.
    """

    def sampler(key_data: jax.Array, temperature: jax.Array) -> jax.Array:
        rng = jax.random.wrap_key_data(key_data)
        vs = dict(variables)
        vs["params"] = dequantize_params(variables["params"])
        images, _, _, _ = model.apply(
            vs,
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


def build_mesh_sampler(model, variables, n_samples: int, mesh,
                       per_sample_temperature: bool = False,
                       scale_temperatures: Optional[Sequence[float]] = None):
    """Data-parallel sampler over a device mesh: params replicated, the
    served batch's rows split over the ``"data"`` axis, one jitted program
    with GSPMD partitioning the whole generative chain.

    The reference serves on however many GPUs one eager ``model.sample``
    call touches (one, ``/root/reference/train.py:76-80``); the TPU serving
    scale-out is this — same program, ``n_devices``× the batch per dispatch.
    Output is bitwise-equal to the single-device sampler (partitionable
    threefry: the per-row random bits don't depend on the mesh), so the
    dynamic-batching runtime's replay guarantee survives sharding —
    tested in tests/test_serving_mesh.py.

    ``n_samples`` must be divisible by the data-axis size.  Returns a
    jitted ``(key_data, temperature) -> images`` with committed shardings
    (callers pass ordinary host arrays; outputs gather on ``np.asarray``).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    n_data = mesh.shape["data"]
    if n_samples % n_data:
        raise ValueError(
            f"serving batch {n_samples} not divisible by data axis {n_data}")
    repl = NamedSharding(mesh, PartitionSpec())
    rows = NamedSharding(mesh, PartitionSpec("data"))
    variables = jax.device_put(variables, repl)
    fn = build_sampler(model, variables, n_samples, scale_temperatures)
    return jax.jit(
        fn,
        in_shardings=(repl, rows if per_sample_temperature else repl),
        out_shardings=rows,
    )


def export_sampler(model, variables, n_samples: int,
                   scale_temperatures: Optional[Sequence[float]] = None,
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   per_sample_temperature: bool = False) -> bytes:
    """Lower the sampler for ``platforms`` and serialize to bytes.

    ``per_sample_temperature`` exports the temperature input as an
    ``f32[n_samples]`` vector instead of a scalar — each row of the served
    batch gets its own temperature, so one artifact call serves a mixed-
    temperature request batch (the dynamic-batching serving case: requests
    with different temperatures share a dispatch instead of fragmenting
    into per-temperature batches).
    """
    from jax import export as jexport

    sampler = build_sampler(model, variables, n_samples, scale_temperatures)
    key_data = jax.random.key_data(jax.random.PRNGKey(0))
    t_shape = (n_samples,) if per_sample_temperature else ()
    exported = jexport.export(jax.jit(sampler), platforms=list(platforms))(
        jax.ShapeDtypeStruct(key_data.shape, key_data.dtype),
        jax.ShapeDtypeStruct(t_shape, jnp.float32),
    )
    return exported.serialize()


def load_artifact(path: str):
    """Deserialize an exported artifact; returns the jax.export Exported
    object (``.call(key_data, temperature)`` runs it on the local backend)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))

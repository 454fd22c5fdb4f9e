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


def quantize_output(images: jax.Array, output_dtype: str) -> jax.Array:
    """Device-side output quantization for the serving tier.

    ``output_dtype="uint8"`` rounds the sampler's [0, 1] pixel
    probabilities to ``round(p * 255)`` **on the device**, so the
    per-dispatch device→host transfer carries 1 byte/pixel instead of 4 —
    the transfer is the serving bottleneck through a remote TPU runtime
    (see README's serving numbers), and u8 is what image consumers want
    anyway (the PNG path re-derives exactly these values on the host,
    ``utils/images.py:to_uint8``).  ``""``/``"float32"`` is the identity.
    """
    if output_dtype in ("", "float32"):
        return images
    if output_dtype == "uint8":
        x = jnp.clip(images.astype(jnp.float32), 0.0, 1.0)
        return jnp.round(x * 255.0).astype(jnp.uint8)
    raise ValueError(f"unknown output_dtype {output_dtype!r}")


def build_sampler(model, variables, n_samples: int,
                  scale_temperatures: Optional[Sequence[float]] = None,
                  output_dtype: str = ""):
    """Close model + weights into a pure ``(key_data, temperature) -> images``.

    ``key_data`` is ``jax.random.key_data(key)`` (uint32[2]) so the exported
    calling convention has no custom-PRNG-type surface; ``temperature`` is a
    traced f32 scalar.  ``variables["params"]`` may contain
    :class:`QuantizedLeaf` entries (int8 weight-only serving) — they are
    dequantized inside the traced function.  ``output_dtype="uint8"``
    quantizes the output pixels on the device (see :func:`quantize_output`).
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
        return quantize_output(images, output_dtype)

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


def variables_from_state(state, use_ema: bool = False) -> dict:
    """The serving variables dict for a train state; ``use_ema`` serves the
    optimizer's EMA parameter average instead of the raw params (raises if
    the state was trained without ``--ema_decay``)."""
    params = state.params
    if use_ema:
        from nvae_tpu.train.optim import find_ema_params

        params = find_ema_params(state.opt_state)
        if params is None:
            raise ValueError(
                "no EMA in the optimizer state — train with --ema_decay"
            )
    return {
        "params": params,
        "batch_stats": state.batch_stats,
        **({"spectral": state.spectral} if state.spectral else {}),
    }


class ReloadableSampler:
    """Hot-reloadable ``(key_data, temperature) -> images`` sampler.

    :func:`build_sampler` closes the weights into the traced function —
    right for ``jax.export`` (constants fold into the artifact), wrong for
    a long-lived server that must follow a training run: a new closure is a
    new jit cache entry, i.e. a full recompile (~minutes through the v5e
    tunnel).  Here the variables ride as a jit ARGUMENT: :meth:`swap` is
    one host→device transfer and the compiled program is untouched (same
    pytree structure + avals → same cache entry).  The dynamic-batching
    worker reads its callable once per dispatch, so the swap boundary is a
    dispatch boundary — in-flight dispatches finish on the old weights.

    ``serve_dtype`` applies the weight-only serving casts (bf16 / int8) to
    every tree swapped in, so a reload keeps the serving memory footprint.

    The sampler is **shape-polymorphic over the served batch**: a vector
    temperature's length picks the batch size, so one ReloadableSampler
    backs multi-shape serving (``BatchingSampler(batch_size=[144, 576])``)
    — jit compiles one program per distinct shape (cached thereafter) and
    every program reads the SAME device weights, so a :meth:`swap` is
    still one host→device transfer no matter how many shapes serve.
    A scalar temperature samples the constructor ``n_samples``.
    """

    def __init__(self, model, variables, n_samples: int,
                 scale_temperatures: Optional[Sequence[float]] = None,
                 serve_dtype: str = "", output_dtype: str = ""):
        import threading

        self._model = model
        self.n_samples = int(n_samples)
        self._st = (tuple(float(t) for t in scale_temperatures)
                    if scale_temperatures else None)
        self.serve_dtype = serve_dtype
        self.output_dtype = output_dtype
        self.generation = 0
        self.step = -1  # checkpoint step served; -1 = constructor weights
        self._lock = threading.Lock()

        def fn(variables, key_data, temperature):
            # Batch size from the temperature vector (static per jit
            # specialization); scalar temperature = constructor default.
            n = (temperature.shape[0] if getattr(temperature, "ndim", 0)
                 else self.n_samples)
            rng = jax.random.wrap_key_data(key_data)
            vs = dict(variables)
            vs["params"] = dequantize_params(variables["params"])
            images, _, _, _ = model.apply(
                vs, n, temperature, True, self._st,
                method=type(model).sample, rngs={"sample": rng},
            )
            return quantize_output(images, output_dtype)

        self._fn = jax.jit(fn)
        # One explicit device for every weight generation: mixing committed
        # (orbax-restored) and uncommitted (freshly-initialized) trees would
        # split the jit cache — i.e. a silent recompile on first reload.
        self._device = jax.local_devices()[0]
        self._variables = jax.device_put(self._prep(variables), self._device)

    def _prep(self, variables: dict) -> dict:
        params = variables["params"]
        if self.serve_dtype == "bfloat16":
            params = cast_params(params, jnp.bfloat16)
        elif self.serve_dtype == "int8":
            params = quantize_params_int8(params)
        elif self.serve_dtype:
            raise ValueError(f"unknown serve_dtype {self.serve_dtype!r}")
        return {**variables, "params": params}

    def __call__(self, key_data, temperature):
        return self._fn(self._variables, key_data, temperature)

    def swap(self, variables: dict, step: Optional[int] = None) -> None:
        """Serve ``variables`` (raw, un-cast) from the next dispatch on."""
        staged = jax.device_put(self._prep(variables), self._device)
        with self._lock:
            self._variables = staged
            self.generation += 1
            if step is not None:
                self.step = int(step)

    @property
    def info(self) -> dict:
        with self._lock:
            return {
                "step": self.step,
                "generation": self.generation,
                "serve_dtype": self.serve_dtype or "float32",
                "output_dtype": self.output_dtype or "float32",
            }


def make_checkpoint_reloader(sampler: ReloadableSampler, ckpt_dir: str,
                             state_template, use_ema: bool = False):
    """The serving tier's ``POST /reload`` hook: restore a step from the
    checkpoint directory configured at startup (never a client-supplied
    path) and swap it into ``sampler``.  ``req`` keys: ``step`` (int,
    default latest), ``use_ema`` (bool, default the server's startup
    setting).  Returns the JSON-able reload record."""
    import os

    from nvae_tpu.train.checkpoint import restore_checkpoint

    ckpt_dir = os.path.abspath(ckpt_dir)

    def reload(req: dict) -> dict:
        step = req.get("step")
        if step is not None and not isinstance(step, int):
            raise ValueError(f"step must be an int, got {step!r}")
        ema = req.get("use_ema", use_ema)
        if not isinstance(ema, bool):
            raise ValueError(f"use_ema must be a bool, got {ema!r}")
        if req.get("if_newer") and step is None:
            # Follow mode (the server's checkpoint-dir poller): reload only
            # when the trainer has written a step beyond the one serving.
            from nvae_tpu.train.checkpoint import latest_step

            newest = latest_step(ckpt_dir)
            if newest is None or newest <= sampler.step:
                return {**sampler.info, "skipped": True}
        state = restore_checkpoint(ckpt_dir, state_template, step)
        sampler.swap(variables_from_state(state, ema), step=int(state.step))
        return {**sampler.info, "use_ema": ema}

    return reload


def build_mesh_sampler(model, variables, n_samples: int, mesh,
                       per_sample_temperature: bool = False,
                       scale_temperatures: Optional[Sequence[float]] = None,
                       output_dtype: str = ""):
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
    fn = build_sampler(model, variables, n_samples, scale_temperatures,
                       output_dtype=output_dtype)
    return jax.jit(
        fn,
        in_shardings=(repl, rows if per_sample_temperature else repl),
        out_shardings=rows,
    )


def export_sampler(model, variables, n_samples: int,
                   scale_temperatures: Optional[Sequence[float]] = None,
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   per_sample_temperature: bool = False,
                   output_dtype: str = "") -> bytes:
    """Lower the sampler for ``platforms`` and serialize to bytes.

    ``per_sample_temperature`` exports the temperature input as an
    ``f32[n_samples]`` vector instead of a scalar — each row of the served
    batch gets its own temperature, so one artifact call serves a mixed-
    temperature request batch (the dynamic-batching serving case: requests
    with different temperatures share a dispatch instead of fragmenting
    into per-temperature batches).  ``output_dtype="uint8"`` bakes the
    device-side pixel quantization into the artifact (1 byte/pixel off the
    device — see :func:`quantize_output`).
    """
    from jax import export as jexport

    sampler = build_sampler(model, variables, n_samples, scale_temperatures,
                            output_dtype=output_dtype)
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

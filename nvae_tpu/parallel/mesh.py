"""Device mesh + sharding helpers — the framework's parallelism layer.

The reference is single-device with eager execution and no collectives
(SURVEY §2.7).  Here parallelism is declarative: a ``jax.sharding.Mesh`` with
``("data", "model")`` axes, batch arrays sharded over ``data``, parameters
replicated (the model fits one chip at reference scale; the ``model`` axis is
reserved for tensor parallelism on larger configs).  XLA/GSPMD inserts the
gradient ``psum`` and cross-replica BatchNorm reductions over ICI — there is
no hand-written communication anywhere, by design.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = 0, n_model: int = 1, devices=None
) -> Mesh:
    """Build a ("data", "model") mesh.  ``n_data=0`` uses every device."""
    devices = devices if devices is not None else jax.devices()
    if n_data <= 0:
        n_data = len(devices) // n_model
    n = n_data * n_model
    grid = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading axis split across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh):
    """Replicate the train state across the mesh (DP layout).

    Requires a data-only mesh (``model`` axis of size 1).  Measured GSPMD
    miscompile otherwise (jax 0.8 CPU backend): with params fully
    replicated on a ("data">1, "model">1) mesh, the grouped-convolution
    gradient (depthwise 5x5, ``batch_group_count`` lowering) double-counts
    across the model axis — caught by the SGD lockstep in
    ``__graft_entry__._sgd_lockstep`` (grad_norm 389 vs 292 on an
    otherwise bit-identical step; every other grad leaf at 1e-8 noise).
    For DP+TP meshes use :func:`shard_state_tp`, whose layout compiles
    correctly.
    """
    if mesh.shape.get("model", 1) > 1:
        raise ValueError(
            "shard_state is the pure-DP layout; this mesh has a model axis "
            f"of size {mesh.shape['model']}. Use shard_state_tp (replicated "
            "params over a >1 model axis miscompile the grouped-conv "
            "gradient — see docstring)."
        )
    return jax.device_put(state, replicated(mesh))


def tp_param_sharding(params, mesh: Mesh, min_features: int = 512):
    """Tensor-parallel layout: shard wide conv kernels' output-feature dim
    over the ``model`` axis; everything else replicated.

    Targets the 6x-expansion 1x1 convolutions of the generative/postprocess
    cells (the widest matmuls in the network).  XLA/GSPMD inserts the
    all-gathers/reduce-scatters; no hand-written collectives.  Returns a
    pytree of NamedShardings congruent with ``params``.
    """
    n_model = mesh.shape["model"]

    def leaf_sharding(path, leaf):
        if (
            n_model > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim == 4
            and leaf.shape[-1] >= min_features
            and leaf.shape[-1] % n_model == 0
        ):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_state_tp(state, mesh: Mesh, min_features: int = 512):
    """DP + TP layout: wide kernels sharded over 'model', rest replicated.

    Optimizer state (Adamax moments, spectral u) follows the replicated
    layout — the moments for sharded kernels are re-sharded lazily by GSPMD
    on first use.
    """
    params_sharding = tp_param_sharding(state.params, mesh, min_features)
    state = state.replace(
        params=jax.device_put(state.params, params_sharding)
    )
    rest = replicated(mesh)
    return state.replace(
        step=jax.device_put(state.step, rest),
        epoch=jax.device_put(state.epoch, rest),
        batch_stats=jax.device_put(state.batch_stats, rest),
        spectral=jax.device_put(state.spectral, rest),
        opt_state=jax.device_put(state.opt_state, rest),
        rng=jax.device_put(state.rng, rest),
    )


def _fsdp_spec(shape, n_shard: int, min_size: int):
    """Shape-based FSDP spec: shard the largest ``data``-divisible dim.

    Pure function of the leaf shape, so applying it independently to
    ``params`` and to the optimizer moments (which are param-congruent
    trees) yields IDENTICAL layouts — the elementwise Adamax update then
    compiles shard-local with no resharding.  Leaves below ``min_size``
    elements (biases, BN scales, 1-D spectral ``u`` vectors) stay
    replicated: sharding them saves nothing and adds collectives.
    """
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    cands = [i for i, d in enumerate(shape) if d % n_shard == 0 and d >= n_shard]
    if not cands:
        return P()
    # Largest dim wins; tie-break toward the trailing (feature/lane) dim.
    best = max(cands, key=lambda i: (shape[i], i))
    spec = [None] * len(shape)
    spec[best] = "data"
    return P(*spec)


def fsdp_sharding(tree, mesh: Mesh, min_size: int = 65536):
    """Pytree of NamedShardings for the FSDP (ZeRO-3) layout.

    Every array leaf with >= ``min_size`` elements is split along its
    largest ``data``-divisible dimension across the ``data`` axis;
    everything else is replicated.  The reference has no counterpart
    (single-device, SURVEY §2.7); this is the TPU-native way to fit
    models/optimizer state beyond one chip's HBM: XLA/GSPMD inserts the
    per-layer all-gathers in forward/backward and reduce-scatters the
    gradients back to the shards — weights, Adamax moments, and gradients
    are all 1/N per device.
    """
    n = mesh.shape["data"]

    def leaf_sharding(leaf):
        return NamedSharding(
            mesh, _fsdp_spec(getattr(leaf, "shape", ()), n, min_size)
        )

    return jax.tree.map(leaf_sharding, tree)


def shard_state_fsdp(state, mesh: Mesh, min_size: int = 65536):
    """FSDP layout for the full train state: params AND optimizer state
    (Adamax mu/nu, spectral u/sigma) sharded over ``data``; small leaves
    (BN stats, per-forward spectral vectors, counters, RNG) replicated.

    Requires a data-only mesh, like :func:`shard_state` (the model axis
    belongs to :func:`shard_state_tp`; see the miscompile note there).
    Validated by the SGD lockstep in ``__graft_entry__`` and
    ``tests/test_parallel.py`` — every step must match single-device to
    fp32 reduction-order noise.
    """
    if mesh.shape.get("model", 1) > 1:
        raise ValueError(
            "shard_state_fsdp shards over the data axis only; this mesh has "
            f"a model axis of size {mesh.shape['model']}. Compose TP via "
            "shard_state_tp instead."
        )
    rest = replicated(mesh)
    return state.replace(
        params=jax.device_put(
            state.params, fsdp_sharding(state.params, mesh, min_size)
        ),
        opt_state=jax.device_put(
            state.opt_state, fsdp_sharding(state.opt_state, mesh, min_size)
        ),
        step=jax.device_put(state.step, rest),
        epoch=jax.device_put(state.epoch, rest),
        batch_stats=jax.device_put(state.batch_stats, rest),
        spectral=jax.device_put(state.spectral, rest),
        rng=jax.device_put(state.rng, rest),
    )


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, data_sharding(mesh))

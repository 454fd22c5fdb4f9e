"""k-NN precision/recall (Kynkäänniemi et al.) — device-batched.

Re-implements the algorithm the reference vendors from NVIDIA
(``precision_recall.py:16-195``): estimate each distribution's manifold as the
union of hyperspheres with radius = distance to the k-th nearest neighbor,
then measure cross-membership.  The reference's ``DistanceBlock`` splits the
distance matrix across GPUs with explicit ``tf.device`` placement
(``precision_recall.py:34-60``); here the row-batched distance computation is
a jitted XLA program, and passing ``mesh=`` shards the feature matrices'
rows over the mesh's ``data`` axis with a ``NamedSharding`` — GSPMD then
splits every distance matrix across devices and inserts the gather/reduce
collectives (tested at 10k x 10k on an 8-device mesh,
``tests/test_parallel.py``).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Row sentinel for padded samples: far from everything real, but finite so
# fp32 distance algebra stays NaN-free ((1e15)^2 = 1e30 < fp32 max).
_PAD_SENTINEL = 1e15


def pairwise_sq_dists(u: jax.Array, v: jax.Array) -> jax.Array:
    """(N, D), (M, D) -> (N, M) squared Euclidean distances, clamped >= 0
    (reference ``batch_pairwise_distances``, ``precision_recall.py:16-30``)."""
    norm_u = jnp.sum(jnp.square(u), axis=1)[:, None]
    norm_v = jnp.sum(jnp.square(v), axis=1)[None, :]
    # HIGHEST precision: on TPU this selects the fp32 (3-pass bf16) MXU mode —
    # membership tests near hypersphere boundaries need the accuracy.
    cross = jnp.matmul(u, v.T, precision=jax.lax.Precision.HIGHEST)
    d = norm_u - 2.0 * cross + norm_v
    return jnp.maximum(d, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_radii(features: jax.Array, k: int) -> jax.Array:
    """Distance to the k-th nearest *other* sample, per row (the hypersphere
    radii of reference ``ManifoldEstimator.__init__``,
    ``precision_recall.py:93-109``)."""
    d = pairwise_sq_dists(features, features)
    # k+1 smallest includes self (distance 0).
    neg_topk, _ = jax.lax.top_k(-d, k + 1)
    return -neg_topk[:, k]


@functools.partial(jax.jit, static_argnames=("k", "col_batch"))
def _knn_radii_rows(
    rows: jax.Array, features: jax.Array, k: int, col_batch: int
) -> jax.Array:
    """k-NN radii for ``rows`` against the full (sentinel-padded) feature
    set, streaming over column blocks: a running top-(k+1) smallest-distance
    buffer is merged with each (R, col_batch) distance tile, so peak memory
    is O(R * col_batch) instead of O(N^2).  This is the reference's own
    row/col batching (``precision_recall.py:97-106``) as one XLA scan.

    ``features.shape[0]`` must be a multiple of ``col_batch`` (callers pad
    with ``_PAD_SENTINEL`` rows, which sit ~1e30 away and never enter a
    real row's top-k)."""
    n = features.shape[0]
    blocks = features.reshape(n // col_batch, col_batch, features.shape[1])

    def body(best, block):
        d = pairwise_sq_dists(rows, block)  # (R, col_batch)
        merged = jnp.concatenate([best, d], axis=1)
        neg_topk, _ = jax.lax.top_k(-merged, k + 1)
        return -neg_topk, None

    init = jnp.full((rows.shape[0], k + 1), jnp.inf, rows.dtype)
    best, _ = jax.lax.scan(body, init, blocks)
    # best is the k+1 smallest distances ascending, self (0) included.
    return best[:, k]


def _knn_radii_batched(
    features: jax.Array, k: int, row_batch_size: int
) -> jax.Array:
    """Host loop over row blocks of ``_knn_radii_rows`` — bounds the radii
    pass at O(row_batch^2) device memory for any N (the full-matrix
    ``_knn_radii`` needs O(N^2): 40 GB at N=100k)."""
    n, d = features.shape
    col_batch = min(row_batch_size, n)
    pad = (-n) % col_batch
    padded = features
    if pad:
        padded = jnp.concatenate(
            [features, jnp.full((pad, d), _PAD_SENTINEL, features.dtype)]
        )
    out = []
    for i in range(0, n, row_batch_size):
        out.append(
            _knn_radii_rows(
                features[i : i + row_batch_size], padded, k, col_batch
            )
        )
    return jnp.concatenate(out)


@jax.jit
def _membership(eval_feats: jax.Array, ref_feats: jax.Array, radii: jax.Array):
    """For each eval sample: does it fall inside any reference hypersphere?
    (reference ``ManifoldEstimator.evaluate``, ``precision_recall.py:124-139``)."""
    d = pairwise_sq_dists(eval_feats, ref_feats)  # (E, R)
    return jnp.any(d <= radii[None, :], axis=1)


@functools.partial(jax.jit, static_argnames=("col_batch",))
def _membership_rows(
    rows: jax.Array, ref_feats: jax.Array, radii: jax.Array, col_batch: int
) -> jax.Array:
    """Column-streamed membership: OR-accumulate ``any(d <= radius)`` over
    (R, col_batch) distance tiles instead of materializing the full (R, N)
    matrix — O(R * col_batch) memory at any reference-set size (the
    membership-side complement of ``_knn_radii_rows``; at N=1M the full
    tile would be 40 GB per 10k row block).

    ``ref_feats.shape[0]`` must be a multiple of ``col_batch`` (callers pad
    with ``_PAD_SENTINEL`` rows whose radii are <0, so they never admit a
    sample).  A Pallas kernel was considered and skipped: the pass is
    MXU-matmul-bound (the D-deep cross product dwarfs the fused
    compare/reduce epilogue), so XLA's fusion already runs it at
    speed-of-light — same conclusion as the in-model kernels
    (PROFILE.md finding 4)."""
    n = ref_feats.shape[0]
    blocks = ref_feats.reshape(n // col_batch, col_batch, ref_feats.shape[1])
    radii_blocks = radii.reshape(n // col_batch, col_batch)

    def body(inside, block_and_radii):
        block, r = block_and_radii
        d = pairwise_sq_dists(rows, block)  # (R, col_batch)
        return inside | jnp.any(d <= r[None, :], axis=1), None

    init = jnp.zeros((rows.shape[0],), jnp.bool_)
    inside, _ = jax.lax.scan(body, init, (blocks, radii_blocks))
    return inside


def _pad_rows_sharded(x: jax.Array, mesh: Mesh):
    """Pad rows to a multiple of the data-axis size (NamedSharding needs
    even splits) with a far-away sentinel, then shard rows over ``data``.
    Returns (sharded array, original row count)."""
    n_data = mesh.shape["data"]
    n = x.shape[0]
    pad = (-n) % n_data
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad, x.shape[1]), _PAD_SENTINEL, x.dtype)]
        )
    return jax.device_put(x, NamedSharding(mesh, P("data"))), n


def knn_precision_recall_features(
    ref_features,
    eval_features,
    nhood_sizes: Sequence[int] = (3,),
    row_batch_size: int = 10000,
    mesh: Mesh | None = None,
) -> Dict[str, float]:
    """Precision/recall between reference (real) and eval (generated)
    feature sets (reference ``knn_precision_recall_features``,
    ``precision_recall.py:155-195``).

    Precision = fraction of eval samples inside the reference manifold;
    recall = fraction of reference samples inside the eval manifold.

    Returns ``precision``/``recall`` for the FIRST neighborhood size plus
    ``precision_k{k}``/``recall_k{k}`` for every requested k (the reference
    returns per-k arrays, ``precision_recall.py:168-170``).

    ``mesh``: shard the feature matrices' rows over the mesh's ``data``
    axis — the TPU-native form of the reference's multi-GPU
    ``DistanceBlock`` (``precision_recall.py:34-60``).  Padded sentinel
    rows (sharding needs even splits) sit ~1e30 away from the data, so
    they never enter any real sample's k-NN; their own radii are sliced
    off, and padded reference radii are set to -1 so no eval sample can
    land inside them.
    """
    ref = jnp.asarray(ref_features, jnp.float32)
    ev = jnp.asarray(eval_features, jnp.float32)
    n_ref, n_ev = ref.shape[0], ev.shape[0]
    if mesh is not None:
        ref, _ = _pad_rows_sharded(ref, mesh)
        ev, _ = _pad_rows_sharded(ev, mesh)

    state: Dict[str, float] = {}
    for k in nhood_sizes:
        if mesh is None and max(n_ref, n_ev) > row_batch_size:
            # Stream the radii pass over row/col blocks — O(row_batch^2)
            # memory for any N (100k x 100k never materializes).
            ref_radii = _knn_radii_batched(ref, k, row_batch_size)
            ev_radii = _knn_radii_batched(ev, k, row_batch_size)
        else:
            ref_radii = _knn_radii(ref, k)
            ev_radii = _knn_radii(ev, k)
        if mesh is not None:
            # Kill the padded hyperspheres; keep radii row-sharded.
            row_ids_ref = jnp.arange(ref.shape[0])
            row_ids_ev = jnp.arange(ev.shape[0])
            ref_radii = jnp.where(row_ids_ref < n_ref, ref_radii, -1.0)
            ev_radii = jnp.where(row_ids_ev < n_ev, ev_radii, -1.0)
            precision = _membership(ev, ref, ref_radii)[:n_ev]
            recall = _membership(ref, ev, ev_radii)[:n_ref]
        else:
            # Row-batch the cross matrices to bound memory (the reference's
            # row/col batching, precision_recall.py:97-106).  Above
            # row_batch_size columns the inner pass streams column blocks
            # too (_membership_rows), so peak memory is O(row_batch^2) at
            # any N — 1M x 1M never materializes anything bigger than one
            # 10k x 10k tile.
            def batched_membership(a, b, radii):
                nb, d_feat = b.shape
                stream_cols = nb > row_batch_size
                if stream_cols:
                    col_batch = min(row_batch_size, nb)
                    pad = (-nb) % col_batch
                    if pad:
                        b = jnp.concatenate(
                            [b, jnp.full((pad, d_feat), _PAD_SENTINEL,
                                         b.dtype)]
                        )
                        # Sentinel hyperspheres must admit nobody.
                        radii = jnp.concatenate(
                            [radii, jnp.full((pad,), -1.0, radii.dtype)]
                        )
                hits = []
                for i in range(0, a.shape[0], row_batch_size):
                    rows = a[i : i + row_batch_size]
                    hits.append(
                        _membership_rows(rows, b, radii, col_batch)
                        if stream_cols
                        else _membership(rows, b, radii)
                    )
                return jnp.concatenate(hits)

            precision = batched_membership(ev, ref, ref_radii)
            recall = batched_membership(ref, ev, ev_radii)
        state[f"precision_k{k}"] = float(
            jnp.mean(precision.astype(jnp.float32))
        )
        state[f"recall_k{k}"] = float(jnp.mean(recall.astype(jnp.float32)))
    k0 = nhood_sizes[0]
    state["precision"] = state[f"precision_k{k0}"]
    state["recall"] = state[f"recall_k{k0}"]
    return state

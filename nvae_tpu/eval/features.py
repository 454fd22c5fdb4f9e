"""Batched on-device feature extractors for the metric suite.

The reference extracts Inception pool_3 / VGG16 features through a frozen
TF1 graph + Keras ImageNet backbones downloaded at run time
(``fid_utils.py:482-533``, ``evaluate.py:192-215``) and resizes images one at
a time with skimage on host (``evaluate.py:228-234``).  Here extraction is a
single jitted function: device-side resize, grayscale->RGB, backbone forward,
global average pool.

Backbones:

- ``vgg16`` / ``inception`` — real architectures in Flax whose ImageNet
  weights load from a local ``.npz`` (path via ``$NVAE_TPU_WEIGHTS`` or
  argument).  With no weight file the extractor falls back to fixed-seed
  random initialization and *says so*: metric values are then only comparable
  within this framework, not to published FID/P&R numbers (this environment
  has no network egress — SURVEY §6's absolute numbers need the real weights).
- ``random_conv`` — a deliberately small fixed-seed CNN for fast, fully
  deterministic metric plumbing (tests, smoke evals).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class _RandomConvNet(nn.Module):
    """4 strided conv stages + GAP -> 512-d features; fixed seed."""

    features: int = 512

    @nn.compact
    def __call__(self, x):
        widths = (64, 128, 256, self.features)
        for w in widths:
            x = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = jax.nn.relu(x)
        return jnp.mean(x, axis=(1, 2))


class _VGG16Features(nn.Module):
    """VGG16 convolutional trunk + GAP (the reference's P&R/PPL feature
    space, ``evaluate.py:209``: ``VGG16(include_top=False, pooling='avg')``)."""

    @nn.compact
    def __call__(self, x):
        plan = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        for block, (width, convs) in enumerate(plan, start=1):
            for i in range(convs):
                x = nn.Conv(
                    width, (3, 3), padding="SAME",
                    name=f"block{block}_conv{i + 1}",
                )(x)
                x = jax.nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return jnp.mean(x, axis=(1, 2))  # (B, 512)


def _resize_to(x: jax.Array, size: int, method: str = "bilinear") -> jax.Array:
    b, h, w, c = x.shape
    if c == 1:
        x = jnp.repeat(x, 3, axis=-1)
        c = 3
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method=method)
    return x


def _find_weights(name: str, weights_path: Optional[str]) -> Optional[str]:
    candidates = [
        weights_path or "",
        os.path.join(os.environ.get("NVAE_TPU_WEIGHTS", ""), f"{name}.npz"),
        os.path.expanduser(f"~/.keras/models/{name}.npz"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def _load_vgg16_params(path: str):
    """Convert a npz of keras-style weights (block{i}_conv{j}/kernel, /bias)
    into the Flax param tree."""
    with np.load(path) as d:
        params = {}
        for key in d.files:
            layer, kind = key.rsplit("/", 1)
            params.setdefault(layer, {})[kind] = jnp.asarray(d[key])
    return {"params": params}


def backbone_weights_status(
    name: str, weights_path: Optional[str] = None
) -> str:
    """Provenance tag for a backbone's weights, for eval artifacts.

    Returns ``"imagenet"`` when a local converted weight npz exists (the
    ``get_extractor`` load path), ``"random-init"`` when the fixed-seed
    random fallback would be used instead, and ``"fixed-seed"`` for the
    deliberately-random ``random_conv`` backbone.  Recorded in
    ``ModelEvaluation`` so a weightless run's FID/P&R numbers are
    self-describing (VERDICT r4 #7)."""
    if name == "random_conv":
        return "fixed-seed"
    if name in ("vgg16", "vgg"):
        key = "vgg16"
    elif name in ("inception", "inception_v3", "iv3"):
        key = "inception_v3"
    else:
        raise ValueError(f"unknown feature extractor {name!r}")
    return "imagenet" if _find_weights(key, weights_path) else "random-init"


@functools.lru_cache(maxsize=8)
def get_extractor(
    name: str = "random_conv",
    input_size: int = 0,
    weights_path: Optional[str] = None,
    resize_method: str = "bilinear",
    input_scaling: str = "pm1",
) -> Callable[[jax.Array], jax.Array]:
    """Returns a jitted ``(B, H, W, C) in [0,1] -> (B, D)`` feature fn.

    ``input_size=0`` picks the backbone's native size (VGG 224, inception
    299, random_conv 64).  ``resize_method="nearest"`` with
    ``input_size=299`` reproduces the reference's skimage ``order=0``
    resize-to-299 protocol (reference ``evaluate.py:228-234``).
    ``input_scaling``: ``"pm1"`` (default) scales to [-1, 1];
    ``"unit"`` feeds raw [0, 1] images — what the reference does (it calls
    the Keras backbones with NO preprocessing, ``evaluate.py:209-215``).
    """
    if input_scaling not in ("pm1", "unit"):
        raise ValueError(f"unknown input_scaling {input_scaling!r}")
    if name == "random_conv":
        size = input_size or 64
        net = _RandomConvNet()
        variables = net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
        )
    elif name in ("vgg16", "vgg"):
        size = input_size or 224
        net = _VGG16Features()
        path = _find_weights("vgg16", weights_path)
        if path:
            variables = _load_vgg16_params(path)
        else:
            print(
                "[nvae_tpu.eval] WARNING: no local vgg16.npz found — using "
                "fixed-seed random VGG16 features. Metric values are "
                "self-consistent but not comparable to published numbers."
            )
            variables = net.init(
                jax.random.PRNGKey(16), jnp.zeros((1, size, size, 3))
            )
    elif name in ("inception", "inception_v3", "iv3"):
        from nvae_tpu.eval.inception import InceptionV3Features

        size = input_size or 299
        net = InceptionV3Features()
        path = _find_weights("inception_v3", weights_path)
        if path:
            with np.load(path) as d:
                params = {}
                for key in d.files:
                    layer, kind = key.rsplit("/", 1)
                    parts = layer.split("/")
                    node = params
                    for p in parts:
                        node = node.setdefault(p, {})
                    node[kind] = jnp.asarray(d[key])
                variables = {"params": params}
        else:
            print(
                "[nvae_tpu.eval] WARNING: no local inception_v3.npz found — "
                "using fixed-seed random InceptionV3 features. Metric values "
                "are self-consistent but not comparable to published numbers."
            )
            variables = net.init(
                jax.random.PRNGKey(299), jnp.zeros((1, size, size, 3))
            )
    else:
        raise ValueError(f"unknown feature extractor {name!r}")

    @jax.jit
    def extract(x):
        x = _resize_to(x, size, method=resize_method)
        if input_scaling == "pm1":
            x = x * 2.0 - 1.0  # ImageNet-style scaling to [-1, 1]
        return net.apply(variables, x)

    return extract


def extract_features(
    images, extractor: Callable, batch_size: int = 256, mesh=None
) -> np.ndarray:
    """Host loop over device-batched extraction; returns (N, D) numpy.

    ``mesh``: shard each batch's rows over the mesh's ``data`` axis (the
    same TPU-native form as the sharded P&R distance computation,
    ``eval/precision_recall.py``) — GSPMD splits the backbone convolutions
    across devices, so a v5e-8 runs the FID/P&R feature pass ~8x wider.
    Row counts are padded to a multiple of the data-axis size with zero
    images and the padding rows are dropped from the result.  This assumes
    the extractor is strictly PER-SAMPLE (every backbone here is: conv
    stacks + per-image pooling) — an extractor with any cross-batch op
    (e.g. batch-wise feature normalization) would have its real rows
    perturbed by the zero padding rows.
    """
    out = []
    n = len(images)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        sharding = NamedSharding(mesh, P("data", None, None, None))
        n_data = mesh.shape["data"]
    for i in range(0, n, batch_size):
        batch = jnp.asarray(images[i : i + batch_size], dtype=jnp.float32)
        if mesh is None:
            out.append(np.asarray(extractor(batch)))
            continue
        rows = batch.shape[0]
        pad = (-rows) % n_data
        if pad:
            batch = jnp.concatenate(
                [batch, jnp.zeros((pad, *batch.shape[1:]), batch.dtype)]
            )
        batch = jax.device_put(batch, sharding)
        out.append(np.asarray(extractor(batch))[:rows])
    return np.concatenate(out, axis=0)

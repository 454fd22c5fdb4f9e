#!/usr/bin/env python
"""Offline Keras -> npz converter for the metric-backbone weights.

The reference downloads ImageNet backbones at run time (Keras
``VGG16``/``InceptionV3``, reference ``evaluate.py:200-209``); this
environment has no egress, so ``nvae_tpu.eval.features`` loads weights from
local ``vgg16.npz`` / ``inception_v3.npz`` files instead.  This tool produces
those files from a Keras checkpoint, offline:

    python tools/convert_backbone_weights.py vgg16 \
        --weights ~/Downloads/vgg16_weights_tf_dim_ordering_tf_kernels_notop.h5 \
        --out ~/.keras/models/vgg16.npz

    python tools/convert_backbone_weights.py inception_v3 \
        --weights .../inception_v3_weights_tf_dim_ordering_tf_kernels_notop.h5 \
        --out ~/.keras/models/inception_v3.npz

``--weights imagenet`` works when the Keras cache is already populated (or
network is available); ``--weights none`` emits random weights (useful only
for testing the pipeline).  Requires TensorFlow (weight conversion is a
one-time offline step; the metric suite itself never imports TF).

Key format (what ``nvae_tpu/eval/features.py:_load_vgg16_params`` and the
inception loader expect):

- vgg16:        ``block{i}_conv{j}/kernel``, ``block{i}_conv{j}/bias``
- inception_v3: ``{flax_name}/conv/kernel``, ``{flax_name}/bn_mean``,
                ``{flax_name}/bn_var``, ``{flax_name}/bn_beta``
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np


def _flax_inception_names():
    """Our ``InceptionV3Features`` ConvBN module names, in *call order* —
    which equals Keras's ``conv2d_bn`` creation order (verified by the
    output-equality test ``tests/test_backbone_convert.py``)."""
    names = [f"stem_{i}" for i in range(5)]
    for bi in range(3):  # Inception-A (Keras mixed0-2)
        n = f"mixed35_{bi}"
        names += [f"{n}_b0_0", f"{n}_b1_0", f"{n}_b1_1",
                  f"{n}_b2_0", f"{n}_b2_1", f"{n}_b2_2", f"{n}_bp"]
    names += ["red_a_b0", "red_a_b1_0", "red_a_b1_1", "red_a_b1_2"]
    for bi in range(4):  # Inception-B (Keras mixed4-7)
        n = f"mixed17_{bi}"
        names += [f"{n}_b0", f"{n}_b1_0", f"{n}_b1_1", f"{n}_b1_2",
                  f"{n}_b2_0", f"{n}_b2_1", f"{n}_b2_2", f"{n}_b2_3",
                  f"{n}_b2_4", f"{n}_bp"]
    names += ["red_b_b0_0", "red_b_b0_1",
              "red_b_b1_0", "red_b_b1_1", "red_b_b1_2", "red_b_b1_3"]
    for bi in range(2):  # Inception-C (Keras mixed9-10)
        n = f"mixed8_{bi}"
        names += [f"{n}_b0", f"{n}_b1", f"{n}_b1a", f"{n}_b1b",
                  f"{n}_b2_0", f"{n}_b2_1", f"{n}_b2a", f"{n}_b2b",
                  f"{n}_bp"]
    return names


def _creation_index(layer) -> int:
    """Keras auto-names layers ``conv2d``, ``conv2d_1``, ... in creation
    order; ``model.layers`` is topological order, which interleaves branches
    differently — sort by the name suffix to recover creation order."""
    m = re.search(r"_(\d+)$", layer.name)
    return int(m.group(1)) if m else 0


def convert_vgg16(weights: str):
    import tensorflow as tf

    model = tf.keras.applications.VGG16(include_top=False, weights=weights)
    out = {}
    for layer in model.layers:
        if isinstance(layer, tf.keras.layers.Conv2D):
            kernel, bias = layer.get_weights()
            out[f"{layer.name}/kernel"] = kernel.astype(np.float32)
            out[f"{layer.name}/bias"] = bias.astype(np.float32)
    assert len(out) == 26, f"expected 13 conv layers, got {len(out) // 2}"
    return out


def convert_inception_v3(weights: str):
    import tensorflow as tf

    model = tf.keras.applications.InceptionV3(
        include_top=False, weights=weights
    )
    convs = sorted(
        (l for l in model.layers if isinstance(l, tf.keras.layers.Conv2D)),
        key=_creation_index,
    )
    bns = sorted(
        (
            l
            for l in model.layers
            if isinstance(l, tf.keras.layers.BatchNormalization)
        ),
        key=_creation_index,
    )
    flax_names = _flax_inception_names()
    assert len(convs) == len(bns) == len(flax_names), (
        len(convs), len(bns), len(flax_names)
    )
    out = {}
    for name, conv, bn in zip(flax_names, convs, bns):
        (kernel,) = conv.get_weights()
        # Keras conv2d_bn: BN(scale=False) -> weights [beta, mean, var].
        beta, mean, var = bn.get_weights()
        out[f"{name}/conv/kernel"] = kernel.astype(np.float32)
        out[f"{name}/bn_beta"] = beta.astype(np.float32)
        out[f"{name}/bn_mean"] = mean.astype(np.float32)
        out[f"{name}/bn_var"] = var.astype(np.float32)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("backbone", choices=["vgg16", "inception_v3"])
    ap.add_argument(
        "--weights", default="imagenet",
        help="Path to a Keras .h5 weight file, 'imagenet' (uses the local "
             "Keras cache), or 'none' (random weights, pipeline testing "
             "only)",
    )
    ap.add_argument("--out", default="", help="Output .npz path")
    args = ap.parse_args(argv)

    weights = None if args.weights == "none" else args.weights
    if weights and weights not in ("imagenet",) and not os.path.exists(
        os.path.expanduser(weights)
    ):
        sys.exit(f"weight file not found: {weights}")
    if weights and weights != "imagenet":
        weights = os.path.expanduser(weights)

    convert = {"vgg16": convert_vgg16, "inception_v3": convert_inception_v3}[
        args.backbone
    ]
    arrays = convert(weights)
    out = os.path.expanduser(
        args.out or os.path.join("~", ".keras", "models", f"{args.backbone}.npz")
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, **arrays)
    n_params = sum(a.size for a in arrays.values())
    print(
        f"wrote {out}: {len(arrays)} arrays, {n_params / 1e6:.1f}M params "
        f"(source: {args.weights})"
    )


if __name__ == "__main__":
    main()

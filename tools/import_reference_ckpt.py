#!/usr/bin/env python
"""Import a reference (stevensdavid/nvae-tf) Keras TF-format checkpoint into
nvae_tpu parameter trees.

The reference saves object-based TF checkpoints via ``model.save_weights``
(reference ``train.py:13-14,28,55``): variable keys are slash-joined object
paths (attribute names, list indices, ``layer_with_weights-N`` for
Sequential children) ending in ``/.ATTRIBUTES/VARIABLE_VALUE``.  TFA's
``SpectralNormalization`` wrapper contributes ``<sn>/w`` (the kernel —
TFA aliases the wrapped Conv2D's kernel as its own ``w`` attribute, which
wins the object-graph naming), ``<sn>/layer/bias`` and ``<sn>/sn_u``.

This module walks the reference's constructor loops (``preprocess.py:7-39``,
``encoder.py:19-66``, ``decoder.py:9-62``, ``common.py:20-62``,
``postprocess.py:8-111``) to enumerate every checkpoint prefix and pair it
with the corresponding ``nvae_tpu`` tree path:

==============================  =========================================
reference object                nvae_tpu module path
==============================  =========================================
preprocess.pre_process[0]       preprocess/SNConv_0
BNSwishConv #k                  preprocess/StemCell_k
encoder residual cells          encoder/EncoderResidualCell_k (flat)
encoder scale rescaler          encoder/Rescaler_s
encoder final_enc conv          encoder/SNConv_0
EncoderDecoderCombiner #b       decoder/merges_{G-2-b}   (list reversal,
                                reference models.py:93 / decoder.py:82)
sampler.enc_sampler[g]          decoder/heads/enc_heads_g
sampler.dec_sampler[g] (g>=1)   decoder/heads/dec_heads_{g-1}
decoder groups cells            decoder/cells_{g}_{c}
DecoderSampleCombiner #g        decoder/combiners_g
decoder scale rescaler          decoder/rescalers_s
decoder.h                       decoder/h
PostprocessCell #k              postprocess/PostprocessCell_k
postprocess final conv          postprocess/SNConv_0
==============================  =========================================

Value transforms: TF Conv2D kernels are HWIO like flax (no transpose);
DepthwiseConv2D kernels are (kh, kw, C, 1) -> ours (kh, kw, 1, C);
TFA ``u`` vectors are (1, out) -> ours (out,); BN gamma/beta/moving_* ->
scale/bias (params) and mean/var (batch_stats).

Usage:
  python tools/import_reference_ckpt.py --ckpt models/epoch_final \\
      --out imported_state.npz [--preset mnist_step_sn_parity]

Library use:
  params, batch_stats, spectral = import_reference_checkpoint(path, cfg)

The returned trees drop into ``{"params": ..., "batch_stats": ...,
"spectral": ...}`` for a model built with ``spectral_mode="forward"`` (the
reference-parity mode; for other modes the ``u`` vectors are simply unused
and ``spectral`` comes back empty).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"


def _ident(x):
    return x


def _dw_transpose(x):
    # TF DepthwiseConv2D kernel (kh, kw, C, 1) -> flax HWIO depthwise
    # (kh, kw, 1, C).
    return np.transpose(x, (0, 1, 3, 2))


def _u_flatten(x):
    # TFA u: (1, out) -> (out,)
    return np.reshape(x, (-1,))


class Mapping:
    """Accumulates (tf_key -> (collection, flax_path, transform)) entries."""

    def __init__(self, spectral: bool):
        self.spectral = spectral
        self.entries: Dict[str, Tuple[str, Tuple[str, ...], callable]] = {}
        # Checkpoint keys that are understood but intentionally dropped
        # (the u vectors when the target model keeps no spectral state).
        self.ignored: set = set()

    def add(self, tf_key, collection, path, transform=_ident):
        assert tf_key not in self.entries, f"duplicate tf key {tf_key}"
        self.entries[tf_key] = (collection, tuple(path), transform)

    def sn_conv(self, tf_prefix, flax_path, use_bias=True):
        """TFA SpectralNormalization(Conv2D): w / layer/bias / sn_u."""
        self.add(f"{tf_prefix}/w", "params", (*flax_path, "sn_kernel"))
        if use_bias:
            self.add(
                f"{tf_prefix}/layer/bias", "params", (*flax_path, "bias")
            )
        if self.spectral:
            self.add(
                f"{tf_prefix}/sn_u", "spectral", (*flax_path, "u"),
                _u_flatten,
            )
        else:
            self.ignored.add(f"{tf_prefix}/sn_u")

    def bn(self, tf_prefix, flax_path):
        """Keras BatchNormalization -> our BatchNorm wrapper subtree."""
        inner = (*flax_path, "BatchNorm_0")
        self.add(f"{tf_prefix}/gamma", "params", (*inner, "scale"))
        self.add(f"{tf_prefix}/beta", "params", (*inner, "bias"))
        self.add(f"{tf_prefix}/moving_mean", "batch_stats", (*inner, "mean"))
        self.add(
            f"{tf_prefix}/moving_variance", "batch_stats", (*inner, "var")
        )

    def dense(self, tf_prefix, flax_path):
        self.add(f"{tf_prefix}/kernel", "params", (*flax_path, "kernel"))
        self.add(f"{tf_prefix}/bias", "params", (*flax_path, "bias"))

    def se(self, tf_prefix, flax_path):
        """SqueezeExcitation: dense1/dense2 -> Dense_0/Dense_1."""
        base = (*flax_path, "SqueezeExcitation_0")
        self.dense(f"{tf_prefix}/dense1", (*base, "Dense_0"))
        self.dense(f"{tf_prefix}/dense2", (*base, "Dense_1"))

    def rescaler(self, tf_prefix, flax_path):
        """common.Rescaler: bn + SN conv."""
        self.bn(f"{tf_prefix}/bn", (*flax_path, "BatchNorm_0"))
        self.sn_conv(f"{tf_prefix}/conv", (*flax_path, "SNConv_0"))

    def depthwise(self, tf_prefix, flax_path):
        self.add(
            f"{tf_prefix}/depthwise_kernel", "params",
            (*flax_path, "dw_kernel"), _dw_transpose,
        )
        self.add(f"{tf_prefix}/bias", "params", (*flax_path, "bias"))


def _map_bnswishconv(m: Mapping, tf_prefix, flax_path, downsample: bool):
    """preprocess.BNSwishConv (n_nodes=2) -> StemCell: nodes Sequential is
    [BN, Act, SNConv, BN, Act, SNConv] -> layer_with_weights 0..3 (the
    Activation carries no weights)."""
    nodes = f"{tf_prefix}/nodes"
    m.bn(f"{nodes}/layer_with_weights-0", (*flax_path, "BatchNorm_0"))
    m.sn_conv(f"{nodes}/layer_with_weights-1", (*flax_path, "SNConv_0"))
    m.bn(f"{nodes}/layer_with_weights-2", (*flax_path, "BatchNorm_1"))
    m.sn_conv(f"{nodes}/layer_with_weights-3", (*flax_path, "SNConv_1"))
    m.se(f"{tf_prefix}/se", flax_path)
    if downsample:
        # SkipScaler conv1..conv4 -> FactorizedDownsample SNConv_0..3.
        fd = (*flax_path, "FactorizedDownsample_0")
        for i in range(4):
            m.sn_conv(
                f"{tf_prefix}/skip/conv{i + 1}", (*fd, f"SNConv_{i}")
            )


def _map_enc_residual(m: Mapping, tf_prefix, flax_path):
    """encoder.EncodingResidualCell."""
    m.bn(f"{tf_prefix}/batch_norm1", (*flax_path, "BatchNorm_0"))
    m.sn_conv(f"{tf_prefix}/conv1", (*flax_path, "SNConv_0"))
    m.bn(f"{tf_prefix}/batch_norm2", (*flax_path, "BatchNorm_1"))
    m.sn_conv(f"{tf_prefix}/conv2", (*flax_path, "SNConv_1"))
    m.se(f"{tf_prefix}/se", flax_path)


def _map_gen_residual(m: Mapping, tf_prefix, flax_path):
    """decoder.GenerativeResidualCell (MBConv; dw 5x5 un-SN'd)."""
    m.bn(f"{tf_prefix}/batch_norm1", (*flax_path, "BatchNorm_0"))
    m.sn_conv(f"{tf_prefix}/conv1", (*flax_path, "SNConv_0"))
    m.bn(f"{tf_prefix}/batch_norm2", (*flax_path, "BatchNorm_1"))
    m.depthwise(f"{tf_prefix}/depth_conv", (*flax_path, "DepthwiseConv_0"))
    m.bn(f"{tf_prefix}/batch_norm3", (*flax_path, "BatchNorm_2"))
    m.sn_conv(f"{tf_prefix}/conv2", (*flax_path, "SNConv_1"))
    m.bn(f"{tf_prefix}/batch_norm4", (*flax_path, "BatchNorm_3"))
    m.se(f"{tf_prefix}/se", flax_path)


def _map_convbnswish(m: Mapping, tf_prefix, flax_path):
    """postprocess.ConvBNSwish: Sequential [SN conv (no bias), BN, Act]."""
    seq = f"{tf_prefix}/sequence"
    m.sn_conv(
        f"{seq}/layer_with_weights-0", (*flax_path, "SNConv_0"),
        use_bias=False,
    )
    m.bn(f"{seq}/layer_with_weights-1", (*flax_path, "BatchNorm_0"))


def _map_postprocess_node(m: Mapping, tf_prefix, flax_path, upscale: bool):
    """postprocess.PostprocessNode sequence: [Rescaler?][BN, ConvBNSwish x2,
    SN conv(no bias), BN, SE]."""
    seq = f"{tf_prefix}/sequence"
    lw = 0
    if upscale:
        m.rescaler(f"{seq}/layer_with_weights-{lw}", (*flax_path, "Rescaler_0"))
        lw += 1
    m.bn(f"{seq}/layer_with_weights-{lw}", (*flax_path, "BatchNorm_0"))
    lw += 1
    _map_convbnswish(
        m, f"{seq}/layer_with_weights-{lw}", (*flax_path, "ConvBNSwish_0")
    )
    lw += 1
    _map_convbnswish(
        m, f"{seq}/layer_with_weights-{lw}", (*flax_path, "ConvBNSwish_1")
    )
    lw += 1
    m.sn_conv(
        f"{seq}/layer_with_weights-{lw}", (*flax_path, "SNConv_0"),
        use_bias=False,
    )
    lw += 1
    m.bn(f"{seq}/layer_with_weights-{lw}", (*flax_path, "BatchNorm_1"))
    lw += 1
    m.se(f"{seq}/layer_with_weights-{lw}", flax_path)


def reference_variable_map(cfg) -> Mapping:
    """Enumerate every (checkpoint key -> nvae_tpu tree path) pair for a
    reference model of architecture ``cfg`` (an ``nvae_tpu.config
    .ModelConfig``)."""
    m = Mapping(spectral=cfg.spectral_mode == "forward")

    # ---- preprocess (reference preprocess.py:19-34) ----------------------
    pre = "preprocess/pre_process"
    m.sn_conv(f"{pre}/layer_with_weights-0", ("preprocess", "SNConv_0"))
    lw, k = 1, 0
    for _ in range(cfg.n_preprocess_blocks):
        for _ in range(cfg.n_preprocess_cells - 1):
            _map_bnswishconv(
                m, f"{pre}/layer_with_weights-{lw}",
                ("preprocess", f"StemCell_{k}"), downsample=False,
            )
            lw += 1
            k += 1
        _map_bnswishconv(
            m, f"{pre}/layer_with_weights-{lw}",
            ("preprocess", f"StemCell_{k}"), downsample=True,
        )
        lw += 1
        k += 1

    # ---- encoder (reference encoder.py:33-66) ----------------------------
    n_scales = cfg.n_latent_scales
    n_total = cfg.n_total_groups
    gi = 0  # index into encoder.groups
    cell_k = 0  # flat EncoderResidualCell counter
    b = 0  # bottom-up combiner counter
    for scale in range(n_scales):
        n_groups = cfg.n_groups_per_scale[scale]
        for group in range(n_groups):
            for c in range(cfg.res_cells_per_group):
                _map_enc_residual(
                    m,
                    f"encoder/groups/{gi}/layer_with_weights-{c}",
                    ("encoder", f"EncoderResidualCell_{cell_k}"),
                )
                cell_k += 1
            gi += 1
            if not (scale == n_scales - 1 and group == n_groups - 1):
                # EncoderDecoderCombiner #b (bottom-up).  The reference
                # reverses the captured list before the decoder walk
                # (models.py:93), so bottom-up combiner b serves decoder
                # merge index G-2-b.
                m.sn_conv(
                    f"encoder/groups/{gi}/decoder_conv",
                    ("decoder", f"merges_{n_total - 2 - b}", "SNConv_0"),
                )
                gi += 1
                b += 1
        if scale < n_scales - 1:
            m.rescaler(
                f"encoder/groups/{gi}", ("encoder", f"Rescaler_{scale}")
            )
            gi += 1
    m.sn_conv(
        "encoder/final_enc/layer_with_weights-0", ("encoder", "SNConv_0")
    )

    # ---- decoder sampler heads (reference common.py:20-62) ---------------
    for g in range(n_total):
        m.sn_conv(
            f"decoder/sampler/enc_sampler/{g}",
            ("decoder", "heads", f"enc_heads_{g}"),
        )
        if g >= 1:
            m.sn_conv(
                f"decoder/sampler/dec_sampler/{g}/layer_with_weights-0",
                ("decoder", "heads", f"dec_heads_{g - 1}"),
            )

    # ---- decoder tower (reference decoder.py:30-62) ----------------------
    groups_topdown = tuple(reversed(cfg.n_groups_per_scale))
    gi = 0
    g_idx = 0
    for scale in range(n_scales):
        for group in range(groups_topdown[scale]):
            if not (scale == 0 and group == 0):
                for c in range(cfg.res_cells_per_group):
                    _map_gen_residual(
                        m,
                        f"decoder/groups/{gi}/layer_with_weights-{c}",
                        ("decoder", f"cells_{g_idx}_{c}"),
                    )
                gi += 1
            m.sn_conv(
                f"decoder/groups/{gi}/conv",
                ("decoder", f"combiners_{g_idx}", "SNConv_0"),
            )
            gi += 1
            g_idx += 1
        if scale < n_scales - 1:
            m.rescaler(
                f"decoder/groups/{gi}", ("decoder", f"rescalers_{scale}")
            )
            gi += 1
    m.add("decoder/h", "params", ("decoder", "h"))

    # ---- postprocess (reference postprocess.py:13-30) --------------------
    seq = "postprocess/sequence"
    lw = 0
    k = 0
    for _ in range(cfg.n_postprocess_blocks):
        for cell_idx in range(cfg.n_postprocess_cells):
            upscale = cell_idx == 0
            cell_tf = f"{seq}/layer_with_weights-{lw}"
            cell_fx = ("postprocess", f"PostprocessCell_{k}")
            if upscale:
                m.rescaler(f"{cell_tf}/skip", (*cell_fx, "Rescaler_0"))
            _map_postprocess_node(
                m, f"{cell_tf}/sequence/layer_with_weights-0",
                (*cell_fx, "PostprocessNode_0"), upscale=upscale,
            )
            lw += 1
            k += 1
    m.sn_conv(
        f"{seq}/layer_with_weights-{lw}", ("postprocess", "SNConv_0")
    )
    return m


def _insert(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def import_reference_checkpoint(
    ckpt_path: str, cfg, strict: bool = True
) -> Tuple[dict, dict, dict]:
    """Read a reference TF checkpoint and return ``(params, batch_stats,
    spectral)`` trees for an ``nvae_tpu.models.NVAE`` of architecture
    ``cfg``.

    ``strict``: raise if any model weight is missing from the checkpoint or
    any checkpoint weight is unused (bookkeeping keys excluded).
    """
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    shape_map = reader.get_variable_to_shape_map()
    mapping = reference_variable_map(cfg)

    trees = {"params": {}, "batch_stats": {}, "spectral": {}}
    missing: List[str] = []
    for tf_prefix, (collection, path, transform) in mapping.entries.items():
        key = tf_prefix + SUFFIX
        if key not in shape_map:
            missing.append(key)
            continue
        value = transform(reader.get_tensor(key))
        _insert(trees[collection], path, np.asarray(value, np.float32))

    mapped_keys = {
        k + SUFFIX for k in (set(mapping.entries) | mapping.ignored)
    }
    unused = [
        k
        for k in shape_map
        if k not in mapped_keys
        and not k.startswith("_CHECKPOINTABLE_OBJECT_GRAPH")
        and not k.startswith("save_counter")
        # Keras optimizer slots (present when save_weights ran after
        # compile+fit) are intentionally not imported.
        and "OPTIMIZER_SLOT" not in k
        and not k.startswith("optimizer/")
    ]
    if strict and (missing or unused):
        raise ValueError(
            f"checkpoint does not match architecture: "
            f"{len(missing)} expected keys missing "
            f"(first: {missing[:3]}), {len(unused)} checkpoint keys unused "
            f"(first: {unused[:3]})"
        )
    return trees["params"], trees["batch_stats"], trees["spectral"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="TF checkpoint prefix (e.g. models/epoch_final)")
    ap.add_argument("--out", required=True,
                    help="Output .npz with flattened params/batch_stats/"
                         "spectral (slash-joined keys)")
    ap.add_argument("--preset", type=str, default="mnist_step_sn_parity")
    ap.add_argument("--no_strict", action="store_true")
    args = ap.parse_args()

    from nvae_tpu.presets import get_preset

    model_cfg, _ = get_preset(args.preset)
    params, batch_stats, spectral = import_reference_checkpoint(
        args.ckpt, model_cfg, strict=not args.no_strict
    )

    flat = {}
    for name, tree in (
        ("params", params),
        ("batch_stats", batch_stats),
        ("spectral", spectral),
    ):
        def walk(node, path):
            for key, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + (key,))
                else:
                    flat["/".join((name,) + path + (key,))] = v

        walk(tree, ())
    np.savez(args.out, **flat)
    print(f"Imported {len(flat)} arrays -> {args.out}")


if __name__ == "__main__":
    main()

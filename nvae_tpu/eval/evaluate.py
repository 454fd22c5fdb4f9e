"""Evaluation orchestrator (reference ``evaluate_model``, ``evaluate.py:48-108``).

Protocol parity: for each temperature in {0.6, 0.8, 1.0}, ``n_attempts``
rounds of {generation, precision/recall against microbatched test data, PPL
via slerp through the final decoder group}; then FID on 10,000 generated
samples; finally IWAE NLL over the test set.  All feature extraction and
distance math runs batched on device.

Result dataclasses mirror reference ``util.py:53-75`` (Metric / Metrics /
ModelEvaluation) with JSON export.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nvae_tpu.eval import ppl as ppl_mod
from nvae_tpu.eval.features import (
    backbone_weights_status,
    extract_features,
    get_extractor,
)
from nvae_tpu.eval.frechet import fid_from_features
from nvae_tpu.eval.nll import neg_log_likelihood
from nvae_tpu.eval.precision_recall import knn_precision_recall_features
from nvae_tpu.models import NVAE

EVAL_TEMPERATURES = (0.6, 0.8, 1.0)  # reference evaluate.py:58
FID_SAMPLE_SIZE = 10000  # reference evaluate.py:156 ("recommended by author")


def quantize_uint8(images) -> np.ndarray:
    """The reference's PNG disk round-trip, as a pure function: float [0,1]
    -> uint8 via truncation (``tf.cast(image * 255, tf.uint8)``, reference
    ``util.py:31-36``) -> back to float.  PNG encoding itself is lossless,
    so the round-trip's only numeric effect is this quantization."""
    x = np.asarray(images, dtype=np.float32)
    return np.clip(x * 255.0, 0.0, 255.0).astype(np.uint8).astype(
        np.float32
    ) / 255.0


@dataclasses.dataclass
class Metric:
    mean: float
    stddev: float

    @staticmethod
    def from_list(values) -> "Metric":
        return Metric(float(np.mean(values)), float(np.std(values)))

    def __str__(self):
        return f"{self.mean:.4f} ± {self.stddev:.4f}"


@dataclasses.dataclass
class Metrics:
    temperature: float
    fid: float
    ppl: Metric
    precision: Metric
    recall: Metric


@dataclasses.dataclass
class ModelEvaluation:
    nll: Optional[Metric]
    sample_metrics: List[Metrics]
    feature_backbone: str = "random_conv"
    fid_backbone: str = "inception"
    # Weight provenance ("imagenet" | "random-init" | "fixed-seed"): FID/P&R
    # from a "random-init" backbone are framework-internal only, NOT
    # comparable to published numbers (VERDICT r4 #7).
    feature_backbone_weights: str = "unknown"
    fid_backbone_weights: str = "unknown"

    def to_dict(self):
        return dataclasses.asdict(self)

    def comparable(self) -> bool:
        """True iff both backbones run real (ImageNet) weights, i.e. the
        FID/P&R values are comparable to published numbers."""
        return (
            self.feature_backbone_weights in ("imagenet",)
            and self.fid_backbone_weights in ("imagenet",)
        )


def evaluate_model(
    trainer,
    test_iter,
    batch_size: int,
    n_attempts: int = 10,
    binary: bool = False,
    temperatures=EVAL_TEMPERATURES,
    fid_sample_size: int = FID_SAMPLE_SIZE,
    feature_backbone: str = "vgg16",
    fid_backbone: str = "inception",
    seed: int = 0,
    pr_parity_accounting: bool = False,
    pr_parity_orientation: bool = False,
    parity_resize_299: bool = False,
    parity_fid_uint8: bool = False,
    parity_unit_input: bool = False,
    mesh=None,
) -> ModelEvaluation:
    """Full evaluation pass.  ``trainer`` provides the model + params
    (anything with ``.model``, ``.state`` and ``.sample_images``).

    The metric suite uses TWO backbones, like the reference: FID features
    come from ``fid_backbone`` (default InceptionV3 pool_3 — the reference
    FIDs through the frozen TF-Slim Inception graph,
    ``evaluate.py:161`` -> ``fid_utils.py:245-316``), while P&R and PPL
    features come from ``feature_backbone`` (default VGG16 —
    ``evaluate.py:209``: ``VGG16(include_top=False, pooling='avg')``).
    Published FID numbers are only comparable on Inception features.

    Parity switches (all default to the *corrected* protocol; see PARITY.md):

    - ``pr_parity_orientation`` — the reference calls
      ``precision_recall(pr_images, microbatch)`` (reference
      ``evaluate.py:72-74``), i.e. ref_features=GENERATED and
      eval_features=REAL in the NVIDIA API, so its published "precision" is
      the textbook recall and vice versa.  True reproduces that labeling.
    - ``parity_resize_299`` — the reference resizes *all* images to
      299x299x3 with nearest-neighbor (skimage ``order=0``) before either
      backbone (reference ``evaluate.py:228-234``); default here is the
      backbone-native size with bilinear.
    - ``parity_fid_uint8`` — the reference's FID round-trips images through
      uint8 PNGs on disk (reference ``evaluate.py:148-157``); True applies
      the equivalent truncating uint8 quantization to both feature inputs.
    - ``parity_unit_input`` — the reference feeds raw [0, 1] images to the
      Keras backbones with no preprocessing (reference ``evaluate.py:
      209-215``); default here is ImageNet-style [-1, 1] scaling.
    """
    model: NVAE = trainer.model
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
        **(
            {"spectral": trainer.state.spectral}
            if trainer.state.spectral
            else {}
        ),
    }
    extractor_opts = dict(
        input_size=299 if parity_resize_299 else 0,
        resize_method="nearest" if parity_resize_299 else "bilinear",
        input_scaling="unit" if parity_unit_input else "pm1",
    )
    # P&R/PPL feature space (reference evaluate.py:209, Keras VGG16).
    extractor = get_extractor(feature_backbone, **extractor_opts)
    # FID feature space (reference evaluate.py:161 -> fid_utils.py:245-316,
    # frozen Inception pool_3).  get_extractor is lru_cached, so when both
    # names coincide this is the same compiled function.
    fid_extractor = get_extractor(fid_backbone, **extractor_opts)
    rng = jax.random.PRNGKey(seed)

    def maybe_quantize(x):
        return quantize_uint8(x) if parity_fid_uint8 else np.asarray(x)

    # Real test images, loaded once (greyscale probs in [0,1]).
    test_batches = list(test_iter.epoch(0))
    real_images = np.concatenate([np.asarray(b) for b in test_batches])
    real_feats = extract_features(
        maybe_quantize(real_images), fid_extractor, mesh=mesh
    )

    # Per-half real features for the P&R loop, computed ONCE — they do not
    # change across attempts/temperatures (the reference recomputes VGG
    # features of the same real microbatch 30x per half, evaluate.py:70-74).
    real_halves = []
    for real_batch in test_batches:
        for half in np.split(np.asarray(real_batch), 2):
            real_halves.append(
                (len(half), extract_features(half, extractor, mesh=mesh))
            )

    def _sample_impl(v, key, t, n):
        return model.apply(
            v, n, t, not binary, rngs={"sample": key}, method=NVAE.sample
        )

    # n is static (few batch sizes); temperature is traced, so the whole
    # temperature sweep shares one compiled program per batch size.
    sample_jit = jax.jit(_sample_impl, static_argnums=(3,))

    def sample(n, t, key):
        return sample_jit(
            variables, key, jnp.asarray(t, jnp.float32), int(n)
        )

    sample_with_z_jit = jax.jit(
        lambda v, z, s, key: model.apply(
            v, z, s, rngs={"sample": key}, method=NVAE.sample_with_z
        )
    )

    evaluation = ModelEvaluation(
        nll=None,
        sample_metrics=[],
        feature_backbone=feature_backbone,
        fid_backbone=fid_backbone,
        feature_backbone_weights=backbone_weights_status(feature_backbone),
        fid_backbone_weights=backbone_weights_status(fid_backbone),
    )
    if not evaluation.comparable():
        print(
            "[nvae_tpu.eval] WARNING: backbone weights are "
            f"feature={evaluation.feature_backbone_weights} "
            f"fid={evaluation.fid_backbone_weights} — FID/P&R/PPL values are "
            "framework-internal only, not comparable to published numbers."
        )
    for t_i, temperature in enumerate(temperatures):
        precisions, recalls, ppls = [], [], []
        for attempt in range(n_attempts):
            key = jax.random.fold_in(rng, t_i * 1000 + attempt)
            k1, k2, k3 = jax.random.split(key, 3)
            images, last_s, z1, z2 = sample(batch_size, temperature, k1)

            # Precision/recall: generated vs real features, microbatched in
            # halves like the reference (evaluate.py:70-74).  Real-half
            # features come from the cache above.
            p_sum, r_sum, n_micro = 0.0, 0.0, 0
            for h_i, (n_half, real_f) in enumerate(real_halves):
                kk = jax.random.fold_in(k2, h_i)
                gen, *_ = sample(n_half, temperature, kk)
                gen_f = extract_features(
                    np.asarray(gen), extractor, mesh=mesh
                )
                if pr_parity_orientation:
                    # Reference argument order (evaluate.py:72-74):
                    # ref=GENERATED, eval=REAL — so "precision" below is
                    # the textbook recall and vice versa.
                    pr = knn_precision_recall_features(
                        gen_f, real_f, mesh=mesh
                    )
                else:
                    pr = knn_precision_recall_features(
                        real_f, gen_f, mesh=mesh
                    )
                p_sum += pr["precision"]
                r_sum += pr["recall"]
                n_micro += 1
            # Reference accounting quirk (evaluate.py:70-77, 87-88): two
            # microbatch precisions are SUMMED per batch and divided by the
            # batch count, so the published numbers live in [0, 2].
            # Default here is the corrected per-microbatch mean in [0, 1];
            # pr_parity_accounting=True reproduces the reference scale
            # (corrected value x2) for comparison against BASELINE.md.
            denom = max(n_micro // 2, 1) if pr_parity_accounting else n_micro
            precisions.append(p_sum / denom)
            recalls.append(r_sum / denom)

            # PPL through the final decoder group (evaluate.py:80-86).
            za, zb = ppl_mod.slerp_pair(z1, z2, k3)
            img_a = sample_with_z_jit(variables, za, last_s, k3)
            img_b = sample_with_z_jit(variables, zb, last_s, k3)
            fa = extract_features(np.asarray(img_a), extractor, mesh=mesh)
            fb = extract_features(np.asarray(img_b), extractor, mesh=mesh)
            ppls.append(ppl_mod.evaluate(fa, fb))

        # FID at this temperature over fid_sample_size samples (Inception
        # features by default — the one space published FIDs live in).
        gen_feats = []
        n_batches = max(fid_sample_size // batch_size, 1)
        for b in range(n_batches):
            kk = jax.random.fold_in(rng, 555000 + t_i * 1000 + b)
            gen, *_ = sample(batch_size, temperature, kk)
            gen_feats.append(
                extract_features(
                    maybe_quantize(gen), fid_extractor, mesh=mesh
                )
            )
        fid = fid_from_features(real_feats, np.concatenate(gen_feats))

        evaluation.sample_metrics.append(
            Metrics(
                temperature=temperature,
                fid=fid,
                ppl=Metric.from_list(ppls),
                precision=Metric.from_list(precisions),
                recall=Metric.from_list(recalls),
            )
        )

    mean, std = neg_log_likelihood(
        model, variables, test_batches, jax.random.fold_in(rng, 999),
        n_attempts=n_attempts,
    )
    evaluation.nll = Metric(mean, std)
    return evaluation


def evaluate_fid_against_dir(
    trainer,
    real_dir: str,
    out_dir: str,
    batch_size: int,
    temperature: float,
    sample_size: int = FID_SAMPLE_SIZE,
    feature_backbone: str = "inception",
) -> float:
    """The reference's disk-based FID protocol (``evaluate.py:143-163``):
    real PNGs in ``real_dir``; regenerate ``sample_size`` PNGs into
    ``out_dir``; FID between the two directories — but with feature
    extraction batched on device instead of a TF1 session.  Default
    backbone is Inception pool_3, matching the reference's disk FID
    (``fid_utils.py:245-316``)."""
    from nvae_tpu.utils.images import ImageDirectory, sample_to_dir

    # Clear only previously generated images (the reference clears its own
    # regenerated dir, evaluate.py:152-154); never touch non-image files.
    for f in os.listdir(out_dir) if os.path.isdir(out_dir) else []:
        if f.lower().endswith((".png", ".jpg", ".jpeg")):
            os.remove(os.path.join(out_dir, f))
    sample_to_dir(
        lambda n, t, b: np.asarray(trainer.sample_images(n, t)[0]),
        batch_size, sample_size, temperature, out_dir,
    )
    extractor = get_extractor(feature_backbone)
    # Lazy directory views: only one extraction batch of PNGs is decoded
    # at a time (O(batch) host RAM at any directory size).
    real = ImageDirectory(real_dir)
    gen = ImageDirectory(out_dir)
    return fid_from_features(
        extract_features(real, extractor), extract_features(gen, extractor)
    )

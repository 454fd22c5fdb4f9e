"""FID path API with precomputed-statistics caching + standalone CLI.

The reference's vendored ``fid_utils.py`` accepts either an image directory
or a precomputed ``.npz`` of activation statistics for each side
(``fid_utils.py:507-533``), can precompute and save those statistics
(``fid_utils.py:454-472``), and ships a standalone argparse CLI
(``fid_utils.py:536-550``).  Same capabilities here, with batched on-device
feature extraction instead of a TF1 session:

    python -m nvae_tpu.eval.fid <path1> <path2> [--backbone vgg16] ...
    python -m nvae_tpu.eval.fid --save_stats <image_dir> <stats.npz>

A path ending in ``.npz`` is loaded as statistics (keys ``mu``/``sigma``,
matching the reference's key names, ``fid_utils.py:511-514``); anything else
is treated as a directory of PNG/JPG images.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np

from nvae_tpu.eval.features import extract_features, get_extractor
from nvae_tpu.eval.frechet import fid_from_stats


def compute_statistics_of_path(
    path: str,
    backbone: str = "vgg16",
    input_size: int = 0,
    batch_size: int = 256,
    limit: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) for a stats ``.npz`` or an image directory (reference
    ``_handle_path``, ``fid_utils.py:507-517``)."""
    if path.endswith(".npz"):
        with np.load(path) as d:
            return d["mu"], d["sigma"]
    if not os.path.isdir(path):
        raise FileNotFoundError(f"not a stats file or image directory: {path}")
    from nvae_tpu.utils.images import ImageDirectory

    # Lazy view: extract_features slices per batch, so only batch_size
    # images are ever decoded/held on host — O(batch) RAM at any directory
    # size (the reference's per-batch decode, fid_utils.py:404-452).
    images = ImageDirectory(path, limit=limit)
    feats = extract_features(
        images, get_extractor(backbone, input_size=input_size), batch_size
    )
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def save_statistics(stats_path: str, mu: np.ndarray, sigma: np.ndarray) -> None:
    """Cache (mu, sigma) as ``.npz`` (reference precalc path,
    ``fid_utils.py:454-472``)."""
    d = os.path.dirname(os.path.abspath(stats_path))
    os.makedirs(d, exist_ok=True)
    np.savez(stats_path, mu=mu, sigma=sigma)


def calculate_fid_given_paths(
    paths,
    backbone: str = "vgg16",
    input_size: int = 0,
    batch_size: int = 256,
) -> float:
    """FID between two paths, each an image dir or a stats ``.npz``
    (reference ``calculate_fid_given_paths``, ``fid_utils.py:519-533``)."""
    assert len(paths) == 2, paths
    mu1, s1 = compute_statistics_of_path(paths[0], backbone, input_size, batch_size)
    mu2, s2 = compute_statistics_of_path(paths[1], backbone, input_size, batch_size)
    return fid_from_stats(mu1, s1, mu2, s2)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", nargs=2,
                    help="Image directory or precomputed stats .npz; with "
                         "--save_stats: <image_dir> <output.npz>")
    ap.add_argument("--backbone", default="vgg16",
                    choices=["vgg16", "inception", "random_conv"])
    ap.add_argument("--input_size", type=int, default=0,
                    help="Resize target (0 = backbone native)")
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--save_stats", action="store_true",
                    help="Precompute statistics of path[0] into path[1] "
                         "instead of scoring")
    args = ap.parse_args(argv)

    if args.save_stats:
        mu, sigma = compute_statistics_of_path(
            args.path[0], args.backbone, args.input_size, args.batch_size
        )
        save_statistics(args.path[1], mu, sigma)
        print(f"saved stats for {args.path[0]} -> {args.path[1]} "
              f"(D={mu.shape[0]})")
        return 0
    fid = calculate_fid_given_paths(
        args.path, args.backbone, args.input_size, args.batch_size
    )
    print(f"FID: {fid:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Observability: JSONL metrics + optional TensorBoard scalars/images.

The reference logs through three ``tf.summary`` writers and tqdm bars
(SURVEY §5).  Here every metric lands in an append-only ``metrics.jsonl``
(machine-readable, survives without TF) and, when TensorFlow is importable,
mirrored to TensorBoard event files with the same tag layout the reference
used (``images/`` writer for samples/reconstructions, scalars per epoch).
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: str, tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb_writer = None
        if tensorboard:
            try:
                import tensorflow as tf  # noqa: F811

                self._tb_writer = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb_writer = None

    def scalars(self, step: int, values: Mapping[str, float], prefix: str = ""):
        rec = {
            "step": int(step),
            "time": time.time(),
            **{
                (prefix + k): float(np.asarray(v))
                for k, v in values.items()
            },
        }
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb_writer is not None:
            import tensorflow as tf

            with self._tb_writer.as_default():
                for k, v in values.items():
                    tf.summary.scalar(prefix + k, float(np.asarray(v)), step=step)

    def images(self, step: int, tag: str, images: np.ndarray):
        """(N, H, W, C) floats in [0,1]; mirrored to TB when available and
        always dumped as PNGs under ``<log_dir>/images/<tag>/``."""
        from nvae_tpu.utils.images import save_images_to_dir

        out = os.path.join(self.log_dir, "images", f"{tag}_step{step}")
        save_images_to_dir(np.asarray(images), out)
        if self._tb_writer is not None:
            import tensorflow as tf

            with self._tb_writer.as_default():
                tf.summary.image(tag, np.asarray(images), step=step, max_outputs=4)

    def close(self):
        self._jsonl.close()
        if self._tb_writer is not None:
            self._tb_writer.close()

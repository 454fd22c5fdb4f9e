"""Device-side input pipeline.

The reference preprocesses on host CPU through a tf.data map (pad -> cast ->
Bernoulli binarize, reference ``datasets.py:11-18``).  Here the per-batch
transform is a jitted device function: uint8 batches stream to HBM and are
padded / normalized / binarized on the TPU, fresh Bernoulli draw every step
(the paper-intended behavior; the reference effectively thresholds at >0 once
per epoch, SURVEY §2.5 — available via ``parity_binarize_255``).
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nvae_tpu.data.datasets import DataBundle


@functools.partial(
    jax.jit,
    static_argnames=("target_size", "binarize", "parity_binarize_255"),
)
def prepare_batch(
    batch_u8: jax.Array,
    rng: jax.Array,
    target_size: int = 32,
    binarize: bool = True,
    parity_binarize_255: bool = False,
) -> jax.Array:
    """uint8 (B, H, W, C) -> float32 (B, S, S, C) in [0, 1], on device."""
    x = batch_u8
    h = x.shape[1]
    if h < target_size:
        pad = target_size - h
        lo, hi = pad // 2, pad - pad // 2
        x = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    elif h > target_size:
        crop = (h - target_size) // 2
        x = x[:, crop:crop + target_size, crop:crop + target_size, :]
    x = x.astype(jnp.float32)
    if binarize:
        if parity_binarize_255:
            # Reference defect parity: Bernoulli(probs in [0,255]) == every
            # nonzero pixel -> 1 (datasets.py:13-15).
            return (x > 0).astype(jnp.float32)
        probs = x / 255.0
        u = jax.random.uniform(rng, probs.shape)
        return (u < probs).astype(jnp.float32)
    return x / 255.0


class BatchIterator:
    """Shuffled, epoch-aware batch stream with on-device preparation.

    Yields ready (device) float batches.  Host work is a gather of uint8
    rows; everything else runs on the accelerator.  ``sharding`` places each
    batch directly into its data-parallel layout so pjit consumes it without
    a resharding copy.
    """

    def __init__(
        self,
        images: np.ndarray,
        batch_size: int,
        *,
        target_size: int = 32,
        binarize: bool = True,
        parity_binarize_255: bool = False,
        shuffle: bool = True,
        drop_remainder: bool = True,
        seed: int = 0,
        sharding=None,
        max_batches: Optional[int] = None,
    ):
        self.images = images
        self.batch_size = batch_size
        self.target_size = target_size
        self.binarize = binarize
        self.parity_binarize_255 = parity_binarize_255
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.sharding = sharding
        self.rng = np.random.RandomState(seed)
        self.key = jax.random.PRNGKey(seed)
        n = len(images) // batch_size if drop_remainder else -(-len(images) // batch_size)
        self.batches_per_epoch = min(n, max_batches) if max_batches else n
        self._epoch = 0

    def __len__(self) -> int:
        return self.batches_per_epoch

    def _make_batch(self, order: np.ndarray, e: int, b: int):
        idx = order[b * self.batch_size : (b + 1) * self.batch_size]
        host = self.images[idx]
        if len(host) < self.batch_size and self.drop_remainder:
            return None
        dev = jax.device_put(host, self.sharding)
        key = jax.random.fold_in(self.key, e * 100003 + b)
        return prepare_batch(
            dev,
            key,
            target_size=self.target_size,
            binarize=self.binarize,
            parity_binarize_255=self.parity_binarize_255,
        )

    def epoch(self, epoch_idx: Optional[int] = None) -> Iterator[jax.Array]:
        """One pass over the data (one shuffle, fresh binarization noise).

        Double-buffered: batch k+1's host gather + transfer + device prep are
        dispatched before batch k is consumed, so input work overlaps the
        train step (JAX dispatch is asynchronous).
        """
        e = self._epoch if epoch_idx is None else epoch_idx
        self._epoch = e + 1
        order = np.arange(len(self.images))
        if self.shuffle:
            np.random.RandomState(hash((e, 0x5EED)) % (2**31)).shuffle(order)
        pending = None
        for b in range(self.batches_per_epoch):
            nxt = self._make_batch(order, e, b)
            if nxt is None:
                break
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    def __iter__(self):
        return self.epoch()


def make_iterators(
    bundle: DataBundle,
    batch_size: int,
    *,
    target_size: int = 32,
    binarize: bool = True,
    parity_binarize_255: bool = False,
    seed: int = 0,
    sharding=None,
    debug: bool = False,
) -> Tuple[BatchIterator, BatchIterator]:
    """(train, test) iterators; ``debug`` truncates both to 4 batches, the
    reference's smoke-test fixture (``train.py:103-105``)."""
    max_batches = 4 if debug else None
    train = BatchIterator(
        bundle.train_x, batch_size, target_size=target_size, binarize=binarize,
        parity_binarize_255=parity_binarize_255, shuffle=True, seed=seed,
        sharding=sharding, max_batches=max_batches,
    )
    test = BatchIterator(
        bundle.test_x, batch_size, target_size=target_size, binarize=binarize,
        parity_binarize_255=parity_binarize_255, shuffle=False, seed=seed + 1,
        sharding=sharding, max_batches=max_batches,
    )
    return train, test

"""nvae_tpu — a TPU-native hierarchical-VAE (NVAE) framework.

A brand-new JAX/Flax/XLA/Pallas implementation with the capabilities of the
TensorFlow reference ``stevensdavid/nvae-tf`` (see SURVEY.md), redesigned for
TPU: a single jitted train step, spectral normalization folded into the
optimizer update, device-side data binarization, batched on-device metric
feature extraction, and data parallelism over a ``jax.sharding.Mesh``.

Public API (mirrors the reference's capability surface):

- :mod:`nvae_tpu.config`    — static configuration (all reference CLI flags)
- :mod:`nvae_tpu.models`    — the NVAE model family
- :mod:`nvae_tpu.train`     — train state, train step, trainer loop, checkpoints
- :mod:`nvae_tpu.data`      — dataset registry + device-side binarization
- :mod:`nvae_tpu.eval`      — IWAE NLL, FID, k-NN precision/recall, PPL
- :mod:`nvae_tpu.parallel`  — mesh construction and sharding helpers
- :mod:`nvae_tpu.kernels`   — Pallas TPU kernels for hot ops
- :mod:`nvae_tpu.serving`   — jax.export StableHLO serving artifacts
"""

__version__ = "0.1.0"

from nvae_tpu.config import ModelConfig, TrainConfig  # noqa: F401

"""Importance-weighted (IWAE) negative log-likelihood.

Reference protocol (``evaluate.py:111-123``): per test batch, K importance
samples; ``log w = -recon_crop - log q + log p``; batch NLL =
``-mean(logsumexp(log w) - log K)``; report mean ± std over batches.  The
reconstruction term crops the 32x32 canvas to the 28x28 MNIST interior
(``models.py:244``).

Here each importance sample is one jitted forward; K is a device loop.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nvae_tpu.config import ModelConfig
from nvae_tpu.models import NVAE
from nvae_tpu.train.losses import recon_loss


def make_nll_fn(
    model: NVAE, n_attempts: int = 10, crop: int = 2,
    bn_batch_stats: bool = True,
):
    """Jitted: (variables, batch, rng) -> per-batch IWAE NLL scalar.

    ``bn_batch_stats``: normalize with the batch's own statistics (mutations
    discarded) — see :func:`nvae_tpu.train.step.make_eval_step` for why
    running-average BN corrupts the log p term on deep hierarchies.
    """
    cfg: ModelConfig = model.cfg

    def one_attempt(carry, rng):
        variables, batch = carry
        if bn_batch_stats:
            out, _ = model.apply(
                variables, batch, True, True, rngs={"sample": rng},
                mutable=["batch_stats", "spectral"],
            )
        else:
            out = model.apply(
                variables, batch, False, True, rngs={"sample": rng}
            )
        rl = recon_loss(out.logits, batch, cfg.likelihood, cfg.n_mix, crop=crop)
        log_iw = -rl - out.log_q + out.log_p  # (B,)
        return carry, log_iw

    @jax.jit
    def nll_fn(variables, batch, rng):
        rngs = jax.random.split(rng, n_attempts)
        _, log_iws = jax.lax.scan(one_attempt, (variables, batch), rngs)
        # (K, B) -> logsumexp over K.
        log_avg = jax.nn.logsumexp(log_iws, axis=0) - jnp.log(
            float(n_attempts)
        )
        return -jnp.mean(log_avg)

    return nll_fn


def neg_log_likelihood(
    model: NVAE,
    variables,
    batches: Iterable[jax.Array],
    rng: jax.Array,
    n_attempts: int = 10,
    crop: int = 2,
) -> Tuple[float, float]:
    """Mean/std of per-batch IWAE NLL over the dataset."""
    nll_fn = make_nll_fn(model, n_attempts, crop)
    values = []
    for i, batch in enumerate(batches):
        values.append(float(nll_fn(variables, batch, jax.random.fold_in(rng, i))))
    return float(np.mean(values)), float(np.std(values))

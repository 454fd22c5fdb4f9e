"""Train state: the complete, checkpointable training snapshot.

The reference checkpoints weights only and restores the warm-up counter
incorrectly (``train.py:133-135``, SURVEY §5).  Here the state carries
everything needed for bitwise resume: params, BN running stats, per-forward
spectral vectors (parity mode), optimizer state (Adamax moments + spectral
u/sigma), the step counter, and the RNG key.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from nvae_tpu.config import ModelConfig, TrainConfig
from nvae_tpu.models import NVAE
from nvae_tpu.train.optim import make_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array
    epoch: jax.Array
    params: Any
    batch_stats: Any
    spectral: Any  # 'forward'-mode per-call power-iteration state (or {})
    opt_state: Any
    rng: jax.Array

    def variables(self):
        v = {"params": self.params, "batch_stats": self.batch_stats}
        if self.spectral:
            v["spectral"] = self.spectral
        return v


def create_train_state(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    total_steps: int,
    rng: Optional[jax.Array] = None,
    tx: Optional[optax.GradientTransformation] = None,
) -> tuple[NVAE, TrainState, optax.GradientTransformation]:
    """Build the model, init variables, and assemble the optimizer."""
    if rng is None:
        rng = jax.random.PRNGKey(train_cfg.seed)
    model = NVAE(model_cfg)
    init_rng, sample_rng, state_rng = jax.random.split(rng, 3)
    x = jnp.zeros(
        (2, model_cfg.image_size, model_cfg.image_size, model_cfg.in_channels)
    )
    # jit the whole init: hundreds of layer initializers (plus the
    # power-iteration warm start in the optimizer) become ONE compiled
    # program instead of op-by-op dispatch.
    variables = jax.jit(
        lambda rngs, x_: model.init(rngs, x_, True)
    )({"params": init_rng, "sample": sample_rng}, x)
    if tx is None:
        tx = make_optimizer(train_cfg, total_steps, model_cfg.spectral_mode)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        spectral=variables.get("spectral", {}),
        opt_state=jax.jit(tx.init)(params),
        rng=state_rng,
    )
    return model, state, tx

"""Optimizer stack: Adamax + cosine decay with spectral-norm strategies
folded into the update transform.

The reference runs a TFA power iteration inside every wrapped convolution's
forward pass (``common.py:41`` et al.) — per-call overhead on the hot path.
Here spectral control is an ``optax`` transform that runs ONE power iteration
per *optimizer step* per tagged kernel (parameters named ``sn_kernel``):

- :func:`spectral_projection` — rescales each updated kernel to unit spectral
  norm (the weight invariant per-forward normalization maintains), so the
  forward pass stays a plain convolution.
- :func:`spectral_tracking` — only tracks ``u`` vectors/sigmas (for the
  spectral-regularization *penalty* variant, BASELINE.md "Step+SR"); the
  penalty term itself is added in the train step via :func:`spectral_penalty`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from nvae_tpu.config import TrainConfig
from nvae_tpu.nn.spectral import is_sn_kernel_path, power_iteration


class SpectralState(NamedTuple):
    # Pytree congruent with params: u vectors for sn_kernel leaves, None else.
    u: object
    # Pytree congruent with params: last sigma estimate per sn_kernel leaf.
    sigma: object


def _init_u(params, n_warmup_iters: int = 5):
    """Warm-started power-iteration vectors for every sn_kernel leaf."""

    def init_leaf(path, leaf):
        if not is_sn_kernel_path(path):
            return None
        w2d = leaf.reshape(-1, leaf.shape[-1])
        # Deterministic start: ones vector, normalized, then warm iterations.
        u = jnp.ones((leaf.shape[-1],)) / jnp.sqrt(leaf.shape[-1])
        for _ in range(n_warmup_iters):
            _, u = power_iteration(w2d, u)
        return u

    return jax.tree_util.tree_map_with_path(init_leaf, params)


def _sigmas(params, u_tree):
    def leaf(path, w, u):
        if u is None or not is_sn_kernel_path(path):
            return None
        return power_iteration(w.reshape(-1, w.shape[-1]), u)

    return jax.tree_util.tree_map_with_path(
        leaf, params, u_tree, is_leaf=lambda x: x is None
    )


def spectral_projection(eps: float = 1e-9) -> optax.GradientTransformation:
    """After the inner update, renormalize each tagged kernel to sigma = 1.

    Implemented as an update rewrite: ``updates' = (w + updates)/sigma - w``
    where sigma is the power-iteration estimate on the *updated* kernel.
    """

    def init_fn(params):
        u = _init_u(params)
        sig = jax.tree_util.tree_map_with_path(
            lambda p, w: (
                None
                if not is_sn_kernel_path(p)
                else jnp.asarray(1.0, dtype=jnp.float32)
            ),
            params,
        )
        return SpectralState(u=u, sigma=sig)

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("spectral_projection requires params")

        def leaf(path, g, w, u):
            if u is None or not is_sn_kernel_path(path):
                return g, None, None
            w_new = w + g
            sigma, u_new = power_iteration(
                w_new.reshape(-1, w_new.shape[-1]), u
            )
            sigma = jnp.maximum(sigma, eps)
            return w_new / sigma - w, u_new, sigma

        flat = jax.tree_util.tree_map_with_path(
            leaf, updates, params, state.u, is_leaf=lambda x: x is None
        )
        is3 = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa: E731
        new_updates = jax.tree.map(lambda t: t[0], flat, is_leaf=is3)
        new_u = jax.tree.map(lambda t: t[1], flat, is_leaf=is3)
        new_sigma = jax.tree.map(lambda t: t[2], flat, is_leaf=is3)
        return new_updates, SpectralState(u=new_u, sigma=new_sigma)

    return optax.GradientTransformation(init_fn, update_fn)


def spectral_tracking() -> optax.GradientTransformation:
    """Track u/sigma per tagged kernel without touching updates (penalty mode)."""

    def init_fn(params):
        u = _init_u(params)
        sig = jax.tree_util.tree_map_with_path(
            lambda p, w: (
                None
                if not is_sn_kernel_path(p)
                else jnp.asarray(1.0, dtype=jnp.float32)
            ),
            params,
        )
        return SpectralState(u=u, sigma=sig)

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("spectral_tracking requires params")

        def leaf(path, w, u):
            if u is None or not is_sn_kernel_path(path):
                return None
            sigma, u_new = power_iteration(w.reshape(-1, w.shape[-1]), u)
            return u_new, sigma

        flat = jax.tree_util.tree_map_with_path(
            leaf, params, state.u, is_leaf=lambda x: x is None
        )
        is2 = lambda x: isinstance(x, tuple) and len(x) == 2  # noqa: E731
        new_u = jax.tree.map(lambda t: t[0], flat, is_leaf=is2)
        new_sigma = jax.tree.map(lambda t: t[1], flat, is_leaf=is2)
        return updates, SpectralState(u=new_u, sigma=new_sigma)

    return optax.GradientTransformation(init_fn, update_fn)


def spectral_penalty(params, u_tree, sr_lambda: float) -> jax.Array:
    """``sr_lambda * sum sigma(W)`` with u/v from the tracking state —
    spectral regularization (paper Eq. 1; the ``spectral_reg`` branch's
    semantics rebuilt).  Differentiable w.r.t. params."""
    total = 0.0

    def leaf(path, w, u):
        nonlocal total
        if u is None or not is_sn_kernel_path(path):
            return None
        sigma, _ = power_iteration(w.reshape(-1, w.shape[-1]), u)
        total = total + sigma
        return None

    jax.tree_util.tree_map_with_path(
        leaf, params, u_tree, is_leaf=lambda x: x is None
    )
    return sr_lambda * total


class EmaState(NamedTuple):
    # Pytree congruent with params: the exponential moving average.
    ema: object
    count: jax.Array


def track_ema(decay: float) -> optax.GradientTransformation:
    """Maintain an exponential moving average of the *post-update* params.

    A capability beyond the reference (no EMA anywhere in
    ``stevensdavid/nvae-tf``); the NVAE paper itself evaluates with EMA
    weights (decay 0.9999).  Chained LAST in the optimizer so the average
    tracks the final parameters (after Adamax *and* the spectral
    projection), it rides inside ``opt_state`` — checkpointing, the
    scan-epoch runner, and the FSDP layout (which shards any param-shaped
    opt_state leaf) all inherit it with zero extra plumbing.

    ``ema_0 = params_0`` (no zero-init bias), then
    ``ema_{t+1} = decay * ema_t + (1 - decay) * params_{t+1}``.
    """
    if not 0.0 < decay < 1.0:
        raise ValueError(f"ema decay must be in (0, 1), got {decay}")

    def init_fn(params):
        return EmaState(
            ema=jax.tree.map(jnp.asarray, params),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("track_ema requires params")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema,
            new_params,
        )
        return updates, EmaState(ema=ema, count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def find_ema_params(opt_state) -> Optional[object]:
    """The EMA param tree inside an optax chain state, or None."""
    for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, EmaState)
    ):
        if isinstance(s, EmaState):
            return s.ema
    return None


def find_spectral_state(opt_state) -> Optional[SpectralState]:
    """Locate the SpectralState inside an optax chain state."""
    for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, SpectralState)
    ):
        if isinstance(s, SpectralState):
            return s
    return None


def make_optimizer(
    train_cfg: TrainConfig,
    total_steps: int,
    spectral_mode: str = "projection",
) -> optax.GradientTransformation:
    """Adamax + cosine decay from ``learning_rate`` over ``total_steps``
    (reference ``train.py:128-131``), plus the spectral strategy."""
    schedule = optax.cosine_decay_schedule(
        init_value=train_cfg.learning_rate, decay_steps=max(total_steps, 1)
    )
    # eps follows Keras' default (1e-7), reference uses Keras Adamax.
    parts = [optax.adamax(learning_rate=schedule, eps=1e-7)]
    if spectral_mode == "projection":
        parts.append(spectral_projection())
    elif spectral_mode == "penalty":
        parts.append(spectral_tracking())
    if getattr(train_cfg, "ema_decay", 0.0) > 0.0:
        # Last, so the average tracks post-projection parameters.
        parts.append(track_ema(train_cfg.ema_decay))
    return optax.chain(*parts)

#!/usr/bin/env python
"""Execute the REFERENCE'S OWN code as a parity oracle (VERDICT r4 #1).

Every prior parity test compared nvae_tpu against builder-authored
re-implementations (``tests/_keras_mimic.py``, golden values).  This tool
removes the self-reference: it imports the *genuine* reference sources
(``/root/reference/models.py`` + the four stage modules, byte-for-byte as
shipped) under ``tf_keras`` and compares them against nvae_tpu with shared
weights and pinned (zeroed) sampling noise.

The reference depends on two packages absent from this image —
``tensorflow_addons`` (only ``layers.SpectralNormalization``) and
``tensorflow_probability`` (only ``distributions.Bernoulli``).  Both are
shimmed in ``sys.modules`` before import: the SN wrapper is the mimic's
TFA-layout replica (``tests/_keras_mimic.py:37``, itself output-validated),
and Bernoulli is ~15 lines of tf ops.  Everything else that runs — model
construction, forward, losses, ``train_step`` — is reference-authored code.

Phases (all on a tiny CPU config; JSON report to stdout / ``--out``):

A. build the genuine model, save its Keras-2 checkpoint, and import it via
   ``tools/import_reference_ckpt.py`` with ``strict=True`` — proving the
   importer's variable map against a checkpoint the genuine code produced
   (previously only proven against the mimic's).
B. forward parity, inference mode: logits / per-group latent params /
   IWAE log_p, log_q (reference ``models.py:89-98``, ``decoder.py:64-104``).
C. loss decomposition: recon (``models.py:242-250``), balanced + plain KL
   (``models.py:191-237``), BN-gamma penalty (``models.py:252-267``).
D. semantics probe of the genuine ``train_step`` (``models.py:100-135``):
   it calls ``self(data)`` with NO training flag, which Keras 2 resolves to
   inference mode — so the reference trains with BatchNorm moving statistics
   frozen at init and TFA's SpectralNormalization power iteration never
   running.  The probe asserts this by diffing those variables across steps.
E1. 3-step SGD lockstep against the genuine ``train_step`` itself (compiled
   with SGD, driven eagerly): nvae_tpu with ``spectral_mode="none"`` +
   ``TrainConfig.parity_frozen_norm=True`` must track the genuine per-step
   losses and final weights.
E2. 3-step SGD lockstep for the *intended* semantics: the reference modules
   driven with an explicit ``training=True`` (TFA normalize-in-place + BN
   batch statistics) vs nvae_tpu's default ``spectral_mode="forward"``
   train step.  Exactness caveat: TFA stores the normalized kernel while
   nvae_tpu stores the raw kernel and divides by sigma each forward — the
   two representations coincide up to O((sigma-1)*lr*grad) per step, so the
   bound here is looser than E1's (see report fields).

Usage:
  TF_USE_LEGACY_KERAS=1 JAX_PLATFORMS=cpu python tools/reference_oracle.py \
      [--steps 3] [--out oracle.json] [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def install_shims(reference_dir: str):
    """Make the genuine reference sources importable: tf_keras as tf.keras,
    TFA/TFP stand-ins in ``sys.modules``, reference dir on ``sys.path``."""
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    if os.environ["TF_USE_LEGACY_KERAS"] != "1":
        raise RuntimeError("oracle requires TF_USE_LEGACY_KERAS=1")
    import types

    import tensorflow as tf

    if not tf.keras.Model.__module__.startswith("tf_keras"):
        raise RuntimeError(
            "tf.keras did not resolve to tf_keras — set TF_USE_LEGACY_KERAS=1 "
            "before tensorflow is first imported (run the oracle in a fresh "
            "process)"
        )

    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    from tests._keras_mimic import SpectralNormalization

    # --- tensorflow_addons: the reference uses exactly one symbol. ---------
    tfa = types.ModuleType("tensorflow_addons")
    tfa_layers = types.ModuleType("tensorflow_addons.layers")
    tfa_layers.SpectralNormalization = SpectralNormalization
    tfa.layers = tfa_layers
    sys.modules["tensorflow_addons"] = tfa
    sys.modules["tensorflow_addons.layers"] = tfa_layers

    # --- tensorflow_probability: Bernoulli only (models.py:168,185,247). ---
    class Bernoulli:
        """tfp.distributions.Bernoulli for float targets: log_prob is the
        standard stable form x*log_sig(l) + (1-x)*log_sig(-l)."""

        def __init__(self, logits=None, probs=None, dtype=tf.float32,
                     allow_nan_stats=True, validate_args=False):
            if logits is None:
                logits = tf.math.log(probs) - tf.math.log1p(-probs)
            self._logits = tf.convert_to_tensor(logits, tf.float32)
            self._dtype = dtype

        def log_prob(self, x):
            x = tf.cast(x, tf.float32)
            l = self._logits
            return -(x * tf.nn.softplus(-l) + (1.0 - x) * tf.nn.softplus(l))

        def probs_parameter(self):
            return tf.cast(tf.math.sigmoid(self._logits), self._dtype)

        def mean(self):
            return self.probs_parameter()

        def sample(self, seed=None):
            p = tf.math.sigmoid(self._logits)
            u = tf.random.uniform(tf.shape(p), seed=seed)
            return tf.cast(u < p, self._dtype)

    tfp = types.ModuleType("tensorflow_probability")
    tfp_dist = types.ModuleType("tensorflow_probability.distributions")
    tfp_dist.Bernoulli = Bernoulli
    tfp.distributions = tfp_dist
    sys.modules["tensorflow_probability"] = tfp
    sys.modules["tensorflow_probability.distributions"] = tfp_dist

    if reference_dir not in sys.path:
        sys.path.insert(0, reference_dir)
    return tf


def _max_delta(a, b):
    import numpy as np

    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def _rel_delta(a, b):
    import numpy as np

    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(
        np.max(np.abs(a - b)) / max(float(np.max(np.abs(b))), 1e-12)
    )


def _tree_max_delta(tree_a, tree_b):
    import jax
    import numpy as np

    la, lb = jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)
    assert len(la) == len(lb), (len(la), len(lb))
    return max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(la, lb)
    )


def run_oracle(reference_dir: str = "/root/reference", n_steps: int = 3,
               lr: float = 1e-5, total_steps: int = 10, batch: int = 4,
               verbose: bool = True) -> dict:
    t_start = time.time()
    tf = install_shims(reference_dir)
    import numpy as np
    import tf_keras

    import models as ref_models  # noqa: the GENUINE reference models.py

    import jax
    import jax.numpy as jnp
    import optax

    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.models import NVAE
    from nvae_tpu.train import losses
    from nvae_tpu.train.state import create_train_state
    from nvae_tpu.train.step import make_train_step
    from tools.import_reference_ckpt import import_reference_checkpoint

    # The axon sitecustomize force-sets jax_platforms="axon,cpu" in every
    # process — the JAX_PLATFORMS env var alone is IGNORED (CLAUDE.md).
    # Everything here is tiny eager compares; re-assert CPU explicitly.
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass

    report = {"phases": {}, "config": {
        "n_steps": n_steps, "lr": lr, "total_steps": total_steps,
        "batch": batch, "tf": tf.__version__, "jax": jax.__version__,
        "jax_platform": jax.default_backend(),
    }}

    def log(msg):
        if verbose:
            print(f"[oracle t+{time.time() - t_start:.0f}s] {msg}",
                  flush=True)

    cfg = debug_config(spectral_mode="none")
    cfg_fwd = debug_config(spectral_mode="forward")

    # ---- build the genuine model --------------------------------------
    tf.random.set_seed(0)
    np.random.seed(0)
    ref = ref_models.NVAE(
        n_encoder_channels=cfg.n_encoder_channels,
        n_decoder_channels=cfg.n_decoder_channels,
        res_cells_per_group=cfg.res_cells_per_group,
        n_preprocess_blocks=cfg.n_preprocess_blocks,
        n_preprocess_cells=cfg.n_preprocess_cells,
        n_latent_per_group=cfg.n_latent_per_group,
        n_latent_scales=cfg.n_latent_scales,
        n_groups_per_scale=list(cfg.n_groups_per_scale),
        n_postprocess_blocks=cfg.n_postprocess_blocks,
        n_post_process_cells=cfg.n_postprocess_cells,
        sr_lambda=cfg.sr_lambda,
        scale_factor=cfg.scale_factor,
        total_epochs=1,
        n_total_iterations=total_steps,
        step_based_warmup=True,
        input_shape=tf.convert_to_tensor(
            (batch, cfg.image_size, cfg.image_size, cfg.in_channels),
            dtype=float,
        ),
    )
    rng = np.random.RandomState(7)
    shape = (batch, cfg.image_size, cfg.image_size, cfg.in_channels)
    warm = [(rng.rand(*shape) > 0.5).astype("float32") for _ in range(12)]
    batches = [(rng.rand(*shape) > 0.5).astype("float32")
               for _ in range(n_steps)]
    x_cmp = batches[0]
    log("building genuine reference model (12 training-mode warm-up calls "
        "to converge sn_u / move BN statistics)")
    for w in warm:
        ref(w, training=True)

    # ---- phase A: checkpoint round-trip via the importer ---------------
    tmp = tempfile.mkdtemp(prefix="oracle_ckpt_")
    ckpt = os.path.join(tmp, "epoch_genuine")
    ref.save_weights(ckpt)
    params, bstats, spectral = import_reference_checkpoint(
        ckpt, cfg_fwd, strict=True
    )
    report["phases"]["A_import_strict"] = {"ok": True}
    log("phase A ok: genuine checkpoint imported strict")

    # ---- pin sampling noise to zero on both frameworks -----------------
    real_tf_normal = tf.random.normal
    tf.random.normal = lambda shape, **kw: tf.zeros(
        shape, dtype=kw.get("dtype", tf.float32)
    )
    real_jax_normal = jax.random.normal

    def _zeros_normal(key, shape=(), dtype=jnp.float32):
        return jnp.zeros(shape, dtype)

    # ---- our model (params imported, noise pinned) ---------------------
    model = NVAE(cfg)
    model_fwd = NVAE(cfg_fwd)
    variables = {"params": params, "batch_stats": bstats}
    jax.random.normal = _zeros_normal
    try:
        # ---- phase B: inference forward ------------------------------
        recon, z_params, log_p, log_q = ref(x_cmp, training=False, nll=True)
        out = model.apply(
            variables, jnp.asarray(x_cmp), False, True,
            rngs={"sample": jax.random.PRNGKey(0)},
        )
        d_logits = _max_delta(recon, out.logits)
        d_groups = max(
            max(
                _max_delta(g.enc_mu, m.enc_mu),
                _max_delta(g.enc_sigma, m.enc_sigma),
                _max_delta(g.dec_mu, m.dec_mu),
                _max_delta(g.dec_sigma, m.dec_sigma),
            )
            for g, m in zip(z_params, out.latents)
        )
        d_log_p = _rel_delta(log_p, out.log_p)
        d_log_q = _rel_delta(log_q, out.log_q)
        report["phases"]["B_forward"] = {
            "logits_max_abs": d_logits, "latent_params_max_abs": d_groups,
            "log_p_rel": d_log_p, "log_q_rel": d_log_q,
        }
        log(f"phase B: logits delta {d_logits:.2e}, latents {d_groups:.2e}, "
            f"log_p rel {d_log_p:.2e}, log_q rel {d_log_q:.2e}")

        # ---- phase C: loss decomposition -----------------------------
        rl_ref = ref.calculate_recon_loss(x_cmp, recon)
        kl_bal_ref = ref.calculate_kl_loss(z_params, True)
        kl_plain_ref = ref.calculate_kl_loss(z_params, False)
        bn_ref = float(ref.calculate_bn_loss())
        rl = losses.recon_loss(out.logits, jnp.asarray(x_cmp))
        kl_all = losses.kl_per_group(out.latents)
        alphas = losses.kl_alphas(
            cfg.n_latent_scales, cfg.n_groups_per_scale
        )
        kl_bal, _ = losses.balanced_kl_loss(kl_all, alphas)
        kl_plain = losses.unbalanced_kl_loss(kl_all)
        bn = float(losses.bn_gamma_penalty(params, cfg.sr_lambda))
        report["phases"]["C_losses"] = {
            "recon_rel": _rel_delta(rl_ref, rl),
            "kl_balanced_rel": _rel_delta(kl_bal_ref, kl_bal),
            "kl_plain_rel": _rel_delta(kl_plain_ref, kl_plain),
            "bn_rel": abs(bn_ref - bn) / max(abs(bn_ref), 1e-12),
        }
        log(f"phase C: {report['phases']['C_losses']}")

        # ---- phase D+E1: genuine train_step lockstep ------------------
        ref.load_weights(ckpt)
        ref.steps = 0
        ref.epoch = 0
        ref.compile(
            optimizer=tf_keras.optimizers.SGD(learning_rate=lr),
            run_eagerly=True,
        )
        # Probes: BN moving statistics + one spectral u + one SN kernel.
        bn_layer = ref.encoder.groups[0].layers[0].batch_norm1
        mm0 = np.array(bn_layer.moving_mean)
        sn_wrap = ref.decoder.sampler.enc_sampler[0]
        u0 = np.array(sn_wrap.u)
        ref_losses = []
        for i in range(n_steps):
            logs = ref.train_step((batches[i], None))
            ref_losses.append(float(logs["loss"]))
        bn_frozen = bool(np.array_equal(mm0, np.array(bn_layer.moving_mean)))
        sn_frozen = bool(np.array_equal(u0, np.array(sn_wrap.u)))
        report["phases"]["D_genuine_semantics"] = {
            "bn_moving_stats_frozen_in_train_step": bn_frozen,
            "sn_power_iteration_frozen_in_train_step": sn_frozen,
        }
        log(f"phase D: genuine train_step keeps BN moving stats frozen="
            f"{bn_frozen}, sn_u frozen={sn_frozen}")

        tc = TrainConfig(
            step_based_warmup=True, parity_frozen_norm=True,
            learning_rate=lr, epochs=1, batch_size=batch,
        )
        tx = optax.sgd(lr)
        model_e1, state, _ = create_train_state(
            cfg, tc, total_steps=total_steps, tx=tx
        )
        state = state.replace(
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, bstats),
            opt_state=tx.init(jax.tree.map(jnp.asarray, params)),
        )
        step_fn = make_train_step(
            model_e1, tx, tc, total_steps=total_steps,
            steps_per_epoch=total_steps, donate=False,
        )
        my_losses = []
        for i in range(n_steps):
            state, metrics = step_fn(state, jnp.asarray(batches[i]))
            my_losses.append(float(metrics["loss"]))
        ref.save_weights(os.path.join(tmp, "after_e1"))
        p_after, b_after, _ = import_reference_checkpoint(
            os.path.join(tmp, "after_e1"), cfg, strict=False
        )
        report["phases"]["E1_genuine_train_step_lockstep"] = {
            "ref_losses": ref_losses,
            "our_losses": my_losses,
            "loss_rel": max(
                abs(a - b) / max(abs(a), 1e-12)
                for a, b in zip(ref_losses, my_losses)
            ),
            "params_max_abs": _tree_max_delta(p_after, state.params),
            "batch_stats_max_abs": _tree_max_delta(
                b_after, state.batch_stats
            ),
        }
        log(f"phase E1: {report['phases']['E1_genuine_train_step_lockstep']}")

        # ---- phase E2: intended semantics (training=True) -------------
        ref.load_weights(ckpt)
        opt2 = tf_keras.optimizers.SGD(learning_rate=lr)
        ref2_losses = []
        for i in range(n_steps):
            with tf.GradientTape() as tape:
                recon_i, zp_i, *_ = ref(batches[i], training=True)
                rl_i = ref.calculate_recon_loss(batches[i], recon_i)
                bn_i = ref.calculate_bn_loss()
                beta = min(i / (0.3 * total_steps), 1)
                kl_i = beta * ref.calculate_kl_loss(zp_i, beta < 1)
                loss_i = tf.math.reduce_mean(rl_i + kl_i) + bn_i
            grads = tape.gradient(loss_i, ref.trainable_weights)
            opt2.apply_gradients(zip(grads, ref.trainable_weights))
            ref2_losses.append(float(loss_i))

        tc2 = TrainConfig(
            step_based_warmup=True, learning_rate=lr, epochs=1,
            batch_size=batch,
        )
        tx2 = optax.sgd(lr)
        model_e2, state2, _ = create_train_state(
            cfg_fwd, tc2, total_steps=total_steps, tx=tx2
        )
        state2 = state2.replace(
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, bstats),
            spectral=jax.tree.map(jnp.asarray, spectral),
            opt_state=tx2.init(jax.tree.map(jnp.asarray, params)),
        )
        step_fn2 = make_train_step(
            model_e2, tx2, tc2, total_steps=total_steps,
            steps_per_epoch=total_steps, donate=False,
        )
        my2_losses = []
        for i in range(n_steps):
            state2, metrics2 = step_fn2(state2, jnp.asarray(batches[i]))
            my2_losses.append(float(metrics2["loss"]))
        report["phases"]["E2_training_true_lockstep"] = {
            "ref_losses": ref2_losses,
            "our_losses": my2_losses,
            "loss_rel": max(
                abs(a - b) / max(abs(a), 1e-12)
                for a, b in zip(ref2_losses, my2_losses)
            ),
        }
        log(f"phase E2: {report['phases']['E2_training_true_lockstep']}")
    finally:
        tf.random.normal = real_tf_normal
        jax.random.normal = real_jax_normal

    report["wall_s"] = round(time.time() - t_start, 1)
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    report = run_oracle(args.reference, n_steps=args.steps, lr=args.lr)
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()

"""Cross-framework golden tests against the installed TF core (VERDICT r2
item 10): the reference trains with Keras BatchNormalization(momentum=0.05,
epsilon=1e-5) layers (reference ``common.py``/``encoder.py:91``) and Keras
Adamax(eps 1e-7) under a cosine-decay schedule (reference
``train.py:128-131``).  These tests pin our Flax/optax re-implementations to
the *real* framework's numerics, not just to self-consistency.

No TFA/TFP needed — plain ``tf.keras`` layers/optimizers only; skipped when
TF is absent.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class TestBatchNormGolden:
    """flax.linen.BatchNorm as configured in ``nvae_tpu.nn.blocks.BatchNorm``
    (momentum .05, eps 1e-5) vs ``tf.keras.layers.BatchNormalization`` with
    the reference's hyperparameters: training output, running-stat update
    rule, and inference apply must all agree."""

    def _keras_bn(self):
        bn = tf.keras.layers.BatchNormalization(momentum=0.05, epsilon=1e-5)
        bn.build((None, 4, 4, 8))
        return bn

    def _flax_bn(self):
        from nvae_tpu.nn.blocks import BatchNorm

        bn = BatchNorm()
        variables = bn.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 4, 4, 8)), True
        )
        return bn, variables

    def test_training_output_and_running_stats(self):
        rng = np.random.RandomState(0)
        batches = [
            rng.randn(6, 4, 4, 8).astype(np.float32) * (i + 1) + i
            for i in range(3)
        ]
        keras_bn = self._keras_bn()
        flax_bn, variables = self._flax_bn()

        for x in batches:
            y_tf = keras_bn(tf.constant(x), training=True).numpy()
            y_jx, mut = flax_bn.apply(
                variables, jnp.asarray(x), True, mutable=["batch_stats"]
            )
            variables = {**variables, "batch_stats": mut["batch_stats"]}
            np.testing.assert_allclose(
                np.asarray(y_jx), y_tf, rtol=2e-4, atol=2e-4
            )

        # Running statistics after 3 updates follow the same EMA rule:
        # moving = momentum * moving + (1 - momentum) * batch_stat.
        stats = jax.tree.leaves(variables["batch_stats"])
        flat = {
            "mean": np.asarray(variables["batch_stats"]["BatchNorm_0"]["mean"]),
            "var": np.asarray(variables["batch_stats"]["BatchNorm_0"]["var"]),
        }
        np.testing.assert_allclose(
            flat["mean"], keras_bn.moving_mean.numpy(), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            flat["var"], keras_bn.moving_variance.numpy(), rtol=1e-4,
            atol=1e-4,
        )
        assert stats  # tree non-empty

    def test_inference_apply_matches(self):
        rng = np.random.RandomState(1)
        x_train = rng.randn(16, 4, 4, 8).astype(np.float32) * 2.0 + 0.5
        x_eval = rng.randn(5, 4, 4, 8).astype(np.float32)

        keras_bn = self._keras_bn()
        flax_bn, variables = self._flax_bn()
        # One training step to move the stats off init, then inference.
        keras_bn(tf.constant(x_train), training=True)
        _, mut = flax_bn.apply(
            variables, jnp.asarray(x_train), True, mutable=["batch_stats"]
        )
        variables = {**variables, "batch_stats": mut["batch_stats"]}

        y_tf = keras_bn(tf.constant(x_eval), training=False).numpy()
        y_jx = flax_bn.apply(variables, jnp.asarray(x_eval), False)
        np.testing.assert_allclose(
            np.asarray(y_jx), y_tf, rtol=2e-4, atol=2e-4
        )

    def test_split_precision_bn_tracks_keras_stats(self):
        """The bf16-apply BN keeps fp32 statistics: its running stats must
        follow Keras' EMA exactly, and its output the fp32 BN to bf16
        resolution (~3 decimal digits)."""
        from nvae_tpu.nn.blocks import _SplitPrecisionBN

        rng = np.random.RandomState(2)
        x = rng.randn(8, 4, 4, 8).astype(np.float32) * 1.5 - 0.3

        keras_bn = self._keras_bn()
        y_tf = keras_bn(tf.constant(x), training=True).numpy()

        bn = _SplitPrecisionBN(apply_dtype=jnp.bfloat16)
        variables = bn.init(jax.random.PRNGKey(0), jnp.zeros_like(x), True)
        y_jx, mut = bn.apply(
            variables, jnp.asarray(x), True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["mean"]),
            keras_bn.moving_mean.numpy(), rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["var"]),
            keras_bn.moving_variance.numpy(), rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(y_jx, dtype=np.float32), y_tf, rtol=2e-2, atol=2e-2
        )


class TestAdamaxCosineGolden:
    """``make_optimizer`` (optax adamax eps 1e-7 + cosine decay) vs Keras
    ``Adamax(CosineDecay(...), epsilon=1e-7)`` — the reference's exact
    optimizer (``train.py:128-131``) — over a multi-step trajectory with
    shared synthetic gradients."""

    def test_trajectories_match(self):
        from nvae_tpu.config import TrainConfig
        from nvae_tpu.train.optim import make_optimizer

        lr, total_steps, n_steps = 0.01, 10, 10
        rng = np.random.RandomState(3)
        w0 = rng.randn(5, 3).astype(np.float32)
        grads = [rng.randn(5, 3).astype(np.float32) for _ in range(n_steps)]

        # Keras trajectory.
        schedule = tf.keras.optimizers.schedules.CosineDecay(
            lr, decay_steps=total_steps
        )
        opt = tf.keras.optimizers.Adamax(learning_rate=schedule, epsilon=1e-7)
        w_tf = tf.Variable(w0)
        for g in grads:
            opt.apply_gradients([(tf.constant(g), w_tf)])

        # optax trajectory through the framework's own constructor.
        cfg = TrainConfig(learning_rate=lr)
        tx = make_optimizer(cfg, total_steps, spectral_mode="none")
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        for g in grads:
            updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)

        np.testing.assert_allclose(
            np.asarray(params["w"]), w_tf.numpy(), rtol=1e-5, atol=1e-6
        )

    def test_cosine_schedule_values_match(self):
        lr, total_steps = 0.01, 40
        schedule_tf = tf.keras.optimizers.schedules.CosineDecay(
            lr, decay_steps=total_steps
        )
        import optax

        schedule_jx = optax.cosine_decay_schedule(
            init_value=lr, decay_steps=total_steps
        )
        for step in (0, 1, 7, 20, 39, 40, 55):
            np.testing.assert_allclose(
                float(schedule_jx(step)),
                float(schedule_tf(step).numpy()),
                rtol=1e-6, atol=1e-9,
                err_msg=f"step {step}",
            )

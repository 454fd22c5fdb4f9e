"""Train-step integration tests: optimization works, spectral strategies hold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvae_tpu.config import TrainConfig, debug_config
from nvae_tpu.nn.spectral import is_sn_kernel_path, power_iteration
from nvae_tpu.train.optim import find_spectral_state, make_optimizer
from nvae_tpu.train.state import create_train_state
from nvae_tpu.train.step import make_eval_step, make_train_step


def _setup(spectral_mode="projection", **train_overrides):
    model_cfg = debug_config(spectral_mode=spectral_mode)
    train_cfg = TrainConfig(
        epochs=2, batch_size=4, step_based_warmup=True, **train_overrides
    )
    model, state, tx = create_train_state(
        model_cfg, train_cfg, total_steps=100
    )
    step_fn = make_train_step(
        model, tx, train_cfg, total_steps=100, steps_per_epoch=50, donate=False
    )
    batch = (
        jax.random.uniform(jax.random.PRNGKey(42), (4, 32, 32, 1)) > 0.5
    ).astype(jnp.float32)
    return model, state, tx, step_fn, batch


@pytest.mark.slow
def test_train_step_reduces_loss():
    model, state, tx, step_fn, batch = _setup()
    first_recon = first_kl = None
    for i in range(8):
        state, metrics = step_fn(state, batch)
        if i == 0:
            first_recon = float(metrics["reconstruction_loss"])
            first_kl = float(metrics["kl_raw"])
    assert int(state.step) == 8
    last_recon = float(metrics["reconstruction_loss"])
    last_kl = float(metrics["kl_raw"])
    assert np.isfinite(last_recon) and np.isfinite(float(metrics["loss"]))
    # Overfitting a single small batch: the ELBO pieces must both drop.
    # (The *total* loss can rise during beta warm-up as KL gets weighted in.)
    assert last_recon < first_recon, (first_recon, last_recon)
    assert last_kl < first_kl, (first_kl, last_kl)
    # Metrics dict carries the reference's loss decomposition keys.
    for key in ("loss", "reconstruction_loss", "kl_loss", "bn_loss", "beta"):
        assert key in metrics


@pytest.mark.slow
def test_spectral_projection_keeps_unit_sigma():
    model, state, tx, step_fn, batch = _setup("projection")
    for _ in range(5):
        state, _ = step_fn(state, batch)
    sn_state = find_spectral_state(state.opt_state)
    assert sn_state is not None
    # Every tagged kernel should now have sigma(W) ~= 1.
    checked = 0
    leaves = jax.tree_util.tree_flatten_with_path(state.params)[0]
    u_leaves = {
        tuple(str(k) for k in p): v
        for p, v in jax.tree_util.tree_flatten_with_path(
            sn_state.u, is_leaf=lambda x: x is None
        )[0]
    }
    for path, w in leaves:
        if not is_sn_kernel_path(path):
            continue
        u = u_leaves[tuple(str(k) for k in path)]
        # A few extra iterations for an accurate estimate.
        for _ in range(10):
            sigma, u = power_iteration(w.reshape(-1, w.shape[-1]), u)
        # One power iteration per step tracks sigma with ~10% lag on a few
        # kernels (same lag as TFA's per-forward iteration).
        np.testing.assert_allclose(float(sigma), 1.0, rtol=0.15)
        checked += 1
    assert checked > 10


@pytest.mark.slow
def test_penalty_mode_runs_and_tracks():
    model, state, tx, step_fn, batch = _setup("penalty")
    state, metrics = step_fn(state, batch)
    assert "spectral_loss" in metrics
    assert np.isfinite(float(metrics["spectral_loss"]))
    assert float(metrics["spectral_loss"]) > 0.0


@pytest.mark.slow
def test_eval_step_and_beta_warmup():
    model, state, tx, step_fn, batch = _setup()
    state, m0 = step_fn(state, batch)
    # Warm-up: beta at step 0 is 0 and grows.
    assert float(m0["beta"]) == 0.0
    state, m1 = step_fn(state, batch)
    assert float(m1["beta"]) > 0.0
    eval_fn = make_eval_step(model, TrainConfig())
    em = eval_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(em["elbo"]))


@pytest.mark.slow
def test_rng_folding_gives_different_noise_per_step():
    """Two consecutive steps on the same batch must use different sample
    noise (the reference relies on global RNG; we fold the step counter)."""
    model, state, tx, step_fn, batch = _setup()
    s1, m1 = step_fn(state, batch)
    # Re-run from the same state: identical (deterministic).
    s1b, m1b = step_fn(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m1b["loss"]), rtol=1e-6)


@pytest.mark.slow
def test_forward_parity_spectral_mode_trains():
    """TFA-parity mode: power iteration in the forward pass, u vectors in the
    'spectral' collection, updated every train step."""
    model, state, tx, step_fn, batch = _setup("forward")
    assert state.spectral, "forward mode must create spectral variables"
    u_before = [np.asarray(x) for x in jax.tree.leaves(state.spectral)]
    state, metrics = step_fn(state, batch)
    u_after = [np.asarray(x) for x in jax.tree.leaves(state.spectral)]
    assert np.isfinite(float(metrics["loss"]))
    changed = any(not np.allclose(a, b) for a, b in zip(u_before, u_after))
    assert changed, "power-iteration vectors must update during training"


@pytest.mark.slow
def test_dml_rgb_training_step():
    """The DML-likelihood (RGB) configuration trains: loss finite and
    decreasing over a few steps on tinted synthetic RGB data (BASELINE
    config #4's likelihood path, reference postprocess.py:29 analog)."""
    from nvae_tpu.data import synthetic_dataset
    from nvae_tpu.data.pipeline import make_iterators

    model_cfg = debug_config(likelihood="dml", in_channels=3, n_mix=4)
    train_cfg = TrainConfig(
        epochs=2, batch_size=4, step_based_warmup=True, binary=False
    )
    model, state, tx = create_train_state(model_cfg, train_cfg, total_steps=100)
    step_fn = make_train_step(
        model, tx, train_cfg, total_steps=100, steps_per_epoch=50, donate=False
    )
    bundle = synthetic_dataset(n_train=16, n_test=8, channels=3)
    train_iter, _ = make_iterators(
        bundle, 4, binarize=False, seed=0
    )
    losses = []
    for batch in train_iter.epoch(0):
        assert batch.shape[-1] == 3
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(x) for x in losses)
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_bn_bf16_apply_matches_fp32_trajectory():
    """bn_apply_dtype=bfloat16 (fp32 stats, bf16 apply) must track the
    fp32-BN training trajectory to within bf16 rounding — same losses,
    step for step, on the debug config."""
    trajectories = {}
    for bn in ("float32", "bfloat16"):
        model_cfg = debug_config(compute_dtype="bfloat16", bn_apply_dtype=bn)
        train_cfg = TrainConfig(epochs=2, batch_size=4, step_based_warmup=True)
        model, state, tx = create_train_state(
            model_cfg, train_cfg, total_steps=100
        )
        step_fn = make_train_step(
            model, tx, train_cfg, total_steps=100, steps_per_epoch=50,
            donate=False,
        )
        batch = (
            jax.random.uniform(jax.random.PRNGKey(42), (4, 32, 32, 1)) > 0.5
        ).astype(jnp.float32)
        losses = []
        for _ in range(6):
            state, metrics = step_fn(state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(x) for x in losses)
        trajectories[bn] = np.array(losses)
    np.testing.assert_allclose(
        trajectories["bfloat16"], trajectories["float32"], rtol=2e-3
    )


def test_grad_accum_matches_manual_microbatch_average():
    """grad_accum=2 under linear SGD: the param update must equal
    -lr * mean(per-microbatch grads) with the microbatch grads computed
    manually through the same public loss pieces (losses.elbo_loss +
    bn_gamma_penalty, chained BN/spectral mutations, per-microbatch RNG
    fold) — an exact end-to-end check of the lax.scan accumulation."""
    import optax

    from nvae_tpu.train import losses

    model_cfg = debug_config()
    tc = TrainConfig(
        epochs=1, batch_size=8, step_based_warmup=True, grad_accum=2
    )
    model, s0, _ = create_train_state(model_cfg, tc, total_steps=4)
    lr = 1e-3
    tx = optax.sgd(lr)
    s0 = s0.replace(opt_state=tx.init(s0.params))
    step = make_train_step(model, tx, tc, 4, 4, donate=False)
    batch = (
        jax.random.uniform(jax.random.PRNGKey(11), (8, 32, 32, 1)) > 0.5
    ).astype(jnp.float32)
    s1, m = step(s0, batch)

    # Manual two-microbatch mirror of step.py's loss_fn.
    rng = jax.random.fold_in(s0.rng, s0.step)
    beta = losses.beta_schedule(
        s0.step, jnp.asarray(0), train_cfg=tc, total_steps=4, total_epochs=1
    )

    def loss_fn(params, mb, bstats, spect, rng_mb):
        variables = {"params": params, "batch_stats": bstats}
        mutable = ["batch_stats"]
        if spect:
            variables["spectral"] = spect
            mutable.append("spectral")
        out, mutated = model.apply(
            variables, mb, True, rngs={"sample": rng_mb}, mutable=mutable
        )
        loss, _ = losses.elbo_loss(out, mb, beta, model_cfg)
        loss = loss + losses.bn_gamma_penalty(params, model_cfg.sr_lambda)
        return loss, mutated

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    bstats, spect = s0.batch_stats, s0.spectral
    grads_acc, loss_acc = None, 0.0
    for i in range(2):
        mb = batch[i * 4 : (i + 1) * 4]
        (l_i, mutated), g_i = grad_fn(
            s0.params, mb, bstats, spect, jax.random.fold_in(rng, i)
        )
        bstats = mutated.get("batch_stats", bstats)
        spect = mutated.get("spectral", spect)
        loss_acc += float(l_i) / 2
        grads_acc = (
            g_i if grads_acc is None
            else jax.tree.map(lambda a, b: a + b, grads_acc, g_i)
        )
    avg_grads = jax.tree.map(lambda g: g / 2, grads_acc)
    expected = jax.tree.map(lambda p, g: p - lr * g, s0.params, avg_grads)

    for got, want in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(expected)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6
        )
    np.testing.assert_allclose(float(m["loss"]), loss_acc, rtol=1e-5)
    for got, want in zip(
        jax.tree.leaves(s1.batch_stats), jax.tree.leaves(bstats)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )


def test_grad_accum_rejects_non_divisible_batch():
    model_cfg = debug_config()
    tc = TrainConfig(
        epochs=1, batch_size=6, step_based_warmup=True, grad_accum=4
    )
    model, s0, tx = create_train_state(model_cfg, tc, total_steps=4)
    step = make_train_step(model, tx, tc, 4, 4, donate=False)
    batch = jnp.zeros((6, 32, 32, 1))
    with pytest.raises(ValueError, match="not divisible"):
        step(s0, batch)


def test_trainer_rejects_grad_accum_with_scan_epochs():
    from nvae_tpu.train.trainer import Trainer

    with pytest.raises(ValueError, match="grad_accum"):
        Trainer(
            debug_config(),
            TrainConfig(
                epochs=1, batch_size=8, scan_epochs=True, grad_accum=2
            ),
            steps_per_epoch=2,
        )


def test_parity_frozen_norm_keeps_norm_state_frozen():
    """TrainConfig.parity_frozen_norm reproduces the reference's genuine
    train-time semantics (models.py:117 calls self(data) with no training
    flag -> inference mode throughout; proven by tools/reference_oracle.py
    phase D): BN batch_stats and spectral u must stay EXACTLY at their
    initial values across steps, while params still train.  Default mode
    must keep updating both."""
    for frozen in (True, False):
        model, state, tx, step_fn, batch = _setup(
            spectral_mode="forward", parity_frozen_norm=frozen
        )
        b0 = jax.tree.map(np.array, state.batch_stats)
        s0 = jax.tree.map(np.array, state.spectral)
        p0 = jax.tree.map(np.array, state.params)
        for _ in range(2):
            state, metrics = step_fn(state, batch)
        db = max(
            float(np.max(np.abs(a - np.asarray(b))))
            for a, b in zip(jax.tree.leaves(b0),
                            jax.tree.leaves(state.batch_stats))
        )
        ds = max(
            float(np.max(np.abs(a - np.asarray(b))))
            for a, b in zip(jax.tree.leaves(s0),
                            jax.tree.leaves(state.spectral))
        )
        dp = max(
            float(np.max(np.abs(a - np.asarray(b))))
            for a, b in zip(jax.tree.leaves(p0),
                            jax.tree.leaves(state.params))
        )
        assert np.isfinite(float(metrics["loss"]))
        assert dp > 0, "params must train in both modes"
        if frozen:
            assert db == 0.0, f"frozen mode moved batch_stats by {db}"
            assert ds == 0.0, f"frozen mode moved spectral u by {ds}"
        else:
            assert db > 0, "default mode must update batch_stats"
            assert ds > 0, "default mode must update spectral u"

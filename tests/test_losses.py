"""Loss-layer tests: KL balancing golden values, warm-up schedule, penalties."""

import jax
import jax.numpy as jnp
import numpy as np

from nvae_tpu.config import ModelConfig, TrainConfig, debug_config
from nvae_tpu.models.nvae import LatentParams
from nvae_tpu.train import losses


def test_kl_alphas_golden_default_config():
    """Hand-computed for the paper-default (5, 10) config, mirroring
    reference models.py:227-237: i=0 -> 1/10 for 10 entries, i=1 -> 4/5 for
    5 entries, concatenated then normalized by the min (0.1)."""
    alphas = losses.kl_alphas(2, (5, 10))
    expected = np.concatenate([np.full(10, 1.0), np.full(5, 8.0)])
    np.testing.assert_allclose(alphas, expected, rtol=1e-6)


def test_kl_alphas_three_scales():
    alphas = losses.kl_alphas(3, (2, 3, 4))
    raw = np.concatenate([np.full(4, 1 / 4), np.full(3, 4 / 3), np.full(2, 16 / 2)])
    np.testing.assert_allclose(alphas, raw / raw.min(), rtol=1e-6)


def test_balanced_kl_golden_small_case():
    """Golden-value test of the balancing algebra (models.py:204-218)."""
    kl_all = jnp.array([[1.0, 3.0], [2.0, 2.0], [10.0, 10.0]])  # (G=3, B=2)
    alphas = jnp.array([1.0, 1.0, 2.0])
    got_loss, got_coeff = losses.balanced_kl_loss(kl_all, alphas)
    # coeff_i = mean|kl| + 0.01 = [2.01, 2.01, 10.01]; total = 14.03
    # / alpha * total = [28.2003, 28.2003, 70.22015]
    # / mean(42.206966..) = [0.66814, 0.66814, 1.66371]
    c = np.array([2.01, 2.01, 10.01])
    c = c / np.array([1.0, 1.0, 2.0]) * c.sum()
    c = c / c.mean()
    np.testing.assert_allclose(got_coeff, c, rtol=1e-5)
    want_loss = (np.array([[1.0, 3.0], [2.0, 2.0], [10.0, 10.0]]) * c[:, None]).sum(0)
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5)


def test_balanced_kl_coeffs_carry_no_gradient():
    kl_all = jnp.array([[1.0], [5.0]])
    alphas = jnp.ones(2)

    def f(k):
        loss, _ = losses.balanced_kl_loss(k, alphas)
        return jnp.sum(loss)

    g = jax.grad(f)(kl_all)
    # With stop_gradient on coeffs, d loss / d kl_g = coeff_g exactly.
    _, coeff = losses.balanced_kl_loss(kl_all, alphas)
    np.testing.assert_allclose(g[:, 0], coeff, rtol=1e-5)


def test_beta_schedule_modes():
    tc_step = TrainConfig(step_based_warmup=True)
    tc_epoch = TrainConfig(step_based_warmup=False)
    tc_parity = TrainConfig(
        step_based_warmup=False, parity_epoch_warmup_in_steps=True
    )
    total_steps, total_epochs = 1000, 10
    kw = dict(total_steps=total_steps, total_epochs=total_epochs)
    # Step-based: beta=1 at 30% of steps.
    b = losses.beta_schedule(jnp.array(150), jnp.array(1), train_cfg=tc_step, **kw)
    np.testing.assert_allclose(b, 0.5, atol=1e-6)
    b = losses.beta_schedule(jnp.array(300), jnp.array(3), train_cfg=tc_step, **kw)
    np.testing.assert_allclose(b, 1.0)
    # Epoch-based fixed: beta=1 at 30% of epochs.
    b = losses.beta_schedule(jnp.array(0), jnp.array(3), train_cfg=tc_epoch, **kw)
    np.testing.assert_allclose(b, 1.0)
    # Parity mode: epoch counter divided by total steps -> tiny beta.
    b = losses.beta_schedule(jnp.array(0), jnp.array(3), train_cfg=tc_parity, **kw)
    np.testing.assert_allclose(b, 3 / 300, atol=1e-6)


def test_recon_loss_crop_matches_interior():
    rng = jax.random.PRNGKey(0)
    x = (jax.random.uniform(rng, (2, 32, 32, 1)) > 0.5).astype(jnp.float32)
    logits = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 32, 1))
    full = losses.recon_loss(logits, x)
    cropped = losses.recon_loss(logits, x, crop=2)
    manual = losses.recon_loss(
        logits[:, 2:30, 2:30, :], x[:, 2:30, 2:30, :]
    )
    np.testing.assert_allclose(cropped, manual, rtol=1e-6)
    assert float(jnp.sum(cropped)) < float(jnp.sum(full))


def test_bn_gamma_penalty_scope():
    """Penalty covers encoder+decoder BN scales only (models.py:252-267)."""
    params = {
        "encoder": {"BatchNorm_0": {"BatchNorm_0": {"scale": jnp.array([2.0, -3.0])}}},
        "decoder": {"cell": {"BatchNorm_1": {"BatchNorm_0": {"scale": jnp.array([1.5])}}}},
        "preprocess": {"BatchNorm_0": {"BatchNorm_0": {"scale": jnp.array([100.0])}}},
        "postprocess": {"x": {"scale": jnp.array([50.0])}},
    }
    got = losses.bn_gamma_penalty(params, sr_lambda=0.01)
    np.testing.assert_allclose(got, 0.01 * (3.0 + 1.5), rtol=1e-6)


def _fake_latents(rng, groups, batch=2, size=4, c=3):
    out = []
    for i in range(groups):
        k = jax.random.fold_in(rng, i)
        mu = jax.random.normal(k, (batch, size, size, c))
        out.append(
            LatentParams(
                enc_mu=mu,
                enc_sigma=jnp.ones_like(mu) * 1.1,
                dec_mu=jnp.zeros_like(mu),
                dec_sigma=jnp.ones_like(mu),
            )
        )
    return out


def test_kl_per_group_shape_and_positivity():
    latents = _fake_latents(jax.random.PRNGKey(2), groups=4)
    kl = losses.kl_per_group(latents)
    assert kl.shape == (4, 2)
    assert float(jnp.min(kl)) > 0.0  # KL > 0 for distinct distributions

"""Unit tests for core numerics against closed forms and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from nvae_tpu.config import ModelConfig, debug_config
from nvae_tpu.ops import (
    bernoulli_log_prob,
    diagonal_gaussian_kl,
    dml_log_prob,
    dml_mean,
    dml_sample,
    gaussian_log_prob,
    normalize_l2,
    slerp,
    softclamp5,
)


def test_softclamp5_bounds_and_identity():
    x = jnp.linspace(-100, 100, 101)
    y = softclamp5(x)
    assert float(jnp.max(jnp.abs(y))) <= 5.0
    # Near the origin it is ~identity.
    np.testing.assert_allclose(softclamp5(jnp.array(0.1)), 0.1, atol=1e-3)
    # Differentiable everywhere (no hard clip).
    g = jax.grad(lambda v: softclamp5(v))(20.0)
    assert 0.0 < g < 1.0


def test_gaussian_log_prob_matches_scipy():
    rng = np.random.RandomState(0)
    z = rng.randn(4, 3).astype(np.float32)
    mu = rng.randn(4, 3).astype(np.float32)
    sigma = np.abs(rng.randn(4, 3)).astype(np.float32) + 0.5
    got = gaussian_log_prob(jnp.array(z), jnp.array(mu), jnp.array(sigma))
    want = scipy.stats.norm.logpdf(z, loc=mu, scale=sigma)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kl_matches_analytic():
    rng = np.random.RandomState(1)
    mu_q = rng.randn(8).astype(np.float32)
    s_q = np.abs(rng.randn(8)).astype(np.float32) + 0.3
    mu_p = rng.randn(8).astype(np.float32)
    s_p = np.abs(rng.randn(8)).astype(np.float32) + 0.3
    got = diagonal_gaussian_kl(
        jnp.array(mu_q), jnp.array(s_q), jnp.array(mu_p), jnp.array(s_p)
    )
    # Standard closed form KL(N(mq,sq) || N(mp,sp))
    want = (
        np.log(s_p / s_q)
        + (s_q**2 + (mu_q - mu_p) ** 2) / (2 * s_p**2)
        - 0.5
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # KL(p || p) == 0
    zero = diagonal_gaussian_kl(
        jnp.array(mu_q), jnp.array(s_q), jnp.array(mu_q), jnp.array(s_q)
    )
    np.testing.assert_allclose(zero, np.zeros(8), atol=1e-6)


def test_bernoulli_log_prob_matches_scipy():
    rng = np.random.RandomState(2)
    logits = rng.randn(16).astype(np.float32) * 3
    x = (rng.rand(16) > 0.5).astype(np.float32)
    got = bernoulli_log_prob(jnp.array(logits), jnp.array(x))
    p = 1.0 / (1.0 + np.exp(-logits))
    want = scipy.stats.bernoulli.logpmf(x.astype(int), p)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_slerp_endpoints_and_norm():
    rng = jax.random.PRNGKey(3)
    a = jax.random.normal(rng, (4, 2, 2, 8))
    b = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2, 2, 8))
    t0 = slerp(a, b, jnp.zeros(4))
    t1 = slerp(a, b, jnp.ones(4))
    np.testing.assert_allclose(t0, normalize_l2(a), atol=1e-5)
    np.testing.assert_allclose(t1, normalize_l2(b), atol=1e-4)
    # Output is unit-norm along channels for any t.
    mid = slerp(a, b, jnp.full((4,), 0.37))
    norms = jnp.sum(mid**2, axis=-1)
    np.testing.assert_allclose(norms, np.ones_like(norms), atol=1e-5)


def test_dml_log_prob_normalizes():
    """Summing discretized-logistic probs over all 256 levels gives ~1."""
    rng = jax.random.PRNGKey(4)
    n_mix, c = 3, 1
    params = jax.random.normal(rng, (1, 1, 1, n_mix * (1 + 2 * c)))
    levels = jnp.linspace(0.0, 1.0, 256).reshape(256, 1, 1, 1)
    params_b = jnp.broadcast_to(params, (256, 1, 1, params.shape[-1]))
    lp = dml_log_prob(params_b, levels, n_mix=n_mix)
    total = float(jnp.sum(jnp.exp(lp)))
    assert abs(total - 1.0) < 1e-3, total


def test_dml_sample_and_mean_shapes():
    rng = jax.random.PRNGKey(5)
    n_mix, c = 5, 3
    params = jax.random.normal(rng, (2, 8, 8, n_mix * (1 + 2 * c)))
    s = dml_sample(params, rng, n_mix=n_mix, n_channels=c)
    m = dml_mean(params, n_mix=n_mix, n_channels=c)
    assert s.shape == (2, 8, 8, c)
    assert m.shape == (2, 8, 8, c)
    assert float(jnp.min(s)) >= 0.0 and float(jnp.max(s)) <= 1.0


class TestConfigShapes:
    def test_default_mnist_shape_algebra(self):
        """Matches the SURVEY §3.1 shape trace for the paper-default config."""
        cfg = ModelConfig()
        s = cfg.shapes()
        assert s.mult_after_preprocess == 4
        assert s.enc_scale_sizes == (8, 4)
        assert s.enc_scale_channels == (128, 256)
        assert s.base_size == 4
        assert s.base_channels_enc == 256
        assert s.base_channels_dec == 256
        assert s.dec_scale_sizes == (4, 8)
        assert s.dec_scale_channels == (256, 128)
        assert cfg.z0_shape == (4, 4, 20)
        assert cfg.n_total_groups == 15

    def test_debug_config_valid(self):
        cfg = debug_config()
        s = cfg.shapes()
        assert s.base_size == 8
        assert cfg.n_latent_scales == 2

    def test_invalid_shapes_raise(self):
        with pytest.raises(ValueError):
            ModelConfig(image_size=30).shapes()

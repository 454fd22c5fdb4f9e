"""End-to-end model tests: shapes, latent structure, sampling, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvae_tpu.config import ModelConfig, debug_config
from nvae_tpu.models import NVAE


@pytest.fixture(scope="module")
def small_model():
    cfg = debug_config()
    model = NVAE(cfg)
    x = jnp.zeros((2, 32, 32, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x,
        True,
    )
    return cfg, model, variables


def test_forward_shapes(small_model):
    cfg, model, variables = small_model
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 1))
    out, _ = model.apply(
        variables, x, True, rngs={"sample": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    assert out.logits.shape == (2, 32, 32, 1)
    assert len(out.latents) == cfg.n_total_groups
    shapes = cfg.shapes()
    # Latents are ordered top-down: first groups at base resolution.
    groups_topdown = tuple(reversed(cfg.n_groups_per_scale))
    i = 0
    for scale in range(cfg.n_latent_scales):
        for _ in range(groups_topdown[scale]):
            lat = out.latents[i]
            size = shapes.dec_scale_sizes[scale]
            assert lat.enc_mu.shape == (2, size, size, cfg.n_latent_per_group), i
            i += 1
    # Group 0's prior is standard normal.
    np.testing.assert_allclose(out.latents[0].dec_mu, 0.0)
    np.testing.assert_allclose(out.latents[0].dec_sigma, 1.0)
    # Sigma heads respect the softclamp floor/ceiling.
    for lat in out.latents:
        assert float(jnp.min(lat.enc_sigma)) >= 1e-2
        assert float(jnp.max(lat.enc_sigma)) <= np.exp(5.0) + 1e-2 + 1e-3


def test_nll_mode_accumulates_log_probs(small_model):
    cfg, model, variables = small_model
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 1))
    out = model.apply(
        variables, x, False, True, rngs={"sample": jax.random.PRNGKey(5)}
    )
    assert out.log_p.shape == (2,)
    assert out.log_q.shape == (2,)
    assert float(jnp.sum(jnp.abs(out.log_p))) > 0.0
    assert float(jnp.sum(jnp.abs(out.log_q))) > 0.0
    # Non-nll mode leaves them zero.
    out0 = model.apply(
        variables, x, False, False, rngs={"sample": jax.random.PRNGKey(5)}
    )
    np.testing.assert_allclose(out0.log_p, 0.0)


def test_batch_size_one_works(small_model):
    """The reference's tf.squeeze defect breaks batch size 1
    (common.py:73, SURVEY defects); this framework must not."""
    cfg, model, variables = small_model
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 32, 32, 1))
    out = model.apply(
        variables, x, False, rngs={"sample": jax.random.PRNGKey(7)}
    )
    assert out.logits.shape == (1, 32, 32, 1)


def test_sample_shapes_and_range(small_model):
    cfg, model, variables = small_model
    images, last_s, z1, z2 = model.apply(
        variables, 4, 0.8, rngs={"sample": jax.random.PRNGKey(8)},
        method=NVAE.sample,
    )
    assert images.shape == (4, 32, 32, 1)
    assert float(jnp.min(images)) >= 0.0 and float(jnp.max(images)) <= 1.0
    base = cfg.shapes().dec_scale_sizes[-1]
    assert z1.shape == (4, base, base, cfg.n_latent_per_group)
    assert z2.shape == z1.shape
    # last_s feeds the final combiner: spatial size of the last scale.
    assert last_s.shape[1] == base


def test_sample_with_z_matches_interp_contract(small_model):
    cfg, model, variables = small_model
    images, last_s, z1, z2 = model.apply(
        variables, 2, 1.0, rngs={"sample": jax.random.PRNGKey(9)},
        method=NVAE.sample,
    )
    out = model.apply(
        variables, z1, last_s, rngs={"sample": jax.random.PRNGKey(10)},
        method=NVAE.sample_with_z,
    )
    assert out.shape == images.shape


def test_sampling_is_rng_deterministic(small_model):
    cfg, model, variables = small_model
    a, *_ = model.apply(
        variables, 2, 1.0, rngs={"sample": jax.random.PRNGKey(11)},
        method=NVAE.sample,
    )
    b, *_ = model.apply(
        variables, 2, 1.0, rngs={"sample": jax.random.PRNGKey(11)},
        method=NVAE.sample,
    )
    c, *_ = model.apply(
        variables, 2, 1.0, rngs={"sample": jax.random.PRNGKey(12)},
        method=NVAE.sample,
    )
    np.testing.assert_allclose(a, b)
    assert float(jnp.max(jnp.abs(a - c))) > 1e-6


def test_temperature_changes_spread(small_model):
    cfg, model, variables = small_model
    rng = {"sample": jax.random.PRNGKey(13)}
    cold, *_ = model.apply(variables, 8, 1e-4, rngs=rng, method=NVAE.sample)
    hot, *_ = model.apply(variables, 8, 1.0, rngs=rng, method=NVAE.sample)
    # Near-zero temperature collapses z0 to the prior mean -> less sample
    # diversity (not exactly zero since deeper groups still sample at T=1,
    # the reference's documented asymmetry).
    assert float(jnp.std(cold)) <= float(jnp.std(hot)) + 1e-3


def test_default_config_param_count():
    """Default MNIST model builds with the documented architecture scale."""
    cfg = ModelConfig()
    model = NVAE(cfg)
    x = jnp.zeros((1, 32, 32, 1))
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)},
            x,
            True,
        )
    )
    n_params = sum(
        np.prod(p.shape) for p in jax.tree.leaves(variables["params"])
    )
    # The reference paper quotes ~21M parameters for this configuration.
    assert 5e6 < n_params < 60e6, n_params


def test_dml_likelihood_head():
    cfg = debug_config(likelihood="dml", in_channels=3, n_mix=4)
    model = NVAE(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x,
        True,
    )
    out = model.apply(
        variables, x, False, rngs={"sample": jax.random.PRNGKey(2)}
    )
    assert out.logits.shape == (2, 32, 32, 4 * (1 + 2 * 3))
    images, *_ = model.apply(
        variables, 2, 1.0, rngs={"sample": jax.random.PRNGKey(3)},
        method=NVAE.sample,
    )
    assert images.shape == (2, 32, 32, 3)


def test_annealed_per_scale_temperatures(small_model):
    """scale_temperatures gives per-scale sampling control (annealed
    sampling for the multi-scale CelebA configuration)."""
    cfg, model, variables = small_model
    rng = {"sample": jax.random.PRNGKey(20)}
    cold, *_ = model.apply(
        variables, 8, 1.0, True, (1e-4,) * cfg.n_latent_scales,
        rngs=rng, method=NVAE.sample,
    )
    hot, *_ = model.apply(
        variables, 8, 1.0, True, (1.0,) * cfg.n_latent_scales,
        rngs=rng, method=NVAE.sample,
    )
    assert cold.shape == hot.shape
    # All-scales-cold collapses variability much harder than the z0-only
    # temperature path tested elsewhere.
    assert float(jnp.std(cold)) < float(jnp.std(hot))


def test_per_sample_temperature_vector_matches_scalar(small_model):
    """temperature of shape (B,) with every row equal to t is BITWISE the
    scalar-t call under the same rng — the batched-sweep path changes only
    the broadcast, never the draws."""
    cfg, model, variables = small_model
    rng = {"sample": jax.random.PRNGKey(21)}
    scalar, *_ = model.apply(variables, 4, 0.7, rngs=rng, method=NVAE.sample)
    vec, *_ = model.apply(
        variables, 4, jnp.full((4,), 0.7, jnp.float32),
        rngs=rng, method=NVAE.sample,
    )
    np.testing.assert_array_equal(np.asarray(scalar), np.asarray(vec))


def test_per_sample_temperature_mixed_batch(small_model):
    """A mixed (B,) temperature vector samples each row at its own T: the
    cold rows of the batch have less spread than the hot rows."""
    cfg, model, variables = small_model
    temps = jnp.concatenate(
        [jnp.full((8,), 1e-4), jnp.full((8,), 1.0)]
    ).astype(jnp.float32)
    images, *_ = model.apply(
        variables, 16, temps, rngs={"sample": jax.random.PRNGKey(22)},
        method=NVAE.sample,
    )
    cold_std = float(jnp.std(images[:8]))
    hot_std = float(jnp.std(images[8:]))
    assert cold_std <= hot_std + 1e-3


def test_per_sample_scale_temperatures_2d_matches_1d(small_model):
    """(n_scales, B) scale_temperatures with identical columns is BITWISE
    the (n_scales,) annealed call under the same rng."""
    cfg, model, variables = small_model
    sched = tuple(0.5 for _ in range(cfg.n_latent_scales))
    rng = {"sample": jax.random.PRNGKey(23)}
    flat, *_ = model.apply(
        variables, 4, 1.0, True, sched, rngs=rng, method=NVAE.sample,
    )
    grid = jnp.full((cfg.n_latent_scales, 4), 0.5, jnp.float32)
    per_row, *_ = model.apply(
        variables, 4, 1.0, True, grid, rngs=rng, method=NVAE.sample,
    )
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(per_row))


def test_three_scale_deep_hierarchy():
    """Deeper hierarchies (more scales/groups — the Omniglot/Fashion-MNIST
    transfer config, BASELINE #3) build and run."""
    cfg = debug_config(n_groups_per_scale=(1, 2, 2), image_size=32,
                       n_preprocess_blocks=1)
    s = cfg.shapes()
    assert s.enc_scale_sizes == (16, 8, 4)
    assert s.base_size == 4
    model = NVAE(cfg)
    x = jnp.zeros((2, 32, 32, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, True,
    )
    out = model.apply(variables, x, False, rngs={"sample": jax.random.PRNGKey(2)})
    assert out.logits.shape == (2, 32, 32, 1)
    assert len(out.latents) == 5
    images, *_ = model.apply(
        variables, 2, 0.8, rngs={"sample": jax.random.PRNGKey(3)},
        method=NVAE.sample,
    )
    assert images.shape == (2, 32, 32, 1)


def test_remat_model_forward_and_grads():
    """Rematerialized cells produce a working, deterministic model with
    gradients flowing through the checkpoint boundaries (remat only changes
    the backward-pass schedule, trading recompute for activation memory)."""
    cfg = debug_config(n_groups_per_scale=(1, 1), n_latent_per_group=2,
                       remat=True)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    model = NVAE(cfg)
    variables = model.init(rngs, x, True)
    out1 = model.apply(variables, x, False, rngs={"sample": jax.random.PRNGKey(2)})
    out2 = model.apply(variables, x, False, rngs={"sample": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(out1.logits), np.asarray(out2.logits))
    assert np.all(np.isfinite(np.asarray(out1.logits)))

    # Gradients flow through every remat boundary.
    def loss_fn(variables):
        out = model.apply(variables, x, False,
                          rngs={"sample": jax.random.PRNGKey(2)})
        return jnp.sum(out.logits ** 2)

    g = jax.grad(loss_fn)(variables)
    total = float(sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g["params"])))
    assert np.isfinite(total) and total > 0


def test_postprocess_depthwise_option():
    cfg = debug_config(n_groups_per_scale=(1, 1), n_latent_per_group=2,
                       postprocess_5x5_depthwise=True)
    model = NVAE(cfg)
    x = jnp.zeros((2, 32, 32, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, True,
    )
    out = model.apply(variables, x, False, rngs={"sample": jax.random.PRNGKey(2)})
    assert out.logits.shape == (2, 32, 32, 1)
    # Depthwise kernels present; fewer params than the full-conv variant.
    full = NVAE(debug_config(n_groups_per_scale=(1, 1), n_latent_per_group=2))
    vf = full.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, True,
    )
    n_dw = sum(p.size for p in jax.tree.leaves(variables["params"]))
    n_full = sum(p.size for p in jax.tree.leaves(vf["params"]))
    assert n_dw < n_full

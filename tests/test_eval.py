"""Metric-suite tests: Frechet vs scipy, k-NN P&R ground truths, PPL, NLL."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from nvae_tpu.eval.frechet import (
    activation_statistics,
    fid_from_features,
    frechet_distance,
)
from nvae_tpu.eval.features import extract_features, get_extractor
from nvae_tpu.eval.ppl import evaluate as ppl_evaluate, slerp_pair
from nvae_tpu.eval.precision_recall import (
    knn_precision_recall_features,
    pairwise_sq_dists,
)


class TestFrechet:
    def test_matches_scipy_sqrtm(self):
        rng = np.random.RandomState(0)
        d = 16
        a = rng.randn(200, d).astype(np.float32)
        b = (rng.randn(220, d) * 1.5 + 0.3).astype(np.float32)
        mu1, c1 = activation_statistics(jnp.asarray(a))
        mu2, c2 = activation_statistics(jnp.asarray(b))
        got = float(frechet_distance(mu1, c1, mu2, c2))
        # Reference formula via scipy (fid_utils.py:320-371).
        m1, s1 = a.mean(0), np.cov(a, rowvar=False)
        m2, s2 = b.mean(0), np.cov(b, rowvar=False)
        covmean = scipy.linalg.sqrtm(s1.dot(s2)).real
        want = np.sum((m1 - m2) ** 2) + np.trace(s1 + s2 - 2 * covmean)
        np.testing.assert_allclose(got, want, rtol=2e-2)

    def test_identical_distributions_near_zero(self):
        rng = np.random.RandomState(1)
        a = rng.randn(500, 8).astype(np.float32)
        assert fid_from_features(a, a.copy()) < 1e-6
        # Device (fp32) path stays within float noise.
        assert fid_from_features(a, a.copy(), precise=False) < 0.05

    def test_separated_gaussians_positive(self):
        rng = np.random.RandomState(2)
        a = rng.randn(300, 8).astype(np.float32)
        b = rng.randn(300, 8).astype(np.float32) + 5.0
        fid = fid_from_features(a, b)
        # Mean shift of 5 in 8 dims -> |mu diff|^2 = 8*25 = 200.
        assert 150 < fid < 260, fid


class TestPrecisionRecall:
    def test_pairwise_distances_match_numpy(self):
        rng = np.random.RandomState(3)
        u = rng.randn(10, 4).astype(np.float32)
        v = rng.randn(12, 4).astype(np.float32)
        got = np.asarray(pairwise_sq_dists(jnp.asarray(u), jnp.asarray(v)))
        want = ((u[:, None] - v[None]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_identical_sets_give_perfect_pr(self):
        rng = np.random.RandomState(4)
        feats = rng.randn(200, 16).astype(np.float32)
        pr = knn_precision_recall_features(feats, feats.copy())
        assert pr["precision"] == pytest.approx(1.0)
        assert pr["recall"] == pytest.approx(1.0)

    def test_disjoint_sets_give_zero_pr(self):
        rng = np.random.RandomState(5)
        a = rng.randn(200, 16).astype(np.float32)
        b = rng.randn(200, 16).astype(np.float32) + 100.0
        pr = knn_precision_recall_features(a, b)
        assert pr["precision"] == pytest.approx(0.0)
        assert pr["recall"] == pytest.approx(0.0)

    def test_batched_radii_match_full_matrix(self):
        """The streaming top-(k+1) radii pass (row/col blocks, VERDICT r2 #7)
        must equal the full-matrix path — uneven final blocks included."""
        from nvae_tpu.eval.precision_recall import (
            _knn_radii,
            _knn_radii_batched,
        )

        rng = np.random.RandomState(7)
        for n in (64, 70):  # 70: last row AND col block are partial
            feats = jnp.asarray(rng.randn(n, 16).astype(np.float32))
            for k in (3, 5):
                full = np.asarray(_knn_radii(feats, k))
                batched = np.asarray(_knn_radii_batched(feats, k, 32))
                np.testing.assert_allclose(batched, full, rtol=1e-5,
                                           atol=1e-5)

    def test_streamed_membership_matches_full_matrix(self):
        """The column-streamed membership pass (OR-accumulated tiles; the
        1M-scale memory bound) must equal the full-matrix membership."""
        from nvae_tpu.eval.precision_recall import (
            _membership,
            _membership_rows,
        )

        rng = np.random.RandomState(9)
        ref = jnp.asarray(rng.randn(96, 16).astype(np.float32))
        ev = jnp.asarray(rng.randn(40, 16).astype(np.float32))
        radii = jnp.asarray(rng.rand(96).astype(np.float32) * 20.0)
        full = np.asarray(_membership(ev, ref, radii))
        streamed = np.asarray(_membership_rows(ev, ref, radii, 32))
        np.testing.assert_array_equal(streamed, full)

    def test_large_n_takes_batched_path(self):
        """Above row_batch_size the orchestrator streams the radii; the
        result must match the in-one-jit small path."""
        rng = np.random.RandomState(8)
        real = rng.randn(150, 8).astype(np.float32)
        gen = rng.randn(130, 8).astype(np.float32) * 0.5
        small = knn_precision_recall_features(real, gen)
        streamed = knn_precision_recall_features(
            real, gen, row_batch_size=64
        )
        assert streamed["precision"] == pytest.approx(small["precision"])
        assert streamed["recall"] == pytest.approx(small["recall"])

    def test_subset_relationship(self):
        """Generated ⊂ real manifold: precision high, recall low."""
        rng = np.random.RandomState(6)
        real = rng.randn(400, 8).astype(np.float32) * 3
        gen = rng.randn(400, 8).astype(np.float32) * 0.3  # tight cluster
        pr = knn_precision_recall_features(real, gen)
        assert pr["precision"] > 0.8
        assert pr["recall"] < 0.5


def _np_manifold_oracle(ref, ev, nhood_sizes, clamp=None, eps=1e-5):
    """NumPy transliteration of reference ``ManifoldEstimator``
    (``precision_recall.py:93-142``): radii, percentile clamp, membership,
    realism, nearest neighbors."""
    d_ref = ((ref[:, None] - ref[None]) ** 2).sum(-1)
    D = np.sort(d_ref, axis=1)[:, list(nhood_sizes)]  # (N, num_nhoods)
    if clamp is not None:
        max_distances = np.percentile(D, clamp, axis=0)
        D[D > max_distances] = 0
    d = ((ev[:, None] - ref[None]) ** 2).sum(-1)  # (E, N)
    preds = np.any(d[:, :, None] <= D[None, :, :], axis=1).astype(np.int32)
    realism = np.max(D[:, 0] / (d + eps), axis=1)
    neighbors = np.argmin(d, axis=1)
    return preds, realism, neighbors


class TestManifoldEstimator:
    """The reference's full evaluate() surface (``precision_recall.py:
    64-151``): realism, nearest neighbors, clamp_to_percentile — against a
    NumPy oracle (VERDICT r3 #4)."""

    def test_evaluate_matches_numpy_oracle(self):
        from nvae_tpu.eval.precision_recall import ManifoldEstimator

        rng = np.random.RandomState(11)
        ref = rng.randn(50, 8).astype(np.float32)
        ev = (rng.randn(40, 8) * 0.8 + 0.2).astype(np.float32)
        est = ManifoldEstimator(ref, nhood_sizes=(3, 5))
        preds, realism, neighbors = est.evaluate(
            ev, return_realism=True, return_neighbors=True
        )
        want_p, want_r, want_n = _np_manifold_oracle(ref, ev, (3, 5))
        np.testing.assert_array_equal(np.asarray(preds), want_p)
        np.testing.assert_allclose(
            np.asarray(realism), want_r, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(neighbors), want_n)

    def test_evaluate_streamed_matches_oracle(self):
        """Row/col-streamed tiles (row_batch_size < N, ragged final block)
        must produce identical realism/neighbor/membership outputs."""
        from nvae_tpu.eval.precision_recall import ManifoldEstimator

        rng = np.random.RandomState(12)
        ref = rng.randn(70, 8).astype(np.float32)
        ev = (rng.randn(45, 8) * 0.7).astype(np.float32)
        est = ManifoldEstimator(ref, nhood_sizes=(3,), row_batch_size=32)
        preds, realism, neighbors = est.evaluate(
            ev, return_realism=True, return_neighbors=True
        )
        want_p, want_r, want_n = _np_manifold_oracle(ref, ev, (3,))
        np.testing.assert_array_equal(np.asarray(preds), want_p)
        np.testing.assert_allclose(
            np.asarray(realism), want_r, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(neighbors), want_n)

    def test_clamp_to_percentile(self):
        from nvae_tpu.eval.precision_recall import ManifoldEstimator

        rng = np.random.RandomState(13)
        ref = rng.randn(60, 8).astype(np.float32)
        ev = (rng.randn(30, 8) * 0.8).astype(np.float32)
        est = ManifoldEstimator(
            ref, nhood_sizes=(3,), clamp_to_percentile=50.0
        )
        # Half the hyperspheres are pruned to radius 0.
        radii = np.asarray(est.radii[3])
        assert (radii == 0).sum() == pytest.approx(30, abs=2)
        preds = est.evaluate(ev)
        want_p, _, _ = _np_manifold_oracle(ref, ev, (3,), clamp=50.0)
        np.testing.assert_array_equal(np.asarray(preds), want_p)

    def test_knn_pr_realism_and_neighbors_keys(self):
        rng = np.random.RandomState(14)
        real = rng.randn(64, 8).astype(np.float32)
        gen = (rng.randn(48, 8) * 0.9).astype(np.float32)
        pr = knn_precision_recall_features(
            real, gen, return_realism=True, return_neighbors=True
        )
        assert pr["realism"].shape == (48,)
        assert pr["nearest_neighbors"].shape == (48,)
        assert pr["nearest_neighbors"].dtype == np.int32
        assert (pr["nearest_neighbors"] >= 0).all()
        assert (pr["nearest_neighbors"] < 64).all()
        want_p, want_r, want_n = _np_manifold_oracle(real, gen, (3,))
        np.testing.assert_allclose(
            pr["realism"], want_r, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(pr["nearest_neighbors"], want_n)

    def test_mesh_composes_with_streaming(self):
        """VERDICT r3 #3: mesh sharding must compose with the streamed
        row/col tier — N > row_batch_size with mesh= takes the streamed
        path (rows AND column blocks sharded over 'data') and must equal
        the single-device streamed result."""
        from nvae_tpu.eval.precision_recall import (
            _knn_radii_batched,
            knn_precision_recall_features,
        )
        from nvae_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
        rng = np.random.RandomState(15)
        real = rng.randn(203, 16).astype(np.float32)  # ragged blocks
        gen = (rng.randn(157, 16) * 0.8 + 0.2).astype(np.float32)

        # Radii: streamed + sharded == streamed single-device.
        base_r = np.asarray(_knn_radii_batched(jnp.asarray(real), 3, 64))
        mesh_r = np.asarray(
            _knn_radii_batched(jnp.asarray(real), 3, 64, mesh=mesh)
        )
        np.testing.assert_allclose(mesh_r, base_r, rtol=1e-5, atol=1e-5)

        # Full P&R + realism/neighbors through the streamed mesh path.
        kw = dict(
            nhood_sizes=(3,), row_batch_size=64,
            return_realism=True, return_neighbors=True,
        )
        base = knn_precision_recall_features(real, gen, **kw)
        sharded = knn_precision_recall_features(real, gen, mesh=mesh, **kw)
        for key in ("precision", "recall"):
            np.testing.assert_allclose(sharded[key], base[key], atol=1e-6)
        np.testing.assert_allclose(
            sharded["realism"], base["realism"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(
            sharded["nearest_neighbors"], base["nearest_neighbors"]
        )
        assert 0.0 < base["precision"] < 1.0


class TestPPL:
    def test_slerp_pair_shapes(self):
        rng = jax.random.PRNGKey(0)
        z1 = jax.random.normal(rng, (6, 4, 4, 8))
        z2 = jax.random.normal(jax.random.fold_in(rng, 1), (6, 4, 4, 8))
        a, b = slerp_pair(z1, z2, jax.random.fold_in(rng, 2))
        assert a.shape == z1.shape and b.shape == z1.shape
        # eps-perturbed pair is close but not identical.
        d = float(jnp.max(jnp.abs(a - b)))
        assert 0 < d < 0.1

    def test_evaluate_scales_with_displacement(self):
        rng = np.random.RandomState(7)
        act = rng.randn(64, 32).astype(np.float32)
        small = ppl_evaluate(act, act + 1e-5)
        large = ppl_evaluate(act, act + 1e-3)
        assert large > small > 0


class TestFeatures:
    def test_random_conv_deterministic(self):
        x = np.random.RandomState(8).rand(4, 32, 32, 1).astype(np.float32)
        f = get_extractor("random_conv")
        a = extract_features(x, f)
        b = extract_features(x, f)
        np.testing.assert_allclose(a, b)
        assert a.shape == (4, 512)

    def test_vgg16_runs_without_weights(self):
        x = np.random.RandomState(9).rand(2, 32, 32, 1).astype(np.float32)
        f = get_extractor("vgg16", input_size=64)
        feats = extract_features(x, f)
        assert feats.shape == (2, 512)
        assert np.all(np.isfinite(feats))


@pytest.mark.slow
def test_nll_on_trained_small_model():
    """IWAE NLL runs and bounds the ELBO direction-wise on a tiny model."""
    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.eval.nll import neg_log_likelihood
    from nvae_tpu.train.state import create_train_state

    model_cfg = debug_config()
    model, state, tx = create_train_state(
        model_cfg, TrainConfig(), total_steps=10
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = (
        jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 1)) > 0.5
    ).astype(jnp.float32)
    mean, std = neg_log_likelihood(
        model, variables, [batch], jax.random.PRNGKey(1), n_attempts=3
    )
    assert np.isfinite(mean) and std >= 0
    assert mean > 0  # NLL of binary images is positive


def test_inception_v3_runs_and_outputs_2048():
    x = np.random.RandomState(10).rand(1, 32, 32, 1).astype(np.float32)
    f = get_extractor("inception", input_size=128)  # small input: fast test
    feats = extract_features(x, f)
    assert feats.shape == (1, 2048)
    assert np.all(np.isfinite(feats))


class TestFidPathAPI:
    """Stats caching + path API + CLI (reference fid_utils.py:454-550)."""

    def _write_dir(self, d, images):
        from nvae_tpu.utils.images import save_images_to_dir

        save_images_to_dir(images, str(d))

    def test_stats_npz_equals_directory_path(self, tmp_path):
        from nvae_tpu.eval.fid import (
            calculate_fid_given_paths,
            compute_statistics_of_path,
            save_statistics,
        )

        rng = np.random.RandomState(11)
        a = rng.rand(24, 32, 32, 1).astype(np.float32)
        b = rng.rand(24, 32, 32, 1).astype(np.float32) * 0.5
        d1, d2 = tmp_path / "a", tmp_path / "b"
        self._write_dir(d1, a)
        self._write_dir(d2, b)
        fid_dirs = calculate_fid_given_paths(
            [str(d1), str(d2)], backbone="random_conv"
        )
        assert np.isfinite(fid_dirs) and fid_dirs > 0
        # Precompute side 1, score stats-vs-dir: identical result.
        mu, sigma = compute_statistics_of_path(str(d1), "random_conv")
        stats = tmp_path / "a_stats.npz"
        save_statistics(str(stats), mu, sigma)
        fid_mixed = calculate_fid_given_paths(
            [str(stats), str(d2)], backbone="random_conv"
        )
        np.testing.assert_allclose(fid_mixed, fid_dirs, rtol=1e-6)

    def test_cli_save_stats_and_score(self, tmp_path, capsys):
        from nvae_tpu.eval.fid import main

        rng = np.random.RandomState(12)
        d1, d2 = tmp_path / "x", tmp_path / "y"
        self._write_dir(d1, rng.rand(16, 32, 32, 1).astype(np.float32))
        self._write_dir(d2, rng.rand(16, 32, 32, 1).astype(np.float32))
        stats = str(tmp_path / "x.npz")
        assert main([str(d1), stats, "--save_stats",
                     "--backbone", "random_conv"]) == 0
        assert main([stats, str(d2), "--backbone", "random_conv"]) == 0
        out = capsys.readouterr().out
        assert "FID:" in out


class TestEvalParitySwitches:
    def test_quantize_uint8_truncates_like_reference(self):
        from nvae_tpu.eval.evaluate import quantize_uint8

        x = np.array([0.0, 0.4999 / 255, 1.7 / 255, 1.0], np.float32)
        q = quantize_uint8(x)
        # tf.cast(x*255, uint8) truncates: 0.4999 -> 0, 1.7 -> 1, 255 -> 255.
        np.testing.assert_allclose(q, [0.0, 0.0, 1.0 / 255, 1.0])

    def test_unit_scaling_changes_features(self):
        x = np.random.RandomState(13).rand(2, 32, 32, 1).astype(np.float32)
        f_pm1 = get_extractor("random_conv")
        f_unit = get_extractor("random_conv", input_scaling="unit")
        a = extract_features(x, f_pm1)
        b = extract_features(x, f_unit)
        assert not np.allclose(a, b)

    def test_resize_299_nearest_extractor(self):
        x = np.random.RandomState(14).rand(1, 32, 32, 1).astype(np.float32)
        f = get_extractor(
            "random_conv", input_size=299, resize_method="nearest"
        )
        feats = extract_features(x, f)
        assert feats.shape == (1, 512) and np.all(np.isfinite(feats))

    def test_pr_orientation_swap(self):
        """With ref=subset(gen) geometry, swapping the argument order swaps
        the labels — exactly the reference's defect."""
        rng = np.random.RandomState(15)
        real = rng.randn(300, 8).astype(np.float32) * 3
        gen = rng.randn(300, 8).astype(np.float32) * 0.3
        std = knn_precision_recall_features(real, gen)
        swapped = knn_precision_recall_features(gen, real)
        assert swapped["precision"] == pytest.approx(std["recall"])
        assert swapped["recall"] == pytest.approx(std["precision"])


@pytest.mark.slow
def test_iwae_bound_tightens_with_more_samples():
    """IWAE-K is monotonically non-increasing in K (tighter NLL bound)."""
    from nvae_tpu.config import TrainConfig, debug_config
    from nvae_tpu.eval.nll import neg_log_likelihood
    from nvae_tpu.train.state import create_train_state

    model_cfg = debug_config(n_groups_per_scale=(1, 1), n_latent_per_group=2,
                             n_encoder_channels=8, n_decoder_channels=8)
    model, state, tx = create_train_state(model_cfg, TrainConfig(), 10)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = (
        jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 1)) > 0.5
    ).astype(jnp.float32)
    rng = jax.random.PRNGKey(4)
    nll_1, _ = neg_log_likelihood(model, variables, [batch], rng, n_attempts=1)
    nll_16, _ = neg_log_likelihood(model, variables, [batch], rng, n_attempts=16)
    # Allow small MC noise; the 16-sample bound must not be looser.
    assert nll_16 <= nll_1 + 2.0, (nll_1, nll_16)


def test_extract_features_sharded_matches_single():
    """Mesh-sharded feature extraction equals the single-device result,
    including the non-divisible-row padding path (8-device CPU mesh)."""
    import numpy as np

    from nvae_tpu.eval.features import extract_features, get_extractor
    from nvae_tpu.parallel import make_mesh

    rng = np.random.RandomState(0)
    images = rng.rand(21, 32, 32, 1).astype(np.float32)  # 21 % 8 != 0
    extractor = get_extractor("random_conv")
    single = extract_features(images, extractor, batch_size=16)
    mesh = make_mesh(n_data=0)
    sharded = extract_features(images, extractor, batch_size=16, mesh=mesh)
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=2e-5)

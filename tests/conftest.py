"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths
(mesh/pjit/shard_map) are exercised without TPU hardware — the standard JAX
pattern the TF reference has no analog of (SURVEY.md §4).

Must run before the first ``import jax`` anywhere in the test process.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Repo root on sys.path so `import nvae_tpu` works without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Some environments register an accelerator plugin in sitecustomize and
# force `jax_platforms` there, overriding the env var. Re-assert CPU after
# importing jax so tests never silently run through an accelerator tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by XLA
# compiles of whole-model programs on the 1-core host; with the cache warm
# a full run drops from ~64 min to the actual compute.  Keyed by HLO +
# flags + jaxlib fingerprint, so code changes miss cleanly.  Opt out with
# NVAE_TPU_COMPILE_CACHE=0.
from nvae_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute integration tests (full training loops, "
        "end-to-end eval protocols); deselect with -m 'not slow'",
    )
    config.addinivalue_line(
        "markers",
        "quick: <5-minute smoke tier — one representative test per "
        "subsystem (`pytest -m quick`); the full suite is for "
        "end-of-round validation only (VERDICT r3 #6)",
    )


# The quick tier: (file, test-function) pairs, one or two per subsystem,
# chosen for small compiles.  Centralised here so the tier is auditable in
# one place instead of scattered decorators.
_QUICK = {
    ("test_ops.py", "test_kl_matches_analytic"),
    ("test_ops.py", "test_softclamp5_bounds_and_identity"),
    ("test_losses.py", "test_balanced_kl_golden_small_case"),
    ("test_blocks.py", "test_squeeze_excitation_gates_channels"),
    ("test_blocks.py", "test_batchnorm_updates_stats_in_train_only"),
    ("test_model.py", "test_forward_shapes"),
    ("test_data.py", "test_synthetic_dataset_deterministic"),
    ("test_data.py", "test_prepare_batch_pads_and_binarizes"),
    ("test_train.py", "test_train_step_reduces_loss"),
    ("test_parallel.py", "test_mesh_shapes"),
    ("test_parallel.py", "test_batch_sharded_across_devices"),
    ("test_pipeline.py", "test_stage_names"),
    ("test_serving_runtime.py", "test_full_batches_pack_across_requests"),
    ("test_ema.py", "test_track_ema_closed_form"),
    ("test_eval.py", "test_matches_scipy_sqrtm"),
    ("test_eval.py", "test_identical_sets_give_perfect_pr"),
    ("test_eval.py", "test_evaluate_matches_numpy_oracle"),
    ("test_images.py", "test_save_and_load_roundtrip"),
    ("test_images.py", "test_image_directory_streams_batches"),
    ("test_kernels.py", "test_se_gate_matches_reference"),
    ("test_cli.py", "test_scale_temperatures_length_validated"),
    ("test_compile_cache.py", "test_enable_is_idempotent_and_returns_dir"),
    ("test_export.py", "test_quantize_params_int8_library"),
    ("test_reproduce_baseline.py",
     "test_reproduce_baseline_end_to_end_on_fabricated_mnist"),
}


def pytest_collection_modifyitems(config, items):
    matched = set()
    for item in items:
        base = os.path.basename(str(item.fspath))
        name = item.name.split("[")[0]
        if (base, name) in _QUICK:
            item.add_marker(pytest.mark.quick)
            matched.add((base, name))
    # A rename must not silently shrink the smoke tier — fail loudly.
    # Only enforced for whole-file collections: node-id (`file::test`) or
    # -k selections legitimately collect a subset.
    argstr = " ".join(map(str, config.invocation_params.args))
    if "::" in argstr or config.option.keyword:
        return
    collected_files = {os.path.basename(str(i.fspath)) for i in items}
    stale = {
        (f, n) for f, n in _QUICK - matched if f in collected_files
    }
    if stale:
        raise pytest.UsageError(
            f"_QUICK entries match no collected test (renamed?): {stale}"
        )


@pytest.fixture(scope="session")
def rng0():
    import jax

    return jax.random.PRNGKey(0)

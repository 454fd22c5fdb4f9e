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


@pytest.fixture(scope="session")
def rng0():
    import jax

    return jax.random.PRNGKey(0)

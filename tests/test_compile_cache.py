"""Persistent-compilation-cache helper (nvae_tpu/utils/compile_cache.py).

The cache itself is exercised by the whole suite (conftest enables it
process-wide); these tests cover the helper's contract: idempotence,
env-var opt-out, and that entries actually land on disk.
"""

import os

import jax
import jax.numpy as jnp

from nvae_tpu.utils import compile_cache


def test_enable_is_idempotent_and_returns_dir():
    d1 = compile_cache.enable_compile_cache()
    d2 = compile_cache.enable_compile_cache()
    assert d1 is not None and d1 == d2
    assert os.path.isdir(d1)


def test_env_opt_out(monkeypatch):
    monkeypatch.setenv("NVAE_TPU_COMPILE_CACHE", "0")
    monkeypatch.setattr(compile_cache, "_ENABLED_DIR", None)
    assert compile_cache.enable_compile_cache() is None


def test_cache_populates_on_slow_compile(tmp_path, monkeypatch):
    # A fresh directory + zeroed thresholds: any jit compile must persist.
    # JAX binds its cache object to the directory lazily ONCE; in a full
    # suite run earlier compiles have already bound it to the default dir,
    # so the redirect only takes effect after a reset_cache().
    from jax._src import compilation_cache as cc

    prior_dir = jax.config.jax_compilation_cache_dir
    monkeypatch.setattr(compile_cache, "_ENABLED_DIR", None)
    d = compile_cache.enable_compile_cache(str(tmp_path / "xla"))
    assert d is not None
    cc.reset_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        x = jnp.arange(64.0).reshape(8, 8)
        jax.jit(lambda a: jnp.tanh(a) @ a.T + 3.0)(x).block_until_ready()
        assert len(os.listdir(d)) >= 1
    finally:
        # Restore the process-wide cache config (tmp_path is deleted after
        # this test; later compiles must not write into a dead directory).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_compilation_cache_dir", prior_dir)
        cc.reset_cache()

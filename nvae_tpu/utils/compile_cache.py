"""Persistent XLA compilation cache (framework-level, opt-out).

The reference pays no compile cost (eager TF, ``train.py:132``); this
framework jit-compiles whole-epoch programs, and through a remote-tunnel
TPU runtime a full-model compile costs minutes.  Enabling JAX's persistent
compilation cache makes every compile a one-time cost per (program, jaxlib,
flags) fingerprint: reruns of the bench, the CLI, the eval protocol, and
the test suite deserialize instead of recompiling.

Environment:

- ``NVAE_TPU_COMPILE_CACHE=<dir>`` — cache directory (default
  ``~/.cache/nvae_tpu/xla``).
- ``NVAE_TPU_COMPILE_CACHE=0`` (or ``off``/``none``) — disable.

Cache correctness is JAX's own: entries are keyed by the serialized HLO +
compile options + backend fingerprint, so code or flag changes miss
cleanly and never load stale binaries.
"""

from __future__ import annotations

import os

_ENABLED_DIR: str | None = None


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently point JAX at a persistent on-disk compilation cache.

    Returns the cache directory, or None when disabled (env opt-out or a
    runtime whose backend does not support serialization — JAX degrades to
    warnings, never errors).
    """
    global _ENABLED_DIR
    env = os.environ.get("NVAE_TPU_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "false"):
        return None
    cache_dir = cache_dir or env or os.path.expanduser(
        "~/.cache/nvae_tpu/xla"
    )
    if _ENABLED_DIR is not None:
        return _ENABLED_DIR

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Whole-model programs are the point; skip sub-second utility jits so
    # the cache stays small and lookups cheap.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _ENABLED_DIR = cache_dir
    return cache_dir

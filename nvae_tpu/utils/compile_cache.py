"""Persistent XLA compilation cache (framework-level, opt-out).

The reference pays no compile cost (eager TF, ``train.py:132``); this
framework jit-compiles whole-epoch programs, and through a remote-tunnel
TPU runtime a full-model compile costs minutes.  Enabling JAX's persistent
compilation cache makes every compile a one-time cost per (program, jaxlib,
flags) fingerprint: reruns of the bench, the CLI, the eval protocol, and
the test suite deserialize instead of recompiling.

Environment:

- ``NVAE_TPU_COMPILE_CACHE=<dir>`` — cache base directory (default
  ``~/.cache/nvae_tpu/xla``).
- ``NVAE_TPU_COMPILE_CACHE=0`` (or ``off``/``none``) — disable.

JAX keys entries by serialized HLO + compile options + backend version,
but (measured, jax 0.8) the XLA:CPU key does NOT cover the host's CPU
feature set: an AOT executable cached on one machine and loaded on a
different one warns ``Target machine feature +prefer-no-scatter is not
supported on the host machine ... could lead to execution errors such as
SIGILL`` — and the dispatched program can hang forever instead of
crashing.  So the cache lives under a per-host fingerprint subdirectory
(hash of the CPU model + feature flags): moving the cache volume to a
different machine misses cleanly and recompiles instead of wedging.
"""

from __future__ import annotations

import hashlib
import os
import platform

_ENABLED_DIR: str | None = None


def _host_fingerprint() -> str:
    """A short stable id for the host's CPU (model + feature flags).

    XLA:CPU AOT executables are feature-set-specific; this is the part of
    the cache key jax itself omits.
    """
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        parts.append(platform.processor() or "unknown")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently point JAX at a persistent on-disk compilation cache.

    The actual directory is ``<base>/<host-fingerprint>`` so caches never
    migrate across machines (see module docstring).  Returns that
    directory, or None when disabled (env opt-out or a runtime whose
    backend does not support serialization — JAX degrades to warnings,
    never errors).
    """
    global _ENABLED_DIR
    env = os.environ.get("NVAE_TPU_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "false"):
        return None
    base = cache_dir or env or os.path.expanduser("~/.cache/nvae_tpu/xla")
    if _ENABLED_DIR is not None:
        return _ENABLED_DIR
    cache_dir = os.path.join(base, _host_fingerprint())

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Whole-model programs are the point; skip sub-second utility jits so
    # the cache stays small and lookups cheap.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _ENABLED_DIR = cache_dir
    return cache_dir

"""ctypes binding for the native batch PNG writer (native/pngio.cpp).

Auto-builds ``native/libpngio.so`` with ``make`` on first use when a
toolchain is present; callers fall back to PIL when unavailable.  One C call
writes a whole (N, H, W, C) uint8 batch — the sample/FID directory protocol
dumps 10k+ files per pass (reference ``evaluate.py:148-157``), and per-file
Python/PIL overhead dominates on small images.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpngio.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pngio_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.pngio_write.restype = ctypes.c_int
        lib.pngio_write_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.pngio_write_batch.restype = ctypes.c_int
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def write_batch(paths: Sequence[str], images: np.ndarray) -> int:
    """Write uint8 NHWC ``images`` to ``paths``; returns count written.

    Raises RuntimeError if the native library is unavailable (callers check
    :func:`available` first).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libpngio.so unavailable")
    imgs = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w = imgs.shape[:3]
    ch = imgs.shape[3] if imgs.ndim == 4 else 1
    assert len(paths) == n
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    return lib.pngio_write_batch(
        blob,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, ch,
    )

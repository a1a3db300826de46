"""ctypes binding for the native C++ frame loader (forge_io).

Builds lazily with the in-image toolchain on first use; every entry point
falls back to the PIL path in data/base.py if the library is unavailable, so
the pure-Python pipeline always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libforge_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.forge_io_load_frame.restype = ctypes.c_int
            lib.forge_io_load_batch.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _build_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def load_frame(path: str, out_size: int, mask_images: bool
               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Returns (rgb [s,s,3], mask [s,s,1]) float32 or None on failure."""
    lib = _load()
    if lib is None:
        return None
    rgb = np.empty((out_size, out_size, 3), np.float32)
    mask = np.empty((out_size, out_size, 1), np.float32)
    rc = lib.forge_io_load_frame(
        path.encode(), out_size, int(mask_images),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return rgb, mask


def load_batch(paths: List[str], out_size: int, mask_images: bool,
               n_threads: int = 4
               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Concurrent batch decode: ([n,s,s,3], [n,s,s,1]) or None."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    rgb = np.empty((n, out_size, out_size, 3), np.float32)
    mask = np.empty((n, out_size, out_size, 1), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.forge_io_load_batch(
        arr, n, out_size, int(mask_images), n_threads,
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return rgb, mask

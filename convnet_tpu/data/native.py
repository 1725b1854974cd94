"""ctypes binding to the native C++ threaded image loader.

Reference counterpart: the reference's data path is native C++ —
CImg/libjpeg decode on a prefetch thread (src/image_iterators.cc,
src/datahandler.cc [U]). This binding loads native/libconvnet_loader.so
(built via `make native`; libjpeg-backed decode + a worker pool). When
the library isn't built, callers fall back to the PIL thread pool in
convnet_tpu.data.image_iterators.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "libconvnet_loader.so"),
    "libconvnet_loader.so",
]

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.loader_load.restype = ctypes.c_int
        lib.loader_load.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_void_p,
        ]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib
    return None


def available() -> bool:
    return _load() is not None


class NativeImageLoader:
    """Decodes batches of image files into (N, S, S, C) uint8 using the
    C++ worker pool."""

    def __init__(self, paths: List[str], raw_size: int, num_colors: int, threads: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader not built (run `make native`)")
        self._lib = lib
        self._raw = raw_size
        self._colors = num_colors
        self._paths_bytes = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(paths))(*self._paths_bytes)
        self._handle = lib.loader_create(arr, len(paths), raw_size, num_colors, threads)
        if not self._handle:
            raise RuntimeError("loader_create failed")

    def load(self, indices: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx), self._raw, self._raw, self._colors), np.uint8)
        rc = self._lib.loader_load(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            raise RuntimeError(f"native loader failed on batch (rc={rc})")
        return out

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.loader_destroy(self._handle)
        except Exception:
            pass

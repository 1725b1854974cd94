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


class RawCacheReader:
    """Gather rows from a memory-mapped raw cache via the C++ core
    (cache_open/cache_gather). Falls back to numpy memmap when the
    native library isn't built — same format either way."""

    HEADER = 16

    def __init__(self, path: str, threads: int = 4):
        import json

        with open(path + ".json") as f:
            meta = json.load(f)
        self.dtype = np.dtype(meta["dtype"])
        self.row_shape = tuple(meta["shape"])
        self.row_bytes = int(self.dtype.itemsize * np.prod(self.row_shape))
        self._handle = None
        self._lib = _load()
        if self._lib is not None and not hasattr(self._lib, "cache_open"):
            # older build of the library without the cache API
            self._lib = None
        if self._lib is not None:
            self._lib.cache_open.restype = ctypes.c_void_p
            self._lib.cache_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
            self._lib.cache_num_rows.restype = ctypes.c_int64
            self._lib.cache_num_rows.argtypes = [ctypes.c_void_p]
            self._lib.cache_row_bytes.restype = ctypes.c_int64
            self._lib.cache_row_bytes.argtypes = [ctypes.c_void_p]
            self._lib.cache_gather.restype = ctypes.c_int
            self._lib.cache_gather.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int,
                ctypes.c_void_p,
            ]
            self._lib.cache_close.argtypes = [ctypes.c_void_p]
            self._handle = self._lib.cache_open(path.encode(), threads)
            if not self._handle:
                raise ValueError(f"bad raw cache file: {path}")
            if self._lib.cache_row_bytes(self._handle) != self.row_bytes:
                raise ValueError(
                    f"{path}: sidecar row size mismatch "
                    f"({self._lib.cache_row_bytes(self._handle)} vs {self.row_bytes})"
                )
            self.num_rows = int(self._lib.cache_num_rows(self._handle))
        else:
            raw = np.memmap(path, dtype=np.uint8, mode="r")
            if bytes(raw[:4]) != b"CNTC":
                raise ValueError(f"bad raw cache magic in {path}")
            payload = raw[self.HEADER :]
            self.num_rows = payload.size // self.row_bytes
            self._mm = payload[: self.num_rows * self.row_bytes].reshape(
                self.num_rows, self.row_bytes
            )

    def gather(self, indices: np.ndarray) -> np.ndarray:
        if self._handle is None and not hasattr(self, "_mm"):
            raise RuntimeError("RawCacheReader is closed")
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        if self._handle is not None:
            out = np.empty((len(idx), self.row_bytes), np.uint8)
            rc = self._lib.cache_gather(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(idx),
                out.ctypes.data_as(ctypes.c_void_p),
            )
            if rc != 0:
                raise IndexError("cache_gather failed (index out of range?)")
        else:
            out = np.ascontiguousarray(self._mm[idx])
        return out.view(self.dtype).reshape((len(idx),) + self.row_shape)

    def close(self):
        if self._handle is not None:
            self._lib.cache_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_raw_cache(path: str, array: np.ndarray):
    """Write an (N, ...) array as a raw cache + JSON sidecar."""
    import json
    import struct

    array = np.ascontiguousarray(array)
    row_bytes = array.dtype.itemsize * int(np.prod(array.shape[1:]))
    with open(path, "wb") as f:
        f.write(b"CNTC")
        f.write(struct.pack("<I", 1))
        f.write(struct.pack("<Q", row_bytes))
        array.tofile(f)
    with open(path + ".json", "w") as f:
        json.dump({"dtype": array.dtype.name, "shape": list(array.shape[1:])}, f)

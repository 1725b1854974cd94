"""Image-file streams: raw JPEG lists, sliding windows, text matrices.

Reference counterparts: RawImageFileIterator / SlidingWindowIterator
(src/image_iterators.cc over the bundled CImg/libjpeg [U]). Decoding
here uses PIL (libjpeg underneath) on worker threads — or, when built,
the native C++ loader (convnet_tpu.data.native) which decodes with
libjpeg directly off-thread; resize semantics match the reference:
scale the shorter side to raw_image_size, then crop on device.
"""

from __future__ import annotations

import concurrent.futures
import os
from typing import List

import numpy as np

from convnet_tpu.data.datahandler import Stream
from convnet_tpu.proto import convnet_config_pb2 as pb


def _read_file_list(path: str) -> List[str]:
    base = os.path.dirname(os.path.abspath(path))
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            out.append(line if os.path.isabs(line) else os.path.join(base, line))
    return out


def decode_and_resize(path: str, raw_size: int, num_colors: int) -> np.ndarray:
    """Decode one image, scale shorter side to raw_size, center-crop the
    longer side to raw_size -> (raw_size, raw_size, num_colors) uint8.

    Uses JPEG DCT-scaled decode (PIL draft; power-of-2) when shrinking —
    the native C++ loader applies the identical scaling so both paths
    stay numerically close."""
    from PIL import Image

    mode = "RGB" if num_colors == 3 else "L"
    img = Image.open(path)
    if img.format == "JPEG":
        img.draft(mode, (raw_size, raw_size))
    img = img.convert(mode)
    w, h = img.size
    scale = raw_size / min(w, h)
    nw, nh = max(raw_size, int(round(w * scale))), max(raw_size, int(round(h * scale)))
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - raw_size) // 2
    top = (nh - raw_size) // 2
    img = img.crop((left, top, left + raw_size, top + raw_size))
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


class RawImageStream(Stream):
    """file_pattern = newline-separated list of image paths (reference:
    RawImageFileIterator [U]). Random crop/flip happen on device."""

    def __init__(self, cfg: pb.DataStreamConfig, num_threads: int = 8):
        super().__init__(cfg)
        if not cfg.file_pattern:
            raise ValueError(f"stream {cfg.layer_name}: IMAGE_RAW needs file_pattern")
        self._paths = _read_file_list(cfg.file_pattern)
        self._raw = cfg.raw_image_size or cfg.image_size
        if not self._raw:
            raise ValueError(f"stream {cfg.layer_name}: needs raw_image_size or image_size")
        self._native = None
        # The native loader decodes JPEG only (libjpeg); route PNG/BMP/etc.
        # lists to the PIL pool. Check magic bytes, not extensions — file
        # lists in the wild have mislabeled/extensionless entries.
        if self._all_jpeg(self._paths):
            try:
                from convnet_tpu.data import native

                if native.available():
                    self._native = native.NativeImageLoader(
                        self._paths, self._raw, cfg.num_colors, num_threads
                    )
            except Exception:
                self._native = None
        if self._native is None:
            self._pool = concurrent.futures.ThreadPoolExecutor(num_threads)

    @staticmethod
    def _all_jpeg(paths: List[str], sniff_limit: int = 64) -> bool:
        """True when every path looks like a JPEG. Extensions decide when
        present; for extensionless/odd names, sniff the SOI magic of up to
        sniff_limit of them (beyond that, be conservative and say no)."""
        to_sniff = []
        for p in paths:
            ext = os.path.splitext(p)[1].lower()
            if ext in (".jpg", ".jpeg", ".jpe", ".jfif"):
                continue
            if ext in (".png", ".bmp", ".gif", ".tif", ".tiff", ".webp", ".ppm", ".pgm"):
                return False
            to_sniff.append(p)
            if len(to_sniff) > sniff_limit:
                return False
        for p in to_sniff:
            try:
                with open(p, "rb") as f:
                    if f.read(2) != b"\xff\xd8":
                        return False
            except OSError:
                return False
        return True

    @property
    def num_rows(self) -> int:
        return len(self._paths)

    def close(self):
        if self._native is None and hasattr(self, "_pool"):
            self._pool.shutdown(wait=False)

    def read_rows(self, indices: np.ndarray) -> np.ndarray:
        if self._native is not None:
            return self._native.load(indices)
        futs = [
            self._pool.submit(
                decode_and_resize, self._paths[i], self._raw, self.cfg.num_colors
            )
            for i in indices
        ]
        return np.stack([f.result() for f in futs])


class SlidingWindowStream(Stream):
    """Dense windows over large images for patchwise eval (reference:
    SlidingWindowIterator [U]). Row k maps to (image, window) in
    row-major window order at stride window_stride."""

    def __init__(self, cfg: pb.DataStreamConfig):
        super().__init__(cfg)
        self._paths = _read_file_list(cfg.file_pattern)
        self._win = cfg.image_size
        self._stride = max(1, cfg.window_stride)
        if not self._win:
            raise ValueError(f"stream {cfg.layer_name}: SLIDING_WINDOW needs image_size")
        self._raw = cfg.raw_image_size or 0
        # precompute per-image window grids
        self._index: List[tuple] = []  # (path_idx, y, x)
        from PIL import Image

        for pi, p in enumerate(self._paths):
            with Image.open(p) as im:
                w, h = im.size
            if self._raw:
                scale = self._raw / min(w, h)
                w, h = int(round(w * scale)), int(round(h * scale))
            ys = list(range(0, max(1, h - self._win + 1), self._stride))
            xs = list(range(0, max(1, w - self._win + 1), self._stride))
            for y in ys:
                for x in xs:
                    self._index.append((pi, y, x))
        self._cache_idx = -1
        self._cache_img: np.ndarray = None

    @property
    def num_rows(self) -> int:
        return len(self._index)

    def _full_image(self, pi: int) -> np.ndarray:
        if pi != self._cache_idx:
            from PIL import Image

            img = Image.open(self._paths[pi]).convert(
                "RGB" if self.cfg.num_colors == 3 else "L"
            )
            if self._raw:
                w, h = img.size
                scale = self._raw / min(w, h)
                img = img.resize(
                    (int(round(w * scale)), int(round(h * scale))), Image.BILINEAR
                )
            arr = np.asarray(img, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            self._cache_idx, self._cache_img = pi, arr
        return self._cache_img

    def read_rows(self, indices: np.ndarray) -> np.ndarray:
        out = np.zeros(
            (len(indices), self._win, self._win, self.cfg.num_colors), np.uint8
        )
        for k, row in enumerate(indices):
            pi, y, x = self._index[int(row)]
            img = self._full_image(pi)
            patch = img[y : y + self._win, x : x + self._win]
            out[k, : patch.shape[0], : patch.shape[1]] = patch
        return out


class TxtStream(Stream):
    """Whitespace-separated numeric matrix, one row per example."""

    def __init__(self, cfg: pb.DataStreamConfig):
        super().__init__(cfg)
        self._data = np.loadtxt(cfg.file_pattern, dtype=np.float32, ndmin=2)

    @property
    def num_rows(self) -> int:
        return self._data.shape[0]

    def read_rows(self, indices: np.ndarray) -> np.ndarray:
        return self._maybe_reshape_images(self._data[indices])

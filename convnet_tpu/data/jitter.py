"""On-device jitter augmentation (fused into the jit'd step).

Reference counterpart: the GPU-side jitter in DataHandler — random
crop/translate, horizontal flip, mean/std normalization
(src/datahandler.cc [U], `[B]` in BASELINE.json). The rebuild runs the
same transforms as a traced prologue of the train step: the host ships
raw uint8 batches (4x less PCIe/HBM traffic than float) and the VPU
does cast + crop + flip + normalize fused with the first conv's input
pipeline.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def crop_dot_dtype() -> str:
    """Element type for the one-hot crop/flip MXU contractions.

    "s8": one-hots and pixels ride as int8 — pixels shifted by -128 to
    fit s8 (the MXU int8 path is signed), exactly restored in the
    integer epilogue — and the dots emit s32. Halves the one-hot and
    intermediate HBM traffic of the bf16 form and doubles the MXU rate;
    bit-exact (every value is a small integer). Measured NEUTRAL at
    B=4096 (tools/r4_chip9.py, +0.54 ms): the dots lower to
    convolution-base-dilated whose rate, not traffic, bounds the
    segment. "bf16": the round-2 form (phased path: via a (B,C,H,W)
    transpose pass). "bf16d": bf16 dots contracting the raw NHWC batch
    directly with the s8 branch's operand order — same exact values
    (one-hot sums have a single term), no transpose pass; its chip A/B
    (tools/r4_chip10.py) landed NEUTRAL (+0.03 ms full step at B=4096 —
    the segment is insensitive to the dot formulation, BASELINE.md).
    Default "auto" = bf16, the measured default;
    CONVNET_CROP_DOT=bf16|bf16d|s8 forces."""
    mode = os.environ.get("CONVNET_CROP_DOT", "auto")
    if mode in ("bf16", "bf16d", "s8"):
        return mode
    return "bf16"


def _shift_s8(x: jax.Array) -> jax.Array:
    """uint8 pixels -> int8 (value - 128); exact, reversed post-dot."""
    return (x.astype(jnp.int16) - 128).astype(jnp.int8)


@dataclass(frozen=True)
class JitterSpec:
    """Static per-stream augmentation spec (hashable: arrays live in
    `mean_std` as numpy and are inlined as jit constants)."""

    image_size: int
    can_translate: bool = False
    can_flip: bool = False
    scale: float = 1.0
    normalize: bool = False

    def __post_init__(self):
        if self.image_size <= 0:
            raise ValueError("image_size must be positive")


def _onehot_crop_flip(x, s, oy, ox, flips):
    """Gather rows/cols through one-hot contractions on the MXU.

    x: (B, H, W, C) uint8; oy/ox: (B,) crop origins; flips: (B,) bool or
    None. Returns (B, s, s, C) bf16 holding exact uint8 values.
    """
    b, h, w, c = x.shape
    ii = jnp.arange(s)
    oh_rows = (oy[:, None, None] + ii[None, :, None] == jnp.arange(h)[None, None, :])
    tgt = ii[None, :]
    if flips is not None:
        tgt = jnp.where(flips[:, None], s - 1 - ii[None, :], tgt)
    oh_cols = (ox[:, None, None] + tgt[:, :, None] == jnp.arange(w)[None, None, :])
    if crop_dot_dtype() == "s8":
        # int8 MXU dots: halve the one-hot/intermediate traffic and run
        # the MXU at its s8 rate. Every position is inside the crop here
        # so the -128 shift is restored unconditionally; the intermediate
        # y holds single shifted pixels in [-128, 127] — s8-exact.
        xs = _shift_s8(x)
        y = jnp.einsum(
            "bih,bhwc->biwc", oh_rows.astype(jnp.int8), xs,
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8)
        z = jnp.einsum(
            "bjw,biwc->bijc", oh_cols.astype(jnp.int8), y,
            preferred_element_type=jnp.int32,
        )
        return (z + 128).astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    y = jnp.einsum("bih,bhwc->biwc", oh_rows.astype(jnp.bfloat16), xb)
    return jnp.einsum("bjw,biwc->bijc", oh_cols.astype(jnp.bfloat16), y)


def sample_crop_flip(rng, b, h, w, s, can_translate, can_flip):
    """Sample per-image crop origins and flips — the exact key-derivation
    order jitter_batch has always used, factored out so the fused Pallas
    prologue (ops/prologue.py) replays the identical augmentation stream."""
    flips = None
    if can_flip:
        flips = jax.random.bernoulli(jax.random.fold_in(rng, 1), 0.5, (b,))
    oy = ox = None
    if can_translate and (h > s or w > s):
        ky, kx = jax.random.split(jax.random.fold_in(rng, 0))
        oy = jax.random.randint(ky, (b,), 0, h - s + 1)
        ox = jax.random.randint(kx, (b,), 0, w - s + 1)
    return oy, ox, flips


def jitter_batch(
    x: jax.Array,
    spec: JitterSpec,
    rng: Optional[jax.Array],
    train: bool,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
) -> jax.Array:
    """x: (B, H, W, C) raw batch (uint8 or float); returns float32
    (B, S, S, C) with S = spec.image_size.

    Train: random crop position (if can_translate) + random horizontal
    flip (if can_flip). Eval: center crop, no flip — matching the
    reference's train/eval jitter split [U].
    """
    b, h, w, c = x.shape
    s = spec.image_size
    if h < s or w < s:
        raise ValueError(f"raw image {h}x{w} smaller than crop {s}")

    # Raw-size mean/std force float math before the crop; otherwise the
    # crop and flip run on the raw dtype — for uint8 batches that's 4x
    # less data movement than the f32 form (the crop's per-sample
    # dynamic-slice loop and the flip's reverse+select both materialize
    # the tensor; measured ~2.5 ms/step at AlexNet batch 256 in f32).
    raw_mean = (
        mean is not None and np.ndim(mean) >= 2 and np.shape(mean)[-3] == h
    )
    raw_std = std is not None and np.ndim(std) >= 2 and np.shape(std)[-3] == h
    if raw_mean or raw_std:
        x = x.astype(jnp.float32)
        if spec.scale != 1.0:
            x = x * spec.scale
        if raw_mean:
            x = x - jnp.asarray(mean, jnp.float32)
            mean = None
        if mean is None and raw_std:
            x = x / jnp.asarray(std, jnp.float32)
            std = None

    if train and (spec.can_flip or spec.can_translate) and rng is None:
        raise ValueError("train jitter needs rng")
    oy, ox, flips = (
        sample_crop_flip(rng, b, h, w, s, spec.can_translate, spec.can_flip)
        if train
        else (None, None, None)
    )

    if oy is not None:
        if x.dtype == jnp.uint8:
            # Per-sample crop + flip as two one-hot batched matmuls: the
            # MXU is idle during augmentation while the vmapped
            # dynamic-slice lowers to a batch-serial while loop and the
            # flip to a materialized reverse+select (~1.6 ms/step at
            # AlexNet batch 256). Exact: uint8 values and one-hot weights
            # are exactly representable in bf16. Flip rides free in the
            # column one-hot.
            x = _onehot_crop_flip(x, s, oy, ox, flips)
            flips = None
        else:
            x = jax.vmap(
                lambda img, y0, x0: jax.lax.dynamic_slice(img, (y0, x0, 0), (s, s, c))
            )(x, oy, ox)
    elif h > s or w > s:
        cy, cx = (h - s) // 2, (w - s) // 2
        x = x[:, cy : cy + s, cx : cx + s, :]

    if flips is not None:
        x = jnp.where(flips[:, None, None, None], x[:, :, ::-1, :], x)

    x = x.astype(jnp.float32)
    if spec.scale != 1.0 and not (raw_mean or raw_std):
        x = x * spec.scale
    if mean is not None:  # crop-size or per-channel mean
        x = x - jnp.asarray(mean, jnp.float32)
    if std is not None:
        x = x / jnp.asarray(std, jnp.float32)
    return x

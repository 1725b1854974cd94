"""Convolution edges on the MXU.

Reference counterparts: ConvEdge over cuda-convnet convUp/convDown/
convOutp (src/conv_edge.*, cudamat/cudamat_conv*.cu [U]) and
ConvOneToOneEdge (src/conv_onetoone_edge.* [U]). The rebuild uses one
primitive — `lax.conv_general_dilated` — whose transpose/autodiff
provides the data- and weight-gradient kernels, and lets XLA tile the
contraction onto the 128x128 systolic array.

Layout: NHWC activations, HWIO weights (TPU-preferred).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from convnet_tpu.graph import conv_out_size


def matmul_precision(compute_dtype):
    """float32 mode is the numerics-parity path (<=1e-4 vs reference, BASELINE
    north_star) and must not silently drop to bf16 passes; explicit bfloat16
    mode takes the fast MXU default."""
    return lax.Precision.HIGHEST if compute_dtype is None else lax.Precision.DEFAULT


def ceil_mode_padding(
    in_size: int, kernel: int, stride: int, padding: int
) -> Tuple[int, int]:
    """Asymmetric (lo, hi) padding implementing the cuda-convnet ceil
    convention: the final window may extend past the padded input and is
    completed with extra implicit high-side padding."""
    out = conv_out_size(in_size, kernel, stride, padding)
    hi = (out - 1) * stride + kernel - in_size - padding
    return (padding, max(hi, 0))


def conv2d(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    padding: int,
    compute_dtype=None,
) -> jax.Array:
    """Forward convolution (reference: convUp [U]).

    x: (B, H, W, Cin) NHWC; w: (kh, kw, Cin, Cout) HWIO.
    Output spatial size follows `conv_out_size` (ceil mode).
    """
    kh, kw = w.shape[0], w.shape[1]
    pad_h = ceil_mode_padding(x.shape[1], kh, stride, padding)
    pad_w = ceil_mode_padding(x.shape[2], kw, stride, padding)
    if compute_dtype is not None:
        # Run entirely in compute_dtype and cast the result back: the
        # astype transpose then casts the cotangent down too, so the
        # bwd convs also run on the MXU fast path (mixing a float32
        # preferred_element_type with bf16 operands breaks the conv
        # transpose rule's dtype agreement).
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # f32-or-wider accumulate; None in compute_dtype mode (see above)
        preferred_element_type=None
        if compute_dtype is not None
        else jnp.promote_types(x.dtype, jnp.float32),
        precision=matmul_precision(compute_dtype),
    )
    return out.astype(jnp.float32) if compute_dtype is not None else out


def conv_onetoone(x: jax.Array, w: jax.Array, compute_dtype=None) -> jax.Array:
    """1x1 channel-mixing conv (reference: ConvOneToOneEdge [U]) — a pure
    MXU matmul over the channel axis."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return jnp.einsum(
        "bhwc,cd->bhwd",
        x,
        w,
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
        precision=matmul_precision(compute_dtype),
    )


def fc(x: jax.Array, w: jax.Array, compute_dtype=None) -> jax.Array:
    """Fully connected edge (reference: FCEdge over cudamat dot [U]).

    x: (B, H, W, C) — flattened to (B, H*W*C); w: (H*W*C, units).
    """
    xf = x.reshape(x.shape[0], -1)
    if compute_dtype is not None:
        xf = xf.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return jnp.dot(
        xf,
        w,
        preferred_element_type=jnp.promote_types(xf.dtype, jnp.float32),
        precision=matmul_precision(compute_dtype),
    )

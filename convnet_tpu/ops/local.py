"""Locally connected (untied-weight) edges.

Reference counterpart: LocalEdge (src/local_edge.* [U]) over the
cuda-convnet "local" kernels — convolution geometry but a distinct
filter per output location (AlexNet-variant layers).

`lax.conv_general_dilated_local` lowers to an MXU batch-matmul over
extracted patches; autodiff provides the data/weight gradients the
reference hand-writes (localDown/localOutp [U]).
"""

from __future__ import annotations

import jax
from jax import lax

from convnet_tpu.ops.conv import ceil_mode_padding, matmul_precision


def local_conv2d(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    padding: int,
    kernel: int,
    compute_dtype=None,
) -> jax.Array:
    """x: (B, H, W, Cin); w: (out_h, out_w, kernel*kernel*Cin, Cout) —
    one filter per output site. Ceil-mode output size like conv2d."""
    pad_h = ceil_mode_padding(x.shape[1], kernel, stride, padding)
    pad_w = ceil_mode_padding(x.shape[2], kernel, stride, padding)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return lax.conv_general_dilated_local(
        x,
        w,
        window_strides=(stride, stride),
        padding=(pad_h, pad_w),
        filter_shape=(kernel, kernel),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=matmul_precision(compute_dtype),
    )


def local_weight_shape(
    out_h: int, out_w: int, kernel: int, in_channels: int, out_channels: int
):
    return (out_h, out_w, kernel * kernel * in_channels, out_channels)

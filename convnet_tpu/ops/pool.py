"""Max pooling (reference: MaxPoolEdge over cuda-convnet MaxPool /
MaxPoolUndo kernels, src/maxpool_edge.* [U]).

`lax.reduce_window` with a -inf identity; XLA's select-and-scatter
transpose is the argmax-routed gradient the reference implements as
MaxPoolUndo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from convnet_tpu.ops.conv import ceil_mode_padding


def maxpool2d(x: jax.Array, kernel: int, stride: int, padding: int = 0) -> jax.Array:
    """x: (B, H, W, C) NHWC; ceil-mode output size (cuda-convnet)."""
    pad_h = ceil_mode_padding(x.shape[1], kernel, stride, padding)
    pad_w = ceil_mode_padding(x.shape[2], kernel, stride, padding)
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)),
    )


def avgpool2d(x: jax.Array, kernel: int, stride: int, padding: int = 0) -> jax.Array:
    """Average pooling over full windows (used by DOWNSAMPLE edges)."""
    pad_h = ceil_mode_padding(x.shape[1], kernel, stride, padding)
    pad_w = ceil_mode_padding(x.shape[2], kernel, stride, padding)
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)),
    )
    return summed / (kernel * kernel)

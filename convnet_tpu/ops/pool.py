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


def maxpool2d_undo_reference(
    x: jax.Array,
    y: jax.Array,
    g: jax.Array,
    kernel: int,
    stride: int,
    padding: int = 0,
) -> jax.Array:
    """cuda-convnet `MaxPoolUndo` semantics (cudamat kMaxPoolUndo [U]):
    every input position EQUAL to its window's max receives that
    window's cotangent — ties are credited to all winners, unlike the
    default path's select-and-scatter (single winner, XLA window
    order) or torch (single winner by index). Post-ReLU zeros tie
    constantly, so the three disagree on real data; forward activations
    are identical either way. This is the numerics oracle for the
    planned fused pool+LRN backward kernel
    (docs/fused_pool_lrn_bwd_design.md) and the reference-exact
    gradient for parity studies.

    x: pool input (B, H, W, C); y = maxpool2d(x, ...); g: cotangent at
    the pool output. Returns dx.
    """
    b, h, w, c = x.shape
    pad_h = ceil_mode_padding(h, kernel, stride, padding)
    pad_w = ceil_mode_padding(w, kernel, stride, padding)
    # dx[p] = sum over windows containing p of g[w] * (x[p] == y[w]):
    # scatter g and y back to input geometry via the transpose of a
    # sum-pool (dilated pad + full-window gather), then compare.
    oh, ow = y.shape[1], y.shape[2]
    dx = jnp.zeros_like(x, dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    for ki in range(kernel):
        for kj in range(kernel):
            # input coordinates covered by tap (ki, kj) of each window
            ii = ki - pad_h[0] + stride * jnp.arange(oh)
            jj = kj - pad_w[0] + stride * jnp.arange(ow)
            vi = (ii >= 0) & (ii < h)
            vj = (jj >= 0) & (jj < w)
            ic = jnp.clip(ii, 0, h - 1)[:, None]
            jc = jnp.clip(jj, 0, w - 1)[None, :]
            valid = (vi[:, None] & vj[None, :])[None, :, :, None]
            patch = xf[:, ic, jc, :]  # (B, oh, ow, C)
            hit = (patch == y.astype(jnp.float32)) & valid
            contrib = jnp.where(hit, g.astype(jnp.float32), 0.0)
            dx = dx.at[:, ic, jc, :].add(contrib)
    return dx.astype(x.dtype)

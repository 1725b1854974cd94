"""Cross-map response normalization (AlexNet-style LRN).

Reference counterparts: ResponseNormEdge (src/response_norm_edge.* [U])
over the cuda-convnet `ResponseNormCrossMap` / `ResponseNormCrossMapUndo`
kernels (cudamat/cudamat_conv*.cu [U]). XLA has no native LRN primitive,
so this is the toolkit's flagship fused Pallas kernel.

Semantics (documented in proto/convnet_config.proto):

    n        = max(1, round(frac_of_filters * C))
    window(i)= [i - (n-1)//2, i + n//2]            (sliding, clipped)
             = block of size n containing i         (blocked)
    s_i      = sum_{j in window(i)} x_j^2
    d_i      = 1 + (add_scale / n) * s_i
    y_i      = x_i * d_i^(-pow_scale)

TPU-first design note: the channel-window sum is expressed as a matmul
with a constant banded 0/1 matrix B (s = x^2 @ B^T), which maps onto the
MXU instead of a scalar sliding loop; forward fuses square -> band
matmul -> pow -> scale in one pass over VMEM. The custom VJP uses the
closed form

    dx = g * d^(-p) - 2*(a/n)*p * x * ((g * x * d^(-p-1)) @ B)

so the backward is two fused passes rather than autodiff through pow.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def norm_window_size(num_channels: int, frac: float) -> int:
    return max(1, int(round(frac * num_channels)))


@functools.lru_cache(maxsize=64)
def _band_matrix(num_channels: int, n: int, blocked: bool) -> np.ndarray:
    """B[i, j] = 1 iff channel j is in window(i). Constant-folded by XLA."""
    i = np.arange(num_channels)[:, None]
    j = np.arange(num_channels)[None, :]
    if blocked:
        mask = (j // n) == (i // n)
    else:
        mask = (j >= i - (n - 1) // 2) & (j <= i + n // 2)
    return mask.astype(np.float32)


def _fwd_math(x, bT, alpha, beta):
    """Shared forward math on a (M, C) f32 tile; returns (y, d)."""
    s = jax.lax.dot(x * x, bT, preferred_element_type=jnp.float32)
    d = 1.0 + alpha * s
    y = x * jnp.exp(-beta * jnp.log(d))
    return y, d


def _bwd_math(g, x, d, b, alpha, beta):
    """Shared backward math on (M, C) f32 tiles; returns dx."""
    dpow = jnp.exp(-(beta + 1.0) * jnp.log(d))
    inner = jax.lax.dot(g * x * dpow, b, preferred_element_type=jnp.float32)
    return g * dpow * d - 2.0 * alpha * beta * x * inner


# ---------------------------------------------------------------------------
# Pallas kernels (TPU): one pass over HBM, band matmuls on the MXU.
# ---------------------------------------------------------------------------

_TILE_M = 512


def _lrn_fwd_kernel(x_ref, bT_ref, y_ref, d_ref, *, alpha, beta):
    y, d = _fwd_math(x_ref[:], bT_ref[:], alpha, beta)
    y_ref[:] = y
    d_ref[:] = d


def _lrn_bwd_kernel(g_ref, x_ref, d_ref, b_ref, dx_ref, *, alpha, beta):
    dx_ref[:] = _bwd_math(g_ref[:], x_ref[:], d_ref[:], b_ref[:], alpha, beta)


def _pad_to(a: jax.Array, rows: int, cols: int) -> jax.Array:
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def _pallas_fwd(x2d: jax.Array, bT: jax.Array, alpha: float, beta: float, interpret: bool):
    m, c = x2d.shape
    cp = max(128, ((c + 127) // 128) * 128)
    tile_m = min(_TILE_M, max(8, ((m + 7) // 8) * 8))
    mp = ((m + tile_m - 1) // tile_m) * tile_m
    xp = _pad_to(x2d, mp, cp)
    bTp = _pad_to(bT, cp, cp)
    kernel = functools.partial(_lrn_fwd_kernel, alpha=alpha, beta=beta)
    grid = (mp // tile_m,)
    y, d = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, cp), jnp.float32),
            jax.ShapeDtypeStruct((mp, cp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * cp * cp + 6 * mp * cp,
            bytes_accessed=4 * (3 * mp * cp + cp * cp),
            transcendentals=2 * mp * cp,
        ),
        interpret=interpret,
    )(xp, bTp)
    return y[:m, :c], d[:m, :c]


def _pallas_bwd(g2d, x2d, d2d, b, alpha, beta, interpret):
    m, c = x2d.shape
    cp = max(128, ((c + 127) // 128) * 128)
    tile_m = min(_TILE_M, max(8, ((m + 7) // 8) * 8))
    mp = ((m + tile_m - 1) // tile_m) * tile_m
    gp = _pad_to(g2d, mp, cp)
    xp = _pad_to(x2d, mp, cp)
    # pad d with ones: log(d) must stay finite in padded lanes
    dp = jnp.pad(d2d, ((0, mp - m), (0, cp - c)), constant_values=1.0)
    bp = _pad_to(b, cp, cp)
    kernel = functools.partial(_lrn_bwd_kernel, alpha=alpha, beta=beta)
    dx = pl.pallas_call(
        kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, cp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * cp * cp + 10 * mp * cp,
            bytes_accessed=4 * (4 * mp * cp + cp * cp),
            transcendentals=2 * mp * cp,
        ),
        interpret=interpret,
    )(gp, xp, dp, bp)
    return dx[:m, :c]


def _use_pallas(backend: str) -> bool:
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    # auto: fused Pallas path on real TPU, plain XLA elsewhere
    return jax.default_backend() not in ("cpu", "gpu")


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def response_norm_cross_map(
    x: jax.Array,
    add_scale: float,
    pow_scale: float,
    frac_of_filters: float,
    blocked: bool = False,
    backend: str = "auto",
) -> jax.Array:
    """y = x * (1 + (add_scale/n) * window_sum(x^2))^(-pow_scale) over the
    channel (last) axis. x: (..., C). backend: "auto" | "pallas" | "xla"."""
    y, _ = _lrn_fwd(x, add_scale, pow_scale, frac_of_filters, blocked, backend)
    return y


def _prep(x, add_scale, frac, blocked):
    c = x.shape[-1]
    n = norm_window_size(c, frac)
    alpha = add_scale / n
    bmat = _band_matrix(c, n, blocked)
    x2d = x.reshape(-1, c).astype(jnp.float32)
    return x2d, bmat, alpha


def _lrn_fwd(x, add_scale, pow_scale, frac, blocked, backend):
    x2d, bmat, alpha = _prep(x, add_scale, frac, blocked)
    beta = float(pow_scale)
    if _use_pallas(backend):
        interp = jax.default_backend() == "cpu"  # tests force backend="pallas"
        y2d, d2d = _pallas_fwd(x2d, jnp.asarray(bmat.T), alpha, beta, interpret=interp)
    else:
        y2d, d2d = _fwd_math(x2d, jnp.asarray(bmat.T), alpha, beta)
    return y2d.reshape(x.shape).astype(x.dtype), d2d


def _lrn_fwd_vjp(x, add_scale, pow_scale, frac, blocked, backend):
    y, d2d = _lrn_fwd(x, add_scale, pow_scale, frac, blocked, backend)
    return y, (x, d2d)


def _lrn_bwd_vjp(add_scale, pow_scale, frac, blocked, backend, residuals, g):
    x, d2d = residuals
    x2d, bmat, alpha = _prep(x, add_scale, frac, blocked)
    g2d = g.reshape(-1, x.shape[-1]).astype(jnp.float32)
    beta = float(pow_scale)
    if _use_pallas(backend):
        interp = jax.default_backend() == "cpu"
        dx2d = _pallas_bwd(g2d, x2d, d2d, jnp.asarray(bmat), alpha, beta, interpret=interp)
    else:
        dx2d = _bwd_math(g2d, x2d, d2d, jnp.asarray(bmat), alpha, beta)
    return (dx2d.reshape(x.shape).astype(x.dtype),)


response_norm_cross_map.defvjp(_lrn_fwd_vjp, _lrn_bwd_vjp)


def response_norm_reference(x, add_scale, pow_scale, frac, blocked=False):
    """Straight-line jnp forward with no custom VJP — the numerics oracle
    for tests (autodiff of this is the reference gradient)."""
    c = x.shape[-1]
    n = norm_window_size(c, frac)
    alpha = add_scale / n
    bmat = jnp.asarray(_band_matrix(c, n, blocked))
    xf = x.astype(jnp.float32)
    s = jnp.einsum("...j,ij->...i", xf * xf, bmat)
    return (xf * (1.0 + alpha * s) ** (-pow_scale)).astype(x.dtype)

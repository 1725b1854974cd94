"""Cross-map response normalization (AlexNet-style LRN).

Reference counterparts: ResponseNormEdge (src/response_norm_edge.* [U])
over the cuda-convnet `ResponseNormCrossMap` / `ResponseNormCrossMapUndo`
kernels (cudamat/cudamat_conv*.cu [U]). XLA has no native LRN primitive,
so this is the toolkit's flagship fused Pallas kernel.

Semantics (documented in proto/convnet_config.proto):

    n        = max(1, round(frac_of_filters * C))
    window(i)= [i - n//2, i + (n-1)//2]            (sliding, clipped)
             = block of size n containing i         (blocked)
    s_i      = sum_{j in window(i)} x_j^2
    d_i      = 1 + (add_scale / n) * s_i
    y_i      = x_i * d_i^(-pow_scale)

TPU-first design notes:
- The channel-window sum is n static lane-shifted adds over a
  zero-padded tile (pure VPU work, O(n) per element) — not a sliding
  scalar loop, and not the O(C) banded matmul (that form is kept only
  as the numerics oracle in `response_norm_reference`).
- The Pallas kernel fuses square -> window-sum -> pow -> scale into one
  pass over VMEM, emitting both y and the denominator d (the residual
  the backward pass reuses, exactly like the reference's Undo kernel
  consumed the saved denoms [U]).
- The custom VJP closed form

      dx = g * d^(-p) - 2*(a/n)*p * x * T(g * x * d^(-p-1))

  needs the *transposed* window sum T (j contributes to i iff i is in
  window(j)); same shifted adds with negated offsets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def norm_window_size(num_channels: int, frac: float) -> int:
    return max(1, int(round(frac * num_channels)))


@functools.lru_cache(maxsize=64)
def _band_matrix(num_channels: int, n: int, blocked: bool) -> np.ndarray:
    """B[i, j] = 1 iff channel j is in window(i) — oracle path only."""
    i = np.arange(num_channels)[:, None]
    j = np.arange(num_channels)[None, :]
    if blocked:
        mask = (j // n) == (i // n)
    else:
        mask = (j >= i - n // 2) & (j <= i + (n - 1) // 2)
    return mask.astype(np.float32)


def _window_sum(v, n: int, blocked: bool, c: int, transpose: bool = False):
    """Window sum over the last axis via n static shifted adds.

    Forward:   s_i = sum_{d=-n//2..(n-1)//2} v_{i+d}
    Transpose: t_j = sum_{d=-(n-1)//2..n//2} v_{j+d}
    Blocked windows are symmetric, so transpose == forward.
    """
    if blocked:
        if c % n == 0:
            shape = v.shape[:-1]
            blocks = v.reshape(shape + (c // n, n)).sum(-1, keepdims=True)
            return jnp.broadcast_to(blocks, shape + (c // n, n)).reshape(
                shape + (c,)
            )
        bmat = jnp.asarray(_band_matrix(c, n, True))
        return jax.lax.dot(v, bmat, preferred_element_type=jnp.float32)
    lo, hi = n // 2, (n - 1) // 2
    if transpose:
        lo, hi = hi, lo
    vp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(lo, hi)])
    s = vp[..., 0:c]
    for k in range(1, n):
        s = s + vp[..., k : k + c]
    return s


def _fwd_math(x, n, blocked, c, alpha, beta):
    """Forward on an (M, C) f32 tile; returns (y, d)."""
    s = _window_sum(x * x, n, blocked, c)
    d = 1.0 + alpha * s
    y = x * jnp.exp(-beta * jnp.log(d))
    return y, d


def _bwd_math(g, x, d, n, blocked, c, alpha, beta):
    """Backward on (M, C) f32 tiles; returns dx."""
    dpow = jnp.exp(-(beta + 1.0) * jnp.log(d))
    inner = _window_sum(g * x * dpow, n, blocked, c, transpose=True)
    return g * dpow * d - 2.0 * alpha * beta * x * inner


# ---------------------------------------------------------------------------
# Pallas kernels (TPU): fused single pass over HBM; VPU shift-adds.
# ---------------------------------------------------------------------------

_TILE_M = 1024


def _lrn_fwd_kernel(x_ref, y_ref, d_ref, *, n, blocked, c, alpha, beta):
    y, d = _fwd_math(x_ref[:], n, blocked, c, alpha, beta)
    y_ref[:] = y
    d_ref[:] = d


def _lrn_bwd_kernel(g_ref, x_ref, d_ref, dx_ref, *, n, blocked, c, alpha, beta):
    dx_ref[:] = _bwd_math(
        g_ref[:], x_ref[:], d_ref[:], n, blocked, c, alpha, beta
    )


def _tiles(m: int, c: int):
    cp = max(128, ((c + 127) // 128) * 128)
    tile_m = min(_TILE_M, max(8, ((m + 7) // 8) * 8))
    mp = ((m + tile_m - 1) // tile_m) * tile_m
    return cp, tile_m, mp


def _pad_to(a, rows, cols, value=0.0):
    return jnp.pad(
        a,
        ((0, rows - a.shape[0]), (0, cols - a.shape[1])),
        constant_values=value,
    )


def _pallas_fwd(x2d, n, blocked, alpha, beta, interpret):
    m, c = x2d.shape
    cp, tile_m, mp = _tiles(m, c)
    # window sums run over the padded lane width; padded channels are zero
    # so real-channel sums are unaffected (windows clip identically).
    kernel = functools.partial(
        _lrn_fwd_kernel, n=n, blocked=blocked, c=cp, alpha=alpha, beta=beta
    )
    y, d = pl.pallas_call(
        kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM)
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
            flops=(n + 6) * mp * cp,
            bytes_accessed=4 * 3 * mp * cp,
            transcendentals=2 * mp * cp,
        ),
        interpret=interpret,
    )(_pad_to(x2d, mp, cp))
    return y[:m, :c], d[:m, :c]


def _pallas_bwd(g2d, x2d, d2d, n, blocked, alpha, beta, interpret):
    m, c = x2d.shape
    cp, tile_m, mp = _tiles(m, c)
    kernel = functools.partial(
        _lrn_bwd_kernel, n=n, blocked=blocked, c=cp, alpha=alpha, beta=beta
    )
    dx = pl.pallas_call(
        kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, cp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, cp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(n + 10) * mp * cp,
            bytes_accessed=4 * 4 * mp * cp,
            transcendentals=2 * mp * cp,
        ),
        interpret=interpret,
    )(
        _pad_to(g2d, mp, cp),
        _pad_to(x2d, mp, cp),
        # d pads with 1.0 so log(d) stays finite in dead lanes
        _pad_to(d2d, mp, cp, value=1.0),
    )
    return dx[:m, :c]


def _use_pallas(backend: str) -> bool:
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    # auto: fused Pallas on real TPU, plain XLA elsewhere
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


def _lrn_fwd(x, add_scale, pow_scale, frac, blocked, backend):
    c = x.shape[-1]
    n = norm_window_size(c, frac)
    alpha = add_scale / n
    beta = float(pow_scale)
    x2d = x.reshape(-1, c).astype(jnp.float32)
    if _use_pallas(backend):
        interp = jax.default_backend() == "cpu"  # tests force backend="pallas"
        y2d, d2d = _pallas_fwd(x2d, n, blocked, alpha, beta, interpret=interp)
    else:
        y2d, d2d = _fwd_math(x2d, n, blocked, c, alpha, beta)
    return y2d.reshape(x.shape).astype(x.dtype), d2d


def _lrn_fwd_vjp(x, add_scale, pow_scale, frac, blocked, backend):
    y, d2d = _lrn_fwd(x, add_scale, pow_scale, frac, blocked, backend)
    return y, (x, d2d)


def _lrn_bwd_vjp(add_scale, pow_scale, frac, blocked, backend, residuals, g):
    x, d2d = residuals
    c = x.shape[-1]
    n = norm_window_size(c, frac)
    alpha = add_scale / n
    beta = float(pow_scale)
    x2d = x.reshape(-1, c).astype(jnp.float32)
    g2d = g.reshape(-1, c).astype(jnp.float32)
    if _use_pallas(backend):
        interp = jax.default_backend() == "cpu"
        dx2d = _pallas_bwd(g2d, x2d, d2d, n, blocked, alpha, beta, interpret=interp)
    else:
        dx2d = _bwd_math(g2d, x2d, d2d, n, blocked, c, alpha, beta)
    return (dx2d.reshape(x.shape).astype(x.dtype),)


response_norm_cross_map.defvjp(_lrn_fwd_vjp, _lrn_bwd_vjp)


def response_norm_reference(x, add_scale, pow_scale, frac, blocked=False):
    """Straight-line banded-matmul forward with no custom VJP — the
    numerics oracle for tests (autodiff of this is the reference
    gradient)."""
    c = x.shape[-1]
    n = norm_window_size(c, frac)
    alpha = add_scale / n
    bmat = jnp.asarray(_band_matrix(c, n, blocked))
    xf = x.astype(jnp.float32)
    s = jnp.einsum("...j,ij->...i", xf * xf, bmat)
    return (xf * (1.0 + alpha * s) ** (-pow_scale)).astype(x.dtype)

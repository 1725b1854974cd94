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

TPU-first design notes (tuned on a real v5e chip, round 2):
- The op is pure HBM-bandwidth: ~0 MXU FLOPs, a handful of VPU ops per
  element. Everything therefore centers on minimizing HBM passes:
  * I/O stays in the caller's dtype (bf16 activations halve traffic);
    math runs in f32 inside VMEM.
  * No denominator residual: the backward recomputes d from x with a
    few extra VPU ops instead of a full-size HBM write + read. Residual
    = x only (already live as the producing layer's activation).
  * No HBM pad/slice copies: the kernel grid tiles the row axis with a
    tile that divides M exactly (M = B*H*W always has small factors);
    lane-misaligned channel counts are fixed by *folding* rows
    (see _fold_factor), never by padding HBM.
- In-kernel, the channel-window sum is a banded matmul against a small
  constant 0/1 matrix resident in VMEM: it moves the O(n)-per-element
  work from the (saturated) VPU onto the (idle) MXU — measured 2-3x
  whole-kernel win over lane-shifted adds on v5e. The XLA fallback path
  keeps the shifted-add form (`_window_sum`), which fuses well there.
- The custom VJP closed form

      dx = g * d^(-p) - 2*(a/n)*p * x * T(g * x * d^(-p-1))

  needs the *transposed* window sum T (j contributes to i iff i is in
  window(j)); same shifted adds with negated offsets.

Measured (v5e-1, batch 256, AlexNet rnorm1 = (256,54,54,96) bf16,
standalone dispatch incl. ~1.5 ms tunnel floor): round-1 kernel fwd+bwd
14.1 ms; this kernel 3.4 ms (see BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from convnet_tpu.ops.pallas_util import mesh_dp, pallas_interpret, shmap


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
        # blocked windows are symmetric: contracting either bmat axis works
        return jnp.einsum(
            "...j,ij->...i", v, bmat, preferred_element_type=jnp.float32
        )
    lo, hi = n // 2, (n - 1) // 2
    if transpose:
        lo, hi = hi, lo
    vp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(lo, hi)])
    s = vp[..., 0:c]
    for k in range(1, n):
        s = s + vp[..., k : k + c]
    return s


def _neg_pow(d, p: float):
    """d ** (-p) for d > 0. Quarter-integer exponents (beta = 0.75 is the
    cuda-convnet default) compose from rsqrt/sqrt/reciprocal — each a fast
    VPU primitive — instead of the ~10x-slower exp/log pair, which is what
    made the round-1 kernel transcendental-bound."""
    q = round(4 * p)
    if abs(4 * p - q) > 1e-9 or not (0 < q <= 16):
        return jnp.exp(-p * jnp.log(d))
    out = None
    k, rem = divmod(q, 4)
    if k:
        inv = 1.0 / d
        out = inv
        for _ in range(k - 1):
            out = out * inv
    r = jax.lax.rsqrt(d) if rem else None  # shared by both branches
    if rem >= 2:
        out = r if out is None else out * r
        rem -= 2
    if rem:
        qr = jnp.sqrt(r)
        out = qr if out is None else out * qr
    return out


def _neg_pow_pair(d, p: float):
    """(d^-p, d^-(p+1)) for d > 0 with minimal special-unit ops.

    The backward pass needs both; computing the second as pb/d costs a
    divide (the slowest VPU special op) and _neg_pow(p+1) would pay a
    second rsqrt. For quarter-integer p both powers are mul-chains of
    qr = d^(-1/4) (one rsqrt + one sqrt total): p=0.75 (the
    cuda-convnet default) gives pb = qr^3 and dpow = qr^7."""
    q = round(4 * p)
    if abs(4 * p - q) > 1e-9 or not (0 < q <= 16):
        pb = _neg_pow(d, p)
        return pb, pb / d
    qr = jnp.sqrt(jax.lax.rsqrt(d))  # d^-(1/4)
    powers = {1: qr}

    def power(k):
        if k in powers:
            return powers[k]
        half = power(k // 2)
        r = half * half
        if k % 2:
            r = r * qr
        powers[k] = r
        return r

    return power(q), power(q + 4)


def _fwd_math(x, n, blocked, c, alpha, beta, relu=False):
    """Forward on an (M, C) f32 tile; returns y."""
    if relu:
        x = jnp.maximum(x, 0.0)
    s = _window_sum(x * x, n, blocked, c)
    d = 1.0 + alpha * s
    return x * _neg_pow(d, beta)


def _bwd_math(g, x, n, blocked, c, alpha, beta, relu=False):
    """Backward on (M, C) f32 tiles; recomputes d from x, returns dx.
    With relu, x is the PRE-activation z: the window math runs on
    max(z,0) and the returned cotangent is masked by (z > 0)."""
    z = x
    if relu:
        x = jnp.maximum(x, 0.0)
    s = _window_sum(x * x, n, blocked, c)
    d = 1.0 + alpha * s
    pb, dpow = _neg_pow_pair(d, beta)  # d^-beta, d^-(beta+1)
    inner = _window_sum(g * x * dpow, n, blocked, c, transpose=True)
    dx = g * pb - 2.0 * alpha * beta * x * inner
    if relu:
        dx = jnp.where(z > 0.0, dx, 0.0)
    return dx


# ---------------------------------------------------------------------------
# Pallas kernels (TPU): fused single pass over HBM; VPU shift-adds;
# native-dtype I/O, f32 math in VMEM.
# ---------------------------------------------------------------------------

# Per-tile f32 working-set budget: the kernel holds the tile plus a
# handful of same-size VPU temporaries on the Mosaic stack, and the grid
# pipeline double-buffers in/out — ~1 MB tiles keep the total comfortably
# under the 16 MB VMEM scoped limit at any channel width.
_TILE_BYTES = 1 << 20


def _mm_window(v, bmat_ref, transpose: bool, f32_exact: bool):
    """Window sum as an (M,C)x(C,C) banded matmul — MXU work is ~free at
    these sizes, vs ~2n lane-rotate+add VPU ops for the shifted-add form
    (measured 2-3x whole-kernel win on v5e). bmat[i, j] = 1 iff j is in
    window(i); the transposed sum contracts the other bmat axis."""
    dims = (((1,), (0 if transpose else 1,)), ((), ()))
    return jax.lax.dot_general(
        v,
        bmat_ref[:],
        dims,
        preferred_element_type=jnp.float32,
        # f32 inputs need exact window sums for the 1e-5 parity bar;
        # bf16 inputs are already quantized, the fast MXU path is exact
        # enough (products of bf16 fit f32; the band weights are 0/1).
        precision=jax.lax.Precision.HIGHEST if f32_exact else None,
    )


def _lrn_fwd_kernel(x_ref, bmat_ref, *rest, alpha, beta, f32_exact, relu, has_bias):
    """rest = (bias_ref,) y_ref with bias fusion, else (y_ref,). The bias
    (the producing conv edge's, deferred here by the model — see
    response_norm_cross_map_bias) is added before the in-kernel ReLU, so
    the conv's epilogue add and this kernel's read collapse into one."""
    y_ref = rest[-1]
    x = x_ref[:].astype(jnp.float32)
    if has_bias:
        # f32 bias add (one rounding FEWER than the unfused graph's
        # materialized bf16 `conv_out + bias` — strictly more accurate)
        x = x + rest[0][:]
    if relu:
        x = jnp.maximum(x, 0.0)
    s = _mm_window(x * x, bmat_ref, False, f32_exact)
    d = 1.0 + alpha * s
    y_ref[:] = (x * _neg_pow(d, beta)).astype(y_ref.dtype)


def _lrn_bwd_kernel(
    g_ref, x_ref, bmat_ref, *rest, alpha, beta, f32_exact, relu, has_bias
):
    """rest = (bias_ref, dx_ref, db_ref) with bias fusion, else (dx_ref,).
    db_ref accumulates this tile's column sums of dz (the bias gradient
    partial) — the alternative is XLA re-reading the full dx from HBM
    (measured 0.79 ms at rnorm1 batch-1024 scale, r2d trace round 4)."""
    g = g_ref[:].astype(jnp.float32)
    z = x_ref[:].astype(jnp.float32)
    if has_bias:
        z = z + rest[0][:]
    x = jnp.maximum(z, 0.0) if relu else z
    s = _mm_window(x * x, bmat_ref, False, f32_exact)
    d = 1.0 + alpha * s
    pb, dpow = _neg_pow_pair(d, beta)
    inner = _mm_window(g * x * dpow, bmat_ref, True, f32_exact)
    dx = g * pb - 2.0 * alpha * beta * x * inner
    if relu:
        dx = jnp.where(z > 0.0, dx, 0.0)
    if has_bias:
        rest[1][:] = dx.astype(rest[1].dtype)
        # db rides a full-array (8, C) accumulator revisited every grid
        # step (constant index map): a per-tile (1, C) block would break
        # Mosaic's (8, 128) block-divisibility rule whenever grid_m > 1
        # (caught on chip, round 4 — interpret mode does not check it)
        @pl.when(pl.program_id(0) == 0)
        def _init():
            rest[2][:] = jnp.zeros_like(rest[2])

        rest[2][0:1, :] = rest[2][0:1, :] + jnp.sum(dx, axis=0, keepdims=True)
    else:
        rest[0][:] = dx.astype(rest[0].dtype)


def _fold_factor(m: int, c: int, dtype) -> int:
    """Rows folded per VMEM row so the lane axis is a multiple of 128.

    C=96 leaves a quarter of every 128-wide vector register dead (measured
    ~8x slowdown vs a lane-aligned C on v5e). Viewing the (M, C) problem as
    (M/k, k*C) with k = 128/gcd(C, 128) fills the lanes completely; the
    window sums stay exact because the band matrix becomes block-diagonal
    (kron(I_k, band)), so windows never cross fold boundaries."""
    import math as _math

    if dtype == jnp.float32:
        # the f32-exact path runs its window matmul at HIGHEST precision,
        # whose cost grows with the folded width — folding loses there
        return 1
    k = 128 // _math.gcd(c, 128)
    if k == 1 or m % k:
        return 1
    if (k * c) * (k * c) * 4 > 4 << 20:  # keep the folded bmat under 4 MB
        return 1
    return k


@functools.lru_cache(maxsize=64)
def _folded_band(c: int, n: int, blocked: bool, fold: int) -> np.ndarray:
    band = _band_matrix(c, n, blocked)
    if fold == 1:
        return band
    return np.kron(np.eye(fold, dtype=np.float32), band)


def _pick_tile(m: int, c: int) -> int:
    """Rows per grid step. Prefer the largest divisor of m within the
    VMEM budget that is a multiple of 8 (f32 sublane) so the grid covers
    m exactly; otherwise fall back to a ragged last block (Pallas masks
    out-of-range writes, and LRN rows are independent, so the padding
    rows' garbage never escapes)."""
    cap = max(8, _TILE_BYTES // (4 * c) // 8 * 8)
    best = 0
    t = 8
    while t <= min(cap, m):
        if m % t == 0:
            best = t
        t += 8
    return best or min(cap, ((m + 7) // 8) * 8)


def _bytes(a):
    return a.size * a.dtype.itemsize


def _bmat_spec(c):
    # the full band matrix rides along in VMEM, same block every grid step
    return pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pallas_fwd(x2d, n, blocked, alpha, beta, interpret, relu=False, bias=None):
    m0, c0 = x2d.shape
    fold = _fold_factor(m0, c0, x2d.dtype)
    m, c = m0 // fold, c0 * fold
    x2d = x2d.reshape(m, c)
    tile_m = _pick_tile(m, c)
    f32_exact = x2d.dtype == jnp.float32
    kernel = functools.partial(
        _lrn_fwd_kernel, alpha=alpha, beta=beta, f32_exact=f32_exact, relu=relu,
        has_bias=bias is not None,
    )
    operands = [x2d, jnp.asarray(_folded_band(c0, n, blocked, fold))]
    in_specs = [
        pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _bmat_spec(c),
    ]
    if bias is not None:
        operands.append(jnp.tile(bias.astype(jnp.float32), fold)[None, :])
        in_specs.append(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    y = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, tile_m),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * c + 8 * m * c,
            bytes_accessed=2 * _bytes(x2d),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return y.reshape(m0, c0)


def _pallas_bwd(g2d, x2d, n, blocked, alpha, beta, interpret, relu=False, bias=None):
    """Returns dx, or (dx, db) when `bias` is given — db computed from
    in-VMEM per-tile column sums instead of an XLA re-read of dx."""
    m0, c0 = x2d.shape
    fold = _fold_factor(m0, c0, x2d.dtype)
    m, c = m0 // fold, c0 * fold
    x2d = x2d.reshape(m, c)
    g2d = g2d.reshape(m, c)
    tile_m = _pick_tile(m, c)
    grid_m = pl.cdiv(m, tile_m)
    # bias fusion needs exact tiling: a ragged last tile's padding rows
    # are masked on the dx WRITE but would still pollute the db sums
    assert bias is None or m % tile_m == 0
    f32_exact = x2d.dtype == jnp.float32
    kernel = functools.partial(
        _lrn_bwd_kernel, alpha=alpha, beta=beta, f32_exact=f32_exact, relu=relu,
        has_bias=bias is not None,
    )
    operands = [g2d, x2d, jnp.asarray(_folded_band(c0, n, blocked, fold))]
    in_specs = [
        pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _bmat_spec(c),
    ]
    dx_spec = pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx_shape = jax.ShapeDtypeStruct((m, c), g2d.dtype)
    if bias is not None:
        operands.append(jnp.tile(bias.astype(jnp.float32), fold)[None, :])
        in_specs.append(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_specs = (
            dx_spec,
            # full-array accumulator block: always Mosaic-legal, stays
            # resident in VMEM across the whole grid (constant index map)
            pl.BlockSpec((8, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (dx_shape, jax.ShapeDtypeStruct((8, c), jnp.float32))
    else:
        out_specs, out_shape = dx_spec, dx_shape
    res = pl.pallas_call(
        kernel,
        grid=(grid_m,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * m * c * c + 14 * m * c,
            bytes_accessed=3 * _bytes(x2d),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    if bias is None:
        return res.reshape(m0, c0)
    dx, db_part = res
    # partials are (grid, fold*c0): sum tiles, then the fold copies
    db = db_part.sum(0).reshape(fold, c0).sum(0)
    return dx.reshape(m0, c0), db


# ---------------------------------------------------------------------------
# Transposed (layout-native) kernels for 4D NHWC inputs.
#
# XLA lays conv/pool activations out batch-minor ({0,3,2,1}: B on lanes,
# C on sublanes). A Pallas call pins its operands to descending
# row-major, so feeding it the logical NHWC array forces a full relayout
# copy on both sides (measured ~0.6 ms per 150 MB tensor per crossing on
# v5e — more than the kernel itself). Feeding it x.transpose(1,2,3,0)
# instead makes the required row-major bytes IDENTICAL to the {0,3,2,1}
# physical bytes, so the boundary transposes compile to bitcasts. Inside
# the kernel the tile is (rows, C, B): every elementwise op runs at full
# B-lane width and the channel-window shifts are sublane addressing, not
# lane rotations.
# ---------------------------------------------------------------------------


def _window_sum_mid(v, n: int, c: int, transpose: bool = False):
    """Sliding window sum over axis 1 of a (M, C, B) tile."""
    lo, hi = n // 2, (n - 1) // 2
    if transpose:
        lo, hi = hi, lo
    vp = jnp.pad(v, ((0, 0), (lo, hi), (0, 0)))
    s = vp[:, 0:c, :]
    for k in range(1, n):
        s = s + vp[:, k : k + c, :]
    return s


def _lrn_fwd_kernel_t(x_ref, y_ref, *, n, c, alpha, beta, relu):
    x = x_ref[:].astype(jnp.float32)
    if relu:
        x = jnp.maximum(x, 0.0)
    d = 1.0 + alpha * _window_sum_mid(x * x, n, c)
    y_ref[:] = (x * _neg_pow(d, beta)).astype(y_ref.dtype)


def _lrn_bwd_kernel_t(g_ref, x_ref, dx_ref, *, n, c, alpha, beta, relu):
    g = g_ref[:].astype(jnp.float32)
    z = x_ref[:].astype(jnp.float32)
    x = jnp.maximum(z, 0.0) if relu else z
    d = 1.0 + alpha * _window_sum_mid(x * x, n, c)
    pb, dpow = _neg_pow_pair(d, beta)
    inner = _window_sum_mid(g * x * dpow, n, c, transpose=True)
    dx = g * pb - 2.0 * alpha * beta * x * inner
    if relu:
        dx = jnp.where(z > 0.0, dx, 0.0)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pick_tile_t(m: int, c: int, b: int) -> int:
    """Rows per grid step for the (M, C, B) form; M is a major (untiled)
    axis so any divisor works — prefer exact coverage, accept ragged.

    CONVNET_LRN_TILE_T overrides for A/B sweeps on hardware."""
    import os

    override = os.environ.get("CONVNET_LRN_TILE_T")
    if override:
        return int(override)
    cap = max(1, _TILE_BYTES // (4 * c * max(b, 128)))
    best = 0
    for t in range(1, min(cap, m) + 1):
        if m % t == 0:
            best = t
    return best or min(cap, m)


def _pallas_t(call_bwd, arrays, n, alpha, beta, interpret, relu=False):
    """Shared driver for the transposed kernels. arrays: (x,) or (g, x),
    each (H, W, C, B)."""
    h, w, c, b = arrays[0].shape
    m = h * w
    arrs = [a.reshape(m, c, b) for a in arrays]
    tile_m = _pick_tile_t(m, c, b)
    spec = pl.BlockSpec((tile_m, c, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _lrn_bwd_kernel_t if call_bwd else _lrn_fwd_kernel_t,
        n=n, c=c, alpha=alpha, beta=beta, relu=relu,
    )
    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, tile_m),),
        in_specs=[spec] * len(arrs),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((m, c, b), arrs[0].dtype),
        cost_estimate=pl.CostEstimate(
            flops=(2 * n + 14) * m * c * b,
            bytes_accessed=(len(arrs) + 1) * _bytes(arrs[0]),
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*arrs)
    return out.reshape(h, w, c, b)


# ---------------------------------------------------------------------------
# Rows-2D ("r2d") kernels: the (H, W, C, B) batch-minor bytes viewed as a
# 2D array (H*W*C, B).
#
# Same zero-copy boundary property as the transposed form (the reshape
# from the conv emitters' {0,3,2,1} physical layout is a bitcast), but
# the channel window runs along ROWS, so the window sum becomes a LEFT
# matmul by a block-banded constant kron(I_k, band_C) — MXU work instead
# of the t-form's VPU sublane shifts. Measured on v5e (round 3): the
# t-form bwd ran ~1.5x over the Pallas DMA floor because its VPU shift
# chain doesn't hide under the DMA; the banded-matmul form (proven on
# rnorm2's C-minor layout at ~580 GB/s) moves that work to the idle MXU.
# Tiles are k image-positions = k*C rows, k a divisor of H*W, so tiles
# never split a channel group and the grid covers M exactly (no ragged
# masking, no NaN*0 contamination through the matmul).
# ---------------------------------------------------------------------------


def _lrn_fwd_kernel_r(
    x_ref, bmat_ref, *rest, alpha, beta, relu, has_bias, f32_exact
):
    """rest = (bias_ref,) y_ref with bias fusion (bias rides as a
    (k*C, 1) column, per-channel values tiled over the k image
    positions), else (y_ref,)."""
    prec = jax.lax.Precision.HIGHEST if f32_exact else None
    y_ref = rest[-1]
    x = x_ref[:].astype(jnp.float32)
    if has_bias:
        x = x + rest[0][:]
    if relu:
        x = jnp.maximum(x, 0.0)
    # s = kron(I_k, band) @ v : contract rows
    s = jax.lax.dot_general(
        bmat_ref[:], x * x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    d = 1.0 + alpha * s
    y_ref[:] = (x * _neg_pow(d, beta)).astype(y_ref.dtype)


def _lrn_bwd_kernel_r(
    g_ref, x_ref, bmat_ref, *rest, alpha, beta, relu, has_bias, f32_exact
):
    """rest = (bias_ref, dx_ref, db_ref) with bias fusion, else
    (dx_ref,). db_ref gets this tile's lane (batch) sums of dz —
    see _lrn_bwd_kernel."""
    prec = jax.lax.Precision.HIGHEST if f32_exact else None
    g = g_ref[:].astype(jnp.float32)
    z = x_ref[:].astype(jnp.float32)
    if has_bias:
        z = z + rest[0][:]
    x = jnp.maximum(z, 0.0) if relu else z
    s = jax.lax.dot_general(
        bmat_ref[:], x * x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    d = 1.0 + alpha * s
    pb, dpow = _neg_pow_pair(d, beta)
    # transposed window: t_j = sum_i band[i, j] u_i  ==  band^T @ u
    inner = jax.lax.dot_general(
        bmat_ref[:], g * x * dpow, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    dx = g * pb - 2.0 * alpha * beta * x * inner
    if relu:
        dx = jnp.where(z > 0.0, dx, 0.0)
    if has_bias:
        rest[1][:] = dx.astype(rest[1].dtype)
        # full-array (8, rows) accumulator — see _lrn_bwd_kernel
        @pl.when(pl.program_id(0) == 0)
        def _init():
            rest[2][:] = jnp.zeros_like(rest[2])

        rest[2][0:1, :] = rest[2][0:1, :] + jnp.sum(dx, axis=1)[None, :]
    else:
        rest[0][:] = dx.astype(rest[0].dtype)


def _pick_k_r(m: int, c: int, b: int, bwd: bool) -> int:
    """Image positions per grid step for the r2d form.

    Forward: the largest divisor of m whose k*C-row tile stays near the
    ~1 MB block budget (bigger DMA bursts run closer to HBM speed), ALSO
    capped so the (k*C)^2 f32 block-band constant stays small VMEM
    freight — without that cap a small-batch shape once picked k=25 at
    C=96 and the 23 MB bmat blew the 16 MB scoped limit at compile
    (v5e, round 3).  Backward: k=1 measured fastest on v5e (5.11 ms vs
    5.90 at k=5 for rnorm1 @ B=1024) — the bwd kernel runs two banded
    matmuls plus ~6 tile-sized f32 temporaries, so smaller tiles
    pipeline better.  CONVNET_LRN_TILE_R / _R_BWD override for sweeps."""
    import os

    override = os.environ.get("CONVNET_LRN_TILE_R_BWD" if bwd else "CONVNET_LRN_TILE_R")
    if override:
        k = int(override)
        # the r2d grid is m // k with no ragged masking: a non-divisor
        # would leave the output tail unwritten — silent garbage in an
        # A/B sweep. Fail loudly instead.
        if k < 1 or m % k:
            raise ValueError(
                f"CONVNET_LRN_TILE_R{'_BWD' if bwd else ''}={k} must divide "
                f"M={m} (the r2d grid covers exactly m//k tiles)"
            )
        return k
    if bwd:
        return 1
    cap = max(1, _TILE_BYTES // (2 * c * max(b, 128)))  # bf16 block bytes
    cap = min(cap, max(1, 724 // c))  # (k*C)^2 f32 bmat <= ~2 MB
    best = 1
    for k in range(1, min(cap, m) + 1):
        if m % k == 0:
            best = k
    return best


@functools.lru_cache(maxsize=64)
def _block_band(c: int, n: int, blocked: bool, k: int) -> np.ndarray:
    return np.kron(np.eye(k, dtype=np.float32), _band_matrix(c, n, blocked))


def _pallas_r(call_bwd, arrays, n, blocked, alpha, beta, interpret, relu=False,
              bias=None):
    """Driver for the r2d kernels. arrays: (x,) or (g, x), each (H, W, C, B);
    both the transpose into this layout and the 2D reshape are bitcasts of
    the batch-minor physical bytes. With `bias`, the fwd adds it in-kernel
    and the bwd additionally returns db (batch+position sums of dz)."""
    h, w, c, b = arrays[0].shape
    m = h * w
    k = _pick_k_r(m, c, b, call_bwd)
    rows = k * c
    grid_m = m // k
    arrs = [a.reshape(m * c, b) for a in arrays]
    spec = pl.BlockSpec((rows, b), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((rows, rows), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _lrn_bwd_kernel_r if call_bwd else _lrn_fwd_kernel_r,
        alpha=alpha, beta=beta, relu=relu, has_bias=bias is not None,
        f32_exact=arrays[0].dtype == jnp.float32,
    )
    in_specs = [spec] * len(arrs) + [bspec]
    operands = arrs + [jnp.asarray(_block_band(c, n, blocked, k))]
    if bias is not None:
        operands.append(jnp.tile(bias.astype(jnp.float32), k)[:, None])
        in_specs.append(
            pl.BlockSpec((rows, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    dx_shape = jax.ShapeDtypeStruct((m * c, b), arrs[0].dtype)
    if call_bwd and bias is not None:
        out_specs = (
            spec,
            # full-array accumulator block (always Mosaic-legal); the
            # revisit across grid steps requires "arbitrary" semantics
            pl.BlockSpec((8, rows), lambda i: (0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (dx_shape, jax.ShapeDtypeStruct((8, rows), jnp.float32))
    else:
        out_specs, out_shape = spec, dx_shape
    semantics = (
        "arbitrary" if (call_bwd and bias is not None) else "parallel",
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid_m,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * len(arrs) * m * c * rows * b + 14 * m * c * b,
            bytes_accessed=(len(arrs) + 1) * _bytes(arrs[0]),
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(dimension_semantics=semantics),
        interpret=interpret,
    )(*operands)
    if call_bwd and bias is not None:
        dx, db_part = out
        db = db_part.sum(0).reshape(k, c).sum(0)
        return dx.reshape(h, w, c, b), db
    return out.reshape(h, w, c, b)


# Above this channel count the C x C band matrix stops being "small" VMEM
# freight (and the O(C) matmul stops beating the O(n) shifted adds) —
# auto mode falls back to XLA. Real LRN nets use C <= 512.
_PALLAS_MAX_C = 1024


def _pick_form(c: int, b: int) -> str:
    """Choose the kernel *form* by the layout XLA gives the activation.

    Lane-aligned channel counts (C % 128 == 0) get C-minor activations
    ({3,0,2,1}) from the conv emitters, whose physical bytes equal the
    row-major (H, W, B, C) view — the folded-2D kernel's shape, so its
    boundary transposes become bitcasts (measured: the transposed-form
    kernel on rnorm2 C=256 pays 4 x 0.58 ms of relayout copies the 2D
    form avoids). Non-aligned C (e.g. 96) gets batch-minor {0,3,2,1},
    matching the zero-copy (H, W, C, B) views: "r2d" (block-banded MXU
    window sums — round-3 A/B on v5e: bwd 4.32 ms vs the t-form's 7.81,
    fwd 2.73 vs 5.01 standalone) with "t" (VPU sublane shifts) as the
    measured-slower fallback. Both put B on the lane axis, so they
    require a lane-aligned batch (B % 128 == 0): compiled Mosaic at
    partial lanes produced wrong window sums at B=4 (caught by a TPU
    run of the fusion equivalence test), while the folded-2D form is
    shape-robust. CONVNET_LRN_FORM overrides ("t" | "2d" | "r2d") for
    A/B on new shapes."""
    import os

    form = os.environ.get("CONVNET_LRN_FORM", "auto")
    if form in ("t", "2d", "r2d"):
        return form
    if c % 128 == 0 or b % 128 != 0:
        return "2d"
    return "r2d"


def _use_pallas(backend: str, c: int) -> bool:
    import os

    if backend == "auto":
        backend = os.environ.get("CONVNET_LRN_BACKEND", "auto")
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    # auto: fused Pallas on real TPU, plain XLA elsewhere
    return c <= _PALLAS_MAX_C and jax.default_backend() not in ("cpu", "gpu")


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def response_norm_cross_map(
    x: jax.Array,
    add_scale: float,
    pow_scale: float,
    frac_of_filters: float,
    blocked: bool = False,
    backend: str = "auto",
    fuse_relu: bool = False,
    mesh=None,
) -> jax.Array:
    """y = x * (1 + (add_scale/n) * window_sum(x^2))^(-pow_scale) over the
    channel (last) axis. x: (..., C). backend: "auto" | "pallas" | "xla".

    fuse_relu: treat x as the PRE-activation and apply max(x, 0) inside
    the kernel (fwd) / mask the cotangent by x > 0 (bwd). Fusing the
    producing layer's ReLU here means the relu output is never
    materialized in HBM: the VJP residual is the conv output that
    already exists, which removes a full activation write+read (and the
    double-layout materialization XLA emits for relu outputs consumed
    by both the norm and its own backward — measured ~5 ms/step on
    AlexNet batch 1024).

    I/O keeps x's dtype (bf16 activations stream at half the HBM cost);
    internal math is always f32.

    mesh: the RESOLVED device mesh, or None. The Pallas kernels carry no
    GSPMD partitioning rule, so under a non-trivial mesh they run inside
    shard_map over the "data" (batch) axis — each shard executes the
    same kernel on its local batch rows (the op is batch-parallel: the
    window spans channels only). Model-axis-sharded inputs are gathered
    to full channel width at the shard_map boundary, exactly where the
    XLA form needed its all-gather too (the window is channel-global)."""
    return _lrn_fwd(
        x, add_scale, pow_scale, frac_of_filters, blocked, backend, fuse_relu,
        mesh,
    )


def _lrn_pallas_fwd_local(x, n, blocked, alpha, beta, interp, relu):
    """Pallas forward on a (per-shard) local array; picks the kernel form
    from the LOCAL shapes (under shard_map the lane-axis batch is the
    per-shard batch)."""
    c = x.shape[-1]
    form = _pick_form(c, x.shape[0]) if x.ndim == 4 and not blocked else "2d"
    if x.ndim == 4 and not blocked and form == "r2d":
        xt = jnp.transpose(x, (1, 2, 3, 0))
        yt = _pallas_r(False, (xt,), n, blocked, alpha, beta, interp, relu=relu)
        return jnp.transpose(yt, (3, 0, 1, 2)).astype(x.dtype)
    if x.ndim == 4 and not blocked and form == "t":
        xt = jnp.transpose(x, (1, 2, 3, 0))
        yt = _pallas_t(False, (xt,), n, alpha, beta, interp, relu=relu)
        return jnp.transpose(yt, (3, 0, 1, 2)).astype(x.dtype)
    if x.ndim == 4 and not blocked:
        # (H, W, B, C) view: for C-minor activations ({3,0,2,1}, what
        # XLA picks for lane-aligned C) this permutation is a bitcast
        b_, h_, w_, c_ = x.shape
        x2 = jnp.transpose(x, (1, 2, 0, 3)).reshape(-1, c)
        y2 = _pallas_fwd(x2, n, blocked, alpha, beta, interpret=interp, relu=relu)
        y4 = y2.reshape(h_, w_, b_, c_)
        return jnp.transpose(y4, (2, 0, 1, 3)).astype(x.dtype)
    y2d = _pallas_fwd(
        x.reshape(-1, c), n, blocked, alpha, beta, interpret=interp, relu=relu
    )
    return y2d.reshape(x.shape).astype(x.dtype)


def _lrn_pallas_bwd_local(g, x, n, blocked, alpha, beta, interp, relu):
    """Pallas backward (dx only) on local arrays — see _lrn_pallas_fwd_local."""
    c = x.shape[-1]
    form = _pick_form(c, x.shape[0]) if x.ndim == 4 and not blocked else "2d"
    if x.ndim == 4 and not blocked and form == "r2d":
        xt = jnp.transpose(x, (1, 2, 3, 0))
        gt = jnp.transpose(g.astype(x.dtype), (1, 2, 3, 0))
        dxt = _pallas_r(True, (gt, xt), n, blocked, alpha, beta, interp, relu=relu)
        return jnp.transpose(dxt, (3, 0, 1, 2)).astype(x.dtype)
    if x.ndim == 4 and not blocked and form == "t":
        xt = jnp.transpose(x, (1, 2, 3, 0))
        gt = jnp.transpose(g.astype(x.dtype), (1, 2, 3, 0))
        dxt = _pallas_t(True, (gt, xt), n, alpha, beta, interp, relu=relu)
        return jnp.transpose(dxt, (3, 0, 1, 2)).astype(x.dtype)
    if x.ndim == 4 and not blocked:
        b_, h_, w_, c_ = x.shape
        x2 = jnp.transpose(x, (1, 2, 0, 3)).reshape(-1, c)
        g2 = jnp.transpose(g.astype(x.dtype), (1, 2, 0, 3)).reshape(-1, c)
        dx2 = _pallas_bwd(
            g2, x2, n, blocked, alpha, beta, interpret=interp, relu=relu
        )
        dx4 = dx2.reshape(h_, w_, b_, c_)
        return jnp.transpose(dx4, (2, 0, 1, 3)).astype(x.dtype)
    x2d = x.reshape(-1, c)
    g2d = g.reshape(-1, c).astype(x2d.dtype)
    dx2d = _pallas_bwd(
        g2d, x2d, n, blocked, alpha, beta, interpret=interp, relu=relu
    )
    return dx2d.reshape(x.shape).astype(x.dtype)


def _pallas_routable(backend, c, b, mesh) -> bool:
    """Pallas path taken (globally or via shard_map)? Under a mesh the
    global batch must divide the data axis so every shard sees the same
    local shape."""
    return _use_pallas(backend, c) and b % mesh_dp(mesh) == 0


def _lrn_fwd(x, add_scale, pow_scale, frac, blocked, backend, relu=False,
             mesh=None):
    c = x.shape[-1]
    n = norm_window_size(c, frac)
    alpha = add_scale / n
    beta = float(pow_scale)
    if _pallas_routable(backend, c, x.shape[0], mesh):
        interp = pallas_interpret()  # tests force backend="pallas"

        def local(xl):
            return _lrn_pallas_fwd_local(xl, n, blocked, alpha, beta, interp, relu)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            return shmap(local, mesh, (P("data"),), P("data"))(x)
        return local(x)
    # XLA path: no reshape, no materialized cast — the f32 math happens in
    # registers inside whatever fusion/layout XLA picks for the neighbors,
    # so this form composes with zero boundary copies (and GSPMD partitions
    # it without help — no shard_map needed).
    y = _fwd_math(x.astype(jnp.float32), n, blocked, c, alpha, beta, relu=relu)
    return y.astype(x.dtype)


def _lrn_fwd_vjp(x, add_scale, pow_scale, frac, blocked, backend, fuse_relu=False,
                 mesh=None):
    y = _lrn_fwd(x, add_scale, pow_scale, frac, blocked, backend, fuse_relu, mesh)
    return y, x  # d is recomputed in the bwd kernel — no HBM residual


def _lrn_bwd_vjp(add_scale, pow_scale, frac, blocked, backend, fuse_relu, mesh,
                 x, g):
    c = x.shape[-1]
    n = norm_window_size(c, frac)
    alpha = add_scale / n
    beta = float(pow_scale)
    if _pallas_routable(backend, c, x.shape[0], mesh):
        interp = pallas_interpret()

        def local(gl, xl):
            return _lrn_pallas_bwd_local(
                gl, xl, n, blocked, alpha, beta, interp, fuse_relu
            )

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            return (shmap(local, mesh, (P("data"), P("data")), P("data"))(g, x),)
        return (local(g, x),)
    dx = _bwd_math(
        g.astype(jnp.float32), x.astype(jnp.float32), n, blocked, c, alpha, beta,
        relu=fuse_relu,
    )
    return (dx.astype(x.dtype),)


response_norm_cross_map.defvjp(_lrn_fwd_vjp, _lrn_bwd_vjp)


# ---------------------------------------------------------------------------
# Bias-fused variant: LRN over (x + b) with db emitted by the kernel
# ---------------------------------------------------------------------------


def _bias_fusable(x, blocked: bool, backend: str, mesh=None) -> bool:
    """The in-kernel bias path needs a shipping Pallas form (r2d or
    exact-tiled folded-2D). Everything else composes x + b in XLA —
    numerically identical, just without the db-re-read saving.

    Under a mesh the decision runs on the PER-SHARD batch (shard_map
    hands each shard its local rows — the form choice inside the body
    must agree with this gate)."""
    c = x.shape[-1]
    dp = mesh_dp(mesh)
    if (
        not _use_pallas(backend, c)
        or blocked
        or x.ndim != 4
        or x.shape[0] % dp
    ):
        return False
    shard_b = x.shape[0] // dp
    form = _pick_form(c, shard_b)
    if form == "r2d":
        return True
    if form == "2d":
        _, h_, w_, c_ = x.shape
        fold = _fold_factor(h_ * w_ * shard_b, c_, x.dtype)
        m = h_ * w_ * shard_b // fold
        return m % _pick_tile(m, c_ * fold) == 0
    return False


def lrn_bias_fusion_wanted() -> bool:
    """Defer eligible conv biases into the response-norm kernel
    (model.apply_fn). Default "auto" = ON for TPU backends since the
    round-4 chip A/B: 121.44 -> 119.33 ms/step on AlexNet @2048
    (+2.1 ms — the two bias-grad reduce re-reads in the trace), db
    f32-accumulated in-kernel. OFF on cpu/gpu: the payoff is the Pallas
    backward's in-VMEM db sums, which the XLA fallback those backends
    use doesn't have (and the deferral ~2x'd the CPU suite for
    nothing). CONVNET_LRN_BIAS_FUSED=0|1 forces."""
    import os

    mode = os.environ.get("CONVNET_LRN_BIAS_FUSED", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return jax.default_backend() not in ("cpu", "gpu")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def response_norm_cross_map_bias(
    x: jax.Array,
    b: jax.Array,
    add_scale: float,
    pow_scale: float,
    frac_of_filters: float,
    blocked: bool = False,
    backend: str = "auto",
    fuse_relu: bool = False,
    mesh=None,
) -> jax.Array:
    """response_norm_cross_map(x + b) with the bias add fused into the
    kernel and — the point — the bias GRADIENT emitted as in-VMEM
    per-tile sums by the backward kernel. Without this, XLA derives db
    from the bias-add node by RE-READING the full dz from HBM (0.79 ms
    for rnorm1 + 0.51 ms for rnorm2 at batch 1024, round-4 r2d trace).
    The model defers an eligible conv edge's bias here
    (CONVNET_LRN_BIAS_FUSED=1, see model.apply_fn).

    x: the conv output WITHOUT bias; b: (C,) bias. With fuse_relu the
    in-kernel order is relu(x + b) — exactly the graph's conv+bias ->
    relu -> LRN chain. mesh: see response_norm_cross_map — under a mesh
    the kernels run per-shard via shard_map over "data"; each shard's
    backward emits a partial db (its local batch rows), stacked along a
    leading shard axis and summed outside the shard_map."""
    return _lrn_fwd_b(
        x, b, add_scale, pow_scale, frac_of_filters, blocked, backend, fuse_relu,
        mesh,
    )


def _lrn_pallas_fwd_b_local(x, b, n, blocked, alpha, beta, interp, relu):
    c = x.shape[-1]
    form = _pick_form(c, x.shape[0])
    if form == "r2d":
        xt = jnp.transpose(x, (1, 2, 3, 0))
        yt = _pallas_r(
            False, (xt,), n, blocked, alpha, beta, interp, relu=relu, bias=b
        )
        return jnp.transpose(yt, (3, 0, 1, 2)).astype(x.dtype)
    b_, h_, w_, c_ = x.shape
    x2 = jnp.transpose(x, (1, 2, 0, 3)).reshape(-1, c)
    y2 = _pallas_fwd(
        x2, n, blocked, alpha, beta, interpret=interp, relu=relu, bias=b
    )
    return jnp.transpose(y2.reshape(h_, w_, b_, c_), (2, 0, 1, 3)).astype(x.dtype)


def _lrn_pallas_bwd_b_local(g, x, b, n, blocked, alpha, beta, interp, relu):
    """(dx, db) on local arrays; db is this shard's partial sum."""
    c = x.shape[-1]
    form = _pick_form(c, x.shape[0])
    if form == "r2d":
        xt = jnp.transpose(x, (1, 2, 3, 0))
        gt = jnp.transpose(g.astype(x.dtype), (1, 2, 3, 0))
        dxt, db = _pallas_r(
            True, (gt, xt), n, blocked, alpha, beta, interp, relu=relu, bias=b
        )
        return jnp.transpose(dxt, (3, 0, 1, 2)).astype(x.dtype), db
    b_, h_, w_, c_ = x.shape
    x2 = jnp.transpose(x, (1, 2, 0, 3)).reshape(-1, c)
    g2 = jnp.transpose(g.astype(x.dtype), (1, 2, 0, 3)).reshape(-1, c)
    dx2, db = _pallas_bwd(
        g2, x2, n, blocked, alpha, beta, interpret=interp, relu=relu, bias=b
    )
    dx4 = jnp.transpose(dx2.reshape(h_, w_, b_, c_), (2, 0, 1, 3))
    return dx4.astype(x.dtype), db


def _lrn_fwd_b(x, b, add_scale, pow_scale, frac, blocked, backend, relu,
               mesh=None):
    c = x.shape[-1]
    n = norm_window_size(c, frac)
    alpha = add_scale / n
    beta = float(pow_scale)
    if _bias_fusable(x, blocked, backend, mesh):
        interp = pallas_interpret()

        def local(xl, bl):
            return _lrn_pallas_fwd_b_local(
                xl, bl, n, blocked, alpha, beta, interp, relu
            )

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            # bias replicated into every shard (tiny); batch rows split
            return shmap(local, mesh, (P("data"), P()), P("data"))(x, b)
        return local(x, b)
    # composed fallback: identical math, bias added by XLA
    return _lrn_fwd(
        x + b.astype(x.dtype), add_scale, pow_scale, frac, blocked, backend, relu,
        mesh,
    )


def _lrn_fwd_b_vjp(x, b, add_scale, pow_scale, frac, blocked, backend, fuse_relu,
                   mesh=None):
    y = _lrn_fwd_b(
        x, b, add_scale, pow_scale, frac, blocked, backend, fuse_relu, mesh
    )
    return y, (x, b)


def _lrn_bwd_b_vjp(add_scale, pow_scale, frac, blocked, backend, fuse_relu, mesh,
                   res, g):
    x, b = res
    c = x.shape[-1]
    n = norm_window_size(c, frac)
    alpha = add_scale / n
    beta = float(pow_scale)
    if _bias_fusable(x, blocked, backend, mesh):
        interp = pallas_interpret()

        def local(gl, xl, bl):
            dxl, dbl = _lrn_pallas_bwd_b_local(
                gl, xl, bl, n, blocked, alpha, beta, interp, fuse_relu
            )
            # leading shard axis: stacked by out_specs, summed below —
            # avoids any in-body collective (no replication rule needed)
            return dxl, dbl[None, :]

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            dx, db_parts = shmap(
                local, mesh, (P("data"), P("data"), P()),
                (P("data"), P("data", None)),
            )(g, x, b)
            return dx, db_parts.sum(0).astype(b.dtype)
        dx, db_part = local(g, x, b)
        return dx, db_part.sum(0).astype(b.dtype)
    # composed fallback: dx via the unbiased backward on z = x + b;
    # db is the XLA reduction (what the fused path avoids)
    (dx,) = _lrn_bwd_vjp(
        add_scale, pow_scale, frac, blocked, backend, fuse_relu, mesh,
        x + b.astype(x.dtype), g,
    )
    db = jnp.sum(dx.astype(jnp.float32), axis=tuple(range(dx.ndim - 1)))
    return dx, db.astype(b.dtype)


response_norm_cross_map_bias.defvjp(_lrn_fwd_b_vjp, _lrn_bwd_b_vjp)


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

"""Fused response-norm -> maxpool with a single-pass fused backward.

Reference counterparts: the ResponseNormEdge + MaxPoolEdge backward
chain (src/response_norm_edge.* / src/maxpool_edge.* over cuda-convnet
ResponseNormCrossMapUndo / MaxPoolUndo [U]). In the reference these are
two kernel launches that communicate through a full-size activation
gradient in GPU memory; here the pair is one Pallas kernel, so the
intermediate LRN cotangent (594 MB at AlexNet rnorm1, batch 1024) is
never written to HBM at all — it lives only as a VMEM tile between the
two stages. docs/fused_pool_lrn_bwd_design.md has the VMEM accounting
that shaped the tiling.

Semantics note (documented in PARITY.md): the pool-undo stage uses the
cuda-convnet comparison form — every input position EQUAL to its
window's max receives that window's cotangent — not XLA
select-and-scatter's single first-winner. Post-ReLU zeros tie
constantly, so the two differ on real data; the comparison form is the
reference's (kMaxPoolUndo `a == ma` [U]). The fused op therefore uses
`ops.pool.maxpool2d_undo_reference` as its fallback/oracle on every
backend, keeping its own semantics backend-independent.

Tiling (backward kernel, r2d batch-minor layout):
  * all four tensors ride as (rows, B) 2D views of their (H, W, C, B)
    transposes — bitcasts of the batch-minor physical bytes the conv
    emitters produce for non-lane-aligned C (see ops/lrn.py r2d notes);
  * grid = (B/LB lane blocks, H image rows, wsplit row halves): one
    output tile = wsplit-th of an image row, LB=128 lanes;
  * the <= ceil(k/s) pool rows feeding output row i arrive as that many
    block-shifted views of g/m (BlockSpec index maps i//s - v); in-row
    window overlap is resolved in-VMEM by a repeat+shift gather, with
    compile-time column masks for taps that fall outside the window;
  * stage 2 (LRN backward) is the r2d block-banded-matmul form on the
    VMEM-resident pool cotangent — MXU window sums, divide-free
    d^-p/d^-(p+1) mul chains (ops/lrn.py), ReLU fused when asked.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convnet_tpu.ops.lrn import (
    _band_matrix,
    _bwd_math,
    _lrn_fwd,
    _neg_pow_pair,
    norm_window_size,
)
from convnet_tpu.ops.pool import maxpool2d, maxpool2d_undo_reference
from convnet_tpu.ops.pallas_util import pallas_interpret


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _gather_cols(slab, s: int, shift: int, w: int, k: int):
    """(OW, C, LB) -> (W, C, LB) with out[j] = slab[j//s - shift] where
    window column v = j//s - shift really covers output column j, zero
    otherwise. All three invalidity cases are static: v < 0 is the zero
    prefix, v > OW-1 the zero tail, and the tap falling past the
    window's right edge (j > s*v + k - 1) depends only on j mod s, so it
    zeroes whole repeat phases. Static repeat + concat only — no dynamic
    addressing and no captured constants, Mosaic-friendly."""
    ow = slab.shape[0]
    tail = slab.shape[1:]
    zero_phase = jnp.zeros((ow, 1) + tail, slab.dtype)
    phases = [
        slab[:, None] if jm + s * shift <= k - 1 else zero_phase
        for jm in range(s)
    ]
    r = jnp.concatenate(phases, axis=1).reshape((ow * s,) + tail)
    pre = s * shift
    if pre:
        r = jnp.concatenate([jnp.zeros((pre,) + tail, slab.dtype), r], axis=0)
    if r.shape[0] < w:
        r = jnp.concatenate(
            [r, jnp.zeros((w - r.shape[0],) + tail, slab.dtype)], axis=0
        )
    return r[:w]


def _select_chunk(full, h2, wsplit: int, wc: int):
    """Chunk h2 of a (W, C, LB) gathered row, as a statically-unrolled
    masked select-sum: Mosaic TC has no dynamic_slice on in-VMEM values
    (the AOT compile probe caught interpret mode hiding this), but a
    traced-scalar select broadcast over each static chunk lowers fine.
    wsplit is small (<= 5 at shipped shapes) so the unroll is cheap VPU
    work on tiles that already live in vregs."""
    if wsplit == 1:
        return full
    acc = None
    for h in range(wsplit):
        part = full[h * wc : (h + 1) * wc]
        sel = jnp.where(h2 == h, part, jnp.zeros_like(part))
        acc = sel if acc is None else acc + sel
    return acc


def _chunk_lrn_y(z_t, bmat_ref, alpha: float, beta: float, relu: bool, out_dtype):
    """One kb-chunk of the LRN forward, the EXACT op sequence both fused
    kernels share: the fwd kernel's m and the bwd kernel's recomputed y
    must agree bit-for-bit (the pool-undo stage credits positions whose
    y equals the stored window max), so both call this helper — same
    banded MXU window sum, same _neg_pow_pair mul-chain, same downcast.
    (The MXU's in-row f32 accumulation order is K-scan over the band's
    contiguous nonzeros, and the zero taps add exact +0.0, so the sums
    are also invariant to the kb tiling itself.)"""
    x = jnp.maximum(z_t, 0.0) if relu else z_t
    ssum = lax.dot_general(
        bmat_ref[:], x * x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32 layers need exact window sums for the 1e-5 parity bar
        # (chip-validated: the default MXU path gave 1.15e-5 rel error
        # vs the exact shift-add oracle at rnorm1 geometry); bf16 inputs
        # are already quantized and products of bf16 fit f32 exactly
        precision=(
            jax.lax.Precision.HIGHEST if out_dtype == jnp.float32 else None
        ),
    )
    d = 1.0 + alpha * ssum
    pb, dpow = _neg_pow_pair(d, beta)
    return x, pb, dpow, (x * pb).astype(out_dtype)


def _fused_bwd_kernel(
    *refs,
    nv: int,
    h: int,
    w: int,
    c: int,
    lb: int,
    oh: int,
    ow: int,
    k: int,
    s: int,
    wsplit: int,
    kb: int,
    alpha: float,
    beta: float,
    relu: bool,
    has_bias: bool,
):
    g_refs = refs[:nv]
    m_refs = refs[nv : 2 * nv]
    if has_bias:
        # extra input: (kb*c, 1) f32 bias column (channel values tiled
        # over the kb positions); extra output: per-tile lane sums of
        # dz — the bias gradient partials (see ops/lrn.py, same trick)
        z_ref, bmat_ref, bias_ref, dz_ref, db_ref = refs[2 * nv :]
    else:
        z_ref, bmat_ref, dz_ref = refs[2 * nv :]
        bias_ref = db_ref = None
    i = pl.program_id(1)
    h2 = pl.program_id(2)
    wc = w // wsplit
    rows = kb * c
    zb = z_ref[:]
    if has_bias:
        # db rides a full-array (8, wc*c) accumulator revisited at every
        # grid step (constant index map): per-tile (1, 1, wc*c) blocks
        # broke Mosaic's (8, 128) divisibility rule (chip, round 4)
        first = (pl.program_id(0) == 0) & (i == 0) & (h2 == 0)

        @pl.when(first)
        def _init():
            db_ref[:] = jnp.zeros_like(db_ref)

    # ---- stage 0: recompute y from z (the 594 MB y read this kernel
    # used to pay is pure redundancy: d is recomputed from z anyway and
    # y = x * d^-beta is one extra multiply per element) ----------------
    ys = []
    for t in range(wc // kb):
        sl = slice(t * rows, (t + 1) * rows)
        z_t = zb[sl].astype(jnp.float32)
        if has_bias:
            z_t = z_t + bias_ref[:]
        _, _, _, y_t = _chunk_lrn_y(z_t, bmat_ref, alpha, beta, relu, zb.dtype)
        ys.append(y_t)
    # pool-max comparisons run in f32: Mosaic has no cmpf on packed
    # (8,128,2) bf16 vregs, and the upcast is exact for bf16 values
    y = jnp.concatenate(ys, axis=0).reshape(wc, c, lb).astype(jnp.float32)
    glrn = jnp.zeros((wc, c, lb), jnp.float32)

    # ---- stage 1: maxpool undo (comparison form) into VMEM ---------------
    for v in range(nv):
        u = i // s - v
        valid_u = (u >= 0) & (u <= oh - 1) & (s * u + (k - 1) >= i)
        m_slab = m_refs[v][:].reshape(ow, c, lb)
        g_slab = g_refs[v][:].reshape(ow, c, lb)
        for t in range(nv):
            m_half = _select_chunk(_gather_cols(m_slab, s, t, w, k), h2, wsplit, wc)
            sel = (y == m_half.astype(jnp.float32)) & valid_u
            g_half = _select_chunk(_gather_cols(g_slab, s, t, w, k), h2, wsplit, wc)
            glrn = glrn + jnp.where(sel, g_half.astype(jnp.float32), 0.0)

    # ---- stage 2: LRN backward (r2d block-banded matmuls). d/pb/dpow
    # are recomputed per chunk rather than carried from stage 0: the
    # extra banded matmul rides the otherwise-idle MXU, while retaining
    # three full-tile f32 temporaries across stage 1 would strain the
    # 16 MB scoped-VMEM budget. ---------------------------------------
    g2 = glrn.reshape(wc * c, lb)
    for t in range(wc // kb):
        sl = slice(t * rows, (t + 1) * rows)
        z_t = zb[sl].astype(jnp.float32)
        if has_bias:
            z_t = z_t + bias_ref[:]
        x, pb, dpow, _ = _chunk_lrn_y(z_t, bmat_ref, alpha, beta, relu, zb.dtype)
        g_t = g2[sl]
        inner = lax.dot_general(
            bmat_ref[:], g_t * x * dpow, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST
                if zb.dtype == jnp.float32
                else None
            ),
        )
        dx = g_t * pb - 2.0 * alpha * beta * x * inner
        if relu:
            dx = jnp.where(z_t > 0.0, dx, 0.0)
        dz_ref[sl] = dx.astype(dz_ref.dtype)
        if has_bias:
            db_ref[0:1, sl] = db_ref[0:1, sl] + jnp.sum(dx, axis=1)[None, :]


@functools.lru_cache(maxsize=64)
def _stage2_band(c: int, n: int, blocked: bool, kb: int) -> np.ndarray:
    return np.kron(np.eye(kb, dtype=np.float32), _band_matrix(c, n, blocked))


def _pick_wsplit(w: int, c: int, lb: int, itemsize: int) -> int:
    """Split the y/z/dz row tiles when a full image row exceeds ~0.5 MB —
    at AlexNet rnorm1 scale (55*96 rows x 128 lanes) the full-row working
    set (3 row streams + 2*nv pool views, double-buffered, plus gather
    temporaries) would blow the 16 MB scoped-VMEM limit. Smallest divisor
    of W that fits, keeping the sub-tile row count 16-aligned (bf16
    sublane tiling). CONVNET_PLRN_WSPLIT overrides."""
    override = os.environ.get("CONVNET_PLRN_WSPLIT")
    if override:
        d = int(override)
        # a non-divisor split would truncate the row tiling (tail of W
        # never processed) — reject instead of computing garbage
        if d < 1 or w % d:
            raise ValueError(f"CONVNET_PLRN_WSPLIT={d} must divide W={w}")
        return d
    budget = 1 << 19
    for d in range(1, w + 1):
        if w % d:
            continue
        wc = w // d
        if (wc * c * lb * itemsize <= budget or wc == 1) and (wc * c) % 16 == 0:
            return d
    return 1


def _pick_kb(wc: int, c: int) -> int:
    """Positions per stage-2 banded matmul: largest divisor of the tile
    width whose kron(I_kb, band) stays ~1.5 MB f32 VMEM freight."""
    best = 1
    for kb in range(1, wc + 1):
        if wc % kb == 0 and (kb * c) * (kb * c) * 4 <= (3 << 19):
            best = kb
    return best


def _pallas_fused_bwd(
    gm, m, z, *, n, blocked, alpha, beta, relu, k, s, interpret, bias=None
):
    """Returns dz, or (dz, db) when `bias` is given."""
    b, h, w, c = z.shape
    _, oh, ow, _ = m.shape
    zt = jnp.transpose(z, (1, 2, 3, 0)).reshape(h * w * c, b)
    mt = jnp.transpose(m, (1, 2, 3, 0)).reshape(oh * ow * c, b)
    gt = jnp.transpose(gm.astype(m.dtype), (1, 2, 3, 0)).reshape(oh * ow * c, b)

    lb = 128 if (b % 128 == 0 and not interpret) else b
    wsplit = _pick_wsplit(w, c, lb, z.dtype.itemsize)
    wc = w // wsplit
    nv = (k - 1) // s + 1
    kb = _pick_kb(wc, c)
    bmat = jnp.asarray(_stage2_band(c, n, blocked, kb))

    row_spec = pl.BlockSpec(
        (wc * c, lb),
        lambda jb, i, h2: (i * wsplit + h2, jb),
        memory_space=pltpu.VMEM,
    )

    def pool_spec(v):
        return pl.BlockSpec(
            (ow * c, lb),
            lambda jb, i, h2, v=v: (jnp.clip(i // s - v, 0, oh - 1), jb),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _fused_bwd_kernel,
        nv=nv, h=h, w=w, c=c, lb=lb, oh=oh, ow=ow, k=k, s=s,
        wsplit=wsplit, kb=kb, alpha=alpha, beta=beta, relu=relu,
        has_bias=bias is not None,
    )
    in_specs = [pool_spec(v) for v in range(nv)] * 2 + [
        row_spec,
        pl.BlockSpec(
            (kb * c, kb * c), lambda jb, i, h2: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [gt] * nv + [mt] * nv + [zt, bmat]
    dz_shape = jax.ShapeDtypeStruct((h * w * c, b), z.dtype)
    if bias is not None:
        operands.append(jnp.tile(bias.astype(jnp.float32), kb)[:, None])
        in_specs.append(
            pl.BlockSpec(
                (kb * c, 1), lambda jb, i, h2: (0, 0), memory_space=pltpu.VMEM
            )
        )
        out_specs = (
            row_spec,
            # full-array accumulator block (always Mosaic-legal); the
            # revisit across all grid dims forces "arbitrary" semantics
            pl.BlockSpec(
                (8, wc * c), lambda jb, i, h2: (0, 0), memory_space=pltpu.VMEM
            ),
        )
        out_shape = (dz_shape, jax.ShapeDtypeStruct((8, wc * c), jnp.float32))
    else:
        out_specs, out_shape = row_spec, dz_shape
    semantics = (
        ("arbitrary",) * 3 if bias is not None else ("parallel",) * 3
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // lb, h, wsplit),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * h * w * c * (kb * c) * b + 10 * nv * nv * h * w * c * b,
            bytes_accessed=_nbytes(zt) * 2 + _nbytes(mt) * 2 * nv,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(dimension_semantics=semantics),
        interpret=interpret,
    )(*operands)
    if bias is None:
        return jnp.transpose(out.reshape(h, w, c, b), (3, 0, 1, 2))
    dz2, db_part = out
    db = db_part.sum(0).reshape(wc, c).sum(0)
    return jnp.transpose(dz2.reshape(h, w, c, b), (3, 0, 1, 2)), db


def _nbytes(a):
    return a.size * a.dtype.itemsize


# ---------------------------------------------------------------------------
# Forward kernel: response-norm + maxpool in one pass, y never in HBM
# ---------------------------------------------------------------------------


def _pool_cols(y_slab, s: int, t: int, ow: int):
    """(W, C, LB) -> (OW, C, LB) with out[j] = y_slab[s*j + t], -inf
    where s*j + t falls past the input's right edge (the ceil-mode
    window overhang reduce_window completes with -inf padding). Static
    slice + pad + reshape only — no dynamic addressing, Mosaic-safe."""
    w = y_slab.shape[0]
    need = s * ow
    sl = y_slab[t : min(t + need, w)]
    if sl.shape[0] < need:
        pad = jnp.full(
            (need - sl.shape[0],) + sl.shape[1:], -jnp.inf, sl.dtype
        )
        sl = jnp.concatenate([sl, pad], axis=0)
    return sl.reshape((ow, s) + sl.shape[1:])[:, 0]


def _fused_fwd_kernel(
    z_ref,
    bmat_ref,
    *rest,
    h: int,
    w: int,
    c: int,
    lb: int,
    ow: int,
    k: int,
    s: int,
    kb: int,
    alpha: float,
    beta: float,
    relu: bool,
    has_bias: bool,
):
    """Grid (B/LB, OH, k): step (jb, i, v) reads image row s*i + v of z,
    computes that row's LRN output y in VMEM (shared _chunk_lrn_y
    chunks), reduces its k column taps, and max-accumulates into output
    row i — which stays resident in VMEM across the v revisits. The LRN
    output never touches HBM; vs the unfused chain (LRN writes y 594 MB,
    pool reads it back + the conv output once more at AlexNet rnorm1/
    B=1024) this saves ~2 HBM round-trips of the layer."""
    bias_ref = rest[0] if has_bias else None
    m_ref = rest[-1]
    i = pl.program_id(1)
    v = pl.program_id(2)
    rows = kb * c
    zb = z_ref[:]
    ys = []
    for t in range(w // kb):
        sl = slice(t * rows, (t + 1) * rows)
        z_t = zb[sl].astype(jnp.float32)
        if has_bias:
            z_t = z_t + bias_ref[:]
        _, _, _, y_t = _chunk_lrn_y(z_t, bmat_ref, alpha, beta, relu, zb.dtype)
        ys.append(y_t)
    y = jnp.concatenate(ys, axis=0).reshape(w, c, lb).astype(jnp.float32)
    # row tap past the bottom edge (ceil-mode overhang): -inf, max identity
    y = jnp.where(i * s + v <= h - 1, y, -jnp.inf)
    cur = None
    for t in range(k):
        g = _pool_cols(y, s, t, ow)
        cur = g if cur is None else jnp.maximum(cur, g)
    cur = cur.reshape(ow * c, lb)

    @pl.when(v == 0)
    def _init():
        m_ref[:] = cur.astype(m_ref.dtype)

    @pl.when(v > 0)
    def _acc():
        m_ref[:] = jnp.maximum(m_ref[:].astype(jnp.float32), cur).astype(
            m_ref.dtype
        )


def _pallas_fused_fwd(z, *, n, blocked, alpha, beta, relu, k, s, interpret,
                      bias=None):
    from convnet_tpu.graph import conv_out_size

    b, h, w, c = z.shape
    oh = conv_out_size(h, k, s, 0)
    ow = conv_out_size(w, k, s, 0)
    zt = jnp.transpose(z, (1, 2, 3, 0)).reshape(h * w * c, b)
    lb = 128 if (b % 128 == 0 and not interpret) else b
    kb = _pick_kb(w, c)
    bmat = jnp.asarray(_stage2_band(c, n, blocked, kb))
    kernel = functools.partial(
        _fused_fwd_kernel,
        h=h, w=w, c=c, lb=lb, ow=ow, k=k, s=s, kb=kb,
        alpha=alpha, beta=beta, relu=relu, has_bias=bias is not None,
    )
    in_specs = [
        pl.BlockSpec(
            (w * c, lb),
            lambda jb, i, v: (jnp.clip(i * s + v, 0, h - 1), jb),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (kb * c, kb * c), lambda jb, i, v: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [zt, bmat]
    if bias is not None:
        operands.append(jnp.tile(bias.astype(jnp.float32), kb)[:, None])
        in_specs.append(
            pl.BlockSpec(
                (kb * c, 1), lambda jb, i, v: (0, 0), memory_space=pltpu.VMEM
            )
        )
    m2 = pl.pallas_call(
        kernel,
        grid=(b // lb, oh, k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (ow * c, lb), lambda jb, i, v: (i, jb), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((oh * ow * c, b), z.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * h * w * c * (kb * c) * b // s,
            bytes_accessed=_nbytes(zt) * 2,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(*operands)
    return jnp.transpose(m2.reshape(oh, ow, c, b), (3, 0, 1, 2))


# ---------------------------------------------------------------------------
# Backend selection + public op
# ---------------------------------------------------------------------------


def _fused_backend(backend: str, shape, pool_padding: int) -> str:
    """"pallas" | "xla". CONVNET_POOL_LRN_BACKEND overrides for A/B."""
    mode = os.environ.get("CONVNET_POOL_LRN_BACKEND", backend)
    if mode == "xla":
        return "xla"
    on_host = jax.default_backend() in ("cpu", "gpu")
    if mode == "pallas":
        return "pallas"  # tests force this on CPU -> interpret mode
    # auto: compiled Pallas only on TPU, only for the r2d layout regime
    # (batch-minor activations: C not lane-aligned, lane-aligned B), with
    # the low-side-unpadded ceil-mode pools these models use.
    if len(shape) != 4 or on_host or pool_padding != 0:
        return "xla"
    b, h, w, c = shape
    # lane-aligned C (e.g. AlexNet rnorm2's 256): the conv emitters pick
    # a C-minor layout for these, so riding the batch-minor r2d view
    # inserts real transposes UNLESS XLA adapts the producer layout to
    # the kernel's pinned operands (it does for rnorm1 — round-2
    # lesson). Whether that nets out is an on-chip A/B:
    # CONVNET_PLRN_CMINOR=1 opts these shapes in.
    if c % 128 == 0 and os.environ.get("CONVNET_PLRN_CMINOR") != "1":
        return "xla"
    if b % 128 != 0 or c > 512 or c % 8 != 0:
        return "xla"
    # the fwd kernel holds a full image row's LRN output in f32 VMEM
    # (plus the double-buffered bf16 row slabs); bail out of the fused
    # path entirely (fwd and bwd stay paired) when that won't fit
    if w * c * 128 * 4 > (6 << 20):
        return "xla"
    return "pallas"


def fusion_applicable(shape, pool_padding: int, backend: str = "auto") -> bool:
    """Whether the fused Pallas backward will actually engage for this
    activation shape. model.apply_fn defers an LRN->pool chain ONLY when
    it does: routing an ineligible chain (e.g. rnorm2's lane-aligned
    C=256) through lrn_maxpool would swap its tuned Pallas 2D-form LRN
    backward for the slower composed XLA fallback."""
    return _fused_backend(backend, tuple(shape), pool_padding) == "pallas"


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
def lrn_maxpool(
    x: jax.Array,
    add_scale: float,
    pow_scale: float,
    frac_of_filters: float,
    blocked: bool,
    pool_kernel: int,
    pool_stride: int,
    pool_padding: int = 0,
    fuse_relu: bool = False,
    backend: str = "auto",
) -> jax.Array:
    """maxpool(response_norm(x)) with a fused single-pass backward.

    Gradient semantics are the reference's comparison-form MaxPoolUndo
    (ties credit every winner) — NOT select-and-scatter. Forward values
    are identical either way. `fuse_relu` treats x as the producing
    layer's pre-activation, exactly as response_norm_cross_map does.

    On the Pallas path the LRN output y exists only inside VMEM tiles:
    the fused forward writes just the pooled maxima and the fused
    backward recomputes y from x per tile (the pool-undo comparison
    needs it bit-exact, so both kernels share _chunk_lrn_y). The
    reference pays HBM for y twice in each direction
    (ResponseNormCrossMap -> MaxPool, then MaxPoolUndo ->
    ResponseNormCrossMapUndo [U])."""
    if x.ndim == 4 and _fused_backend(backend, x.shape, pool_padding) == "pallas":
        c = x.shape[-1]
        n = norm_window_size(c, frac_of_filters)
        return _pallas_fused_fwd(
            x,
            n=n, blocked=blocked, alpha=add_scale / n, beta=float(pow_scale),
            relu=fuse_relu, k=pool_kernel, s=pool_stride,
            interpret=pallas_interpret(),
        )
    y = _lrn_fwd(
        x, add_scale, pow_scale, frac_of_filters, blocked, "auto", fuse_relu
    )
    return maxpool2d(y, pool_kernel, pool_stride, pool_padding)


def _lrn_maxpool_fwd(
    x, add_scale, pow_scale, frac, blocked, pk, ps, ppad, fuse_relu, backend
):
    if x.ndim == 4 and _fused_backend(backend, x.shape, ppad) == "pallas":
        c = x.shape[-1]
        n = norm_window_size(c, frac)
        m = _pallas_fused_fwd(
            x,
            n=n, blocked=blocked, alpha=add_scale / n, beta=float(pow_scale),
            relu=fuse_relu, k=pk, s=ps,
            interpret=pallas_interpret(),
        )
        return m, (x, None, m)  # y is VMEM-only; the bwd recomputes it
    y = _lrn_fwd(x, add_scale, pow_scale, frac, blocked, "auto", fuse_relu)
    m = maxpool2d(y, pk, ps, ppad)
    return m, (x, y, m)


def _lrn_maxpool_bwd(
    add_scale, pow_scale, frac, blocked, pk, ps, ppad, fuse_relu, backend, res, gm
):
    x, y, m = res
    c = x.shape[-1]
    n = norm_window_size(c, frac)
    alpha = add_scale / n
    beta = float(pow_scale)
    # branch on the RESIDUAL, not a re-evaluation of _fused_backend: the
    # env override can legitimately change between the fwd and bwd
    # executions (e.g. an eager jax.grad where the caller scopes the env
    # around the loss call only), and the bwd must pair with whichever
    # forward actually ran (y is VMEM-only on the Pallas path)
    if y is None:
        interp = pallas_interpret()
        dz = _pallas_fused_bwd(
            gm, m, x,
            n=n, blocked=blocked, alpha=alpha, beta=beta, relu=fuse_relu,
            k=pk, s=ps, interpret=interp,
        )
        return (dz.astype(x.dtype),)
    g_lrn = maxpool2d_undo_reference(y, m, gm, pk, ps, ppad)
    dz = _bwd_math(
        g_lrn.astype(jnp.float32), x.astype(jnp.float32),
        n, blocked, c, alpha, beta, relu=fuse_relu,
    )
    return (dz.astype(x.dtype),)


lrn_maxpool.defvjp(_lrn_maxpool_fwd, _lrn_maxpool_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))
def lrn_maxpool_bias(
    x: jax.Array,
    b: jax.Array,
    add_scale: float,
    pow_scale: float,
    frac_of_filters: float,
    blocked: bool,
    pool_kernel: int,
    pool_stride: int,
    pool_padding: int = 0,
    fuse_relu: bool = False,
    backend: str = "auto",
) -> jax.Array:
    """lrn_maxpool(x + b) with the producing conv's bias fused into both
    kernels and the bias GRADIENT emitted from the fused backward's
    in-VMEM tile sums (see ops/lrn.py response_norm_cross_map_bias — the
    same 1.3 ms of XLA dz re-reads, for the pool-fused path)."""
    return _lrn_maxpool_bias_fwd(
        x, b, add_scale, pow_scale, frac_of_filters, blocked,
        pool_kernel, pool_stride, pool_padding, fuse_relu, backend,
    )[0]


def _lrn_maxpool_bias_fwd(
    x, b, add_scale, pow_scale, frac, blocked, pk, ps, ppad, fuse_relu, backend
):
    if x.ndim == 4 and _fused_backend(backend, x.shape, ppad) == "pallas":
        c = x.shape[-1]
        n = norm_window_size(c, frac)
        m = _pallas_fused_fwd(
            x,
            n=n, blocked=blocked, alpha=add_scale / n, beta=float(pow_scale),
            relu=fuse_relu, k=pk, s=ps,
            interpret=pallas_interpret(),
            bias=b,
        )
        return m, (x, b, None, m)
    z = x + b.astype(x.dtype)
    y = _lrn_fwd(z, add_scale, pow_scale, frac, blocked, "auto", fuse_relu)
    m = maxpool2d(y, pk, ps, ppad)
    return m, (x, b, y, m)


def _lrn_maxpool_bias_bwd(
    add_scale, pow_scale, frac, blocked, pk, ps, ppad, fuse_relu, backend, res, gm
):
    x, b, y, m = res
    c = x.shape[-1]
    n = norm_window_size(c, frac)
    alpha = add_scale / n
    beta = float(pow_scale)
    # pair with the forward that ran — see _lrn_maxpool_bwd
    if y is None:
        dz, db = _pallas_fused_bwd(
            gm, m, x,
            n=n, blocked=blocked, alpha=alpha, beta=beta, relu=fuse_relu,
            k=pk, s=ps, interpret=pallas_interpret(),
            bias=b,
        )
        return dz.astype(x.dtype), db.astype(b.dtype)
    g_lrn = maxpool2d_undo_reference(y, m, gm, pk, ps, ppad)
    z = (x + b.astype(x.dtype)).astype(jnp.float32)
    dz = _bwd_math(
        g_lrn.astype(jnp.float32), z, n, blocked, c, alpha, beta, relu=fuse_relu
    )
    db = jnp.sum(dz, axis=tuple(range(dz.ndim - 1)))
    return dz.astype(x.dtype), db.astype(b.dtype)


lrn_maxpool_bias.defvjp(_lrn_maxpool_bias_fwd, _lrn_maxpool_bias_bwd)


def pool_lrn_fusion_wanted() -> bool:
    """Whether model.apply_fn should route eligible LRN->maxpool chains
    through lrn_maxpool. Off by default: the fused backward uses the
    reference's tie-credits-all-winners gradient, which diverges from
    the select-and-scatter default wherever post-ReLU zeros tie (see
    PARITY.md). CONVNET_POOL_LRN_FUSED=1 opts in (the bench A/B path)."""
    return os.environ.get("CONVNET_POOL_LRN_FUSED", "0") == "1"

"""Jitter -> space-to-depth relayout: one Pallas pass from the crop
einsum's batch-major output to the first conv's batch-minor input.

Reference counterpart: the GPU-side jitter feeding the first conv
(src/datahandler.cc [U]). The round-2/3 XLA chain runs the one-hot
crop/flip einsums and then FOUR separate full-tensor passes to get the
bytes into conv1's preferred physical layout (v5e trace, batch 1024:
relayout copy 1.10 ms + pad 0.97 + s2d reshape 1.00 + regroup copy
1.03 = 4.1 ms of pure data movement; the round-3 fully-fused Pallas
prologue lost instead on its dense per-image one-hot MXU matmuls).

This module splits the work where each engine is strongest:

 1. The crop/flip one-hots stay BATCHED XLA einsums (the MXU runs them
    at ~peak; per-image Pallas matmuls measured ~5x slower) — but they
    emit a PHASE-MAJOR padded layout: row index i = rp*Pp + p and
    column index j = cp*Pp + q map output position (p, q) of row/col
    phases (rp, cp), with Pp = P rounded up to 16 so phase planes are
    sublane-tile aligned. The ceil-mode zero pad is folded into the
    one-hots (positions past the crop match no source column), and the
    operand order is arranged so both dots produce their natural
    (batch, lhs_free, rhs_free) dimension order — no HLO transposes.
 2. The affine normalize (scale/mean/std) + pad mask are elementwise
    on the einsum output and fuse into its epilogue.
 3. A Pallas kernel performs ONLY the relayout: grid over (row-block,
    batch-chunk), in-VMEM (bn, 16, Pp)->(16, Pp, bn) transposes (as a
    single 2D transpose — the only form the backend compiler accepts,
    see _kform), writing a 3D (K, P*P, B) merged view whose row-major
    bytes are physical (K, P, P, B). Rank-4 output blocks crash the
    backend compiler (round-4 bisection), hence the merged view; the
    layout is K-major rather than the conv emitter's historical
    (P, K, P, B), so XLA either adapts the conv input layout to the
    kernel or pays one relayout — the chip A/B decides the knob. K
    order is (row-phase, col-phase, cin), matching
    `_s2d_regroup_weight`.

Total HBM traffic after the einsums: read (B, s*Pp, s*Pp, cin) bf16 +
write (P, K, P, B) bf16 ~= 0.72 GB at AlexNet batch 1024 ~= 1.8 ms at
the measured 400 GB/s Pallas floor, vs 4.1 ms for the XLA chain.
Opt-in via CONVNET_S2D_RELAYOUT=1 until the chip A/B decides.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convnet_tpu.data.jitter import _shift_s8, crop_dot_dtype
from convnet_tpu.graph import conv_out_size
from convnet_tpu.ops.conv import S2DInput


def relayout_geometry(crop: int, kernel: int, stride: int):
    """(p_out, p_pad): ceil-mode s2d grid extent and its 16-aligned pad."""
    p_out = conv_out_size(crop, kernel, stride, 0)
    khp = -(-kernel // stride) * stride
    tgt = (p_out - 1) * stride + khp
    p_grid = tgt // stride  # s2d positions incl. the ceil-mode pad
    p_pad = -(-p_grid // 16) * 16
    return p_grid, p_pad


@functools.lru_cache(maxsize=32)
def _phase_maps(crop: int, s: int, pp: int):
    """Static (target_position, valid) maps for the phase-major index."""
    idx = np.arange(s * pp)
    t = s * (idx % pp) + idx // pp
    valid = t < crop
    return t, valid


def jitter_crop_phased(
    x: jax.Array,
    oy: jax.Array,
    ox: jax.Array,
    flips: Optional[jax.Array],
    *,
    crop: int,
    stride: int,
    p_pad: int,
    scale: float = 1.0,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    cmajor: bool = False,
) -> jax.Array:
    """One-hot crop+flip+normalize into the phase-major padded layout.

    x: (B, H, W, C) uint8 raw batch. Returns bf16 (B, C, s*Pp, s*Pp)
    with row i = rp*Pp + p, col j = cp*Pp + q <-> cropped pixel
    (s*p + rp, s*q + cp); positions past the crop are exactly 0.
    Operand order keeps both dots in natural dimension order (no HLO
    transposes); the affine + mask fuse into the second dot's epilogue.

    cmajor=True returns (C, B, s*Pp, s*Pp) instead — same values with
    the channel axis LEADING, so the relayout kernel's per-channel
    operands are leading-dim slices (bitcasts). The (B, C, ...) order
    makes them dim-1 slices that XLA materializes as a full-tensor
    pass (slice_bitcast_fusion, 4.90 ms at B=4096 in the round-5
    trace).
    """
    b, h, w, c = x.shape
    s, pp = stride, p_pad
    t, valid = _phase_maps(crop, s, pp)
    tj = jnp.asarray(t)
    vj = jnp.asarray(valid)

    oh_rows = (
        (oy[:, None] + tj[None, :])[:, :, None]
        == jnp.arange(h)[None, None, :]
    ) & vj[None, :, None]
    tc = tj[None, :]
    if flips is not None:
        tc = jnp.where(flips[:, None], crop - 1 - tc, tc)
    oh_cols = (
        (ox[:, None] + tc)[:, :, None] == jnp.arange(w)[None, None, :]
    ) & vj[None, :, None]

    if crop_dot_dtype() == "s8":
        # int8 MXU dots (see data.jitter.crop_dot_dtype): the raw NHWC
        # batch is contracted directly — no (B,C,H,W) transpose pass —
        # pixels shifted to s8 and the one-hots ride as s8, both dots
        # s32-exact. The -128 shift is restored only where a one-hot
        # row AND column actually fired (the folded ceil-mode pad
        # positions have all-zero one-hots and must stay exactly 0).
        xs = _shift_s8(x)
        # (b,h,w,c) x (b,i,h) -> (b,w,c,i): natural (batch, lhs_free, rhs_free)
        y = jnp.einsum(
            "bhwc,bih->bwci", xs, oh_rows.astype(jnp.int8),
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8)  # single shifted pixels in [-128,127]: exact
        # (b,w,c,i) x (b,j,w) -> (b,c,i,j): natural order again
        z32 = jnp.einsum(
            "bwci,bjw->cbij" if cmajor else "bwci,bjw->bcij",
            y, oh_cols.astype(jnp.int8),
            preferred_element_type=jnp.int32,
        )
        v2 = (vj[:, None] & vj[None, :])[None, None, :, :]
        zf = z32.astype(jnp.float32) + 128.0 * v2.astype(jnp.float32)
    elif crop_dot_dtype() == "bf16d":
        # bf16 dots over the raw NHWC batch — the s8 branch's operand
        # order without the integer shift: kills the (B,C,H,W)
        # transpose+cast pass (fusion.5, ~3.8 ms at B=4096) the "bf16"
        # form pays. Values are bitwise identical to "bf16" (every
        # one-hot contraction has exactly one nonzero term).
        xb = x.astype(jnp.bfloat16)
        # (b,h,w,c) x (b,i,h) -> (b,w,c,i): natural (batch, lhs_free, rhs_free)
        y = jnp.einsum("bhwc,bih->bwci", xb, oh_rows.astype(jnp.bfloat16))
        # (b,w,c,i) x (b,j,w) -> (b,c,i,j): natural order again
        z = jnp.einsum(
            "bwci,bjw->cbij" if cmajor else "bwci,bjw->bcij",
            y, oh_cols.astype(jnp.bfloat16),
        )
        zf = z.astype(jnp.float32)
    else:
        xb = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.bfloat16)  # (B,C,H,W)
        # (b,c,h,w) x (b,i,h) -> (b,c,w,i): natural (batch, lhs_free, rhs_free)
        y = jnp.einsum("bchw,bih->bcwi", xb, oh_rows.astype(jnp.bfloat16))
        # (b,c,w,i) x (b,j,w) -> (b,c,i,j): natural order again
        z = jnp.einsum(
            "bcwi,bjw->cbij" if cmajor else "bcwi,bjw->bcij",
            y, oh_cols.astype(jnp.bfloat16),
        )
        zf = z.astype(jnp.float32)
    cshape = (-1, 1, 1, 1) if cmajor else (1, -1, 1, 1)
    if scale != 1.0:
        zf = zf * scale
    if mean is not None:
        zf = zf - jnp.asarray(mean, jnp.float32).reshape(cshape)
    if std is not None:
        zf = zf / jnp.asarray(std, jnp.float32).reshape(cshape)
    if mean is not None or std is not None:
        # keep the folded ceil-mode pad exactly zero through the affine
        zf = jnp.where((vj[:, None] & vj[None, :])[None, None, :, :], zf, 0.0)
    return zf.astype(jnp.bfloat16)


def _kform() -> str:
    """In-VMEM transpose strategy. Backend-compiler support was probed
    empirically (round 4, chipless AOT bisection — BASELINE.md):
      "2d"  — flatten to (bn, 16*Pp), one 2D transpose, reshape back:
              COMPILES (the default).
      "3d"  — jnp.transpose(x, (1, 2, 0)): the backend compiler crashes
              after ~110 s (tpu_compile_helper exit 1) — kept only so the
              compile gate can re-probe future toolchains.
      "mxu" — the 2D transpose as an identity dot_general (MXU is idle
              in this kernel; a fallback if "2d" ever regresses)."""
    v = os.environ.get("CONVNET_S2D_RELAYOUT_KFORM", "2d")
    if v not in ("3d", "2d", "mxu"):
        raise ValueError(f"CONVNET_S2D_RELAYOUT_KFORM={v} not in 3d|2d|mxu")
    return v


def _relayout_kernel(*refs, cin, s, pp, p_out, kform):
    # One call handles one 16-row block of ONE row phase but ALL column
    # phases: Mosaic requires the in-block's last dim to be 128-aligned
    # or the full array dim, and Pp (64 at AlexNet geometry) is neither —
    # so the block spans the whole phase-major width s*Pp and the cp
    # split happens on static slices in VMEM. The output ref is the 3D
    # (K, P*P, B) merged view (rank-4 output blocks crash the backend
    # compiler — round-4 bisection); this grid step's K slice is the
    # s*cin (col-phase, cin) pairs of ONE row phase.
    in_refs, out_ref = refs[:cin], refs[cin]
    bn = in_refs[0].shape[0]
    w = s * pp
    for ci in range(cin):
        # transpose the WHOLE s*Pp-lane block at once: a lane-dim slice
        # taken BEFORE the transpose crashes the backend compiler
        # (round-4 bisection), while the full-width 2D transpose
        # compiles; the per-col-phase split below is then a sublane
        # slice at an 8-aligned offset, which lowers fine
        x = in_refs[ci][:]  # (bn, 16, s*Pp)
        if kform == "3d":
            t = jnp.transpose(x, (1, 2, 0))  # (16, s*Pp, bn)
        elif kform == "2d":
            t = x.reshape(bn, 16 * w).T.reshape(16, w, bn)
        else:  # "mxu"
            x2 = x.reshape(bn, 16 * w)
            eye = (
                jax.lax.broadcasted_iota(jnp.int32, (bn, bn), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (bn, bn), 1)
            ).astype(x2.dtype)
            t2 = jax.lax.dot_general(
                x2, eye, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)  # exact: one nonzero per contraction
            t = t2.reshape(16, w, bn)
        for cp in range(s):
            # (16 rows p, Pp cols q, bn) -> merged (p*p_out + q, bn);
            # cols q >= p_out are cut by the slice, rows p >= p_out land
            # past the array end of the final ragged block and are
            # masked by Mosaic (raggedness is legal on the last two dims)
            seg = t[:, cp * pp : cp * pp + p_out, :]
            out_ref[cp * cin + ci] = seg.reshape(16 * p_out, bn)


def _pick_bn(b: int) -> int:
    override = os.environ.get("CONVNET_S2D_RELAYOUT_BN")
    if override:
        bn = int(override)
        if bn < 128 or bn % 128 or b % bn:
            raise ValueError(
                f"CONVNET_S2D_RELAYOUT_BN={bn} must be a multiple of 128 "
                f"dividing B={b}"
            )
        return bn
    if b % 128:
        raise ValueError(
            f"s2d_relayout needs B % 128 == 0 (batch rides the lane axis), got {b}"
        )
    # VMEM budget: blocks are double-buffered, and a grid step holds
    # cin*(bn,16,s*Pp) in + (16,s*cin,P,bn) out — at AlexNet geometry
    # bn=128 is ~5.8 MB live / ~11.6 MB pipelined against the ~16 MB
    # core VMEM; bn=256 would blow it.
    return 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def s2d_relayout(z, stride, p_out, p_pad, interpret=False, cmajor=False):
    """(B, C, s*Pp, s*Pp) phase-major bf16 -> (B, P, P, s*s*C) s2d view
    whose PHYSICAL layout is row-major (K, P, P, B) — the kernel's 3D
    merged output viewed logically as NHWC. K order (row-phase,
    col-phase, cin) matches `ops.conv._s2d_regroup_weight`.

    cmajor=True: z arrives channel-major (C, B, s*Pp, s*Pp) — the
    per-channel kernel operands become LEADING-dim slices (true
    bitcasts); the (B, C, ...) order costs a full-tensor
    slice_bitcast pass (round-5 trace, 4.90 ms at B=4096)."""
    return _relayout_fwd_impl(z, stride, p_out, p_pad, interpret, cmajor)


def block_plan(b: int, cin: int, s: int, pp: int, p_out: int):
    """(in_block, out_block, grid) for the relayout pallas_call.

    Factored out so tests can statically check Mosaic legality (last two
    block dims divisible by (8, 128) or equal to the array dims) and the
    double-buffered VMEM budget without compiling for TPU — interpret
    mode does not enforce either (a real lowering failure at AlexNet
    geometry got through CPU validation in round 3). The out block is a
    slice of the 3D (K, P*P, B) merged view: rank-4 output blocks crash
    the backend compiler outright (round-4 chipless bisection), and
    16*p_out is always 8-divisible, so every dim is legal by
    construction; the final p-row block overhangs P*P and relies on
    Mosaic's last-two-dim raggedness masking.
    """
    bn = _pick_bn(b)
    bpr = pp // 16
    in_block = (bn, 16, s * pp)
    out_block = (s * cin, 16 * p_out, bn)
    grid = (s * bpr, b // bn)
    return in_block, out_block, grid


def _relayout_fwd_impl(z, stride, p_out, p_pad, interpret, cmajor=False):
    if cmajor:
        cin, b, n, _ = z.shape
        xcs = [z[ci] for ci in range(cin)]  # leading-dim slices: bitcasts
    else:
        b, cin, n, _ = z.shape
        # dim-1 slices: XLA materializes these as a full-tensor pass
        xcs = [z[:, ci] for ci in range(cin)]
    s, pp = stride, p_pad
    assert n == s * pp, (z.shape, stride, p_pad)
    bn = _pick_bn(b)
    bpr = pp // 16  # 16-row blocks per phase plane (pp % 16 == 0)
    kernel = functools.partial(
        _relayout_kernel, cin=cin, s=s, pp=pp, p_out=p_out, kform=_kform()
    )
    # in-block last two dims (16, s*pp): 16 % 8 == 0 and s*pp IS the
    # array's last dim — the only Mosaic-legal choice here since
    # pp % 128 != 0 at AlexNet geometry (pp=64).
    in_block, out_block, grid = block_plan(b, cin, s, pp, p_out)
    in_spec = pl.BlockSpec(
        in_block, lambda h, j: (j, h, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * cin,
        out_specs=pl.BlockSpec(
            # 3D merged (K, P*P, B) view: dim0 = the K slice of this row
            # phase (s col-phases x cin), dim1 = this 16-row p-block's
            # merged (p, q) rows, dim2 = the batch chunk
            out_block,
            lambda h, j: (h // bpr, h % bpr, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (s * s * cin, p_out * p_out, b), z.dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * z.size * z.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(*xcs)
    # logical NHWC view: the reshape is a bitcast of the row-major 3D
    # bytes; the transpose pins physical (K, P, P, B) — K-major rather
    # than the conv emitter's historical (P, K, P, B) pick, so XLA
    # either adapts the conv's input layout to the kernel (as it does
    # for the LRN forms) or inserts one relayout copy; the chip A/B
    # (tools/r4_chip7.py) measures which happens
    out4 = out.reshape(s * s * cin, p_out, p_out, b)
    return jnp.transpose(out4, (3, 1, 2, 0))


def _relayout_fwd(z, stride, p_out, p_pad, interpret, cmajor=False):
    return _relayout_fwd_impl(z, stride, p_out, p_pad, interpret, cmajor), None


def _relayout_bwd(stride, p_out, p_pad, interpret, cmajor, _, g):
    # inverse arrangement in plain XLA ops — dead-code-eliminated when
    # the s2d conv is the first edge (its input is data, cf. _s2d_core)
    b = g.shape[0]
    s, pp = stride, p_pad
    cin = g.shape[3] // (s * s)
    d = g.reshape(b, p_out, p_out, s, s, cin)
    d = jnp.transpose(d, (0, 5, 3, 1, 4, 2))  # (B, C, rp, p, cp, q)
    d = jnp.pad(
        d, ((0, 0), (0, 0), (0, 0), (0, pp - p_out), (0, 0), (0, pp - p_out))
    )
    d = d.reshape(b, cin, s * pp, s * pp).astype(g.dtype)
    if cmajor:
        d = jnp.transpose(d, (1, 0, 2, 3))
    return (d,)


s2d_relayout.defvjp(_relayout_fwd, _relayout_bwd)


def relayout_wanted() -> bool:
    """The jitter->conv1 input path uses the fused phase-major einsum +
    Pallas relayout. Default "auto" = ON for TPU backends since the
    round-4 chip A/B: bit-exact vs the XLA chain on chip and 119.33 ->
    119.31 ms/step on AlexNet @2048 (neutral-to-slightly-better; part
    of the measured 17,370 img/s winner config); OFF on cpu/gpu, where
    the kernel would run in interpret mode as pure overhead (the
    dedicated tests opt in with CONVNET_S2D_RELAYOUT=1).
    CONVNET_S2D_RELAYOUT=0|1 forces."""
    mode = os.environ.get("CONVNET_S2D_RELAYOUT", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return jax.default_backend() not in ("cpu", "gpu")


def cmajor_wanted() -> bool:
    """Feed the relayout kernel channel-major einsum output (true
    leading-dim bitcast operands) instead of (B, C, ...) whose channel
    split costs a full-tensor pass. CONVNET_S2D_CMAJOR=0|1 forces;
    auto is ON — the chip A/B (tools/r5_chip3.py, B=4096) measured
    -0.59 ms/step for cmajor (235.22 vs 235.82), numerics array-equal;
    the segment alone is neutral (the einsum epilogue shifts), the win
    is the downstream bitcast split."""
    mode = os.environ.get("CONVNET_S2D_CMAJOR", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return True


def jitter_s2d(
    x: jax.Array,
    oy: jax.Array,
    ox: jax.Array,
    flips: Optional[jax.Array],
    *,
    crop: int,
    kernel: int,
    stride: int,
    scale: float = 1.0,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    interpret: bool = False,
) -> S2DInput:
    """Full fused path: raw uint8 batch -> S2DInput for the first conv.

    Equivalent (bit-exact at bf16) to jitter_batch + conv2d's internal
    pad/space-to-depth, with the data movement collapsed to one Pallas
    pass. Requires B % 128 == 0 (the relayout batch chunk rides the
    lane axis); callers gate on that.
    """
    p_grid, p_pad = relayout_geometry(crop, kernel, stride)
    from convnet_tpu.ops.jitter_gather import (
        gather_crop_phased,
        gather_supported,
        gather_wanted,
    )

    if gather_wanted() and gather_supported(
        x.shape[1], x.shape[2], x.shape[3], crop, stride, p_pad, mean, std,
    ):
        # round-5 gather kernel — measured NEGATIVE on chip (segment
        # 38.1 vs 24.2 ms at B=4096, tools/r5_chip2.py: the per-image
        # formulation is VMEM-pass-bound); kept as the documented knob.
        # Stays at the pre-cmajor relayout layout its A/B ran with (the
        # kernel emits (B,C,n,n)); re-plumbing it channel-major would
        # invalidate the measurement without changing the verdict's
        # cause (VMEM passes, not the relayout operand slices)
        z = gather_crop_phased(
            x, oy, ox, flips,
            crop=crop, stride=stride, p_pad=p_pad,
            scale=scale, mean=mean, std=std, interpret=interpret,
        )
        xs = s2d_relayout(z, stride, p_grid, p_pad, interpret)
        return S2DInput(xs, stride)
    cm = cmajor_wanted()
    z = jitter_crop_phased(
        x, oy, ox, flips,
        crop=crop, stride=stride, p_pad=p_pad,
        scale=scale, mean=mean, std=std, cmajor=cm,
    )
    xs = s2d_relayout(z, stride, p_grid, p_pad, interpret, cm)
    return S2DInput(xs, stride)


def jitter_s2d_sharded(
    mesh,
    x: jax.Array,
    oy: jax.Array,
    ox: jax.Array,
    flips: Optional[jax.Array],
    **kwargs,
) -> S2DInput:
    """jitter_s2d shard_mapped over the mesh's "data" axis.

    The whole pipeline is per-image (crop one-hots, affine, relayout),
    so each shard runs it on its local batch rows — sharded training
    keeps the same fused prologue the single-chip headline path uses.
    Requires per-shard batch % 128 == 0 (the relayout's lane-axis
    chunk); trainer._preprocess gates on that."""
    from jax.sharding import PartitionSpec as P

    from convnet_tpu.ops.pallas_util import shmap

    stride = kwargs["stride"]
    args = [x, oy, ox] + ([] if flips is None else [flips])

    def body(*local):
        fl = local[3] if len(local) > 3 else None
        return jitter_s2d(local[0], local[1], local[2], fl, **kwargs).x

    xs = shmap(body, mesh, (P("data"),) * len(args), P("data"))(*args)
    return S2DInput(xs, stride)

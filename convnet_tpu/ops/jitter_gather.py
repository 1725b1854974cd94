"""Per-image Pallas GATHER for the jitter -> conv1 input chain.

Reference counterpart: the GPU-side crop/flip jitter feeding the first
conv (src/datahandler.cc [U]).

Round-4 closed the einsum direction: the one-hot crop dots are bound by
XLA's convolution-base-dilated lowering RATE, not traffic — bf16/bf16d/
s8 all measure ~21.5 ms standalone at B=4096 (BASELINE.md), against a
~4.5 ms DMA floor. This kernel replaces the einsum stage of
`jitter_s2d` (fusion.5 3.77 + slice_bitcast 4.90 + fusion.1 4.89 =
13.56 ms in the round-5 trace) with a gather that never does dense
dots: one grid step per image DMAs the raw uint8 rows and produces the
SAME phase-major padded layout `jitter_crop_phased` emits, so the
existing hardware-validated `s2d_relayout` kernel consumes it
unchanged.

The kernel form is dictated by four toolchains probes (tools/
r5_probe_gather*.py, chipless AOT):
- No dynamic unaligned slices, no `rev` lowering, no element-offset
  DMA, rank-4 blocks crash the backend.
- What DOES lower: pl.when-predicated STATIC unaligned slices (the
  oy/ox crops become 33-way switches — only the taken branch
  executes), leading-dim + minor-dim transposes, full 2D transposes,
  u8 -> i32 -> f32 converts, canonical 2D MXU dots, and partial-lane
  stores at 8-aligned offsets.
- The horizontal flip therefore runs as s*cin small one-hot
  contractions (J_P @ plane — a (P, P) reversal matrix against each
  (P, N) column-phase plane) with the column-phase swap expressed in
  the STORE offsets, all under pl.when(flip) so unflipped images pay
  nothing.

Shuffles move u8-exact values as bf16 (0..255 are exact in bf16); the
affine normalize runs once in f32 on the final pass with the SAME op
order as the einsum path (x*scale - mean, / std, pad re-zeroed after).
Equality contract (tests/test_jitter_gather.py): the GATHER itself is
ARRAY-EQUAL to the einsum path (scale-only and identity affines are
bit-exact); with a mean subtraction the in-kernel mul+sub compiles to
an FMA the einsum graph doesn't use, so outputs may differ by <= 1
bf16 ulp at cancellation points (x*scale ~= mean) — same values,
one rounding.

Opt-in via CONVNET_JITTER_GATHER until its chip A/B lands.
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


def gather_supported(
    h: int, w: int, cin: int, crop: int, stride: int, p_pad: int,
    mean, std,
) -> bool:
    """Static geometry gate for the kernel form (AlexNet: 256/224/4/64
    passes; anything else falls back to the einsum path). Batch is NOT
    gated here: the downstream s2d_relayout requires B % 128 == 0 and
    raises loudly itself (trainer._preprocess pre-gates per-shard B)."""
    p = crop // stride
    return (
        crop % stride == 0
        and p % 8 == 0
        and p_pad % 8 == 0
        and p <= p_pad
        and 1 <= h - crop + 1 <= 64  # oy/ox switch width
        and 1 <= w - crop + 1 <= 64
        and cin in (1, 3, 4)
        and (np.ndim(mean) <= 1 and np.ndim(std) <= 1)
    )


def gather_wanted() -> bool:
    """CONVNET_JITTER_GATHER=0|1 forces; auto is OFF pending the chip
    A/B (tools/r5_chip2.py) — flip the default here once measured."""
    mode = os.environ.get("CONVNET_JITTER_GATHER", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return False


def _rev_matrix(p: int):
    """(P, P) reversal one-hot built from iotas in-kernel (Pallas
    kernels cannot capture array constants; `rev` has no lowering)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    return (j == (p - 1) - i).astype(jnp.float32)


def _gather_kernel(
    oy_ref, ox_ref, fl_ref, x_ref, aff_ref, o_ref,
    crop_scr, c2_scr, rp_scr, f_scr,
    *, h, wc, crop, s, pp, cin, p, n, cw, n_oy, n_ox, scale, has_mean,
    has_std, has_flip,
):
    b = pl.program_id(0)
    # u8 -> bf16 (0..255 exact); shuffles run at 2 bytes/elem
    v = x_ref[0].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    # oy crop: predicated static sublane slices (only the taken branch
    # executes — a where-chain would cost n_oy full-tile passes)
    for k in range(n_oy):
        @pl.when(oy_ref[b] == k)
        def _(k=k):
            crop_scr[...] = v[k : k + crop, :]
    u = crop_scr[...]
    # ox crop: predicated static lane slices
    for k in range(n_ox):
        @pl.when(ox_ref[b] == k)
        def _(k=k):
            c2_scr[...] = u[:, cin * k : cin * k + cw]
    w = c2_scr[...]
    # row-phase deinterleave + pad P -> Pp: crop row s*p + rp lands at
    # phase-major row rp*Pp + p; pad rows stay zero
    rp_scr[...] = jnp.zeros_like(rp_scr)
    r = jnp.transpose(w.reshape(p, s, cw), (1, 0, 2))  # (s, P, CW)
    for rp in range(s):
        rp_scr[pp * rp : pp * rp + p, :] = r[rp]
    # columns to sublanes
    t = rp_scr[...].reshape(n, cw).T  # (CW, N): sublane = col*cin + c
    # col-phase deinterleave: (P, s*cin, N) -> (s*cin, P, N) [cpc, q, i]
    z = jnp.transpose(t.reshape(p, s * cin, n), (1, 0, 2))
    zr = z.reshape(cw, n)  # rows cpc*P + q

    if has_flip:
        @pl.when(fl_ref[b] == 0)
        def _():
            f_scr[...] = zr

        @pl.when(fl_ref[b] != 0)
        def _():
            # flipped (cp, q) sources unflipped (s-1-cp, P-1-q): the
            # q-reversal is a small one-hot MXU dot per column-phase
            # plane, the cp swap is the store offset
            jq = _rev_matrix(p).astype(jnp.bfloat16)
            for cp in range(s):
                for c in range(cin):
                    src = z[cp * cin + c]  # (P, N)
                    flipped = jax.lax.dot_general(
                        jq, src, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                    dst = (s - 1 - cp) * cin + c
                    f_scr[p * dst : p * dst + p, :] = flipped
    else:
        f_scr[...] = zr

    # final transpose + affine (f32, einsum-identical op order) + the
    # phase-plane assembly with q-pad columns left zero
    w2 = f_scr[...].T.astype(jnp.float32)  # (N, CW) [i, cpc*P + q]
    if scale != 1.0:
        w2 = w2 * scale
    if has_mean:
        w2 = w2 - aff_ref[0:1, :]
    if has_std:
        w2 = w2 / aff_ref[1:2, :]
    if has_mean or has_std:
        # pad rows (p' >= P within each row phase) must be EXACTLY 0
        # through the affine, matching the einsum path's mask
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, cw), 0)
        w2 = jnp.where(rows % pp < p, w2, 0.0)
    w2 = w2.astype(jnp.bfloat16)
    o_ref[...] = jnp.zeros_like(o_ref)
    for c in range(cin):
        for cp in range(s):
            o_ref[c, :, pp * cp : pp * cp + p] = w2[
                :, p * (cp * cin + c) : p * (cp * cin + c) + p
            ]


def gather_crop_phased(
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
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for `jitter_crop_phased` (bit-exact): (B, H,
    W, C) uint8 -> (B, C, s*Pp, s*Pp) bf16 phase-major padded layout,
    row i = rp*Pp + p, col j = cp*Pp + q <-> cropped pixel
    (s*p + rp, s*q + cp); positions past the crop are exactly 0."""
    b, h, w, cin = x.shape
    s, pp = stride, p_pad
    p = crop // s
    n, cw, wc = s * pp, crop * cin, w * cin
    assert gather_supported(h, w, cin, crop, s, pp, mean, std), (
        x.shape, crop, s, pp)

    # per-lane affine rows arranged for the final (N, CW) layout:
    # lane l = (cp*cin + c)*P + q -> channel c = (l // P) % cin
    chan = (np.arange(cw) // p) % cin

    def _chan_row(v, fill):
        # scalar or per-channel, like the einsum path's broadcast
        if v is None:
            return np.full(cw, fill, np.float32)
        v = np.broadcast_to(np.asarray(v, np.float32).reshape(-1), (cin,))
        return np.ascontiguousarray(v[chan], np.float32)

    mrow = _chan_row(mean, 0.0)
    srow = _chan_row(std, 1.0)
    aff = np.zeros((8, cw), np.float32)
    aff[0] = mrow
    aff[1] = srow

    fl = flips
    has_flip = fl is not None
    if not has_flip:
        fl = jnp.zeros((b,), jnp.int32)

    kernel = functools.partial(
        _gather_kernel,
        h=h, wc=wc, crop=crop, s=s, pp=pp, cin=cin, p=p, n=n, cw=cw,
        n_oy=h - crop + 1, n_ox=w - crop + 1, scale=float(scale),
        has_mean=mean is not None, has_std=std is not None,
        has_flip=has_flip,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wc), lambda i, oy_, ox_, fl_: (i, 0, 0)),
            pl.BlockSpec((8, cw), lambda i, oy_, ox_, fl_: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (cin, n, n), lambda i, oy_, ox_, fl_: (i, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((crop, wc), jnp.bfloat16),
            pltpu.VMEM((crop, cw), jnp.bfloat16),
            pltpu.VMEM((n, cw), jnp.bfloat16),
            pltpu.VMEM((cw, n), jnp.bfloat16),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * cin, n, n), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cin * p * p * n,  # flip dots (upper bound)
            bytes_accessed=x.size + 2 * b * cin * n * n,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(
        oy.astype(jnp.int32), ox.astype(jnp.int32), fl.astype(jnp.int32),
        x.reshape(b, h, wc), jnp.asarray(aff),
    )
    return out.reshape(b, cin, n, n)

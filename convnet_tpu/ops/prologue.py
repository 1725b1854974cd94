"""Fused augmentation prologue: crop + flip + normalize + zero-pad +
space-to-depth in ONE Pallas pass.

Reference counterpart: the GPU-side jitter in DataHandler
(src/datahandler.cc [U]) feeding the first conv. The round-2 rebuild ran
this as XLA ops (one-hot MXU crop/flip -> pad -> s2d reshape/transpose),
which the v5e trace showed costs ~5.1 ms/step at AlexNet batch 1024 —
four full HBM round-trips of the 308 MB input tensor, because XLA
materializes a relayout copy between the jitter einsum, the pad, and the
s2d regroup. This kernel reads the raw uint8 batch once and writes the
final space-to-depth bf16 view once (~0.5 GB total ≈ 1.3 ms at the
Pallas DMA floor).

Mosaic constraints shaped the design (all hit on v5e, round 3):
  * no dynamic ref slicing at unaligned offsets (sublane starts must be
    multiples of 8, lane starts of 128) — so the per-image crop CANNOT
    be a dynamic_slice / pl.ds load;
  * no uint8->bf16 cast (widen through i32/f32 in registers).
Both per-image dynamic crops are therefore expressed as MXU matmuls
against one-hot matrices BUILT IN-KERNEL from broadcasted_iota
compares (a few hundred K VPU compares, negligible):

  1. widen the whole (H, W*cin) uint8 image to bf16 in registers
  2. column matmul: one-hot (W*cin, P*s*cin) that simultaneously applies
     the horizontal ox-shift, the flip (selected by the per-image flip
     bit), the high-side ceil-mode zero pad, and the space-to-depth
     COLUMN regroup
  3. row matmul: one-hot (tgt, H) selecting rows oy..oy+crop-1 (zero
     rows above the crop = the row-side pad)
  4. in-VMEM row-phase fold (rows r = s*P + rh fold into channels)
  5. y * a + b (affine normalize; padded taps stay exactly 0)

Output channel order is (row-phase, col-phase, cin) — exactly
`ops/conv._s2d_regroup_weight`'s convention, so the strided first conv
runs as a stride-1 conv directly on this output (ops/conv.py S2DInput).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convnet_tpu.graph import conv_out_size
from convnet_tpu.ops.conv import (
    _MIN_CIN,
    _S2D_MAX_FOLDED_CIN,
    S2DInput,
)


def s2d_geometry(crop: int, kernel: int, stride: int):
    """(out, khp, tgt, P): ceil-mode conv output size, stride-padded
    kernel extent, padded input extent, space-to-depth extent."""
    out = conv_out_size(crop, kernel, stride, 0)
    khp = -(-kernel // stride) * stride
    tgt = (out - 1) * stride + khp
    return out, khp, tgt, tgt // stride


@functools.lru_cache(maxsize=16)
def _affine_consts(crop, cin, s, p_out, scale, mean_t, std_t):
    """(a, b) with plane[rh] = v*a + b[rh] over the kernel's
    (s, P, P*s*cin) output view; b is masked to 0 on zero-padded taps
    so they stay exactly 0."""
    q_cols = p_out * s * cin
    a = np.full(cin, scale, np.float32)
    bc = np.zeros(cin, np.float32)
    if mean_t is not None:
        bc = bc - np.asarray(mean_t, np.float32).reshape(-1) * np.ones(cin, np.float32)
    if std_t is not None:
        stdv = np.asarray(std_t, np.float32).reshape(-1) * np.ones(cin, np.float32)
        a, bc = a / stdv, bc / stdv
    q = np.arange(q_cols)
    rem = q % (s * cin)
    wt = s * (q // (s * cin)) + rem // cin
    c = rem % cin
    colv = wt < crop  # (q_cols,)
    rh = np.arange(s)[:, None, None]
    pq = np.arange(p_out)[None, :, None]
    rowv = (s * pq + rh) < crop  # (s, P, 1)
    a2 = np.tile(a, p_out * s)[None, :]  # (1, q_cols)
    b3 = bc[c][None, None, :] * (rowv & colv[None, None, :])
    return a2.astype(np.float32), b3.astype(np.float32)


def _prologue_kernel(
    x_ref, oy_ref, ox_ref, flip_ref, a_ref, bias_ref, out_ref,
    *, crop, cin, s, h, w, tgt, p_out,
):
    """One image: x_ref (1, H, W*cin) uint8; out (1, s, P, P*s*cin) bf16
    — the s2d view with the row phase on its own (static-indexed) plane;
    the caller folds it into channels with one XLA transpose. oy/ox/flip
    ride whole in SMEM, indexed by the grid step."""
    i = pl.program_id(0)
    q_cols = p_out * s * cin
    # uint8 -> bf16 via i32/f32 (no direct Mosaic cast); stays in regs
    xf = x_ref[0].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    # column one-hot: source lane l=(w,c) -> output col q=(Q,rw,c),
    # ox-shifted, flip-mirrored, zero where the tap falls past the crop
    qi = lax.broadcasted_iota(jnp.int32, (w * cin, q_cols), 1)
    rem = qi % (s * cin)
    wt = s * (qi // (s * cin)) + rem // cin  # 0..tgt-1, crop frame
    wsrc = jnp.where(flip_ref[i] > 0, crop - 1 - wt, wt) + ox_ref[i]
    li = lax.broadcasted_iota(jnp.int32, (w * cin, q_cols), 0)
    cm = (
        (li // cin == wsrc) & (li % cin == rem % cin) & (wt < crop)
    ).astype(jnp.bfloat16)
    mid = lax.dot_general(
        xf, cm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)  # (H, q_cols)

    # per-row-phase one-hot row selection: plane rh takes source rows
    # s*pq + rh + oy, zero where the tap falls past the crop (the
    # row-side ceil-mode pad). Writing each plane at a static index
    # sidesteps Mosaic's unsupported lane-splitting shape cast.
    hi = lax.broadcasted_iota(jnp.int32, (p_out, h), 1)
    pq = lax.broadcasted_iota(jnp.int32, (p_out, h), 0)
    for rh in range(s):
        rsel = ((hi == s * pq + rh + oy_ref[i]) & (s * pq + rh < crop)).astype(
            jnp.bfloat16
        )
        part = lax.dot_general(
            rsel, mid, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (p_out, q_cols)
        part = part * a_ref[:] + bias_ref[rh]
        out_ref[0, rh] = part.astype(out_ref.dtype)


def fused_crop_s2d(
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
    """x: (B, H, W, Cin) uint8 raw batch; oy/ox: (B,) crop origins;
    flips: (B,) bool or None. Returns the S2D view (B, P, P, s*s*Cin)
    bf16 of `crop(x)*scale - mean` zero-padded to the ceil-mode conv
    geometry of (kernel, stride, padding=0) at crop size `crop`."""
    b, h, w, cin = x.shape
    s = stride
    _, _, tgt, p_out = s2d_geometry(crop, kernel, stride)
    mean_t = tuple(np.asarray(mean, np.float32).reshape(-1)) if mean is not None else None
    std_t = tuple(np.asarray(std, np.float32).reshape(-1)) if std is not None else None
    a2, b2 = _affine_consts(crop, cin, s, p_out, float(scale), mean_t, std_t)

    if flips is None:
        flips = jnp.zeros((b,), jnp.int32)

    q_cols = p_out * s * cin
    kernel_fn = functools.partial(
        _prologue_kernel, crop=crop, cin=cin, s=s, h=h, w=w, tgt=tgt, p_out=p_out
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # whole (B,) array
    out4 = pl.pallas_call(
        kernel_fn,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w * cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            smem(), smem(), smem(),
            pl.BlockSpec((1, q_cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, p_out, q_cols), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, s, p_out, q_cols), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, p_out, q_cols), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h * w * cin + s * p_out * h) * q_cols,
            bytes_accessed=x.size + 2 * b * s * p_out * q_cols,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(
        x.reshape(b, h, w * cin),
        oy.astype(jnp.int32),
        ox.astype(jnp.int32),
        flips.astype(jnp.int32),
        jnp.asarray(a2),
        jnp.asarray(b2),
    )
    # fold the row phase into channels: (B, rh, P, Q, s*cin) ->
    # (B, P, Q, rh, s*cin) — one XLA transpose (~0.33 GB at bf16),
    # channel order (row-phase, col-phase, cin) = _s2d_regroup_weight's
    out5 = out4.reshape(b, s, p_out, p_out, s * cin).transpose(0, 2, 3, 1, 4)
    return S2DInput(out5.reshape(b, p_out, p_out, s * s * cin), stride)


def prologue_plan(graph, layer_name: str):
    """The conv edge eligible for the fused prologue feeding input layer
    `layer_name`, or None. Eligible: bf16 compute, a single consumer
    edge that is a CONV with stride > 1, padding 0, and a folded channel
    count in the space-to-depth window [_MIN_CIN, _S2D_MAX_FOLDED_CIN]
    (the same gate conv2d's s2d route uses)."""
    from convnet_tpu.graph import ET

    if graph.compute_dtype != "bfloat16":
        return None
    consumers = [e for e in graph.edges if e.source == layer_name]
    if len(consumers) != 1:
        return None
    e = consumers[0]
    cin = graph.shapes[layer_name][2]
    if (
        e.edge_type != ET.CONV
        or e.stride <= 1
        or e.padding != 0
        or not (_MIN_CIN <= cin * e.stride * e.stride <= _S2D_MAX_FOLDED_CIN)
    ):
        return None
    return e

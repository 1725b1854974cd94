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

Per image (one grid step per image):
  1. dynamic-slice the (crop, crop) window at (oy, ox)  [sublane/lane offset]
  2. one MXU matmul against a constant one-hot matrix that
     simultaneously applies the horizontal flip (selecting between two
     constants by the per-image flip bit), the high-side zero pad, and
     the space-to-depth COLUMN regroup
  3. row-phase regroup (rows r = s*P + rh fold into channels)  [in-VMEM]
  4. y * a + b (affine normalize; padded taps stay exactly 0)

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
def _col_matrix(crop: int, cin: int, s: int, q_cols: int, flip: bool) -> np.ndarray:
    """(crop*cin, q_cols) one-hot: source column (w, c) -> output column
    q = Q*(s*cin) + rw*cin + c with w = s*Q + rw (mirrored when `flip`),
    all-zero for out-of-crop targets (the high-side ceil-mode pad)."""
    src_w = np.arange(crop * cin) // cin
    src_c = np.arange(crop * cin) % cin
    col = np.arange(q_cols)
    q, rem = col // (s * cin), col % (s * cin)
    rw, c = rem // cin, rem % cin
    w_t = s * q + rw
    w_eff = np.where(flip, crop - 1 - w_t, w_t)
    valid = w_t < crop
    m = (
        (src_w[:, None] == w_eff[None, :])
        & (src_c[:, None] == c[None, :])
        & valid[None, :]
    )
    return m.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _affine_consts(crop, cin, s, p_out, scale, mean_t, std_t):
    """(a, b) with y = v*a + b over the (P, P*s*s*cin) 2D output view;
    b is masked to 0 on zero-padded taps so they stay exactly 0."""
    a = np.full(cin, scale, np.float32)
    b = np.zeros(cin, np.float32)
    if mean_t is not None:
        b = b - np.asarray(mean_t, np.float32).reshape(-1) * np.ones(cin, np.float32)
    if std_t is not None:
        stdv = np.asarray(std_t, np.float32).reshape(-1) * np.ones(cin, np.float32)
        a, b = a / stdv, b / stdv
    ch = np.arange(s * s * cin)
    rh, rw = ch // (s * cin), (ch % (s * cin)) // cin
    pq = np.arange(p_out)
    h_t = s * pq[:, None, None] + rh[None, None, :]  # (P, 1, ssc)
    w_t = s * pq[None, :, None] + rw[None, None, :]  # (1, P, ssc)
    valid = (h_t < crop) & (w_t < crop)  # (P, P, ssc)
    a2 = np.tile(np.tile(a, s * s), p_out)[None, :]  # (1, P*ssc)
    b2 = (np.tile(b, s * s)[None, None, :] * valid).reshape(p_out, -1)
    return a2.astype(np.float32), b2.astype(np.float32)


def _prologue_kernel(
    x_ref, oy_ref, ox_ref, flip_ref, b0_ref, b1_ref, a_ref, bias_ref, out_ref,
    *, crop, cin, s, tgt, p_out,
):
    """One image: x_ref (1, H, W*cin) uint8; out (1, P, P*s*s*cin) bf16."""
    x = x_ref[0].astype(jnp.bfloat16)
    xc = jax.lax.dynamic_slice(
        x, (oy_ref[0], ox_ref[0] * cin), (crop, crop * cin)
    )
    # flip + col-phase regroup + zero col-pad in one MXU pass
    bmat = jnp.where(flip_ref[0] > 0, b1_ref[:], b0_ref[:])
    mid = jax.lax.dot_general(
        xc, bmat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (crop, P*s*cin)
    # zero row-pad to tgt rows, then fold the row phase into channels
    mid = jnp.pad(mid, ((0, tgt - crop), (0, 0)))
    y = (
        mid.reshape(p_out, s, p_out, s * cin)
        .transpose(0, 2, 1, 3)
        .reshape(p_out, p_out * s * s * cin)
    )
    y = y * a_ref[:] + bias_ref[:]
    out_ref[0] = y.astype(out_ref.dtype)


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
    q_cols = p_out * s * cin
    mean_t = tuple(np.asarray(mean, np.float32).reshape(-1)) if mean is not None else None
    std_t = tuple(np.asarray(std, np.float32).reshape(-1)) if std is not None else None
    a2, b2 = _affine_consts(crop, cin, s, p_out, float(scale), mean_t, std_t)

    if flips is None:
        flips = jnp.zeros((b,), jnp.int32)
    b0 = jnp.asarray(_col_matrix(crop, cin, s, q_cols, False), jnp.bfloat16)
    b1 = jnp.asarray(_col_matrix(crop, cin, s, q_cols, True), jnp.bfloat16)

    kernel_fn = functools.partial(
        _prologue_kernel, crop=crop, cin=cin, s=s, tgt=tgt, p_out=p_out
    )
    smem = lambda: pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM)
    const = lambda r, c: pl.BlockSpec(
        (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out2 = pl.pallas_call(
        kernel_fn,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w * cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            smem(), smem(), smem(),
            const(crop * cin, q_cols),
            const(crop * cin, q_cols),
            const(1, p_out * s * s * cin),
            const(p_out, p_out * s * s * cin),
        ],
        out_specs=pl.BlockSpec(
            (1, p_out, p_out * s * s * cin), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, p_out, p_out * s * s * cin), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * crop * crop * cin * q_cols,
            bytes_accessed=x.size + 2 * b * p_out * p_out * s * s * cin,
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
        b0,
        b1,
        jnp.asarray(a2),
        jnp.asarray(b2),
    )
    return S2DInput(out2.reshape(b, p_out, p_out, s * s * cin), stride)


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

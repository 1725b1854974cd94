"""Convolution edges on the MXU.

Reference counterparts: ConvEdge over cuda-convnet convUp/convDown/
convOutp (src/conv_edge.*, cudamat/cudamat_conv*.cu [U]) and
ConvOneToOneEdge (src/conv_onetoone_edge.* [U]). The rebuild uses one
primitive — `lax.conv_general_dilated` — whose transpose/autodiff
provides the data- and weight-gradient kernels, and lets XLA tile the
contraction onto the 128x128 systolic array.

Layout: NHWC activations, HWIO weights (TPU-preferred).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from convnet_tpu.graph import conv_out_size


@jax.tree_util.register_pytree_node_class
@dataclass
class S2DInput:
    """A batch already in space-to-depth form (B, H/s, W/s, s*s*Cin),
    channel order (row-phase, col-phase, cin) — produced by the fused
    crop+flip+normalize+s2d prologue (ops/prologue.py) so the strided
    first conv consumes it without any relayout between the augmentation
    and the conv."""

    x: jax.Array
    stride: int

    def tree_flatten(self):
        return (self.x,), (self.stride,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


def matmul_precision(compute_dtype):
    """float32 mode is the numerics-parity path (<=1e-4 vs reference, BASELINE
    north_star) and must not silently drop to bf16 passes; explicit bfloat16
    mode takes the fast MXU default."""
    return lax.Precision.HIGHEST if compute_dtype is None else lax.Precision.DEFAULT


def ceil_mode_padding(
    in_size: int, kernel: int, stride: int, padding: int
) -> Tuple[int, int]:
    """Asymmetric (lo, hi) padding implementing the cuda-convnet ceil
    convention: the final window may extend past the padded input and is
    completed with extra implicit high-side padding."""
    out = conv_out_size(in_size, kernel, stride, padding)
    hi = (out - 1) * stride + kernel - in_size - padding
    return (padding, max(hi, 0))


# Use space-to-depth for strided convs whose folded input-channel count
# still fits one MXU contraction tile: Cin=3 stride=4 (AlexNet conv1)
# folds to 48. Above 128 the fold stops paying for its transpose.
_S2D_MAX_FOLDED_CIN = 128

# Below this input-channel count, plain convs run as im2col + one MXU
# matmul instead of the conv primitive: libtpu's weight-gradient conv
# for degenerate Cin compiles pathologically (measured on v5e: Cin=1
# 5x5 wgrad takes 54s at DEFAULT precision and >15min — effectively
# hangs — at HIGHEST, while Cin=16 takes 5.5s; zero-padding Cin up is
# undone by the algebraic simplifier, which regenerates the degenerate
# conv). im2col also feeds the MXU a kh*kw*Cin-deep contraction (25-75
# lanes) instead of Cin per tap, and its grads are matmul/slice
# transposes — no gradient conv exists to hang.
_MIN_CIN = 16


def _im2col_conv(x, w, stride, out_h, out_w, pad_h, pad_w, pref, prec):
    """y[b,p,q,:] = sum_{i,j,c} x[b, p*s+i, q*s+j, c] * w[i,j,c,:].

    Patch extraction is kh*kw static shifted slices concatenated on the
    channel axis — (i, j, c) order matching w.reshape(kh*kw*cin, cout).
    """
    kh, kw, cin, cout = w.shape
    s = stride
    x = jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)))
    cols = [
        x[:, i : i + (out_h - 1) * s + 1 : s, j : j + (out_w - 1) * s + 1 : s, :]
        for i in range(kh)
        for j in range(kw)
    ]
    patches = jnp.concatenate(cols, axis=-1)
    return jnp.einsum(
        "bhwk,kc->bhwc",
        patches,
        w.reshape(kh * kw * cin, cout),
        preferred_element_type=pref,
        precision=prec,
    )


def _s2d_regroup_weight(w, s):
    """Regroup (kh, kw, cin, cout) into the stride-1 kernel over the
    space-to-depth view: (kh/s, kw/s, s*s*cin, cout), channel order
    (row-phase, col-phase, cin)."""
    kh, kw, cin, cout = w.shape
    khp, kwp = -(-kh // s) * s, -(-kw // s) * s
    w = jnp.pad(w, ((0, khp - kh), (0, kwp - kw), (0, 0), (0, 0)))
    return (
        w.reshape(khp // s, s, kwp // s, s, cin, cout)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(khp // s, kwp // s, s * s * cin, cout)
    )


def _s2d_wgrad_mode() -> str:
    """"conv" (default) keeps XLA's transposed-conv weight-grad —
    the round-2 measured config (the trace shows conv1's wgrad as a
    1.9 ms fused reduce at 135 TFLOP/s); "explicit" computes it as
    k'xk' dot_generals over shifted input slices, which avoids the
    full-tensor transposes but re-reads the cotangent per tap.
    CONVNET_S2D_WGRAD overrides; the default follows the measured
    winner of the chip A/B (tools/r3_chip3.py) — until that A/B has
    run on hardware, the measured round-2 form stays the default."""
    return os.environ.get("CONVNET_S2D_WGRAD", "conv")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _s2d_core(xs, wr, pref, prec):
    """Stride-1 conv over a space-to-depth view, with a hand-written
    weight gradient.

    XLA derives a conv's weight grad as another conv with batch and
    feature dims exchanged; on TPU that emits full-tensor transposes of
    both the s2d activations and the cotangent before the contraction —
    the dominant entry in the round-2 trace's 6.6 ms reshape/transpose
    bin (BASELINE.md breakdown). Here the weight grad is written as the
    matmul it is: for each of the k'*k' kernel taps,

        dwr[a,b] = <xs[:, a:a+OH, b:b+OW, :], g>  contracting (B, OH, OW)

    one MXU dot_general per tap over a shifted window of xs — no layout
    exchange, no regroup materialization. The data gradient keeps the
    standard flipped-kernel conv form in separate ops, so when the s2d
    conv is the first edge (its input is data) XLA dead-code-eliminates
    it entirely.
    """
    return lax.conv_general_dilated(
        xs,
        wr,
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
        precision=prec,
    )


def _s2d_core_fwd(xs, wr, pref, prec):
    return _s2d_core(xs, wr, pref, prec), (xs, wr)


def _s2d_core_bwd(pref, prec, res, g):
    xs, wr = res
    kh, kw, ci, co = wr.shape
    b, oh, ow, _ = g.shape
    # data grad: full correlation with the spatially-flipped kernel,
    # standalone ops -> DCE'd when the caller never uses dxs
    dxs = lax.conv_general_dilated(
        g,
        jnp.flip(wr, (0, 1)).swapaxes(2, 3),
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
        precision=prec,
    ).astype(xs.dtype)
    if _s2d_wgrad_mode() == "conv":
        _, vjp = jax.vjp(
            lambda w_: lax.conv_general_dilated(
                xs, w_, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pref, precision=prec,
            ),
            wr,
        )
        return dxs, vjp(g)[0]
    taps = []
    for a in range(kh):
        for bb in range(kw):
            xsl = lax.slice(
                xs, (0, a, bb, 0), (b, a + oh, bb + ow, ci)
            )
            taps.append(
                lax.dot_general(
                    xsl,
                    g,
                    (((0, 1, 2), (0, 1, 2)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
            )
    dwr = jnp.stack(taps, axis=0).reshape(kh, kw, ci, co).astype(wr.dtype)
    return dxs, dwr


_s2d_core.defvjp(_s2d_core_fwd, _s2d_core_bwd)


def _space_to_depth_conv(x, w, stride, out_h, out_w, pad_h, pad_w, pref, prec):
    """Strided conv as a stride-1 conv over a space-to-depth view.

    A tiny Cin (3 for RGB input) uses 3/128 of the MXU's contraction
    lanes — worst in the weight-grad pass, whose contraction runs over
    the input channels. Folding the stride into channels,

        y = conv_s(x, w)  ==  conv_1(S2D_s(x'), w')

    with x' padded so each kernel tap lands in a distinct (row%s, col%s)
    phase, W' the matching regrouped kernel, lifts Cin to s*s*Cin. The
    identity: index kernel rows i = s*a + r; then x[s*p+i] = X[p+a] at
    phase r, where X = S2D(x). FLOPs grow by ceil(k/s)^2*s^2/k^2 (~19%
    for 11x11 s4) but MXU utilization grows ~s*s-fold.
    """
    s = stride
    kh, kw, cin, cout = w.shape
    khp, kwp = -(-kh // s) * s, -(-kw // s) * s
    # pad/crop each spatial dim to exactly (out-1)*s + k' (multiple of s)
    tgt_h = (out_h - 1) * s + khp
    tgt_w = (out_w - 1) * s + kwp
    hi_h = tgt_h - x.shape[1] - pad_h[0]
    hi_w = tgt_w - x.shape[2] - pad_w[0]
    x = jnp.pad(
        x,
        (
            (0, 0),
            (pad_h[0], max(hi_h, 0)),
            (pad_w[0], max(hi_w, 0)),
            (0, 0),
        ),
    )
    x = x[:, :tgt_h, :tgt_w, :]
    b = x.shape[0]
    x = (
        x.reshape(b, tgt_h // s, s, tgt_w // s, s, cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, tgt_h // s, tgt_w // s, s * s * cin)
    )
    w = _s2d_regroup_weight(w, s)
    return _s2d_core(x, w, pref, prec)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    padding: int,
    compute_dtype=None,
    groups: int = 1,
) -> jax.Array:
    """Forward convolution (reference: convUp [U]).

    x: (B, H, W, Cin) NHWC; w: (kh, kw, Cin/groups, Cout) HWIO.
    Output spatial size follows `conv_out_size` (ceil mode).

    groups > 1 is grouped convolution (the cuda-convnet kernels'
    numGroups — the original two-tower AlexNet topology): channels split
    into `groups` independent towers, lowered as ONE MXU conv via
    feature_group_count. Groups whose per-group Cin is below the
    degenerate-weight-grad threshold (or strided, where the s2d fold
    applies) run as per-group calls through the safe single-group routes.
    """
    if groups > 1 and not isinstance(x, S2DInput):
        cin_g, cout = w.shape[2], w.shape[3]
        if x.shape[3] != cin_g * groups:
            raise ValueError(
                f"grouped conv: input has {x.shape[3]} channels but weight "
                f"expects {cin_g}*{groups}"
            )
        if cin_g < _MIN_CIN or stride > 1:
            # per-group dispatch keeps degenerate-Cin weight-grads off the
            # conv primitive (im2col route) and keeps the s2d fold for
            # strided towers; `groups` is static so this unrolls at trace
            # time into `groups` independent convs XLA schedules freely
            cout_g = cout // groups
            outs = [
                conv2d(
                    x[..., gi * cin_g : (gi + 1) * cin_g],
                    w[..., gi * cout_g : (gi + 1) * cout_g],
                    stride,
                    padding,
                    compute_dtype=compute_dtype,
                )
                for gi in range(groups)
            ]
            return jnp.concatenate(outs, axis=-1)
        kh, kw = w.shape[0], w.shape[1]
        pad_h = ceil_mode_padding(x.shape[1], kh, stride, padding)
        pad_w = ceil_mode_padding(x.shape[2], kw, stride, padding)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
        return lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride, stride),
            padding=(pad_h, pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=None
            if compute_dtype is not None
            else jnp.promote_types(x.dtype, jnp.float32),
            precision=matmul_precision(compute_dtype),
        )
    if isinstance(x, S2DInput):
        if groups > 1:
            raise ValueError(
                "grouped conv cannot consume a fused-prologue S2D input "
                "(the s2d fold interleaves all input channels)"
            )
        # pre-space-to-depth'd input from the fused prologue: the crop/
        # flip/normalize/pad/regroup already happened in one Pallas pass
        if x.stride != stride:
            raise ValueError(f"S2D input built for stride {x.stride}, edge has {stride}")
        xs = x.x
        if compute_dtype is not None:
            xs = xs.astype(compute_dtype)
            w = w.astype(compute_dtype)
        return _s2d_core(
            xs,
            _s2d_regroup_weight(w, stride),
            None
            if compute_dtype is not None
            else jnp.promote_types(xs.dtype, jnp.float32),
            matmul_precision(compute_dtype),
        )
    kh, kw = w.shape[0], w.shape[1]
    cin = w.shape[2]
    pad_h = ceil_mode_padding(x.shape[1], kh, stride, padding)
    pad_w = ceil_mode_padding(x.shape[2], kw, stride, padding)
    if compute_dtype is not None:
        # Run entirely in compute_dtype and RETURN compute_dtype: the
        # bias/activation epilogue and the next edge consume it as-is, so
        # forward activations and backward cotangents both stay bf16 —
        # no per-edge f32 round-trip (those round-trips showed up in the
        # v5e trace as full-tensor convert+copy ops between every edge).
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # f32-or-wider accumulate; in compute_dtype mode the MXU still
    # accumulates f32 internally and rounds the output to compute_dtype
    pref = (
        None if compute_dtype is not None else jnp.promote_types(x.dtype, jnp.float32)
    )
    prec = matmul_precision(compute_dtype)
    if stride > 1 and _MIN_CIN <= cin * stride * stride <= _S2D_MAX_FOLDED_CIN:
        # lower bound: a fold below _MIN_CIN (e.g. stride-2 RGB -> 12)
        # would hand conv_general_dilated a degenerate-Cin weight-grad —
        # the compile pathology _MIN_CIN exists to avoid; those fall
        # through to the im2col route below
        out_h = conv_out_size(x.shape[1], kh, stride, padding)
        out_w = conv_out_size(x.shape[2], kw, stride, padding)
        return _space_to_depth_conv(x, w, stride, out_h, out_w, pad_h, pad_w, pref, prec)
    if cin < _MIN_CIN:
        out_h = conv_out_size(x.shape[1], kh, stride, padding)
        out_w = conv_out_size(x.shape[2], kw, stride, padding)
        return _im2col_conv(x, w, stride, out_h, out_w, pad_h, pad_w, pref, prec)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
        precision=prec,
    )


def conv_onetoone(x: jax.Array, w: jax.Array, compute_dtype=None) -> jax.Array:
    """1x1 channel-mixing conv (reference: ConvOneToOneEdge [U]) — a pure
    MXU matmul over the channel axis. Returns compute_dtype when set
    (f32 MXU accumulation either way)."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return jnp.einsum(
        "bhwc,cd->bhwd",
        x,
        w,
        preferred_element_type=None
        if compute_dtype is not None
        else jnp.promote_types(x.dtype, jnp.float32),
        precision=matmul_precision(compute_dtype),
    )


def fc(x: jax.Array, w: jax.Array, compute_dtype=None) -> jax.Array:
    """Fully connected edge (reference: FCEdge over cudamat dot [U]).

    x: (B, H, W, C) — flattened to (B, H*W*C); w: (H*W*C, units).
    Returns compute_dtype when set (f32 MXU accumulation either way).
    """
    xf = x.reshape(x.shape[0], -1)
    if compute_dtype is not None:
        xf = xf.astype(compute_dtype)
        w = w.astype(compute_dtype)
    return jnp.dot(
        xf,
        w,
        preferred_element_type=None
        if compute_dtype is not None
        else jnp.promote_types(xf.dtype, jnp.float32),
        precision=matmul_precision(compute_dtype),
    )

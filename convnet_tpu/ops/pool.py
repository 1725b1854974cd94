"""Max pooling (reference: MaxPoolEdge over cuda-convnet MaxPool /
MaxPoolUndo kernels, src/maxpool_edge.* [U]).

Forward: XLA's `lax.reduce_window` (the shipped default). A Pallas
forward kernel exists behind CONVNET_POOL_BACKEND=pallas but its chip
A/B (tools/r5_chip4.py, 2026-08-19) was a decisive NEGATIVE: standalone
pool1 29.0 vs 4.9 ms, pool2 19.8 vs 4.7, pool5 4.4 vs 1.7, full step
+42.9 ms at B=4096. The ~151 GB/s the trace shows for reduce-window is
not recoverable headroom: the (H, W, lanes) views the kernel needs are
REAL relayouts of the activations XLA keeps in conv-friendly layouts
(not free bitcasts), and the k overlapping row-block reads re-DMA the
input k times — both costs the fused XLA chain never pays. The kernel
(k shifted block index maps per output row, w-window as an s-phase
reshape + static shifted slices, VPU max) stays hardware-validated as
the documented negative result.

Backward stays XLA's select-and-scatter (the argmax-routed gradient
the reference implements as MaxPoolUndo): round-4 arithmetic showed a
standalone Pallas pool-bwd cannot beat it (its reads fuse into
neighboring producers). The custom VJP's residual is x only; the
backward re-derives window maxima from x (no y residual).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convnet_tpu.ops.conv import ceil_mode_padding
from convnet_tpu.ops.pallas_util import mesh_dp, pallas_interpret, shmap


def _xla_maxpool(x: jax.Array, kernel: int, stride: int, padding: int):
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


def _pool_pallas_wanted() -> bool:
    """CONVNET_POOL_BACKEND: "auto" | "pallas" | "xla". auto is XLA —
    the chip A/B (tools/r5_chip4.py) measured the Pallas form losing
    3-4x standalone and +42.9 ms full-step at B=4096 (see module
    docstring); "pallas" opts in for re-measurement."""
    mode = os.environ.get("CONVNET_POOL_BACKEND", "auto")
    if mode == "pallas":
        return True
    return False


def _pool_form(x, kernel: int, stride: int, padding: int, mesh=None):
    """Kernel-eligible? Returns "bminor" | "cminor" | None. Needs
    pad-free exact window cover (all AlexNet pools) and a 128-divisible
    trailing lane dim; under a mesh the per-shard batch decides."""
    b, h, w, c = x.shape
    dp = mesh_dp(mesh)
    if b % dp:
        return None
    b = b // dp
    if padding != 0 or kernel > 2 * stride or kernel < stride:
        return None
    # h/w >= kernel first: Python's negative modulo would otherwise let
    # e.g. h=1,k=3,s=2 through as "exact cover" with a zero-sized output
    if h < kernel or w < kernel:
        return None
    if (h - kernel) % stride or (w - kernel) % stride:
        return None
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    if (c * b) % 128:
        return None
    return "cminor" if c % 128 == 0 else "bminor"


def _maxpool_kernel(*refs, k, w, wp, s, ow):
    in_refs, o_ref, scr = refs[:k], refs[k], refs[k + 1]
    m = in_refs[0][0]
    for r in in_refs[1:]:
        m = jnp.maximum(m, r[0])
    scr[...] = jnp.full_like(scr, -jnp.inf)
    scr[0:w, :] = m
    u = scr[...].reshape(wp // s, s, scr.shape[-1])
    acc = None
    for j in range(k):
        t = u[j // s : j // s + ow, j % s, :]
        acc = t if acc is None else jnp.maximum(acc, t)
    o_ref[0] = acc


def _pick_xsl(l: int, w: int, wp: int, ow: int, k: int, itemsize: int) -> int:
    """Largest 128-multiple divisor of L whose per-step VMEM (k in-blocks
    + scratch + out, double-buffered in/out) stays near ~6 MB."""
    budget = 6 << 20
    per = itemsize * (2 * k * w + wp + 2 * ow)  # bytes per lane
    cap = max(128, budget // per // 128 * 128)
    best = 128
    d = 128
    while d <= min(cap, l):
        if l % d == 0:
            best = d
        d += 128
    return best


def _pallas_maxpool_local(x, kernel, stride, form, interpret):
    b, h, w, c = x.shape
    s, k = stride, kernel
    oh, ow = (h - k) // s + 1, (w - k) // s + 1
    if form == "cminor":
        xt = jnp.transpose(x, (1, 2, 0, 3)).reshape(h, w, b * c)
    else:
        xt = jnp.transpose(x, (1, 2, 3, 0)).reshape(h, w, c * b)
    l = xt.shape[-1]
    # enough w-phase groups for the last tap's shift
    wp = max(-(-w // s), (k - 1) // s + ow) * s
    xsl = _pick_xsl(l, w, wp, ow, k, x.dtype.itemsize)
    kern = functools.partial(_maxpool_kernel, k=k, w=w, wp=wp, s=s, ow=ow)
    out = pl.pallas_call(
        kern,
        grid=(oh, l // xsl),
        in_specs=[
            # k overlapping row views of the SAME array: per output row
            # the h-window's taps arrive as k shifted blocks
            pl.BlockSpec((1, w, xsl), lambda oh_, j, i=i: (s * oh_ + i, 0, j))
            for i in range(k)
        ],
        out_specs=pl.BlockSpec((1, ow, xsl), lambda oh_, j: (oh_, 0, j)),
        out_shape=jax.ShapeDtypeStruct((oh, ow, l), x.dtype),
        scratch_shapes=[pltpu.VMEM((wp, xsl), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=(k * k) * oh * ow * l,
            bytes_accessed=(h * w + oh * ow) * l * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(*([xt] * k))
    if form == "cminor":
        return jnp.transpose(out.reshape(oh, ow, b, c), (2, 0, 1, 3))
    return jnp.transpose(out.reshape(oh, ow, c, b), (3, 0, 1, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _maxpool_pallas(x, kernel, stride, padding, form, mesh=None):
    interp = pallas_interpret()

    def local(xl):
        return _pallas_maxpool_local(xl, kernel, stride, form, interp)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        return shmap(local, mesh, (P("data"),), P("data"))(x)
    return local(x)


def _maxpool_pallas_fwd(x, kernel, stride, padding, form, mesh=None):
    return _maxpool_pallas(x, kernel, stride, padding, form, mesh), x


def _maxpool_pallas_bwd(kernel, stride, padding, form, mesh, x, g):
    # XLA's select-and-scatter transpose, derived from x alone (the
    # primal reduce-window below is dead code and DCE'd)
    _, vjp = jax.vjp(lambda xx: _xla_maxpool(xx, kernel, stride, padding), x)
    return vjp(g)


_maxpool_pallas.defvjp(_maxpool_pallas_fwd, _maxpool_pallas_bwd)


def maxpool2d(
    x: jax.Array, kernel: int, stride: int, padding: int = 0, mesh=None
) -> jax.Array:
    """x: (B, H, W, C) NHWC; ceil-mode output size (cuda-convnet)."""
    if _pool_pallas_wanted():
        form = _pool_form(x, kernel, stride, padding, mesh)
        if form is not None:
            return _maxpool_pallas(x, kernel, stride, padding, form, mesh)
    return _xla_maxpool(x, kernel, stride, padding)


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

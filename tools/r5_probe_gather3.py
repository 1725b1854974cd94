"""Round-5 gather probes, wave 3 (CHIPLESS) — final design pins.

Wave-2 results: Squeezed+Element mixing is rejected ("all block dims
must be Elements or none"); Element lane-crops still hit the 128-
divisibility rule; u8 loads convert via i32 (not directly); `rev` has
no lowering (flip must be one-hot MXU contractions); minor-dims
transposes OK; 33-way predicated static-slice switch OK; rank-4 input
blocks crash the backend.

This wave pins the remaining stage-1 primitives and then compiles the
FULL composite stage-1 kernel:

  P1c  all-Element input block (the clean dynamic row-offset DMA)
  P23  dynamic BLOCK row indexing from a prefetched scalar (fallback
       row gather at 8-row granularity; the oy%8 residue then needs an
       8-way switch)
  P20b the flip as two small one-hot contractions on a rank-3 VMEM
       value (contract a lane-split dim, restore order by transpose)
  P22  pl.when keyed on a prefetched scalar, dots inside the branch
  P19b per-sublane select via broadcasted iota compare (stage-2 spare)
  P24  COMPOSITE: the entire stage-1 per-image pipeline — u8 rows in,
       convert+normalize, ox 33-switch, row/col phase deinterleaves,
       flip contractions under pl.when, K-major (rp,cpc,p,q) out
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convnet_tpu.trainer import enable_compilation_cache

enable_compilation_cache()
print(f"backend={jax.default_backend()}", flush=True)

H, W, L = 256, 224, 768
CW = 672  # 224 px * 3 ch
results = {}


def probe(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        results[name] = "OK"
        print(f"{name:12s} OK      in {time.perf_counter()-t0:5.0f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        results[name] = f"FAIL {type(e).__name__}"
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name:12s} FAILED  in {time.perf_counter()-t0:5.0f}s "
              f"{type(e).__name__}: {msg}", flush=True)


def p1c():  # all-Element input block: dynamic row offset, static rest
    def kernel(oy_ref, x_ref, o_ref):
        o_ref[...] = x_ref[0]

    Bn = 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bn,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(W), pl.Element(L)),
                lambda b, oy: (b, oy[b], 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), pl.Blocked(W), pl.Blocked(L)), lambda b, oy: (b, 0, 0)
        ),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bn, W, L), jnp.bfloat16),
    )
    jax.jit(f).lower(
        jnp.zeros((Bn,), jnp.int32), jnp.zeros((Bn, H, L), jnp.bfloat16)
    ).compile()


def p23():  # dynamic BLOCK row index from a prefetched scalar
    def kernel(a_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...]

    Bn, RB = 8, 8  # 8-row blocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bn, W // RB),
        in_specs=[
            pl.BlockSpec((1, RB, L), lambda b, j, a: (b, a[b] + j, 0)),
        ],
        out_specs=pl.BlockSpec((1, RB, L), lambda b, j, a: (b, j, 0)),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bn, W, L), jnp.bfloat16),
    )
    jax.jit(f).lower(
        jnp.zeros((Bn,), jnp.int32), jnp.zeros((Bn, H, L), jnp.bfloat16)
    ).compile()


def value_probe(body, out_shape, in_shape=(W, CW), in_dtype=jnp.bfloat16,
                out_dtype=jnp.bfloat16):
    def kernel(s_ref, x_ref, o_ref):
        o_ref[...] = body(x_ref, s_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(in_shape, lambda i, s: (0,) * len(in_shape))],
        out_specs=pl.BlockSpec(out_shape, lambda i, s: (0,) * len(out_shape)),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
    )
    jax.jit(f).lower(
        jnp.zeros((8,), jnp.int32), jnp.zeros(in_shape, in_dtype)
    ).compile()


def _flip_qcp(v):
    """(224, 672) [(rp,p) rows, (cpc=12, q=56) lanes]: q -> 55-q and
    cp -> 3-cp via two one-hot contractions (no `rev` lowering exists).
    cpc index = 3*cp + c -> perm (3-cp)*3 + c. The one-hot matrices are
    built IN-KERNEL from iotas (Pallas kernels cannot capture array
    constants)."""
    z = v.reshape(W, 12, 56)
    i56 = jax.lax.broadcasted_iota(jnp.int32, (56, 56), 0)
    j56 = jax.lax.broadcasted_iota(jnp.int32, (56, 56), 1)
    jq = (i56 == 55 - j56).astype(jnp.float32)
    i12 = jax.lax.broadcasted_iota(jnp.int32, (12, 12), 0)
    j12 = jax.lax.broadcasted_iota(jnp.int32, (12, 12), 1)
    pcm = (j12 == (3 - (i12 // 3)) * 3 + (i12 % 3)).astype(jnp.float32)
    # contract q: (W, 12, 56) x (56, 56') -> (W, 12, 56')
    z = jax.lax.dot_general(
        z, jq, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # contract cpc: (W, 12, 56') x (12, 12') -> (W, 56', 12')
    z = jax.lax.dot_general(
        z, pcm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # restore (W, 12', 56'): minor-dims transpose (OK per P16)
    return jnp.transpose(z, (0, 2, 1)).reshape(W, CW)


def p20b():  # the flip contractions alone
    value_probe(lambda x, s: _flip_qcp(x[...].astype(jnp.float32))
                .astype(jnp.bfloat16), (W, CW))


def p22():  # pl.when keyed on a prefetched scalar, dots inside
    def kernel(s_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...]

        @pl.when(s_ref[0] > 0)
        def _():
            o_ref[...] = _flip_qcp(x_ref[...].astype(jnp.float32)).astype(
                o_ref.dtype
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((W, CW), lambda i, s: (0, 0))],
        out_specs=pl.BlockSpec((W, CW), lambda i, s: (0, 0)),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W, CW), jnp.bfloat16),
    )
    jax.jit(f).lower(
        jnp.zeros((8,), jnp.int32), jnp.zeros((W, CW), jnp.bfloat16)
    ).compile()


def p19b():  # per-sublane select via broadcasted_iota compare
    def body(x, s):
        v = x[...]
        rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        return jnp.where(rows < s[0], v, v * 2)

    value_probe(body, (W, CW))


def p24():  # COMPOSITE stage-1 kernel, one image per grid step
    def kernel(oy_ref, ox_ref, fl_ref, x_ref, o_ref):
        b = pl.program_id(0)
        v = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # (224, 768)
        v = v * (1.0 / 255.0) - 0.45  # normalize (per-channel consts ride as input in the real kernel)
        # ox crop: 33-way predicated static lane slices
        acc = jnp.zeros((W, CW), jnp.float32)
        for k in range(33):
            acc = jnp.where(ox_ref[b] == k, v[:, 3 * k : 3 * k + CW], acc)
        # row-phase deinterleave: rows (56, 4) -> (4, 56)
        r = jnp.transpose(acc.reshape(56, 4, CW), (1, 0, 2)).reshape(W, CW)
        # cols to sublanes
        t = r.T  # (672, 224)
        # col-phase deinterleave on sublanes: (56, 12) -> (12, 56)
        u = jnp.transpose(t.reshape(56, 12, W), (1, 0, 2)).reshape(CW, W)
        # back: K-major [(rp, p) rows, (cpc, q) lanes]
        w = u.T  # (224, 672)
        o_ref[...] = w.astype(jnp.bfloat16)[None]

        @pl.when(fl_ref[b] > 0)
        def _():
            o_ref[...] = _flip_qcp(w).astype(jnp.bfloat16)[None]

    Bn = 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Bn,),
        in_specs=[
            pl.BlockSpec((1, W, L), lambda b, oy, ox, fl: (b, oy[b], 0)),
        ],
        out_specs=pl.BlockSpec((1, W, CW), lambda b, oy, ox, fl: (b, 0, 0)),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bn, W, CW), jnp.bfloat16),
    )
    jax.jit(f).lower(
        jnp.zeros((Bn,), jnp.int32), jnp.zeros((Bn,), jnp.int32),
        jnp.zeros((Bn,), jnp.int32), jnp.zeros((Bn, H, L), jnp.uint8),
    ).compile()


for name, fn in (
    ("P1c-allelem", p1c), ("P23-blkrow", p23), ("P20b-flip", p20b),
    ("P22-when", p22), ("P19b-iotasel", p19b), ("P24-composite", p24),
):
    probe(name, fn)

print("summary:", results, flush=True)
print("R5 GATHER PROBES WAVE 3 COMPLETE", flush=True)

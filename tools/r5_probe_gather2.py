"""Round-5 gather probes, wave 2 (CHIPLESS — compile-only, no claim).

Wave 1 (tools/r5_probe_gather.py) results on this toolchain:
  OK:   P5 leading-dims transpose, P6 middle-dim static index,
        P8 dynamic sublane slice at an 8-aligned hinted offset,
        P9/P10 static UNALIGNED sublane/lane slices
  FAIL: pltpu.roll (static AND dynamic), strided slices, dynamic
        unaligned sublane slices, P1 (squeezed/element row DMA — but it
        died on a probe-script shape bug, re-probed here)

These pin the stage-1 (per-image gather+normalize) / stage-2 (batch
transpose + flip) design: stage 1 DMAs each image's crop rows at a
dynamic row offset, deinterleaves row/col phases with reshape +
leading-dim transposes + one 2D transpose, and writes a K-major
(rp, cpc, p, q) per-image layout; stage 2 re-uses the proven
s2d_relayout transpose pattern with the flip applied as two small
one-hot contractions + a per-image select. Each probe below is one
still-unpinned primitive of that plan.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convnet_tpu.trainer import enable_compilation_cache

enable_compilation_cache()
print(f"backend={jax.default_backend()}", flush=True)

H, W, L = 256, 224, 768  # raw rows, crop rows, lanes (256 px * 3 ch)
results = {}


def probe(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        results[name] = "OK"
        print(f"{name:12s} OK      in {time.perf_counter()-t0:5.0f}s", flush=True)
    except Exception as e:  # noqa: BLE001 - report everything, keep going
        results[name] = f"FAIL {type(e).__name__}"
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name:12s} FAILED  in {time.perf_counter()-t0:5.0f}s "
              f"{type(e).__name__}: {msg}", flush=True)


# ---- P1 re-probe: element-offset dynamic ROW DMA (wave-1 had a shape
# bug: squeezed in-block vs unsqueezed out-block) -----------------------
def p1_fix():
    def kernel(oy_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...]

    Bn = 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bn,),
        in_specs=[
            pl.BlockSpec(
                (pl.Squeezed(), pl.Element(W), pl.Blocked(L)),
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
    oy = jnp.zeros((Bn,), jnp.int32)
    x = jnp.zeros((Bn, H, L), jnp.bfloat16)
    jax.jit(f).lower(oy, x).compile()


# ---- P13b: element offset on the LANE (last) dim — would let the DMA
# do the ox crop too (offset 3*ox is not 128-aligned) -------------------
def p13b():
    def kernel(ox_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...]

    Bn = 8
    CW = 672  # 224 px * 3 ch
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bn,),
        in_specs=[
            pl.BlockSpec(
                (pl.Squeezed(), pl.Blocked(W), pl.Element(CW)),
                lambda b, ox: (b, 0, 3 * ox[b]),
            ),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), pl.Blocked(W), pl.Blocked(CW)), lambda b, ox: (b, 0, 0)
        ),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bn, W, CW), jnp.bfloat16),
    )
    ox = jnp.zeros((Bn,), jnp.int32)
    x = jnp.zeros((Bn, W, L), jnp.bfloat16)
    jax.jit(f).lower(ox, x).compile()


# ---- shared scaffolding: single-block value probes --------------------
def value_probe(body, out_shape, in_shape=(H, L), in_dtype=jnp.bfloat16,
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
    s = jnp.zeros((8,), jnp.int32)
    x = jnp.zeros(in_shape, in_dtype)
    jax.jit(f).lower(s, x).compile()


def p14a():  # u8 load + direct f32 convert
    value_probe(lambda x, s: (x[...].astype(jnp.float32) * 0.5).astype(jnp.bfloat16),
                (H, L), in_dtype=jnp.uint8)


def p14b():  # u8 -> i32 -> f32 ladder
    value_probe(
        lambda x, s: (x[...].astype(jnp.int32).astype(jnp.float32) * 0.5)
        .astype(jnp.bfloat16),
        (H, L), in_dtype=jnp.uint8,
    )


def p15a():  # static flip on LANES
    value_probe(lambda x, s: x[...][:, ::-1], (H, L))


def p15b():  # static flip on SUBLANES
    value_probe(lambda x, s: x[...][::-1, :], (H, L))


def p15c():  # static flip on the leading dim of a 3D view
    value_probe(
        lambda x, s: jnp.flip(x[...].reshape(64, 4, L), 0).reshape(H, L), (H, L)
    )


def p16():  # minor-dims transpose (a, b, c) -> (a, c, b)
    value_probe(
        lambda x, s: jnp.transpose(x[...].reshape(4, 64, L), (0, 2, 1))
        .reshape(4 * L, 64),
        (4 * L, 64),
    )


def p17a():  # rank-4 INPUT block (output rank 2)
    def kernel(s_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(H, L)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((2, 128, 8, 96), lambda i, s: (0, 0, 0, 0))],
        out_specs=pl.BlockSpec((H, L), lambda i, s: (0, 0)),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, L), jnp.bfloat16),
    )
    jax.jit(f).lower(
        jnp.zeros((8,), jnp.int32), jnp.zeros((2, 128, 8, 96), jnp.bfloat16)
    ).compile()


def p18():  # 33-way pl.when switch of static unaligned lane slices
    CW = 672

    def body(x, s):
        acc = jnp.zeros((W, CW), jnp.float32)
        v = x[...].astype(jnp.float32)
        for k in range(33):
            acc = jnp.where(s[0] == k, v[:, 3 * k : 3 * k + CW], acc)
        return acc.astype(jnp.bfloat16)

    value_probe(body, (W, CW), in_shape=(W, L))


def p19():  # per-sublane select from a (rows, 1) flag column
    def body(x, s):
        v = x[...]
        flag = (v[:, 0:1] > 0).astype(jnp.bfloat16)  # (H, 1) broadcast
        return v * flag + (1 - flag) * (v * 2)

    value_probe(body, (H, L))


def p20():  # two-factor one-hot contractions on a 4D view (the flip dot)
    def body(x, s):
        z = x[...].reshape(8, 12, 56, 96)  # [img, cpc, q, rest-lanes]
        pc = jnp.eye(12, dtype=jnp.float32)
        jq = jnp.eye(56, dtype=jnp.float32)[::-1]
        z1 = jax.lax.dot_general(
            z.astype(jnp.float32), pc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # -> [img, q, rest, cpc']
        z2 = jax.lax.dot_general(
            z1, jq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # -> [img, rest, cpc', q']
        return jnp.transpose(z2, (0, 2, 3, 1)).reshape(H * 21, 256).astype(
            jnp.bfloat16
        )

    value_probe(body, (H * 21, 256), in_shape=(H * 21, 256))


def p21():  # the full stage-1 per-image shuffle chain, composed
    CW = 672

    def body(x, s):
        v = x[...].astype(jnp.float32)  # (224, 672) normalized crop
        # row-phase deinterleave: (56, 4, 672) -> (4, 56, 672)
        r = jnp.transpose(v.reshape(56, 4, CW), (1, 0, 2)).reshape(W, CW)
        # batchless 2D transpose: cols to sublanes
        t = r.reshape(W, CW).T  # (672, 224)
        # col-phase deinterleave on sublanes: (56, 12, 224) -> (12, 56, 224)
        u = jnp.transpose(t.reshape(56, 12, W), (1, 0, 2)).reshape(CW, W)
        # final: K-major (rp, cpc) x (p, q): transpose back
        return u.T.astype(jnp.bfloat16)  # (224, 672) = [(rp,p), (cpc,q)]

    value_probe(body, (W, CW), in_shape=(W, CW))


for name, fn in (
    ("P1-fix", p1_fix), ("P13b-lane", p13b),
    ("P14a-u8f32", p14a), ("P14b-u8i32", p14b),
    ("P15a-fliplane", p15a), ("P15b-flipsub", p15b), ("P15c-flip3d", p15c),
    ("P16-minor-t", p16), ("P17a-rank4in", p17a),
    ("P18-switch33", p18), ("P19-rowsel", p19), ("P20-flipdot", p20),
    ("P21-chain", p21),
):
    probe(name, fn)

print("summary:", results, flush=True)
print("R5 GATHER PROBES WAVE 2 COMPLETE", flush=True)

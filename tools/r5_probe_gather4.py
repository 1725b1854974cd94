"""Round-5 gather probes, wave 4 (CHIPLESS) — bisect the wave-3 crashes.

Wave-3: all-Element DMA crashes the backend (P1c); block-granular
dynamic row indexing works (P23); the composite flip-dot crashes
(P20b/P22/P24) — bisected here; iota-select works (P19b).

Design pivot after wave 3: fetch the FULL 256-row image per grid step
(14% extra read, ~0.25 ms at B=4096) and do BOTH crops in-VMEM as
pl.when-predicated static slices (static unaligned slices lower fine;
a jnp.where chain would cost 33 full-tile passes, a pl.when chain
executes only the taken branch). Probes:

  P25a  in-kernel iota-built one-hot matrix, written out
  P25b  dot_general contracting the LAST dim of a rank-3 value
  P25c  dot_general contracting the MIDDLE dim of a rank-3 value
  P25d  rank-3 value f32 minor-dims transpose (post-dot shape)
  P26   pl.when writing a static unaligned sublane slice
  P27   33-branch pl.when oy switch (sublane slices)
  P28   33-branch pl.when ox switch (lane slices)
  P30   in-kernel 2D transpose at stage-1 shape (224,672)->(672,224)
  P31   composite v2: full-image fetch + when-switch crops +
        deinterleaves (no flip dot)
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

H, W, L = 256, 224, 768
CW = 672
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


def _jq56():
    i = jax.lax.broadcasted_iota(jnp.int32, (56, 56), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (56, 56), 1)
    return (i == 55 - j).astype(jnp.float32)


def p25a():  # iota one-hot alone
    def body(x, s):
        m = _jq56()
        return jnp.pad(m, ((0, W - 56), (0, CW - 56))).astype(jnp.bfloat16)

    value_probe(body, (W, CW))


def p25b():  # contract LAST dim of rank-3
    def body(x, s):
        z = x[...].astype(jnp.float32).reshape(W, 12, 56)
        z = jax.lax.dot_general(
            z, _jq56(), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return z.reshape(W, CW).astype(jnp.bfloat16)

    value_probe(body, (W, CW))


def p25c():  # contract MIDDLE dim of rank-3
    def body(x, s):
        z = x[...].astype(jnp.float32).reshape(W, 12, 56)
        i = jax.lax.broadcasted_iota(jnp.int32, (12, 12), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (12, 12), 1)
        pcm = (j == (3 - (i // 3)) * 3 + (i % 3)).astype(jnp.float32)
        z = jax.lax.dot_general(
            z, pcm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # -> (W, 56, 12)
        return jnp.transpose(z, (0, 2, 1)).reshape(W, CW).astype(jnp.bfloat16)

    value_probe(body, (W, CW))


def p25d():  # rank-3 f32 minor transpose alone
    def body(x, s):
        z = x[...].astype(jnp.float32).reshape(W, 12, 56)
        return jnp.transpose(z, (0, 2, 1)).reshape(W, CW).astype(jnp.bfloat16)

    value_probe(body, (W, CW))


def p26():  # pl.when + static unaligned sublane slice write
    def kernel(s_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...][0:W, :]

        @pl.when(s_ref[0] == 3)
        def _():
            o_ref[...] = x_ref[...][3 : 3 + W, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((H, L), lambda i, s: (0, 0))],
        out_specs=pl.BlockSpec((W, L), lambda i, s: (0, 0)),
    )
    f = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W, L), jnp.bfloat16),
    )
    jax.jit(f).lower(
        jnp.zeros((8,), jnp.int32), jnp.zeros((H, L), jnp.bfloat16)
    ).compile()


def _when_switch33(kernel_body, in_shape, out_shape):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(in_shape, lambda i, s: (0, 0))],
        out_specs=pl.BlockSpec(out_shape, lambda i, s: (0, 0)),
    )
    f = pl.pallas_call(
        kernel_body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
    )
    jax.jit(f).lower(
        jnp.zeros((8,), jnp.int32), jnp.zeros(in_shape, jnp.bfloat16)
    ).compile()


def p27():  # 33-branch oy switch (sublane slices)
    def kernel(s_ref, x_ref, o_ref):
        for k in range(33):
            @pl.when(s_ref[0] == k)
            def _(k=k):
                o_ref[...] = x_ref[...][k : k + W, :]

    _when_switch33(kernel, (H, L), (W, L))


def p28():  # 33-branch ox switch (lane slices)
    def kernel(s_ref, x_ref, o_ref):
        for k in range(33):
            @pl.when(s_ref[0] == k)
            def _(k=k):
                o_ref[...] = x_ref[...][:, 3 * k : 3 * k + CW]

    _when_switch33(kernel, (W, L), (W, CW))


def p30():  # stage-1 2D transpose shape
    def body(x, s):
        return x[...].reshape(W, CW).T.astype(jnp.bfloat16)

    value_probe(body, (CW, W))


def p31():  # composite v2: full fetch + when crops + deinterleaves
    def kernel(oy_ref, ox_ref, x_ref, o_ref, crop_ref):
        b = pl.program_id(0)
        v = x_ref[0].astype(jnp.int32).astype(jnp.float32) * (1 / 255.0) - 0.45
        for k in range(33):
            @pl.when(oy_ref[b] == k)
            def _(k=k):
                crop_ref[...] = v[k : k + W, :].astype(jnp.float32)
        u = crop_ref[...]
        acc = None
        for k in range(33):  # ox: where-chain would be 33 passes; when
            @pl.when(ox_ref[b] == k)
            def _(k=k):
                w = u[:, 3 * k : 3 * k + CW]
                r = jnp.transpose(w.reshape(56, 4, CW), (1, 0, 2)).reshape(W, CW)
                t = r.T
                z = jnp.transpose(t.reshape(56, 12, W), (1, 0, 2)).reshape(CW, W)
                o_ref[...] = z.T.astype(jnp.bfloat16)[None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(8,),
        in_specs=[pl.BlockSpec((1, H, L), lambda b, oy, ox: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, W, CW), lambda b, oy, ox: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((W, L), jnp.float32)],
    )
    f = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, W, CW), jnp.bfloat16),
    )
    jax.jit(f).lower(
        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32),
        jnp.zeros((8, H, L), jnp.uint8),
    ).compile()


for name, fn in (
    ("P25a-iota", p25a), ("P25b-dotlast", p25b), ("P25c-dotmid", p25c),
    ("P25d-transp", p25d), ("P26-when1", p26), ("P27-oy33", p27),
    ("P28-ox33", p28), ("P30-t2d", p30), ("P31-compv2", p31),
):
    probe(name, fn)

print("summary:", results, flush=True)
print("R5 GATHER PROBES WAVE 4 COMPLETE", flush=True)

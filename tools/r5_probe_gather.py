"""Round-5 lead 1 groundwork: CHIPLESS probes of the Mosaic primitives
a Pallas gather formulation of the jitter->conv1 segment would need.

The segment (~22.2 ms of the 233 ms B=4096 step; DMA floor ~4.5 ms) is
proven insensitive to the einsum formulation (bf16/bf16d/s8 all ~21.5
ms standalone, tools/r4_chip10.py) — the only remaining attack is a
kernel that GATHERS instead of one-hot-matmuls. Known constraints
(round 3/4): no unaligned dynamic ref slices (sublane %8 / lane %128),
no u8->bf16 direct cast, per-image in-kernel MXU dots ~5x slower than
batched XLA einsums, rank-4 output blocks + pre-transpose lane slices
crash the backend. What was NEVER probed is whether the DMA engine (via
scalar-prefetch index_maps / unblocked indexing) or the VPU (dynamic
rolls, strided slices, small leading-dim transposes) can do the
per-image crop shifts instead. Each probe compiles a tiny kernel
through the chipless AOT helper and reports pass/fail; the surviving
primitives determine the round-5 kernel design:

  P1 unblocked (element-offset) dynamic ROW indexing from a prefetched
     scalar — would let the input DMA do the oy crop directly
  P2 dynamic sublane roll (pltpu.roll by a traced amount) — oy shift
     in VMEM if P1 fails
  P3 dynamic lane roll — the ox*cin column shift
  P4 strided sublane slice x[0:224:4] — the row-phase deinterleave
  P5 leading-dims transpose (64,4,L)->(4,64,L), lanes untouched — the
     alternative row-phase deinterleave
  P6 middle-dim static index on a 3D value — per-phase plane extract
  P7 dynamic-start CONTIGUOUS sublane slice at unaligned offset (the
     documented round-3 failure — re-probe so the constraint stays
     pinned to this toolchain)

Chipless: safe to run any time; no chip claim is taken.
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
        print(f"{name:10s} OK      in {time.perf_counter()-t0:5.0f}s", flush=True)
    except Exception as e:  # noqa: BLE001 - report everything, keep going
        results[name] = f"FAIL {type(e).__name__}"
        msg = str(e).replace("\n", " ")[:240]
        print(f"{name:10s} FAILED  in {time.perf_counter()-t0:5.0f}s "
              f"{type(e).__name__}: {msg}", flush=True)


# ---- P1: element-offset dynamic row indexing via scalar prefetch ------
# (jax 0.9 spells "unblocked" per-dimension: pl.Element(size) makes the
# index_map return ELEMENT offsets for that dim — the DMA engine then
# does the per-image oy crop, no in-kernel dynamic slice needed.)
def p1():
    def kernel(oy_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...]

    B = 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (pl.Squeezed(), pl.Element(W), pl.Blocked(L)),
                lambda b, oy: (b, oy[b], 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, W, L), lambda b, oy: (b, 0, 0)),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, W, L), jnp.bfloat16),
    )
    oy = jnp.zeros((B,), jnp.int32)
    x = jnp.zeros((B, H, L), jnp.bfloat16)
    jax.jit(f).lower(oy, x).compile()


# ---- shared scaffolding for single-block value probes ------------------
def value_probe(body, out_shape):
    def kernel(s_ref, x_ref, o_ref):
        o_ref[...] = body(x_ref, s_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((H, L), lambda i, s: (0, 0))],
        out_specs=pl.BlockSpec(out_shape, lambda i, s: (0,) * len(out_shape)),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
    )
    s = jnp.zeros((8,), jnp.int32)
    x = jnp.zeros((H, L), jnp.bfloat16)
    jax.jit(f).lower(s, x).compile()


def p2():  # dynamic sublane roll
    value_probe(lambda x, s: pltpu.roll(x[...], s[0], 0), (H, L))


def p3():  # dynamic lane roll
    value_probe(lambda x, s: pltpu.roll(x[...], s[0], 1), (H, L))


def p4():  # strided sublane slice (row-phase deinterleave)
    value_probe(lambda x, s: jax.lax.slice(x[...], (0, 0), (W, L), (4, 1)),
                (56, L))


def p5():  # leading-dims transpose, lanes untouched
    value_probe(
        lambda x, s: jnp.transpose(x[...].reshape(64, 4, L), (1, 0, 2))
        .reshape(H, L),
        (H, L),
    )


def p6():  # middle-dim static index on a 3D value
    value_probe(lambda x, s: x[...].reshape(64, 4, L)[:, 1, :], (64, L))


def p7():  # dynamic-start contiguous sublane slice, unaligned offset
    value_probe(lambda x, s: x[pl.ds(s[0], W), :], (W, L))


def p2b():  # STATIC sublane roll (is roll legal at all?)
    value_probe(lambda x, s: pltpu.roll(x[...], 5, 0), (H, L))


def p3b():  # STATIC lane roll
    value_probe(lambda x, s: pltpu.roll(x[...], 5, 1), (H, L))


def p8():  # dynamic sublane slice at a HINTED 8-aligned offset
    value_probe(
        lambda x, s: x[pl.ds(pl.multiple_of(s[0] * 8, 8), W), :], (W, L)
    )


def p9():  # static UNALIGNED sublane slice of a value
    value_probe(lambda x, s: x[...][3:227, :], (W, L))


def p10():  # static UNALIGNED lane slice of a value
    value_probe(lambda x, s: x[...][:, 5:133], (H, 128))


for name, fn in (("P1-elem", p1), ("P2-rollsub", p2), ("P3-rolllane", p3),
                 ("P4-stride", p4), ("P5-ldtrans", p5), ("P6-midindex", p6),
                 ("P7-dynsub", p7), ("P2b-rollst", p2b), ("P3b-rollst", p3b),
                 ("P8-dynhint", p8), ("P9-stunal", p9), ("P10-stlane", p10)):
    probe(name, fn)

print("summary:", results, flush=True)
print("R5 GATHER PROBES COMPLETE", flush=True)

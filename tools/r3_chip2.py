"""Round-3 chip batch 2:

1. Lane-blocked DMA microbench — the feasibility question for the fused
   pool+LRN backward: docs/fused_pool_lrn_bwd_design.md assumed that
   B-splitting a (M, 1024) batch-minor array into 128-lane column
   blocks collapses DMA throughput (256 B chunks at 2 KB stride).
   Measure it: 2-in/1-out copy kernel, full-width blocks vs 128-lane
   column blocks, at rnorm1 scale.
2. Extract-representation throughput on chip (rows/s to HDF5) and
   Predictor latency at batch 1 / 64 — the serving numbers VERDICT r2
   asked for.
3. Fresh xplane trace of the round-3 default train step (r2d LRN, no
   prologue) at batch 1024 -> /tmp/trace_r3_r2d, parsed by
   tools/traceparse.py — the updated attack-list breakdown.
"""
import functools
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

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
print(f"platform={jax.devices()[0]}", flush=True)


def timeit(name, fn, *args, n=20, bytes_moved=None):
    r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0][..., :1]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0][..., :1]))
    dt = (time.perf_counter() - t0) / n
    gbs = f"  {bytes_moved/dt/1e9:7.1f} GB/s" if bytes_moved else ""
    print(f"{name:52s} {dt*1e3:8.3f} ms{gbs}", flush=True)
    return dt


# --- 1. lane-blocked DMA microbench ----------------------------------------
M, B = 55 * 55 * 96, 1024  # rnorm1 scale in the r2d view
x1 = jax.random.normal(jax.random.PRNGKey(0), (M, B), jnp.float32).astype(jnp.bfloat16)
x2 = jax.random.normal(jax.random.PRNGKey(1), (M, B), jnp.float32).astype(jnp.bfloat16)


def copy_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] + b_ref[:]


def run_copy(rows, lanes):
    grid = (M // rows, B // lanes)
    spec = pl.BlockSpec((rows, lanes), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        copy_kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((M, B), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
    )(x1, x2)


total = 3 * M * B * 2  # 2 in + 1 out, bf16
for rows, lanes in [(2640, 1024), (5280, 1024), (2640, 128), (5280, 128), (10560, 128), (21120, 128)]:
    try:
        f = jax.jit(functools.partial(run_copy, rows, lanes))
        timeit(f"copy 2in/1out blocks ({rows:6d} x {lanes:4d})", f, bytes_moved=total)
    except Exception as e:
        print(f"blocks ({rows} x {lanes}) FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)

# --- 2a. predictor latency ---------------------------------------------------
from convnet_tpu.predictor import Predictor
from convnet_tpu import config, model as model_lib
from convnet_tpu.graph import build_graph

model = config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
model.parallel.data = 1
model.parallel.model = 1
graph = build_graph(model, {"input": 224})
params = model_lib.init_params(graph, seed=0)
rng = np.random.RandomState(0)
for pb in (1, 64):
    pred = Predictor(graph, params, batch_size=pb, input_dtype=np.uint8)
    xb = rng.randint(0, 256, (pb, 224, 224, 3), dtype=np.uint8)
    out = pred({"input": xb})  # compile
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        out = pred({"input": xb})
    jax.tree.map(lambda a: np.asarray(a), out)
    dt = (time.perf_counter() - t0) / n
    print(f"predictor batch={pb:3d}: {dt*1e3:7.2f} ms/call  {pb/dt:9.0f} img/s", flush=True)

# --- 2b. extract throughput (rows/s incl. HDF5 write) ------------------------
import tempfile

from convnet_tpu.data.native import write_raw_cache
from convnet_tpu.cli import extract as extract_cli
from convnet_tpu import checkpoint as ckpt

td = tempfile.mkdtemp()
n_rows = 2048
write_raw_cache(
    os.path.join(td, "img.cache"),
    rng.randint(0, 256, (n_rows, 224, 224, 3), dtype=np.uint8),
)
data_pbtxt = os.path.join(td, "data.pbtxt")
with open(data_pbtxt, "w") as f:
    f.write(
        f"""name: "extract_bench"
batch_size: 256
pipeline_loads: true
data_config {{
  layer_name: "input"
  data_type: RAW_CACHE
  file_pattern: "{td}/img.cache"
}}
"""
    )
ckpt_path = ckpt.save(td, "bench", params, jax.tree.map(np.zeros_like, params), step=0)
out_h5 = os.path.join(td, "feats.h5")
t0 = time.perf_counter()
extract_cli.main(
    [
        os.path.join(here, "examples/imagenet/alexnet.pbtxt"),
        data_pbtxt,
        "--checkpoint", ckpt_path,
        "--output", out_h5,
        "--layers", "fc7",
    ]
)
dt = time.perf_counter() - t0
print(f"extract fc7: {n_rows} rows in {dt:.1f}s = {n_rows/dt:.0f} rows/s (incl. compile)", flush=True)
t0 = time.perf_counter()
extract_cli.main(
    [
        os.path.join(here, "examples/imagenet/alexnet.pbtxt"),
        data_pbtxt,
        "--checkpoint", ckpt_path,
        "--output", out_h5,
        "--layers", "fc7",
    ]
)
dt = time.perf_counter() - t0
print(f"extract fc7 (warm): {n_rows} rows in {dt:.1f}s = {n_rows/dt:.0f} rows/s", flush=True)

# --- 3. fresh trace of the default train step at B=1024 ----------------------
from convnet_tpu.data.jitter import JitterSpec
from convnet_tpu.trainer import init_state, make_train_step

model.parallel.data = 1
model.parallel.model = 1
B = 1024
jitter = {
    "input": (
        JitterSpec(image_size=224, can_translate=True, can_flip=True, scale=1 / 255),
        np.full((3,), 0.45, np.float32),
        None,
    )
}
rng2 = np.random.RandomState(3)
data = {
    "input": jax.device_put(rng2.randint(0, 256, (B, 256, 256, 3), dtype=np.uint8)),
    "labels": jax.device_put(rng2.randint(0, 1000, (B,), dtype=np.int32)),
}
step = make_train_step(graph, jitter)
state = init_state(graph)
state, m = step(state, data)
float(m["loss"])
state, m = step(state, data)
float(m["loss"])
t0 = time.perf_counter()
NTRACE = 10
with jax.profiler.trace("/tmp/trace_r3_r2d"):
    for _ in range(NTRACE):
        state, m = step(state, data)
    float(m["loss"])
dt = (time.perf_counter() - t0) / NTRACE
print(f"traced step: {dt*1e3:.2f} ms ({B/dt:.0f} img/s) -> /tmp/trace_r3_r2d", flush=True)
print("R3 CHIP BATCH 2 COMPLETE", flush=True)

"""Round-3 chip batch 4: serving numbers in a FRESH claim + tunnel
characterization + the retries chip batch 2 lost to compile-helper
broken pipes.

Chip batch 2's tail (predictor 23 img/s @1, extract 34 rows/s, traced
step 87 ms vs the 65 ms measured an hour earlier) ran right after six
remote-compile failures and is suspected degraded. This batch reorders
the work quick-first and measures the tunnel itself so serving numbers
can be decomposed into wire vs compute.

Order (ONE process so a single chip claim serves everything):
  1. Tunnel h2d/d2h transfer-rate probe (no compiles).
  2. Predictor latency, uint8 jitter path (the intended serving
     config): batch 1 / 64, host-numpy wire calls AND device-resident
     pure-compute calls.
  3. Extract 2048 rows from RAW_CACHE with --timing (per-phase split).
  4. Input-path bench: bench.main() with BENCH_DATA=rawcache.
  5. Lane-blocked DMA microbench retry (the fused-bwd design question).
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

# --- 1. tunnel transfer characterization ------------------------------------
dev = jax.devices()[0]
rng = np.random.RandomState(0)
for name, arr in [
    ("h2d uint8   150 KB", rng.randint(0, 256, (1, 224, 224, 3), dtype=np.uint8)),
    ("h2d uint8  9.6 MB", rng.randint(0, 256, (64, 224, 224, 3), dtype=np.uint8)),
    ("h2d f32   38.5 MB", rng.randn(64, 224, 224, 3).astype(np.float32)),
    ("h2d uint8  201 MB", rng.randint(0, 256, (1024, 256, 256, 3), dtype=np.uint8)),
]:
    x = jax.device_put(arr, dev)
    float(jnp.sum(x[..., :1].astype(jnp.float32)))  # land it
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        x = jax.device_put(arr, dev)
        float(jnp.sum(x[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    print(
        f"{name}: {dt*1e3:8.1f} ms  {arr.nbytes/dt/1e6:8.1f} MB/s",
        flush=True,
    )
big = jnp.zeros((1024, 4096), jnp.float32)  # 16 MB
float(jnp.sum(big[:1, :1]))
n = 5
t0 = time.perf_counter()
for _ in range(n):
    _ = np.asarray(big)
dt = (time.perf_counter() - t0) / n
print(f"d2h f32     16 MB: {dt*1e3:8.1f} ms  {big.nbytes/dt/1e6:8.1f} MB/s", flush=True)

# --- 2. predictor latency, uint8 jitter path --------------------------------
from convnet_tpu import config, model as model_lib
from convnet_tpu.data.jitter import JitterSpec
from convnet_tpu.graph import build_graph
from convnet_tpu.predictor import Predictor

model = config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
model.parallel.data = 1
model.parallel.model = 1
graph = build_graph(model, {"input": 224})
params = model_lib.init_params(graph, seed=0)
jit_map = {
    "input": (
        JitterSpec(image_size=224, scale=1 / 255),
        np.full((3,), 0.45, np.float32),
        None,
    )
}
for pb in (1, 64):
    pred = Predictor(
        graph, params, batch_size=pb, jitter=jit_map, raw_size=256,
        input_dtype=np.uint8,
    )
    xb = rng.randint(0, 256, (pb, 256, 256, 3), dtype=np.uint8)
    out = pred({"input": xb})  # warm
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = pred({"input": xb})
    dt = (time.perf_counter() - t0) / n
    print(
        f"predictor batch={pb:3d} wire(u8):   {dt*1e3:8.2f} ms/call "
        f"{pb/dt:9.0f} img/s",
        flush=True,
    )
    # device-resident input: pure dispatch+compute+tiny readback
    xd = jax.device_put({"input": jnp.asarray(xb)})
    o = pred._compiled(pred.params, xd)
    jax.tree.map(lambda a: np.asarray(a), o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = pred._compiled(pred.params, xd)
        jax.tree.map(lambda a: np.asarray(a), o)
    dt = (time.perf_counter() - t0) / n
    print(
        f"predictor batch={pb:3d} device-res: {dt*1e3:8.2f} ms/call "
        f"{pb/dt:9.0f} img/s",
        flush=True,
    )

# --- 3. extract with --timing ------------------------------------------------
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
  image_size: 224
  num_colors: 3
  scale: 0.00392156862
}}
"""
    )
ckpt_path = ckpt.save(td, "alexnet", params, None, 0)
t0 = time.perf_counter()
extract_cli.main(
    [
        os.path.join(here, "examples/imagenet/alexnet.pbtxt"),
        data_pbtxt,
        "--checkpoint", ckpt_path,
        "--output", os.path.join(td, "feats.h5"),
        "--layers", "fc7",
        "--timing",
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
        "--output", os.path.join(td, "feats.h5"),
        "--layers", "fc7",
        "--timing",
    ]
)
dt = time.perf_counter() - t0
print(f"extract fc7 (warm): {n_rows} rows in {dt:.1f}s = {n_rows/dt:.0f} rows/s", flush=True)

# --- 4. input-path bench (rawcache) ------------------------------------------
os.environ["BENCH_DATA"] = "rawcache"
os.environ["BENCH_STEPS"] = "10"
sys.path.insert(0, here)
import bench

bench.main()
del os.environ["BENCH_DATA"]

# --- 5. lane-blocked DMA microbench retry ------------------------------------
M, B = 55 * 55 * 96, 1024  # rnorm1 scale in the r2d view
x1 = jax.random.normal(jax.random.PRNGKey(0), (M, B), jnp.float32).astype(jnp.bfloat16)
x2 = jax.random.normal(jax.random.PRNGKey(1), (M, B), jnp.float32).astype(jnp.bfloat16)


def copy_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] + b_ref[:]


def run_copy(rows, lanes, a, b):
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
    )(a, b)


total = 3 * M * B * 2  # 2 in + 1 out, bf16
for rows, lanes in [(2640, 1024), (5280, 1024), (2640, 128), (5280, 128), (10560, 128), (21120, 128)]:
    try:
        f = jax.jit(functools.partial(run_copy, rows, lanes))
        r = f(x1, x2)
        float(jnp.sum(r[:1, :1].astype(jnp.float32)))
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(x1, x2)
        float(jnp.sum(r[:1, :1].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / n
        print(
            f"copy 2in/1out blocks ({rows:6d} x {lanes:4d}) {dt*1e3:8.3f} ms"
            f"  {total/dt/1e9:7.1f} GB/s",
            flush=True,
        )
    except Exception as e:
        print(f"blocks ({rows} x {lanes}) FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)

print("R3 CHIP BATCH 4 COMPLETE", flush=True)

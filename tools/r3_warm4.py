"""Chipless AOT pre-warm of every program tools/r3_chip4.py runs, so
the chip batch pays no compile time inside its claim. Device-free:
params and inputs are ShapeDtypeStructs; .lower().compile() rides the
HTTP AOT helper into /tmp/convnet_tpu_xla_cache.
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
from convnet_tpu import config, model as model_lib
from convnet_tpu.data.jitter import JitterSpec
from convnet_tpu.graph import build_graph
from convnet_tpu.trainer import make_forward

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def warm(name, fn, *avals):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*avals).compile()
    print(f"{name}: compiled in {time.perf_counter()-t0:.0f}s", flush=True)


model = config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
model.parallel.data = 1
model.parallel.model = 1
graph = build_graph(model, {"input": 224})
params_struct = jax.eval_shape(lambda: model_lib.init_params(graph, seed=0))

# --- predictor programs (batch 1 / 64, uint8 + jitter raw 256) ---------------
jit_map = {
    "input": (
        JitterSpec(image_size=224, scale=1 / 255),
        np.full((3,), 0.45, np.float32),
        None,
    )
}
out_layers = [l.name for l in graph.output_layers]
for pb in (1, 64):
    base_fwd = make_forward(graph, out_layers, jit_map)
    jittered = frozenset(jit_map)

    def fwd(params, batch):
        batch = {
            k: v if k in jittered else jnp.asarray(v, jnp.float32)
            for k, v in batch.items()
        }
        return base_fwd(params, batch)

    ex = {"input": jax.ShapeDtypeStruct((pb, 256, 256, 3), jnp.uint8)}
    warm(f"predictor b{pb}", fwd, params_struct, ex)

# --- extract forward (batch 256, jitter from the bench data pbtxt) -----------
ds = config.parse_dataset_config(
    """name: "extract_bench"
batch_size: 256
pipeline_loads: true
data_config {
  layer_name: "input"
  data_type: RAW_CACHE
  file_pattern: "unused"
  image_size: 224
  num_colors: 3
  scale: 0.00392156862
}
"""
)
ex_jit = {}
for c in ds.data_config:
    if c.image_size:
        ex_jit[c.layer_name] = (
            JitterSpec(
                image_size=c.image_size,
                can_translate=c.can_translate,
                can_flip=c.can_flip,
                scale=c.scale,
                normalize=c.normalize,
            ),
            None,
            None,
        )
fwd_x = make_forward(graph, ["fc7"], ex_jit)
ex = {"input": jax.ShapeDtypeStruct((256, 224, 224, 3), jnp.uint8)}
t0 = time.perf_counter()
fwd_x.lower(params_struct, ex).compile()
print(f"extract fwd b256: compiled in {time.perf_counter()-t0:.0f}s", flush=True)

# --- lane-blocked copy kernels ------------------------------------------------
M, B = 55 * 55 * 96, 1024


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


xs = jax.ShapeDtypeStruct((M, B), jnp.bfloat16)
for rows, lanes in [(2640, 1024), (5280, 1024), (2640, 128), (5280, 128), (10560, 128), (21120, 128)]:
    try:
        warm(
            f"copy blocks ({rows} x {lanes})",
            functools.partial(run_copy, rows, lanes),
            xs,
            xs,
        )
    except Exception as e:
        print(
            f"copy blocks ({rows} x {lanes}) WARM FAILED: "
            f"{type(e).__name__}: {str(e)[:140]}",
            flush=True,
        )
print("WARM4 COMPLETE", flush=True)

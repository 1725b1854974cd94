"""Per-component timing of the AlexNet train step on the real chip.

Times (a) the full train step, (b) fwd-only, (c) fwd+bwd without the
optimizer, (d) every edge op at its true shape fwd and fwd+bwd.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from convnet_tpu import config
from convnet_tpu.trainer import enable_compilation_cache

enable_compilation_cache()
from convnet_tpu.data.jitter import JitterSpec, jitter_batch
from convnet_tpu.graph import build_graph, ET
from convnet_tpu.trainer import init_state, make_train_step
from convnet_tpu import model as model_lib
from convnet_tpu import optim

BATCH = int(os.environ.get("B", "256"))
STEPS = int(os.environ.get("S", "20"))

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
model = config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
model.parallel.data = 1
model.parallel.model = 1
graph = build_graph(model, {"input": 224})

rng = np.random.RandomState(0)
raw = 256
data = {
    "input": jax.device_put(rng.randint(0, 256, (BATCH, raw, raw, 3), dtype=np.uint8)),
    "labels": jax.device_put(rng.randint(0, 1000, (BATCH,), dtype=np.int32)),
}
jitter = {
    "input": (
        JitterSpec(image_size=224, can_translate=True, can_flip=True, scale=1 / 255),
        np.full((3,), 0.45, np.float32),
        None,
    )
}


def timeit(name, fn, *args, n=STEPS):
    # warmup & compile
    r = fn(*args)
    r = fn(*args)
    jax.tree.map(lambda a: np.asarray(jax.device_get(a)) if hasattr(a, "dtype") else a, r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    # force sync via device_get of one leaf
    leaves = jax.tree.leaves(r)
    _ = np.asarray(jax.device_get(leaves[0])) if leaves else None
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:9.3f} ms   {BATCH/dt:10.0f} img/s")
    return dt


print(f"batch={BATCH} platform={jax.devices()[0]}")

# --- full train step ---
step = make_train_step(graph, jitter)
state = init_state(graph)
state, m = step(state, data)
float(m["loss"])
t0 = time.perf_counter()
for _ in range(STEPS):
    state, m = step(state, data)
float(m["loss"])
dt = (time.perf_counter() - t0) / STEPS
print(f"{'FULL train step':40s} {dt*1e3:9.3f} ms   {BATCH/dt:10.0f} img/s")

# --- fwd-only loss ---
@jax.jit
def fwd_only(params, batch):
    proc = {"input": jitter_batch(batch["input"], jitter["input"][0], None, False, jitter["input"][1], None), "labels": batch["labels"]}
    loss, _ = model_lib.loss_fn(graph, params, proc, train=False)
    return loss

timeit("fwd only (eval)", fwd_only, state["params"], data)

# --- fwd+bwd, no optimizer ---
@jax.jit
def fwd_bwd(params, batch, key):
    proc = {"input": jitter_batch(batch["input"], jitter["input"][0], key, True, jitter["input"][1], None), "labels": batch["labels"]}
    def loss_of(p):
        l, _ = model_lib.loss_fn(graph, p, proc, train=True, dropout_rng=key)
        return l
    return jax.grad(loss_of)(params)

key = jax.random.PRNGKey(0)
timeit("fwd+bwd (no opt)", fwd_bwd, state["params"], data, key)

# --- optimizer only ---
@jax.jit
def opt_only(params, moms):
    return optim.apply_updates(graph, params, moms, params, jnp.int32(100))

timeit("optimizer only", opt_only, state["params"], state["moms"])

# --- jitter only ---
@jax.jit
def jit_only(batch, key):
    return jitter_batch(batch["input"], jitter["input"][0], key, True, jitter["input"][1], None)

timeit("jitter prologue", jit_only, data, key)

# --- per-op at true shapes (bf16 compute) ---
shapes = graph.shapes
print("\nper-edge ops (fwd / fwd+bwd):")
acts = {}
acts["input"] = jnp.asarray(rng.rand(BATCH, 224, 224, 3), jnp.float32)
params = state["params"]
cdt = jnp.bfloat16

from convnet_tpu.ops.conv import conv2d, fc
from convnet_tpu.ops.pool import maxpool2d
from convnet_tpu.ops.lrn import response_norm_cross_map

topo = graph.topo_layer_order()
for name in topo:
    l = graph.layer(name)
    if l.is_input:
        continue
    for e in graph.incoming(name):
        x = acts[e.source]
        p = params.get(e.name)
        if e.edge_type == ET.CONV:
            f = jax.jit(functools.partial(conv2d, stride=e.stride, padding=e.padding, compute_dtype=cdt))
            y = f(x, p["w"])
            timeit(f"  {e.name} fwd", f, x, p["w"])
            g = jax.jit(lambda x, w, f=f: jax.grad(lambda x, w: f(x, w).sum(), argnums=(0, 1))(x, w))
            timeit(f"  {e.name} fwd+bwd", lambda x, w, g=g: g(x, w), x, p["w"])
        elif e.edge_type == ET.FC:
            f = jax.jit(functools.partial(fc, compute_dtype=cdt))
            y = f(x, p["w"])[:, None, None, :]
            timeit(f"  {e.name} fwd", f, x, p["w"])
        elif e.edge_type == ET.MAXPOOL:
            f = jax.jit(functools.partial(maxpool2d, kernel=e.kernel_size, stride=e.stride, padding=e.padding))
            y = f(x)
            timeit(f"  {e.name} fwd", f, x)
            g = jax.jit(lambda x, f=f: jax.grad(lambda x: f(x).sum())(x))
            timeit(f"  {e.name} fwd+bwd", g, x)
        elif e.edge_type == ET.RESPONSE_NORM:
            for backend in ("xla", "pallas"):
                f = jax.jit(functools.partial(
                    response_norm_cross_map,
                    add_scale=e.add_scale, pow_scale=e.pow_scale,
                    frac_of_filters=e.frac_of_filters_response_norm,
                    blocked=e.response_norm_blocked, backend=backend))
                try:
                    y2 = f(x)
                    timeit(f"  {e.name} fwd [{backend}]", f, x)
                    g = jax.jit(lambda x, f=f: jax.grad(lambda x: f(x).sum())(x))
                    timeit(f"  {e.name} fwd+bwd [{backend}]", g, x)
                except Exception as ex:
                    print(f"  {e.name} [{backend}] FAILED: {type(ex).__name__}: {str(ex)[:200]}")
            y = y2 if 'y2' in dir() else x
        else:
            continue
        if y.ndim == 2:
            y = y[:, None, None, :]
        acts[name] = jnp.maximum(y.astype(jnp.float32), 0) if l.activation else y.astype(jnp.float32)
print("done")

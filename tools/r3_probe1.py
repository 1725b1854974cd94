"""Round-3 probe batch #1 (run ONCE, in background, generous budget).

1. Fresh jax.profiler trace of the full AlexNet train step @1024.
2. Timed full step (current img/s).
3. LRN transposed-form tile sweep at rnorm1 shape (isolated kernels).
4. Pool-bwd standalone timings (select-and-scatter at pool1/2 shapes).
5. conv1 fwd / wgrad / s2d-view standalone timings (attribute the
   reshape/transpose trace bin).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from convnet_tpu.trainer import enable_compilation_cache

enable_compilation_cache()
from convnet_tpu import config
from convnet_tpu.data.jitter import JitterSpec, jitter_batch
from convnet_tpu.graph import build_graph
from convnet_tpu.trainer import init_state, make_train_step

B = 1024
here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timeit(name, fn, *args, n=20):
    t_c0 = time.perf_counter()
    r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0][..., :1]))
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0][..., :1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)", flush=True)
    return dt


print(f"platform={jax.devices()[0]}", flush=True)

# ---- full step: trace + timing -------------------------------------------
model = config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
model.parallel.data = 1
model.parallel.model = 1
graph = build_graph(model, {"input": 224})
jitter = {
    "input": (
        JitterSpec(image_size=224, can_translate=True, can_flip=True, scale=1 / 255),
        np.full((3,), 0.45, np.float32),
        None,
    )
}
step = make_train_step(graph, jitter)
state = init_state(graph)


@jax.jit
def make_data(key):
    ki, kl = jax.random.split(key)
    return {
        "input": jax.random.randint(ki, (B, 256, 256, 3), 0, 256, dtype=jnp.int32).astype(jnp.uint8),
        "labels": jax.random.randint(kl, (B,), 0, 1000, dtype=jnp.int32),
    }


data = make_data(jax.random.PRNGKey(0))
t0 = time.perf_counter()
for _ in range(3):
    state, m = step(state, data)
float(m["loss"])
print(f"full step compiled+warm in {time.perf_counter()-t0:.0f}s", flush=True)

jax.profiler.start_trace("/tmp/trace_r3_base")
for _ in range(10):
    state, m = step(state, data)
float(m["loss"])
jax.profiler.stop_trace()
print("trace -> /tmp/trace_r3_base", flush=True)

t0 = time.perf_counter()
for _ in range(20):
    state, m = step(state, data)
float(m["loss"])
dt = (time.perf_counter() - t0) / 20
print(f"FULL STEP: {dt*1e3:.2f} ms  {B/dt:.0f} img/s", flush=True)

# ---- LRN t-form tile sweep (isolated, t-layout in/out) --------------------
from convnet_tpu.ops import lrn as lrn_mod

key = jax.random.PRNGKey(1)
xt = jax.random.normal(key, (55, 55, 96, B), jnp.float32).astype(jnp.bfloat16)
gt = jax.random.normal(jax.random.fold_in(key, 1), (55, 55, 96, B), jnp.float32).astype(jnp.bfloat16)
alpha, beta, n_win = 0.0001 / 5, 0.75, 5

for tile in (1, 5, 11, 25):
    os.environ["CONVNET_LRN_TILE_T"] = str(tile)
    try:
        fwd = jax.jit(
            lambda x: lrn_mod._pallas_t(False, (x,), n_win, alpha, beta, False, relu=True)
        )
        timeit(f"lrn_t rnorm1 fwd tile={tile}", fwd, xt)
    except Exception as e:
        print(f"lrn_t fwd tile={tile} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
    try:
        bwd = jax.jit(
            lambda g, x: lrn_mod._pallas_t(True, (g, x), n_win, alpha, beta, False, relu=True)
        )
        timeit(f"lrn_t rnorm1 bwd tile={tile}", bwd, gt, xt)
    except Exception as e:
        print(f"lrn_t bwd tile={tile} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
os.environ.pop("CONVNET_LRN_TILE_T", None)

# ---- pool bwd standalone ---------------------------------------------------
from convnet_tpu.ops.pool import maxpool2d

for name, shape in (("pool1", (B, 55, 55, 96)), ("pool2", (B, 27, 27, 256))):
    x = jax.random.normal(key, shape, jnp.float32).astype(jnp.bfloat16)
    pool = functools.partial(maxpool2d, kernel=3, stride=2, padding=0)
    y = jax.jit(pool)(x)
    g = jnp.ones_like(y)
    timeit(f"{name} fwd", jax.jit(pool), x)

    def pool_bwd(x, g):
        _, vjp = jax.vjp(pool, x)
        return vjp(g)[0]

    timeit(f"{name} bwd (select-scatter)", jax.jit(pool_bwd), x, g)

# ---- conv1 pieces ----------------------------------------------------------
from convnet_tpu.ops.conv import conv2d

x1 = jax.random.normal(key, (B, 224, 224, 3), jnp.float32)
w1 = jax.random.normal(key, (11, 11, 3, 96), jnp.float32) * 0.01
c1 = functools.partial(conv2d, stride=4, padding=0, compute_dtype=jnp.bfloat16)
y1 = jax.jit(c1)(x1, w1)
g1 = jnp.ones_like(y1)
timeit("conv1 fwd (s2d)", jax.jit(c1), x1, w1)

def conv1_wgrad(x, w, g):
    _, vjp = jax.vjp(lambda w: c1(x, w), w)
    return vjp(g)[0]

timeit("conv1 wgrad", jax.jit(conv1_wgrad), x1, w1, g1)

def s2d_view(x):
    x = x.astype(jnp.bfloat16)
    x = jnp.pad(x, ((0, 0), (0, 4), (0, 4), (0, 0)))[:, :228, :228, :]
    b = x.shape[0]
    return (
        x.reshape(b, 57, 4, 57, 4, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, 57, 57, 48)
    )

timeit("s2d view alone (f32 in, bf16 out)", jax.jit(s2d_view), x1)

# jitter prologue alone
jit_fn = jax.jit(
    lambda x, k: jitter_batch(x, jitter["input"][0], k, True, jitter["input"][1], None)
)
timeit("jitter prologue", jit_fn, data["input"], jax.random.PRNGKey(3))

print("probe1 done", flush=True)

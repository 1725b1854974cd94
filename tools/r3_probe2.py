"""Round-3 probe #2: r2d LRN kernel A/B on the chip.

1. r2d fwd/bwd standalone at rnorm1 shape, k in {1, 5, 11}
   (t-form round-3 baseline: fwd 5.01 / bwd 7.81 ms standalone).
2. Full train step with CONVNET_LRN_FORM=r2d vs t.
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
from convnet_tpu.data.jitter import JitterSpec
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

from convnet_tpu.ops import lrn as lrn_mod

key = jax.random.PRNGKey(1)
xt = jax.random.normal(key, (55, 55, 96, B), jnp.float32).astype(jnp.bfloat16)
gt = jax.random.normal(jax.random.fold_in(key, 1), (55, 55, 96, B), jnp.float32).astype(jnp.bfloat16)
alpha, beta, n_win = 0.0001 / 5, 0.75, 5

for k in (5, 11, 1):
    os.environ["CONVNET_LRN_TILE_R"] = str(k)
    try:
        fwd = jax.jit(
            lambda x: lrn_mod._pallas_r(False, (x,), n_win, False, alpha, beta, False, relu=True)
        )
        timeit(f"lrn_r2d rnorm1 fwd k={k}", fwd, xt)
    except Exception as e:
        print(f"lrn_r2d fwd k={k} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
    try:
        bwd = jax.jit(
            lambda g, x: lrn_mod._pallas_r(True, (g, x), n_win, False, alpha, beta, False, relu=True)
        )
        timeit(f"lrn_r2d rnorm1 bwd k={k}", bwd, gt, xt)
    except Exception as e:
        print(f"lrn_r2d bwd k={k} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
os.environ.pop("CONVNET_LRN_TILE_R", None)

# numerics spot-check on hardware at the real shape (vs XLA path)
x_small = jax.random.normal(key, (128, 55, 55, 96), jnp.float32).astype(jnp.bfloat16)
args = (0.0001, 0.75, 5.0 / 96, False)
os.environ["CONVNET_LRN_FORM"] = "r2d"
y_r = jax.jit(lambda a: lrn_mod.response_norm_cross_map(a, *args, "pallas", True))(x_small)
os.environ["CONVNET_LRN_FORM"] = "2d"
y_2 = jax.jit(lambda a: lrn_mod.response_norm_cross_map(a, *args, "pallas", True))(x_small)
del os.environ["CONVNET_LRN_FORM"]
diff = float(jnp.max(jnp.abs(y_r.astype(jnp.float32) - y_2.astype(jnp.float32))))
print(f"r2d vs 2d max abs diff on chip: {diff:.6f}", flush=True)
assert diff < 1e-2, diff

# ---- full step A/B ---------------------------------------------------------
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


@jax.jit
def make_data(key):
    ki, kl = jax.random.split(key)
    return {
        "input": jax.random.randint(ki, (B, 256, 256, 3), 0, 256, dtype=jnp.int32).astype(jnp.uint8),
        "labels": jax.random.randint(kl, (B,), 0, 1000, dtype=jnp.int32),
    }


data = make_data(jax.random.PRNGKey(0))

for form in ("r2d", "t"):
    os.environ["CONVNET_LRN_FORM"] = form
    step = make_train_step(graph, jitter)
    state = init_state(graph)
    t0 = time.perf_counter()
    for _ in range(3):
        state, m = step(state, data)
    float(m["loss"])
    print(f"form={form}: compiled+warm in {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = step(state, data)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 20
    print(f"FULL STEP form={form}: {dt*1e3:.2f} ms  {B/dt:.0f} img/s", flush=True)
del os.environ["CONVNET_LRN_FORM"]

print("probe2 done", flush=True)

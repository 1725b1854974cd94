"""Round-5 chip batch 4: Pallas maxpool-forward A/B.

The round-5 trace puts XLA's reduce-window forwards at 8.90 ms of the
233 ms step (pool1 4.87 + pool2 3.52 + pool5 0.51) — ~151 GB/s for
~1.3 GB of traffic, ~3x off the Pallas DMA floor. ops/pool.py's new
kernel reads k overlapping row blocks and maxes on the VPU. Sequence:

  1. on-chip numerics gate per pool shape (bit-equal fwd, bit-equal
     select-and-scatter grad)
  2. standalone per-pool microbench at B=4096 (pallas vs reduce-window)
  3. full-step A/B at B=4096 (CONVNET_POOL_BACKEND=pallas vs default)
  4. trace the winner -> /tmp/trace_r5_pool

Run standalone (one chip claim).
"""
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
from convnet_tpu.ops.pool import _maxpool_pallas, _pool_form, _xla_maxpool
from convnet_tpu.trainer import init_state, make_train_step

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
print(f"platform={jax.devices()[0]}", flush=True)

POOLS = [
    ("pool1", (4096, 55, 55, 96)),
    ("pool2", (4096, 27, 27, 256)),
    ("pool5", (4096, 13, 13, 256)),
]

# ---- 1. numerics gates (small batch keeps the d2h light) -------------
for tag, (b, h, w, c) in POOLS:
    x = jnp.asarray(
        np.random.RandomState(1).randn(256, h, w, c), jnp.bfloat16
    )
    form = _pool_form(x, 3, 2, 0)
    want = np.asarray(jax.jit(lambda a: _xla_maxpool(a, 3, 2, 0))(x), np.float32)
    got = np.asarray(
        jax.jit(lambda a, f=form: _maxpool_pallas(a, 3, 2, 0, f))(x), np.float32
    )
    eq = np.array_equal(got, want)
    g = jnp.asarray(np.random.RandomState(2).randn(*want.shape), jnp.bfloat16)
    g1 = np.asarray(
        jax.jit(
            lambda a, gg, f=form: jax.vjp(
                lambda z: _maxpool_pallas(z, 3, 2, 0, f), a
            )[1](gg)[0]
        )(x, g),
        np.float32,
    )
    g2 = np.asarray(
        jax.jit(
            lambda a, gg: jax.vjp(lambda z: _xla_maxpool(z, 3, 2, 0), a)[1](gg)[0]
        )(x, g),
        np.float32,
    )
    geq = np.array_equal(g1, g2)
    print(f"numerics[{tag}] form={form}: fwd_equal={eq} grad_equal={geq}",
          flush=True)
    if not (eq and geq):
        sys.exit(1)

# ---- 2. standalone microbenches --------------------------------------
for tag, shape in POOLS:
    x = jnp.asarray(np.random.RandomState(3).randn(*shape), jnp.bfloat16)
    form = _pool_form(x, 3, 2, 0)
    fx = jax.jit(lambda a: _xla_maxpool(a, 3, 2, 0))
    fp = jax.jit(lambda a, f=form: _maxpool_pallas(a, 3, 2, 0, f))
    for name, f in (("xla", fx), ("pallas", fp)):
        r = f(x)
        float(r.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(30):
            r = f(x)
        float(r.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / 30
        print(f"standalone {tag} {name:6s}: {dt*1e3:6.2f} ms", flush=True)

# ---- 3. full-step A/B -------------------------------------------------
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
data = {
    "input": jnp.asarray(
        np.random.RandomState(9).randint(0, 256, (4096, 256, 256, 3), np.uint8)
    ),
    "labels": jnp.asarray(
        np.random.RandomState(10).randint(0, 1000, (4096,), np.int32)
    ),
}


def measure(tag, n=16, **env):
    prev_env = {k: os.environ.get(k) for k in env}
    for k, v in env.items():
        os.environ[k] = v
    jax.clear_caches()
    try:
        step = make_train_step(graph, jitter)
        state = init_state(graph)
        for _ in range(2):
            state, m = step(state, data)
        float(np.asarray(m["loss"]).reshape(-1)[-1])
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, data)
        float(np.asarray(m["loss"]).reshape(-1)[-1])
        dt = (time.perf_counter() - t0) / n
        print(f"{tag:42s} {dt*1e3:7.2f} ms/step  {4096/dt:8.0f} img/s", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{tag:42s} FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None
    finally:
        for k in env:
            if prev_env.get(k) is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = prev_env[k]


base = measure("B=4096 xla pool (shipped default)")
pal = measure("B=4096 pallas pool fwd", CONVNET_POOL_BACKEND="pallas")
pal_wins = pal is not None and (base is None or pal < base)
if base and pal:
    print(f"pool factor at 4096: {'pallas WINS' if pal_wins else 'xla keeps'} "
          f"({(pal - base) * 1e3:+.2f} ms for pallas)", flush=True)
if pal_wins:
    print("CHIPBATCH_SETENV CONVNET_POOL_BACKEND=pallas", flush=True)

# ---- 4. trace the winner ---------------------------------------------
win_env = {"CONVNET_POOL_BACKEND": "pallas"} if pal_wins else {}
trace_dir = f"/tmp/trace_r5_pool_{'pallas' if pal_wins else 'xla'}"
for k, v in win_env.items():
    os.environ[k] = v
jax.clear_caches()
step = make_train_step(graph, jitter)
state = init_state(graph)
for _ in range(2):
    state, m = step(state, data)
float(np.asarray(m["loss"]).reshape(-1)[-1])
with jax.profiler.trace(trace_dir):
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, data)
    float(np.asarray(m["loss"]).reshape(-1)[-1])
    dt = (time.perf_counter() - t0) / 10
print(f"traced winner step: {dt*1e3:.2f} ms -> {trace_dir}", flush=True)

print("R5 CHIP BATCH 4 COMPLETE", flush=True)

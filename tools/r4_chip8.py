"""Round-4 chip batch 8: isolate the input-path factors at the new
batch-4096 operating point, and probe 8192.

Why: chip7's greedy A/B tested bias/s2d at B=2048 (bias +2.1 ms, s2d
neutral) and then moved to 4096 with both ON. The /tmp/trace_r4_final
decomposition shows the s2d input chain costs ~22.2 ms at 4096 —
including a 3.9 ms relayout copy XLA inserts because it does not adapt
conv1's input to the kernel's K-major layout — so the factor needs its
own 4096 measurement before the default (now ON) is trusted at the
bench batch.

Sequence:
  1. base (B=4096, bias=1 s2d=1)  — expect ~235.8 ms (chip7, cached)
  2. B=4096, bias=1 s2d=0         — the XLA jitter chain at 4096
  3. B=4096, bias=0 s2d=<winner>  — bias factor sanity at 4096
  4. B=8192 at the winning config — batch-trend probe (try/except: HBM)
  5. trace the 4096 winner if s2d flipped -> /tmp/trace_r4_s2d_ab

Prints CHIPBATCH_SETENV lines for the winners (consumed by later jobs
and mirrored into code defaults by hand). Run under tools/chipbatch.py.
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
from convnet_tpu.trainer import init_state, make_train_step

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
print(f"platform={jax.devices()[0]}", flush=True)

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


def measure(tag, B=4096, n=16, **env):
    for k, v in env.items():
        os.environ[k] = v
    jax.clear_caches()
    try:
        step = make_train_step(graph, jitter)
        state = init_state(graph)

        @jax.jit
        def make_data(key):
            ki, kl = jax.random.split(key)
            return {
                "input": jax.random.randint(
                    ki, (B, 256, 256, 3), 0, 256, dtype=jnp.int32
                ).astype(jnp.uint8),
                "labels": jax.random.randint(kl, (B,), 0, 1000, dtype=jnp.int32),
            }

        data = make_data(jax.random.PRNGKey(7))
        for _ in range(2):
            state, m = step(state, data)
            float(np.asarray(m["loss"]).reshape(-1)[-1])
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, data)
        float(np.asarray(m["loss"]).reshape(-1)[-1])
        dt = (time.perf_counter() - t0) / n
        print(f"{tag:42s} {dt*1e3:7.2f} ms/step  {B/dt:8.0f} img/s", flush=True)
        return dt
    finally:
        for k in env:
            del os.environ[k]


base = measure("B=4096 bias=1 s2d=1 (chip7 winner)")
nos2d = measure("B=4096 bias=1 s2d=0", CONVNET_S2D_RELAYOUT="0")
s2d_on = nos2d is None or (base is not None and base <= nos2d)
print(
    f"s2d factor at 4096: {'ON keeps' if s2d_on else 'OFF wins'} "
    f"({(base - nos2d) * 1e3:+.2f} ms for ON)"
    if base and nos2d
    else "s2d factor: incomplete",
    flush=True,
)
if not s2d_on:
    print("CHIPBATCH_SETENV CONVNET_S2D_RELAYOUT=0", flush=True)

win_env = {} if s2d_on else {"CONVNET_S2D_RELAYOUT": "0"}
nobias = measure("B=4096 bias=0 s2d=winner", CONVNET_LRN_BIAS_FUSED="0", **win_env)
best = min(x for x in (base, nos2d) if x is not None)
if nobias is not None and nobias < best:
    print("bias factor REVERSED at 4096 — investigate", flush=True)
    print("CHIPBATCH_SETENV CONVNET_LRN_BIAS_FUSED=0", flush=True)

try:
    dt8 = measure("B=8192 winner config", B=8192, n=8, **win_env)
    if dt8 is not None and dt8 / 2 < best:
        print("CHIPBATCH_SETENV BENCH_BATCH=8192", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"batch 8192: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

if not s2d_on:
    for k, v in win_env.items():
        os.environ[k] = v
    jax.clear_caches()
    step = make_train_step(graph, jitter)
    state = init_state(graph)
    data = {
        "input": jnp.asarray(
            np.random.RandomState(9).randint(0, 256, (4096, 256, 256, 3), np.uint8)
        ),
        "labels": jnp.asarray(
            np.random.RandomState(10).randint(0, 1000, (4096,), np.int32)
        ),
    }
    for _ in range(2):
        state, m = step(state, data)
    float(np.asarray(m["loss"]).reshape(-1)[-1])
    with jax.profiler.trace("/tmp/trace_r4_s2d_ab"):
        t0 = time.perf_counter()
        for _ in range(10):
            state, m = step(state, data)
        float(np.asarray(m["loss"]).reshape(-1)[-1])
        dt = (time.perf_counter() - t0) / 10
    print(f"traced s2d=0 step: {dt*1e3:.2f} ms -> /tmp/trace_r4_s2d_ab", flush=True)

print("R4 CHIP BATCH 8 COMPLETE", flush=True)

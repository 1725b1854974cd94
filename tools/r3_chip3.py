"""Round-3 chip batch 3: hardware-validate the fused pool+LRN backward
kernel (ops/fused_pool_lrn.py) and A/B it in the full train step.

Order (quick numerics first, long A/Bs last; ONE process so a single
chip claim serves everything — see docs/performance.md traps):
  1. Compiled fused-backward numerics vs the XLA oracle composition at
     AlexNet rnorm1 geometry (B=128, 55x55x96, pool k3 s2): f32 plain
     and bf16+fuse_relu (the bench regime), tie-heavy quantized input.
  2. Full-step A/B at batch 1024, 2x2 factorial: pool+LRN fusion
     (CONVNET_POOL_LRN_FUSED) x s2d weight-grad form (CONVNET_S2D_WGRAD
     conv = round-2 transposed-conv wgrad, explicit = tap-matmul).
  3. Fresh xplane trace of the winner -> /tmp/trace_r3_best.
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
from convnet_tpu import config, model as model_lib
from convnet_tpu.data.jitter import JitterSpec
from convnet_tpu.graph import build_graph
from convnet_tpu.ops.fused_pool_lrn import lrn_maxpool
from convnet_tpu.trainer import init_state, make_train_step

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
print(f"platform={jax.devices()[0]}", flush=True)

# --- 1. fused backward numerics on chip at rnorm1 geometry ------------------
FRAC = 5.0 / 96


def vjp_pair(x, g, backend, fuse_relu):
    os.environ["CONVNET_POOL_LRN_BACKEND"] = backend
    try:
        y, vjp = jax.vjp(
            lambda a: lrn_maxpool(
                a, 0.001, 0.75, FRAC, False, 3, 2, 0, fuse_relu
            ),
            x,
        )
        (dx,) = vjp(g)
        return np.asarray(y, np.float32), np.asarray(dx, np.float32)
    finally:
        del os.environ["CONVNET_POOL_LRN_BACKEND"]


rng = np.random.RandomState(0)
# quantized -> tied window maxima; negatives exercise the fused relu
xq = np.round(rng.randn(128, 55, 55, 96) * 2) / 2

from convnet_tpu.graph import conv_out_size

OH = conv_out_size(55, 3, 2, 0)
numerics_failures = []
for dtype, fr in ((jnp.float32, False), (jnp.bfloat16, True)):
    x = jnp.asarray(xq, dtype)
    g = jnp.asarray(rng.randn(128, OH, OH, 96), dtype)
    t0 = time.perf_counter()
    y_p, dx_p = vjp_pair(x, g, "pallas", fr)
    t1 = time.perf_counter()
    y_x, dx_x = vjp_pair(x, g, "xla", fr)
    scale = np.max(np.abs(dx_x)) + 1e-12
    dy = np.max(np.abs(y_p - y_x))
    ddx = np.max(np.abs(dx_p - dx_x)) / scale
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    status = "OK" if (dy < 10 * tol and ddx < tol) else "FAIL"
    print(
        f"fused bwd ON CHIP {np.dtype(dtype).name:8s} relu={fr}: "
        f"fwd maxdiff={dy:.2e} bwd rel-maxdiff={ddx:.2e} [{status}] "
        f"(pallas compile+run {t1-t0:.0f}s)",
        flush=True,
    )
    if status != "OK":
        # record but keep going: the 2x2 A/B below is the expensive,
        # chip-bound part of this job and its data stays useful even if
        # the numerics bar needs another look (first failure was a
        # marginal 1.15e-5 vs 1e-5 from default-precision MXU f32 dots,
        # fixed by f32_exact threading — this guards the re-validation)
        numerics_failures.append((np.dtype(dtype).name, fr, dy, ddx))

# --- 2. full-step A/B at batch 1024 ----------------------------------------
model = config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
model.parallel.data = 1
model.parallel.model = 1
graph = build_graph(model, {"input": 224})
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


def measure(tag, n=30):
    jax.clear_caches()  # env knobs are read at trace time
    step = make_train_step(graph, jitter)
    state = init_state(graph)
    state, m = step(state, data)
    float(m["loss"])
    state, m = step(state, data)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, data)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"{tag:44s} {dt*1e3:7.2f} ms/step  {B/dt:8.0f} img/s", flush=True)
    return dt


results = {}
for fused in ("0", "1"):
    for wgrad in ("conv", "explicit"):
        os.environ["CONVNET_POOL_LRN_FUSED"] = fused
        os.environ["CONVNET_S2D_WGRAD"] = wgrad
        tag = f"fused={fused} wgrad={wgrad}" + (
            " (round-2 config)" if (fused, wgrad) == ("0", "conv") else ""
        )
        results[(fused, wgrad)] = measure(tag)

best = min(results, key=results.get)
os.environ["CONVNET_POOL_LRN_FUSED"], os.environ["CONVNET_S2D_WGRAD"] = best
print(
    f"best: fused={best[0]} wgrad={best[1]} "
    f"({B/results[best]:.0f} img/s, saves "
    f"{(results[('0','conv')]-results[best])*1e3:.2f} ms vs round-2 config)",
    flush=True,
)
# chipbatch env chaining: subsequent jobs (the greedy sweep) start from
# this winner config
print(f"CHIPBATCH_SETENV CONVNET_POOL_LRN_FUSED={best[0]}", flush=True)
print(f"CHIPBATCH_SETENV CONVNET_S2D_WGRAD={best[1]}", flush=True)

# --- 3. trace the winner -----------------------------------------------------
step = make_train_step(graph, jitter)
state = init_state(graph)
state, m = step(state, data)
float(m["loss"])
t0 = time.perf_counter()
NTRACE = 10
with jax.profiler.trace("/tmp/trace_r3_best"):
    for _ in range(NTRACE):
        state, m = step(state, data)
    float(m["loss"])
dt = (time.perf_counter() - t0) / NTRACE
print(f"traced step: {dt*1e3:.2f} ms ({B/dt:.0f} img/s) -> /tmp/trace_r3_best", flush=True)
if numerics_failures:
    raise SystemExit(f"fused pool+LRN hardware numerics FAIL: {numerics_failures}")
print("R3 CHIP BATCH 3 COMPLETE", flush=True)

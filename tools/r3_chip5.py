"""Round-3 chip batch 5: greedy one-factor-at-a-time A/B from the best
known config, then a trace of the winner.

Factors (in order; each kept only if it wins):
  1. BENCH_UNROLL 1 -> 4 -> 8 (multi-step-per-launch scan)
  2. CONVNET_PLRN_CMINOR=1 (rnorm2 through the fused pool+LRN path)
  3. CONVNET_FUSED_PROLOGUE=1 (retry under the new balance)
  4. batch 2048 at the winning config
Then: fresh xplane trace -> /tmp/trace_r3_final.

Base config comes from env (set by the runner to chip batch 3's
winner): CONVNET_POOL_LRN_FUSED / CONVNET_S2D_WGRAD.
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
print(
    "base: fused=%s wgrad=%s" % (
        os.environ.get("CONVNET_POOL_LRN_FUSED", "0"),
        os.environ.get("CONVNET_S2D_WGRAD", "conv"),
    ),
    flush=True,
)

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


def measure(tag, B=1024, unroll=1, n=24):
    jax.clear_caches()
    step = make_train_step(graph, jitter, unroll=unroll)
    state = init_state(graph)
    rng = jax.random.PRNGKey(7)
    lead = () if unroll == 1 else (unroll,)

    @jax.jit
    def make_data(key):
        ki, kl = jax.random.split(key)
        return {
            "input": jax.random.randint(
                ki, lead + (B, 256, 256, 3), 0, 256, dtype=jnp.int32
            ).astype(jnp.uint8),
            "labels": jax.random.randint(kl, lead + (B,), 0, 1000, dtype=jnp.int32),
        }

    data = make_data(rng)
    launches = max(2, n // unroll)
    state, m = step(state, data)
    float(np.asarray(m["loss"]).reshape(-1)[-1])
    state, m = step(state, data)
    float(np.asarray(m["loss"]).reshape(-1)[-1])
    t0 = time.perf_counter()
    for _ in range(launches):
        state, m = step(state, data)
    float(np.asarray(m["loss"]).reshape(-1)[-1])
    dt = (time.perf_counter() - t0) / (launches * unroll)
    print(f"{tag:46s} {dt*1e3:7.2f} ms/step  {B/dt:8.0f} img/s", flush=True)
    return dt


# 2026-08-18 attempt-1 results (log /tmp/chipbatch/r3_chip5.py.a1.log):
# base 62.12 ms, unroll=4 61.93, unroll=8 61.92 -> unroll winner 8;
# PLRN_CMINOR 62.63 dropped; FUSED_PROLOGUE 64.00 dropped. The attempt
# then died on the s2d_relayout Mosaic block bug (since fixed) — this
# rerun re-measures only base + the winning unroll and the new factors.
best = measure("base (B=1024, unroll=1)")
best_unroll = 1
dt = measure("unroll=8", unroll=8)
if dt < best:
    best, best_unroll = dt, 8
print(f"unroll winner: {best_unroll}", flush=True)


def ab_factor(env, tag):
    """Greedy keep-if-wins, and a factor whose compile/lowering fails
    must not kill the batch — record and move on."""
    global best
    os.environ[env] = "1"
    try:
        dt = measure(f"+ {env}=1 ({tag})", unroll=best_unroll)
    except Exception as e:
        del os.environ[env]
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    if dt < best:
        best = dt
        print(f"{tag}: KEPT", flush=True)
        print(f"CHIPBATCH_SETENV {env}=1", flush=True)
    else:
        del os.environ[env]
        print(f"{tag}: dropped", flush=True)


# round-4 factor: phase-major einsum + Pallas s2d relayout of the
# jitter->conv1 input chain (ops/s2d_relayout.py; targets the 4.1 ms
# relayout bin in the r2d trace). First compile costs ~150 s Mosaic.
ab_factor("CONVNET_S2D_RELAYOUT", "s2d_relayout")

# round-4 factor: conv bias deferred into the LRN kernels (db from
# in-VMEM tile sums; targets the 1.3 ms reduce re-reads in the r2d
# trace). Covers both the plain-LRN path (response_norm_cross_map_bias)
# and the pool-fused path (lrn_maxpool_bias), so it runs regardless of
# the chip-3 winner. First compile ~150 s Mosaic per new kernel form.
ab_factor("CONVNET_LRN_BIAS_FUSED", "lrn_bias")

dt2048 = measure(f"batch 2048 (unroll={best_unroll})", B=2048, unroll=best_unroll)
B_final = 2048 if dt2048 / 2 < best else 1024
print(
    f"final: B={B_final} unroll={best_unroll} "
    f"fused={os.environ.get('CONVNET_POOL_LRN_FUSED', '0')} "
    f"wgrad={os.environ.get('CONVNET_S2D_WGRAD', 'conv')} "
    f"cminor={os.environ.get('CONVNET_PLRN_CMINOR', '0')} "
    f"prologue={os.environ.get('CONVNET_FUSED_PROLOGUE', '0')} "
    f"-> {(B_final/(dt2048/2 if B_final == 2048 else best)):.0f} img/s",
    flush=True,
)

# ---- trace the winner -------------------------------------------------------
jax.clear_caches()
step = make_train_step(graph, jitter, unroll=best_unroll)
state = init_state(graph)
lead = () if best_unroll == 1 else (best_unroll,)
B = B_final


@jax.jit
def make_data(key):
    ki, kl = jax.random.split(key)
    return {
        "input": jax.random.randint(
            ki, lead + (B, 256, 256, 3), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8),
        "labels": jax.random.randint(kl, lead + (B,), 0, 1000, dtype=jnp.int32),
    }


data = make_data(jax.random.PRNGKey(3))
state, m = step(state, data)
float(np.asarray(m["loss"]).reshape(-1)[-1])
NL = max(1, 10 // best_unroll)
t0 = time.perf_counter()
with jax.profiler.trace("/tmp/trace_r3_final"):
    for _ in range(NL):
        state, m = step(state, data)
    float(np.asarray(m["loss"]).reshape(-1)[-1])
dt = (time.perf_counter() - t0) / (NL * best_unroll)
print(f"traced step: {dt*1e3:.2f} ms ({B/dt:.0f} img/s) -> /tmp/trace_r3_final", flush=True)
print("R3 CHIP BATCH 5 COMPLETE", flush=True)

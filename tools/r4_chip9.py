"""Round-4 chip batch 9: int8 one-hot crop dots (CONVNET_CROP_DOT=s8).

Why: the /tmp/trace_r4_final decomposition puts the jitter->conv1 input
chain at ~22.2 ms of the 233 ms step at B=4096, and the fattest waste
inside it is the bf16 one-hot materialization — two bf16[4096,256,256]
one-hot tensors (3.2 GB written + re-read) plus a bf16 copy of x
(1.6 GB) feeding einsums that only ever produce exact small integers.
The s8 form: one-hots and pixels ride as int8 (pixels shifted by -128,
exactly restored in the epilogue), dots emit s32 on the MXU int8 path,
and the operand order contracts the raw NHWC batch directly (no
transpose pass). Expected ~4-6 ms/step; bit-exact by construction.

Sequence:
  1. numerics gate: jitter_crop_phased s8 == bf16 bitwise ON CHIP
     (both jit-compiled; interpret mode proved insufficient in round 3)
  2. base (B=4096, crop_dot=bf16)  — expect ~235.5 ms (chip8, cached)
  3. B=4096, crop_dot=s8
  4. B=8192 at the winning config (try/except: the bf16 form failed
     compile at 8192 — the smaller s8 intermediates may fix it)
  5. trace the winner -> /tmp/trace_r4_cropdot

Prints CHIPBATCH_SETENV lines for the winners (mirrored into code
defaults by hand). Run under tools/chipbatch.py.
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

# ---- 1. numerics gate: s8 vs bf16 crop dots, compiled on chip --------
from convnet_tpu.data.jitter import sample_crop_flip
from convnet_tpu.ops.s2d_relayout import jitter_crop_phased, relayout_geometry

xg = jnp.asarray(
    np.random.RandomState(3).randint(0, 256, (256, 256, 256, 3), np.uint8)
)
oy, ox, flips = sample_crop_flip(jax.random.PRNGKey(5), 256, 256, 256, 224, True, True)
_, p_pad = relayout_geometry(224, 11, 4)
mean = np.asarray([0.45, 0.45, 0.45], np.float32)


def phased(dot):
    os.environ["CONVNET_CROP_DOT"] = dot
    try:
        f = jax.jit(
            lambda x, a, b, c: jitter_crop_phased(
                x, a, b, c, crop=224, stride=4, p_pad=p_pad, scale=1 / 255, mean=mean
            )
        )
        return np.asarray(f(xg, oy, ox, flips), np.float32)
    finally:
        del os.environ["CONVNET_CROP_DOT"]


zb = phased("bf16")
zs = phased("s8")
exact = np.array_equal(zb, zs)
print(f"crop-dot numerics gate: bf16 vs s8 bitwise equal = {exact}", flush=True)
if not exact:
    diff = np.abs(zb - zs)
    print(f"  max abs diff {diff.max():.3e} at {np.unravel_index(diff.argmax(), diff.shape)}")
    print("GATE FAILED — not A/B'ing an inexact form", flush=True)
    sys.exit(1)

# ---- 2-4. full-step A/B at the headline operating point --------------
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
    except Exception as e:  # noqa: BLE001
        print(f"{tag:42s} FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None
    finally:
        for k in env:
            del os.environ[k]


base = measure("B=4096 crop_dot=bf16 (chip8 winner)")
s8 = measure("B=4096 crop_dot=s8", CONVNET_CROP_DOT="s8")
s8_wins = s8 is not None and (base is None or s8 < base)
if base and s8:
    print(f"crop-dot factor at 4096: {'s8 WINS' if s8_wins else 'bf16 keeps'} "
          f"({(s8 - base) * 1e3:+.2f} ms for s8)", flush=True)
if s8_wins:
    print("CHIPBATCH_SETENV CONVNET_CROP_DOT=s8", flush=True)

win_env = {"CONVNET_CROP_DOT": "s8"} if s8_wins else {}
best = min(x for x in (base, s8) if x is not None)
dt8 = measure("B=8192 winner config", B=8192, n=8, **win_env)
if dt8 is not None and dt8 / 2 < best:
    print("CHIPBATCH_SETENV BENCH_BATCH=8192", flush=True)

# ---- 5. trace the winner ---------------------------------------------
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
with jax.profiler.trace("/tmp/trace_r4_cropdot"):
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, data)
    float(np.asarray(m["loss"]).reshape(-1)[-1])
    dt = (time.perf_counter() - t0) / 10
print(f"traced winner step: {dt*1e3:.2f} ms -> /tmp/trace_r4_cropdot", flush=True)

print("R4 CHIP BATCH 9 COMPLETE", flush=True)

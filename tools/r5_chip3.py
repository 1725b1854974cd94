"""Round-5 chip batch 3: channel-major einsum output A/B (cmajor).

The round-5 trace names slice_bitcast_fusion (4.90 ms at B=4096) as
the cost of splitting the (B, C, i, j) einsum output into the relayout
kernel's three per-channel operands — dim-1 slices XLA must
materialize. Emitting the einsum as (C, B, i, j) makes the split a
leading-dim bitcast (ops/s2d_relayout.py cmajor). The einsum's own
layout epilogue may shift in response, so the A/B decides:

  1. numerics gate: cmajor on/off bit-equal through jitter_s2d (chip)
  2. segment microbench at B=4096 (einsum reference ~24.2 ms, chip2)
  3. full-step A/B at B=4096
  4. trace the winner -> /tmp/trace_r5_cmajor

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
from convnet_tpu.ops.s2d_relayout import jitter_s2d
from convnet_tpu.trainer import init_state, make_train_step

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
print(f"platform={jax.devices()[0]}", flush=True)

MEAN = np.asarray([0.45, 0.45, 0.45], np.float32)
BSEG = 4096
xs_ = jnp.asarray(np.random.RandomState(1).randint(0, 256, (BSEG, 256, 256, 3), np.uint8))
oys = jnp.asarray(np.random.RandomState(2).randint(0, 33, BSEG), jnp.int32)
oxs = jnp.asarray(np.random.RandomState(3).randint(0, 33, BSEG), jnp.int32)
fls = jnp.asarray(np.random.RandomState(4).randint(0, 2, BSEG), jnp.int32)


def seg(cm: str, n=20, ret=False):
    prev = os.environ.get("CONVNET_S2D_CMAJOR")
    os.environ["CONVNET_S2D_CMAJOR"] = cm
    jax.clear_caches()
    try:
        f = jax.jit(
            lambda x, a, b, c: jitter_s2d(
                x, a, b, c, crop=224, kernel=11, stride=4, scale=1 / 255,
                mean=MEAN,
            ).x
        )
        r = f(xs_, oys, oxs, fls)
        float(r.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(xs_, oys, oxs, fls)
        float(r.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / n
        print(f"segment jitter_s2d cmajor={cm}: {dt*1e3:7.2f} ms", flush=True)
        return (dt, np.asarray(r[:64], np.float32)) if ret else (dt, None)
    except Exception as e:  # noqa: BLE001
        print(f"segment cmajor={cm} FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return (None, None)
    finally:
        if prev is None:
            os.environ.pop("CONVNET_S2D_CMAJOR", None)
        else:
            os.environ["CONVNET_S2D_CMAJOR"] = prev


d0, v0 = seg("0", ret=True)
d1, v1 = seg("1", ret=True)
if v0 is not None and v1 is not None:
    exact = np.array_equal(v0, v1)
    print(f"numerics gate (first 64 rows): array_equal={exact}", flush=True)
    if not exact:
        sys.exit(1)

# ---- full-step A/B ----------------------------------------------------
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


base = measure("B=4096 cmajor=0 (shipped default)")
cm = measure("B=4096 cmajor=1", CONVNET_S2D_CMAJOR="1")
cm_wins = cm is not None and (base is None or cm < base)
if base and cm:
    print(f"cmajor factor at 4096: {'cmajor WINS' if cm_wins else 'bmajor keeps'} "
          f"({(cm - base) * 1e3:+.2f} ms for cmajor)", flush=True)
if cm_wins:
    print("CHIPBATCH_SETENV CONVNET_S2D_CMAJOR=1", flush=True)

# ---- trace the winner -------------------------------------------------
win_env = {"CONVNET_S2D_CMAJOR": "1"} if cm_wins else {}
trace_dir = f"/tmp/trace_r5_{'cmajor' if cm_wins else 'bmajor'}"
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

print("R5 CHIP BATCH 3 COMPLETE", flush=True)

"""Round-4 chip batch 10: transpose-free bf16 crop dots (bf16d).

Why: the /tmp/trace_r4_final decomposition showed the bf16 phased crop
path paying a dedicated (B,C,H,W) transpose+cast pass (fusion.5,
~3.8 ms at B=4096) before its one-hot einsums. The s8 branch already
contracts the raw NHWC batch directly with natural operand order —
"bf16d" applies the same operand order at bf16: bitwise-identical
values (single-term one-hot sums), no transpose pass, no integer
shift/restore epilogue. The s8 A/B (chip9) was neutral because the s8
dots gave back what the killed transpose saved; bf16d keeps the dots
at the measured bf16 rate, so the transpose saving should be net.

Sequence:
  1. numerics gate: jitter_crop_phased bf16d == bf16 bitwise ON CHIP
  2. segment microbench: jit'd jitter_s2d alone at B=4096 for
     bf16 / bf16d / s8 (fast compiles; isolates the input chain)
  3. full-step A/B at B=4096: base (bf16, cached) vs bf16d
  4. trace the winner -> /tmp/trace_r4_bf16d (feeds the misc-copy
     itemization, chipless)

Prints CHIPBATCH_SETENV for a winner. Run under tools/chipbatch.py.
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
from convnet_tpu.data.jitter import JitterSpec, sample_crop_flip
from convnet_tpu.graph import build_graph
from convnet_tpu.ops.s2d_relayout import (
    jitter_crop_phased,
    jitter_s2d,
    relayout_geometry,
)
from convnet_tpu.trainer import init_state, make_train_step

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
print(f"platform={jax.devices()[0]}", flush=True)

# ---- 1. numerics gate: bf16d vs bf16, compiled on chip ----------------
xg = jnp.asarray(
    np.random.RandomState(3).randint(0, 256, (256, 256, 256, 3), np.uint8)
)
oy, ox, flips = sample_crop_flip(jax.random.PRNGKey(5), 256, 256, 256, 224, True, True)
_, p_pad = relayout_geometry(224, 11, 4)
mean = np.asarray([0.45, 0.45, 0.45], np.float32)


def phased(dot):
    prev = os.environ.get("CONVNET_CROP_DOT")
    os.environ["CONVNET_CROP_DOT"] = dot
    try:
        f = jax.jit(
            lambda x, a, b, c: jitter_crop_phased(
                x, a, b, c, crop=224, stride=4, p_pad=p_pad, scale=1 / 255, mean=mean
            )
        )
        return np.asarray(f(xg, oy, ox, flips), np.float32)
    finally:
        if prev is None:
            del os.environ["CONVNET_CROP_DOT"]
        else:
            os.environ["CONVNET_CROP_DOT"] = prev


zb = phased("bf16")
zd = phased("bf16d")
exact = np.array_equal(zb, zd)
print(f"crop-dot numerics gate: bf16 vs bf16d bitwise equal = {exact}", flush=True)
if not exact:
    diff = np.abs(zb - zd)
    print(f"  max abs diff {diff.max():.3e} at {np.unravel_index(diff.argmax(), diff.shape)}")
    print("GATE FAILED — not A/B'ing an inexact form", flush=True)
    sys.exit(1)

# ---- 2. segment microbench: jitter_s2d alone at B=4096 ---------------
BSEG = 4096
xseg = jnp.asarray(
    np.random.RandomState(7).randint(0, 256, (BSEG, 256, 256, 3), np.uint8)
)
oys, oxs, flipss = sample_crop_flip(
    jax.random.PRNGKey(9), BSEG, 256, 256, 224, True, True
)


def seg_time(dot, n=20):
    prev = os.environ.get("CONVNET_CROP_DOT")
    os.environ["CONVNET_CROP_DOT"] = dot
    jax.clear_caches()
    try:
        f = jax.jit(
            lambda x, a, b, c: jitter_s2d(
                x, a, b, c, crop=224, kernel=11, stride=4, scale=1 / 255, mean=mean
            ).x.sum(dtype=jnp.float32)
        )
        float(f(xseg, oys, oxs, flipss))
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(xseg, oys, oxs, flipss)
        float(r)
        dt = (time.perf_counter() - t0) / n
        print(f"segment jitter_s2d {dot:6s} B={BSEG}: {dt*1e3:7.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"segment jitter_s2d {dot:6s} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    finally:
        if prev is None:
            del os.environ["CONVNET_CROP_DOT"]
        else:
            os.environ["CONVNET_CROP_DOT"] = prev


seg = {dot: seg_time(dot) for dot in ("bf16", "bf16d", "s8")}

# ---- 3. full-step A/B at the headline operating point ----------------
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
    prev_env = {k: os.environ.get(k) for k in env}
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
            if prev_env.get(k) is None:
                del os.environ[k]
            else:
                os.environ[k] = prev_env[k]


base = measure("B=4096 crop_dot=bf16 (shipped default)")
bd = measure("B=4096 crop_dot=bf16d", CONVNET_CROP_DOT="bf16d")
bd_wins = bd is not None and (base is None or bd < base)
if base and bd:
    print(f"crop-dot factor at 4096: {'bf16d WINS' if bd_wins else 'bf16 keeps'} "
          f"({(bd - base) * 1e3:+.2f} ms for bf16d)", flush=True)
if bd_wins:
    print("CHIPBATCH_SETENV CONVNET_CROP_DOT=bf16d", flush=True)

# ---- 4. trace the winner ---------------------------------------------
win_env = {"CONVNET_CROP_DOT": "bf16d"} if bd_wins else {}
trace_dir = f"/tmp/trace_r4_{'bf16d' if bd_wins else 'bf16'}"
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
with jax.profiler.trace(trace_dir):
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, data)
    float(np.asarray(m["loss"]).reshape(-1)[-1])
    dt = (time.perf_counter() - t0) / 10
print(f"traced winner step ({'bf16d' if bd_wins else 'bf16'}): {dt*1e3:.2f} ms -> {trace_dir}", flush=True)

print("R4 CHIP BATCH 10 COMPLETE", flush=True)

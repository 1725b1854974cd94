"""Round-5 chip batch 2: the jitter gather kernel A/B.

The round-5 trace (BASELINE.md decomposition) puts the einsum stage of
the input chain at 13.56 ms of the 22.19 ms segment (fusion.5 +
slice_bitcast + fusion.1); the gather kernel (ops/jitter_gather.py)
replaces it with per-image DMA + predicated static slices. Sequence:

  1. on-chip numerics gate: gather vs einsum at full AlexNet geometry
     (B=256) — scale-only must be ARRAY-EQUAL; with mean/std <= 1 bf16
     ulp (in-kernel fma, see the module docstring)
  2. segment microbench: jit'd jitter_s2d alone at B=4096, einsum vs
     gather (einsum reference: ~21.5 ms, r4_chip10)
  3. full-step A/B at B=4096 (shipped defaults vs CONVNET_JITTER_GATHER=1)
  4. trace the winner -> /tmp/trace_r5_gather

Run under tools/chipbatch.py or standalone (takes one chip claim).
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
from convnet_tpu.ops.jitter_gather import gather_crop_phased
from convnet_tpu.ops.s2d_relayout import (
    jitter_crop_phased,
    jitter_s2d,
    relayout_geometry,
)
from convnet_tpu.trainer import init_state, make_train_step

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
print(f"platform={jax.devices()[0]}", flush=True)

MEAN = np.asarray([0.45, 0.45, 0.45], np.float32)
pg, pp = relayout_geometry(224, 11, 4)

# ---- 1. numerics gate -------------------------------------------------
rng = np.random.RandomState(7)
B0 = 256
x0 = jnp.asarray(rng.randint(0, 256, (B0, 256, 256, 3), np.uint8))
oy0 = jnp.asarray(rng.randint(0, 33, B0), jnp.int32)
ox0 = jnp.asarray(rng.randint(0, 33, B0), jnp.int32)
fl0 = jnp.asarray(rng.randint(0, 2, B0), jnp.int32)

for tag, kw in (
    ("scale-only", dict(scale=1 / 255, mean=None, std=None)),
    ("mean", dict(scale=1 / 255, mean=MEAN, std=None)),
):
    want = np.asarray(
        jax.jit(
            lambda x, a, b, c: jitter_crop_phased(
                x, a, b, c, crop=224, stride=4, p_pad=pp, **kw
            )
        )(x0, oy0, ox0, fl0),
        np.float32,
    )
    got = np.asarray(
        jax.jit(
            lambda x, a, b, c: gather_crop_phased(
                x, a, b, c, crop=224, stride=4, p_pad=pp, **kw
            )
        )(x0, oy0, ox0, fl0),
        np.float32,
    )
    if kw["mean"] is None:
        exact = np.array_equal(got, want)
        print(f"numerics[{tag}]: array_equal={exact}", flush=True)
        if not exact:
            bad = np.argwhere(got != want)
            print(f"  MISMATCH {len(bad)} elems, first {bad[:3]}", flush=True)
            sys.exit(1)
    else:
        ulp = 2.0 ** (np.floor(np.log2(np.maximum(np.abs(want), 1e-30))) - 7)
        bad = np.abs(got - want) > np.maximum(ulp, 2e-7)
        print(f"numerics[{tag}]: within 1 bf16 ulp = {not bad.any()} "
              f"({bad.sum()} beyond)", flush=True)
        if bad.any():
            sys.exit(1)

# ---- 2. segment microbench -------------------------------------------
BSEG = 4096
xs_ = jnp.asarray(np.random.RandomState(1).randint(0, 256, (BSEG, 256, 256, 3), np.uint8))
oys = jnp.asarray(np.random.RandomState(2).randint(0, 33, BSEG), jnp.int32)
oxs = jnp.asarray(np.random.RandomState(3).randint(0, 33, BSEG), jnp.int32)
fls = jnp.asarray(np.random.RandomState(4).randint(0, 2, BSEG), jnp.int32)


def seg_time(gather: str, n=20):
    prev = os.environ.get("CONVNET_JITTER_GATHER")
    os.environ["CONVNET_JITTER_GATHER"] = gather
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
        print(f"segment jitter_s2d gather={gather}: {dt*1e3:7.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"segment gather={gather} FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
    finally:
        if prev is None:
            os.environ.pop("CONVNET_JITTER_GATHER", None)
        else:
            os.environ["CONVNET_JITTER_GATHER"] = prev


seg = {g: seg_time(g) for g in ("0", "1")}

# ---- 3. full-step A/B at B=4096 --------------------------------------
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


base = measure("B=4096 einsum (shipped default)")
gat = measure("B=4096 gather kernel", CONVNET_JITTER_GATHER="1")
gat_wins = gat is not None and (base is None or gat < base)
if base and gat:
    print(f"gather factor at 4096: {'gather WINS' if gat_wins else 'einsum keeps'} "
          f"({(gat - base) * 1e3:+.2f} ms for gather)", flush=True)
if gat_wins:
    print("CHIPBATCH_SETENV CONVNET_JITTER_GATHER=1", flush=True)

# ---- 4. trace the winner ---------------------------------------------
win_env = {"CONVNET_JITTER_GATHER": "1"} if gat_wins else {}
trace_dir = f"/tmp/trace_r5_{'gather' if gat_wins else 'einsum'}"
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

print("R5 CHIP BATCH 2 COMPLETE", flush=True)

"""Round-5 chip batch 1: itemize the ~20 ms "misc copies/reshapes" bin.

VERDICT-r4 missing #3: the B=4096 step decomposition (BASELINE.md)
attributes ~20 ms to an un-itemized copies/reshapes residual — 8.6% of
the 233 ms step, the only bin without a named op and an argued floor.
/tmp did not survive the session boundary, so this captures a FRESH
trace at the shipped defaults and itemizes it in-process:

  1. one warm bench-equivalent step config (B=4096, bias-fused LRN +
     s2d relayout defaults), 2 warmup steps, 10 traced steps
     -> /tmp/trace_r5_base
  2. full per-op listing: every op >= 0.15 ms/step with its category,
     so the copy/reshape/fusion(other) bins resolve to NAMED ops
     (the round-2..4 method: trace -> name the op -> attack or argue
     a floor)
  3. jitter-segment micro-listing: ops whose name matches the input
     chain (one-hot dots / relayout / convert) for the gather-kernel
     baseline.

Run under tools/chipbatch.py (or standalone; takes one chip claim).
"""
import collections
import glob
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

B = 4096
TRACE_DIR = "/tmp/trace_r5_base"
NSTEPS = 10

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
rng = np.random.RandomState(5)
data = {
    "input": jnp.asarray(rng.randint(0, 256, (B, 256, 256, 3), np.uint8)),
    "labels": jnp.asarray(rng.randint(0, 1000, (B,), np.int32)),
}

t0 = time.perf_counter()
for _ in range(2):
    state, m = step(state, data)
float(np.asarray(m["loss"]).reshape(-1)[-1])
print(f"warmup (incl. compile): {time.perf_counter()-t0:.1f} s", flush=True)

with jax.profiler.trace(TRACE_DIR):
    t0 = time.perf_counter()
    for _ in range(NSTEPS):
        state, m = step(state, data)
    float(np.asarray(m["loss"]).reshape(-1)[-1])
    dt = (time.perf_counter() - t0) / NSTEPS
print(f"traced step: {dt*1e3:.2f} ms = {B/dt:.0f} img/s -> {TRACE_DIR}", flush=True)

# ---- in-process itemization ------------------------------------------
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

xs = glob.glob(TRACE_DIR + "/plugins/profile/*/*.xplane.pb")
sp = xplane_pb2.XSpace()
sp.ParseFromString(open(xs[0], "rb").read())


def cat(name):
    n = name.lower()
    if "custom-call" in name and ("jvp" in n or "lrn" in n or "tpu_custom_call" in n):
        return "pallas"
    if "convolution" in n or ("conv" in n and "fusion" in n):
        return "conv"
    if "select-and-scatter" in n:
        return "pool-bwd"
    if "reduce-window" in n:
        return "pool-fwd"
    if "copy" in n:
        return "copy"
    if "reshape" in n or "bitcast" in n or "transpose" in n:
        return "reshape/transpose"
    if (
        "dynamic-slice" in n or "while" in n or "reverse" in n or "iota" in n
        or "rng" in n or "threefry" in n
    ):
        return "jitter/rng"
    if "fusion" in n:
        return "fusion(other)"
    return "other"


for p in sp.planes:
    if p.name != "/device:TPU:0":
        continue
    md = p.event_metadata
    agg = collections.Counter()
    cnt = collections.Counter()
    for line in p.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = md[ev.metadata_id].name
            agg[name] += ev.duration_ps
            cnt[name] += 1
    total = sum(agg.values()) / 1e9 / NSTEPS
    print(f"device total: {total:.2f} ms/step", flush=True)
    bycat = collections.Counter()
    for name, dd in agg.items():
        bycat[cat(name)] += dd
    for c, dd in bycat.most_common():
        print(f"  {dd/1e9/NSTEPS:7.3f} ms/step  {c}", flush=True)
    print("\n=== FULL itemization: every op >= 0.15 ms/step ===", flush=True)
    listed = 0.0
    for name, dd in agg.most_common():
        ms = dd / 1e9 / NSTEPS
        if ms < 0.15:
            break
        listed += ms
        print(
            f"  {ms:7.3f} ms x{cnt[name]//NSTEPS:4d} [{cat(name):17s}] {name[:150]}",
            flush=True,
        )
    print(f"  (listed {listed:.2f} of {total:.2f} ms; rest is <0.15 ms ops)",
          flush=True)
    print("\n=== copy + reshape/transpose bins, EVERY op ===", flush=True)
    for name, dd in agg.most_common():
        if cat(name) not in ("copy", "reshape/transpose"):
            continue
        ms = dd / 1e9 / NSTEPS
        if ms < 0.01:
            break
        print(f"  {ms:7.3f} ms x{cnt[name]//NSTEPS:4d} [{cat(name):17s}] {name[:150]}",
              flush=True)

print("R5 CHIP BATCH 1 COMPLETE", flush=True)

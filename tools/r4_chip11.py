"""Round-4 chip batch 11: conv1 rate gap + the 8192 compile bisect.

Why: the fresh B=4096 trace (/tmp/trace_r4_bf16d) shows conv1 fwd
(fusion.364, 7.24 ms) and conv1 wgrad (fusion.363, 7.41 ms) running at
~119 TFLOP/s vs conv2's ~190 — and before the s2d-relayout default
flipped on, conv1's wgrad was a 1.9 ms fused reduce at 135 TFLOP/s at
B=2048 (~3.8 ms at 4096). Suspect: the relayout kernel's K-major
{2,0,1} output layout slows the conv even though the chain A/B (chip8)
showed s2d=1 winning net by 1.0 ms. If conv1 under s2d=0 runs ~4 ms
faster, the right fix is emitting the conv's preferred layout from the
kernel (round-5 work), worth ~4-5 ms on top of the chain savings.

Sequence:
  1. trace the full step with CONVNET_S2D_RELAYOUT=0 at B=4096
     -> /tmp/trace_r4_s2d0 (conv1 rows compared offline vs the s2d=1
     trace; also sanity-prints step time vs chip8's 236.50 ms)
  2. standalone conv1-geometry rate probes (fwd + wgrad) for the s2d
     form (57x57x48 -> 3x3x48x96) and variants (K=64 pad, Cout=128) —
     layout here is XLA's free choice, so ~190 TF/s standalone vs ~119
     in-graph fingers layout, not geometry
  3. chipless 8192 bisect: AOT-lower (a) the rnorm1 r2d LRN kernel
     alone at B=8192 — its flattened (290400, B) output is 2.379e9
     elements > 2^31, the suspected failure — (b) rnorm2's form
     (1.53e9, should pass), (c) the full step with
     CONVNET_LRN_BACKEND=xla (if THAT compiles, the LRN kernel is the
     8192 blocker, confirmed)

Run under tools/chipbatch.py.
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

# ---- 1. trace the s2d=0 step at B=4096 -------------------------------
os.environ["CONVNET_S2D_RELAYOUT"] = "0"
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
with jax.profiler.trace("/tmp/trace_r4_s2d0"):
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, data)
    float(np.asarray(m["loss"]).reshape(-1)[-1])
    dt = (time.perf_counter() - t0) / 10
print(f"s2d=0 step at B=4096: {dt*1e3:.2f} ms -> /tmp/trace_r4_s2d0", flush=True)
del os.environ["CONVNET_S2D_RELAYOUT"]
del state, data
jax.clear_caches()

# ---- 2. standalone conv1-geometry rate probes -------------------------
B = 4096
dn = jax.lax.conv_dimension_numbers((B, 57, 57, 48), (3, 3, 48, 96), ("NHWC", "HWIO", "NHWC"))


def conv_rate(tag, k_in, c_out, n=20):
    x = jnp.zeros((B, 57, 57, k_in), jnp.bfloat16)
    w = jnp.zeros((3, 3, k_in, c_out), jnp.bfloat16)
    ct = jnp.zeros((B, 55, 55, c_out), jnp.bfloat16)
    fwd = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.bfloat16,
        )
    )
    wgrad = jax.jit(
        lambda x, ct: jax.vjp(lambda w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.bfloat16,
        ), jnp.zeros((3, 3, k_in, c_out), jnp.bfloat16))[1](ct)[0]
    )
    flops = 2 * B * 55 * 55 * c_out * 9 * k_in
    for name, f, args in (("fwd", fwd, (x, w)), ("wgrad", wgrad, (x, ct))):
        try:
            r = f(*args)
            float(r.sum(dtype=jnp.float32))
            t0 = time.perf_counter()
            for _ in range(n):
                r = f(*args)
            float(r.sum(dtype=jnp.float32))
            ms = (time.perf_counter() - t0) / n * 1e3
            print(f"conv1-probe {tag:18s} {name:5s}: {ms:6.2f} ms  "
                  f"{flops/ms/1e9:6.1f} TFLOP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"conv1-probe {tag:18s} {name:5s}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


conv_rate("s2d form K=48", 48, 96)
conv_rate("K=64 pad", 64, 96)
conv_rate("Cout=128 pad", 48, 128)
jax.clear_caches()

# ---- 3. chipless 8192 bisect ------------------------------------------
from convnet_tpu.ops.lrn import response_norm_cross_map

for B8, c, hw, tag in ((8192, 96, 55, "rnorm1@8192 (2.38e9 el > 2^31)"),
                       (8192, 256, 27, "rnorm2@8192 (1.53e9 el)")):
    x = jnp.zeros((B8, hw, hw, c), jnp.bfloat16)
    t0 = time.perf_counter()
    try:
        jax.jit(
            lambda x: response_norm_cross_map(x, 5, 0.0001, 0.75)
        ).lower(x).compile()
        print(f"lower {tag}: COMPILE OK in {time.perf_counter()-t0:.0f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"lower {tag}: COMPILE FAILED in {time.perf_counter()-t0:.0f}s "
              f"{type(e).__name__}: {str(e)[:1200]}", flush=True)

for tag, env in (("full step B=8192 (known fail, capture error)", {}),
                 ("full step B=8192 LRN=xla", {"CONVNET_LRN_BACKEND": "xla"})):
    for k, v in env.items():
        os.environ[k] = v
    jax.clear_caches()
    t0 = time.perf_counter()
    try:
        step = make_train_step(graph, jitter)
        state = init_state(graph)
        d8 = {
            "input": jnp.zeros((8192, 256, 256, 3), jnp.uint8),
            "labels": jnp.zeros((8192,), jnp.int32),
        }
        jax.jit(step).lower(state, d8).compile()
        print(f"lower {tag}: COMPILE OK in {time.perf_counter()-t0:.0f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"lower {tag}: COMPILE FAILED in {time.perf_counter()-t0:.0f}s "
              f"{type(e).__name__}: {str(e)[:1200]}", flush=True)
    for k in env:
        del os.environ[k]

print("R4 CHIP BATCH 11 COMPLETE", flush=True)

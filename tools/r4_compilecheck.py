"""Round-4 chipless compile gate + cache warmer.

The s2d relayout kernel passed Python-side Mosaic lowering (round-4
fix) but crashed the BACKEND compiler on chip (remote_compile HTTP 500,
tpu_compile_helper exit 1) — an error class neither interpret mode nor
cross-platform lowering (tests/test_mosaic_lowering.py) can catch.
Compiles are chipless on this environment (HTTP AOT helper), so this
job burns compile time, not claim time:

  1. AOT-compiles the standalone relayout kernel at bench geometry for
     each in-VMEM transpose strategy (CONVNET_S2D_RELAYOUT_KFORM) and
     prints the FULL backend error for the ones that crash.
  2. Exports the first working form to later jobs via CHIPBATCH_SETENV.
  3. Pre-compiles the full train-step configs r4_chip7.py will A/B
     (bias-fused / s2d / combined at batch 2048) so the measurement job
     spends its chip claim measuring, not compiling.

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
here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
print(f"platform={jax.devices()[0]}", flush=True)

from convnet_tpu.ops.s2d_relayout import relayout_geometry, s2d_relayout

B = 2048
STRIDE, P_OUT, P_PAD = 4, *relayout_geometry(224, 11, 4)


def try_kform(kform: str) -> bool:
    os.environ["CONVNET_S2D_RELAYOUT_KFORM"] = kform
    z = jnp.zeros((B, 3, STRIDE * P_PAD, STRIDE * P_PAD), jnp.bfloat16)
    t0 = time.perf_counter()
    try:
        jax.jit(
            lambda z: s2d_relayout(z, STRIDE, P_OUT, P_PAD, False)
        ).lower(z).compile()
        print(f"kform={kform}: COMPILE OK in {time.perf_counter()-t0:.0f}s", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 - report everything, keep going
        print(
            f"kform={kform}: COMPILE FAILED in {time.perf_counter()-t0:.0f}s "
            f"{type(e).__name__}:\n{str(e)[:3000]}",
            flush=True,
        )
        return False


# "3d" is excluded by default: its backend compile HANGS (~2630 s
# before dying, measured 08:05 2026-08-18 — not the ~110 s crash the
# bisection saw) and one hung probe stalls the whole gate. Re-probe a
# future toolchain with CONVNET_S2D_PROBE_3D=1.
forms = ("2d", "mxu") + (
    ("3d",) if os.environ.get("CONVNET_S2D_PROBE_3D") == "1" else ()
)
winner = None
for kform in forms:
    if try_kform(kform) and winner is None:
        winner = kform
if winner is None:
    print("s2d relayout: NO kform compiles — A/B will skip it", flush=True)
else:
    print(f"CHIPBATCH_SETENV CONVNET_S2D_RELAYOUT_KFORM={winner}", flush=True)
    os.environ["CONVNET_S2D_RELAYOUT_KFORM"] = winner

# ---- pre-compile the full-step A/B configs (warms the persistent cache)
from convnet_tpu import config
from convnet_tpu.data.jitter import JitterSpec
from convnet_tpu.graph import build_graph
from convnet_tpu.trainer import init_state, make_train_step

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


def warm(tag, **env):
    for k, v in env.items():
        os.environ[k] = v
    jax.clear_caches()
    t0 = time.perf_counter()
    compiled = None
    try:
        step = make_train_step(graph, jitter)
        state = init_state(graph)
        data = {
            "input": jnp.zeros((B, 256, 256, 3), jnp.uint8),
            "labels": jnp.zeros((B,), jnp.int32),
        }
        compiled = jax.jit(step).lower(state, data).compile()
        print(f"warm {tag}: OK in {time.perf_counter()-t0:.0f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(
            f"warm {tag}: FAILED in {time.perf_counter()-t0:.0f}s "
            f"{type(e).__name__}: {str(e)[:1500]}",
            flush=True,
        )
    for k in env:
        del os.environ[k]
    return compiled


base_exe = warm("base")
# settle what the 9.6 ms `fusion.105` in the B=2048 trace really is
# (suspected: conv2's dgrad, misclassified as reshape/transpose by
# traceparse) — dump the optimized HLO and print its full definition
if base_exe is not None:
    try:
        txt = base_exe.as_text()
        with open("/tmp/hlo_base_b2048.txt", "w") as f:
            f.write(txt)
        import re

        for name in ("fusion.105", "fusion.348", "fusion.346", "fusion.102"):
            m = re.search(
                rf"(?s)%{re.escape(name)} =.*?(?=\n  %|\n\}})", txt
            )
            print(
                f"--- {name}: "
                + (m.group(0)[:800] if m else "NOT FOUND"),
                flush=True,
            )
        print("full HLO -> /tmp/hlo_base_b2048.txt", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"hlo dump failed: {type(e).__name__}: {str(e)[:300]}", flush=True)
warm("bias", CONVNET_LRN_BIAS_FUSED="1")
if winner is not None:
    warm("s2d", CONVNET_S2D_RELAYOUT="1")
    warm("bias+s2d", CONVNET_LRN_BIAS_FUSED="1", CONVNET_S2D_RELAYOUT="1")

print("R4 COMPILE CHECK COMPLETE", flush=True)

"""Round-4 chip batch 7: re-A/B the two factors whose kernels failed on
chip in batch 5 (now fixed: the bias-gradient accumulator blocks, and
the relayout transpose form picked by tools/r4_compilecheck.py), at the
new batch-2048 operating point, plus a 4096 probe and the round's final
trace.

Sequence (greedy keep-if-wins from the measured base):
  0. On-chip numerics gates: s2d relayout bit-exact vs the XLA chain;
     bias-fused LRN fwd/bwd vs the composed fallback (compiled Mosaic
     has disagreed with interpret mode before — never A/B an unvalidated
     kernel form).
  1. base (B=2048, unroll=1)          — expect ~121.3 ms (chip batch 5)
  2. + CONVNET_LRN_BIAS_FUSED=1
  3. + CONVNET_S2D_RELAYOUT=1 (kform from env; skipped if compilecheck
     found no working form)
  4. batch 4096 at the winning config (2048 beat 1024 — check the trend)
  5. jax.profiler trace of the winner -> /tmp/trace_r4_final

Run under tools/chipbatch.py (after tools/r4_compilecheck.py so the
compile cache is hot and CONVNET_S2D_RELAYOUT_KFORM is set).
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
    "env: kform=%s" % os.environ.get("CONVNET_S2D_RELAYOUT_KFORM", "<default>"),
    flush=True,
)

# --- 0a. s2d relayout numerics on chip: bit-exact vs the XLA chain ---------
# mirrors tests/test_s2d_relayout.py::test_jitter_s2d_bit_exact_vs_xla_chain
# but at full AlexNet geometry and COMPILED (the CPU suite interprets)
from convnet_tpu.data.jitter import JitterSpec as _JS, jitter_batch, sample_crop_flip
from convnet_tpu.graph import conv_out_size
from convnet_tpu.ops.conv import ceil_mode_padding
from convnet_tpu.ops.s2d_relayout import jitter_s2d

s2d_ok = False
try:
    rng = np.random.RandomState(3)
    raw = jnp.asarray(rng.randint(0, 256, (128, 256, 256, 3), np.uint8))
    key = jax.random.PRNGKey(5)
    mean = np.full((3,), 0.45, np.float32)
    KR, ST, CROP = 11, 4, 224

    def _xla_s2d_view(x4):
        b, h, w, cin = x4.shape
        out = conv_out_size(h, KR, ST, 0)
        khp = -(-KR // ST) * ST
        tgt = (out - 1) * ST + khp
        pad_h = ceil_mode_padding(h, KR, ST, 0)
        x4 = jnp.pad(x4, ((0, 0), (pad_h[0], tgt - h), (pad_h[0], tgt - w), (0, 0)))
        return (
            x4.reshape(b, tgt // ST, ST, tgt // ST, ST, cin)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, tgt // ST, tgt // ST, ST * ST * cin)
        )

    @jax.jit
    def both(raw, key):
        oy, ox, flips = sample_crop_flip(key, 128, 256, 256, CROP, True, True)
        s2d = jitter_s2d(
            raw, oy, ox, flips, crop=CROP, kernel=KR, stride=ST,
            scale=1 / 255, mean=mean,
        )
        spec = _JS(image_size=CROP, can_translate=True, can_flip=True, scale=1 / 255)
        xj = jitter_batch(raw, spec, key, True, mean=mean)
        return s2d.x, _xla_s2d_view(xj.astype(jnp.bfloat16))

    got, want = both(raw, key)
    diff = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    s2d_ok = diff == 0.0
    print(f"s2d numerics on chip: max abs diff = {diff} (exact={s2d_ok})", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"s2d numerics: FAILED {type(e).__name__}: {str(e)[:500]}", flush=True)

# --- 0b. bias-fused LRN numerics on chip vs the composed fallback ----------
from convnet_tpu.ops import lrn

bias_ok = False
try:
    x = jnp.asarray(
        np.random.RandomState(4).randn(128, 55, 55, 96), jnp.bfloat16
    )
    bias = jnp.asarray(np.random.RandomState(5).randn(96) * 0.1, jnp.float32)
    g = jnp.ones((128, 55, 55, 96), jnp.bfloat16)

    def run(backend):
        def f(x, b):
            y = lrn.response_norm_cross_map_bias(
                x, b, 0.0001, 0.75, 0.052, False, backend, True
            )
            return jnp.sum((y.astype(jnp.float32)) ** 2)

        v, (dx, db) = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))(x, bias)
        return float(v), np.asarray(dx, np.float32), np.asarray(db)

    v1, dx1, db1 = run("pallas")
    v2, dx2, db2 = run("xla")
    rel = abs(v1 - v2) / max(abs(v2), 1e-9)
    dxrel = float(np.max(np.abs(dx1 - dx2)) / (np.max(np.abs(dx2)) + 1e-9))
    dbrel = float(np.max(np.abs(db1 - db2)) / (np.max(np.abs(db2)) + 1e-9))
    # tolerances follow tests/test_lrn_bias.py's bf16 scale-normalized
    # max-error bars (2e-2 on grads, 1e-2 on db), with headroom for the
    # different fwd value reduction
    bias_ok = rel < 1e-2 and dxrel < 5e-2 and dbrel < 2e-2
    print(
        f"bias-fused numerics on chip: y^2 rel={rel:.2e} dx rel={dxrel:.2e} "
        f"db rel={dbrel:.2e} (ok={bias_ok})",
        flush=True,
    )
except Exception as e:  # noqa: BLE001
    print(f"bias numerics: FAILED {type(e).__name__}: {str(e)[:500]}", flush=True)

# --- the greedy A/B ----------------------------------------------------------
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


def measure(tag, B=2048, n=24):
    jax.clear_caches()
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
    print(f"{tag:46s} {dt*1e3:7.2f} ms/step  {B/dt:8.0f} img/s", flush=True)
    return dt


best = measure("base (B=2048)")


def ab_factor(env, tag, gate=True):
    global best
    if not gate:
        print(f"{tag}: SKIPPED (numerics/compile gate)", flush=True)
        return
    os.environ[env] = "1"
    try:
        dt = measure(f"+ {env}=1 ({tag})")
    except Exception as e:  # noqa: BLE001
        del os.environ[env]
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:400]}", flush=True)
        return
    if dt < best:
        best = dt
        print(f"{tag}: KEPT", flush=True)
        print(f"CHIPBATCH_SETENV {env}=1", flush=True)
    else:
        del os.environ[env]
        print(f"{tag}: dropped", flush=True)


ab_factor("CONVNET_LRN_BIAS_FUSED", "lrn_bias", gate=bias_ok)
ab_factor("CONVNET_S2D_RELAYOUT", "s2d_relayout", gate=s2d_ok)

dt4096 = None
try:
    dt4096 = measure("batch 4096", B=4096, n=12)
except Exception as e:  # noqa: BLE001
    print(f"batch 4096: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
B_final, dt_final = 2048, best
if dt4096 is not None and dt4096 / 2 < best:
    B_final, dt_final = 4096, dt4096
print(
    f"final: B={B_final} bias={os.environ.get('CONVNET_LRN_BIAS_FUSED', '0')} "
    f"s2d={os.environ.get('CONVNET_S2D_RELAYOUT', '0')} "
    f"-> {B_final/dt_final:.0f} img/s",
    flush=True,
)
if B_final != 2048:
    print(f"CHIPBATCH_SETENV BENCH_BATCH={B_final}", flush=True)

# --- final trace of the winner ------------------------------------------------
step = make_train_step(graph, jitter)
state = init_state(graph)
data = {
    "input": jnp.asarray(
        np.random.RandomState(9).randint(0, 256, (B_final, 256, 256, 3), np.uint8)
    ),
    "labels": jnp.asarray(np.random.RandomState(10).randint(0, 1000, (B_final,), np.int32)),
}
for _ in range(2):
    state, m = step(state, data)
float(np.asarray(m["loss"]).reshape(-1)[-1])
with jax.profiler.trace("/tmp/trace_r4_final"):
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, data)
    float(np.asarray(m["loss"]).reshape(-1)[-1])
    dt = (time.perf_counter() - t0) / 10
print(f"traced step: {dt*1e3:.2f} ms ({B_final/dt:.0f} img/s) -> /tmp/trace_r4_final", flush=True)
print("R4 CHIP BATCH 7 COMPLETE", flush=True)

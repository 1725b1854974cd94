"""Round-3 chip batch 1: hardware-validate the r2d LRN form and the
fused prologue, then A/B the full train step.

Order (quick numerics first, long A/Bs last; ONE process so a single
chip claim serves everything — see docs/performance.md traps):
  1. r2d fwd/bwd numerics vs XLA reference at B=128 (lane-aligned).
  2. fused prologue numerics vs NumPy oracle at bench geometry (B=128).
  3. Full-step A/B at batch 1024: t-form/no-prologue (round-2 config),
     auto(r2d)/no-prologue, auto(r2d)+prologue.
"""
import functools
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
from convnet_tpu.trainer import init_state, make_train_step

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
print(f"platform={jax.devices()[0]}", flush=True)

# --- 1. r2d numerics on chip ------------------------------------------------
from convnet_tpu.ops import lrn as lrn_mod

rng = np.random.RandomState(1)
x = jnp.asarray(rng.randn(128, 7, 7, 96).astype(np.float32))
g = jnp.asarray(rng.randn(128, 7, 7, 96).astype(np.float32))
args = (0.001, 0.75, 5.0 / 96, False, "pallas")

os.environ["CONVNET_LRN_FORM"] = "r2d"
y, vjp = jax.vjp(lambda a: lrn_mod.response_norm_cross_map(a, *args), x)
(dx,) = vjp(g)
del os.environ["CONVNET_LRN_FORM"]
want = lrn_mod.response_norm_reference(x, 0.001, 0.75, 5.0 / 96)
want_dx = jax.grad(
    lambda a: (lrn_mod.response_norm_reference(a, 0.001, 0.75, 5.0 / 96) * g).sum()
)(x)
dy = float(jnp.max(jnp.abs(y - want)))
ddx = float(jnp.max(jnp.abs(dx - want_dx)))
print(f"r2d ON CHIP fwd maxdiff={dy:.2e} bwd maxdiff={ddx:.2e}", flush=True)
assert dy < 1e-4 and ddx < 1e-3, "r2d hardware numerics FAIL"

# fused-relu variant
os.environ["CONVNET_LRN_FORM"] = "r2d"
yf, vjp_f = jax.vjp(lambda a: lrn_mod.response_norm_cross_map(a, *args, fuse_relu=True), x)
(dxf,) = vjp_f(g)
del os.environ["CONVNET_LRN_FORM"]
yc = lrn_mod.response_norm_reference(jnp.maximum(x, 0.0), 0.001, 0.75, 5.0 / 96)
dxc = jax.grad(
    lambda a: (lrn_mod.response_norm_reference(jnp.maximum(a, 0.0), 0.001, 0.75, 5.0 / 96) * g).sum()
)(x)
dyf = float(jnp.max(jnp.abs(yf - yc)))
ddxf = float(jnp.max(jnp.abs(dxf - dxc)))
print(f"r2d+relu ON CHIP fwd maxdiff={dyf:.2e} bwd maxdiff={ddxf:.2e}", flush=True)
assert dyf < 1e-4 and ddxf < 1e-3, "r2d fused-relu hardware numerics FAIL"

# --- 2. prologue numerics on chip at bench geometry -------------------------
from convnet_tpu.ops.prologue import fused_crop_s2d, s2d_geometry

B0 = 128
xr = rng.randint(0, 256, (B0, 256, 256, 3), dtype=np.uint8)
key = jax.random.PRNGKey(7)
oy, ox, flips = sample_crop_flip(key, B0, 256, 256, 224, True, True)
mean = np.full((3,), 0.45, np.float32)
got = fused_crop_s2d(
    jnp.asarray(xr), oy, ox, flips,
    crop=224, kernel=11, stride=4, scale=1 / 255, mean=mean,
)
gx = np.asarray(got.x, np.float32)
oy_h, ox_h, fl_h = np.asarray(oy), np.asarray(ox), np.asarray(flips)
_, _, tgt, p = s2d_geometry(224, 11, 4)
err = 0.0
for i in range(0, B0, 17):  # spot-check a spread of images
    img = xr[i, oy_h[i]:oy_h[i]+224, ox_h[i]:ox_h[i]+224, :].astype(np.float32)
    if fl_h[i]:
        img = img[:, ::-1, :]
    img = img / 255.0 - 0.45
    pad = np.zeros((tgt, tgt, 3), np.float32)
    pad[:224, :224] = img
    v = pad.reshape(p, 4, p, 4, 3).transpose(0, 2, 1, 3, 4).reshape(p, p, -1)
    err = max(err, float(np.max(np.abs(gx[i] - v))))
print(f"prologue ON CHIP maxdiff vs numpy={err:.2e} out_shape={gx.shape}", flush=True)
assert err < 5e-3, "prologue hardware numerics FAIL"  # bf16 output rounding

# --- 3. full-step A/B at batch 1024 ----------------------------------------
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

@jax.jit
def make_data(key):
    ki, kl = jax.random.split(key)
    return {
        "input": jax.random.randint(ki, (B, 256, 256, 3), 0, 256, dtype=jnp.int32).astype(jnp.uint8),
        "labels": jax.random.randint(kl, (B,), 0, 1000, dtype=jnp.int32),
    }

data = make_data(jax.random.PRNGKey(0))
float(jnp.sum(data["labels"]))

def run(tag, form, prologue, n=8):
    os.environ["CONVNET_LRN_FORM"] = form
    os.environ["CONVNET_FUSED_PROLOGUE"] = prologue
    step = make_train_step(graph, jitter)
    state = init_state(graph)
    t_c = time.perf_counter()
    state, m = step(state, data)
    loss0 = float(m["loss"])
    compile_s = time.perf_counter() - t_c
    state, m = step(state, data)  # warm
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, data)
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(
        f"{tag:44s} {dt*1e3:8.2f} ms/step  {B/dt:9.0f} img/s  "
        f"loss={loss:.4f} (compile {compile_s:.0f}s)",
        flush=True,
    )
    assert np.isfinite(loss)
    return dt

t_old = run("t-form, no prologue (round-2 config)", "t", "0")
t_r2d = run("r2d (auto), no prologue", "auto", "0")
t_all = run("r2d (auto) + fused prologue", "auto", "1")
print(
    f"summary: r2d saves {1e3*(t_old-t_r2d):.2f} ms, prologue saves "
    f"{1e3*(t_r2d-t_all):.2f} ms, total {1e3*(t_old-t_all):.2f} ms "
    f"({B/t_all:.0f} img/s)",
    flush=True,
)
os.environ.pop("CONVNET_LRN_FORM", None)
os.environ.pop("CONVNET_FUSED_PROLOGUE", None)
print("R3 CHIP BATCH 1 COMPLETE", flush=True)

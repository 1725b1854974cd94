"""Round-4 chip batch 6: serving-path time attribution.

chip4 measured extract-fc7 warm at 18 rows/s (116.7 s / 2048 rows =
~14 s per 256-row batch) and bench rawcache at 93 img/s — both far
below wire arithmetic (38.5 MB h2d at ~46 MB/s ~= 0.9 s/batch). This
probe splits a serving batch into its phases with explicit syncs so
the missing ~13 s/batch gets a name:

  1. h2d: jax.device_put vs passing numpy straight as a jit argument
     (the tunnel may treat the two paths differently).
  2. d2h: np.asarray of a COMPUTED activation vs jnp.zeros (a
     compressing tunnel would make the zeros probe optimistic).
  3. fwd compute alone: device-resident input, synced and pipelined.
  4. The extract loop replicated with per-phase syncs.
  5. Pipelined wire-format predictor (2-deep) = the throughput a
     latency-tolerant serving caller actually gets.

Run under tools/chipbatch.py (prints CHIP_LIVE via the child wrapper).
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


def sync(x):
    """block_until_ready is a no-op on axon; force a tiny readback."""
    float(jnp.sum(jax.tree.leaves(x)[0][..., :1].astype(jnp.float32)))


rng = np.random.RandomState(0)
xb = rng.randint(0, 256, (256, 224, 224, 3), dtype=np.uint8)

# --- 1. h2d: device_put vs jit-arg ------------------------------------------
dev = jax.devices()[0]
x = jax.device_put(xb, dev)
sync(x)
t0 = time.perf_counter()
for _ in range(4):
    x = jax.device_put(xb, dev)
    sync(x)
dt = (time.perf_counter() - t0) / 4
print(f"h2d device_put 38.5MB u8: {dt*1e3:8.1f} ms  {xb.nbytes/dt/1e6:6.1f} MB/s", flush=True)


@jax.jit
def ident(a):
    return a.astype(jnp.float32).sum()


float(ident(xb))
t0 = time.perf_counter()
for _ in range(4):
    float(ident(xb))
dt = (time.perf_counter() - t0) / 4
print(f"h2d jit-arg    38.5MB u8: {dt*1e3:8.1f} ms  {xb.nbytes/dt/1e6:6.1f} MB/s", flush=True)

# --- 2. d2h computed vs zeros -------------------------------------------------
fc = jax.random.normal(jax.random.PRNGKey(0), (256, 4096), jnp.float32)
sync(fc)
for tag, arr in (("computed-noise", fc), ("zeros", jnp.zeros((256, 4096), jnp.float32))):
    sync(arr)
    np.asarray(arr)
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(arr)
    dt = (time.perf_counter() - t0) / 4
    print(f"d2h 4MB f32 {tag:15s}: {dt*1e3:8.1f} ms  {arr.nbytes/dt/1e6:6.1f} MB/s", flush=True)

# --- 3. fwd compute alone -----------------------------------------------------
from convnet_tpu import config, model as model_lib
from convnet_tpu.data.jitter import JitterSpec
from convnet_tpu.graph import build_graph
from convnet_tpu.trainer import make_forward

model = config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
model.parallel.data = 1
model.parallel.model = 1
graph = build_graph(model, {"input": 224})
params = model_lib.init_params(graph, seed=0)
params = jax.device_put(params)
jit_map = {
    "input": (
        JitterSpec(image_size=224, scale=1 / 255),
        np.full((3,), 0.45, np.float32),
        None,
    )
}
fwd = make_forward(graph, ["fc7"], jit_map)
xd = jax.device_put({"input": jnp.asarray(xb)})
out = fwd(params, xd)
sync(out)
t0 = time.perf_counter()
for _ in range(8):
    out = fwd(params, xd)
    sync(out)
dt = (time.perf_counter() - t0) / 8
print(f"fwd b256 synced each:      {dt*1e3:8.1f} ms/call", flush=True)
t0 = time.perf_counter()
for _ in range(8):
    out = fwd(params, xd)
sync(out)
dt = (time.perf_counter() - t0) / 8
print(f"fwd b256 pipelined:        {dt*1e3:8.1f} ms/call", flush=True)

# --- 4. extract loop, per-phase synced ----------------------------------------
import tempfile

from convnet_tpu.data.native import write_raw_cache
from convnet_tpu.data.datahandler import DataHandler
from convnet_tpu import config as cfg_mod

td = tempfile.mkdtemp()
n_rows = 2048
write_raw_cache(
    os.path.join(td, "img.cache"),
    rng.randint(0, 256, (n_rows, 224, 224, 3), dtype=np.uint8),
)
data_pbtxt = os.path.join(td, "data.pbtxt")
with open(data_pbtxt, "w") as f:
    f.write(
        f"""name: "probe"
batch_size: 256
data_config {{
  layer_name: "input"
  data_type: RAW_CACHE
  file_pattern: "{td}/img.cache"
  image_size: 224
  num_colors: 3
  scale: 0.00392156862
}}
"""
    )
data_cfg = cfg_mod.read_dataset_config(data_pbtxt)
handler = DataHandler(data_cfg, batch_size=256, randomize=False)
fwd2 = make_forward(graph, ["fc7"], handler.jitter_specs())
t = {"gather": 0.0, "h2d": 0.0, "fwd": 0.0, "d2h": 0.0}
nb = 0
# warm the compile outside the timed epoch
b0, _ = next(handler.iter_epoch())
o0 = fwd2(params, jax.device_put(b0))
sync(o0)
for batch, valid in handler.iter_epoch():
    nb += 1
    t0 = time.perf_counter()
    bd = jax.device_put(batch)
    sync(bd)
    t["h2d"] += time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fwd2(params, bd)
    sync(out)
    t["fwd"] += time.perf_counter() - t0
    t0 = time.perf_counter()
    acts = jax.device_get(out)
    t["d2h"] += time.perf_counter() - t0
print(
    f"extract phases over {nb} synced batches: "
    + "  ".join(f"{k}={v:6.2f}s" for k, v in t.items()),
    flush=True,
)
handler.close()

# --- 5. pipelined wire-format predictor ---------------------------------------
from convnet_tpu.predictor import Predictor

pred = Predictor(
    graph, params, batch_size=64, jitter=jit_map, raw_size=256,
    input_dtype=np.uint8,
)
wire = rng.randint(0, 256, (64, 256, 256, 3), dtype=np.uint8)
o = pred({"input": wire})  # warm
n = 32
for depth, tag in ((1, "serial"), (2, "2-deep")):
    pending = []
    t0 = time.perf_counter()
    for _ in range(n):
        o = pred._compiled(pred.params, {"input": jnp.asarray(wire)})
        pending.append(o)
        if len(pending) >= depth:
            jax.tree.map(np.asarray, pending.pop(0))
    for o in pending:
        jax.tree.map(np.asarray, o)
    dt = (time.perf_counter() - t0) / n
    print(
        f"predictor b=64 wire {tag:7s}: {dt*1e3:8.2f} ms/call  {64/dt:7.0f} img/s",
        flush=True,
    )

print("R4 CHIP BATCH 6 COMPLETE", flush=True)

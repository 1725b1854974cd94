"""TPU-vs-CPU numerics diff of the SHIPPED bf16 program (hardware suite).

The grad checker validates f32/x64 on CPU; this test bounds the bf16
chain the bench actually ships, on the backend that runs it: the same
AlexNet graph + params + batch is evaluated on the real chip (compiled
Pallas kernels, MXU bf16 passes) and on CPU in f32 (the numerics
reference), and every layer's activation, the loss, and every edge's
gradient are compared. Catches kernel miscompiles and layout bugs that
interpret-mode CPU tests cannot (the t-form partial-lane bug class).

Runs only under `make test-tpu` (CONVNET_TEST_TPU=1); the CPU side is
computed in a subprocess because a process pinned to the axon platform
cannot also build CPU executables for the same program reliably.

North-star parity bar: BASELINE.json "activations match within float
tolerance" — this is the offline half (chip vs our own f32 chain).
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("CONVNET_TEST_TPU") != "1",
    reason="hardware suite only (make test-tpu)",
)

_SIZE = 67  # smallest size where every AlexNet conv/pool keeps positive extent
_BATCH = 128  # lane-aligned: engages the same kernel forms as the bench

_CPU_SCRIPT = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, {repo!r})
from convnet_tpu import config, model as model_lib
from convnet_tpu.graph import build_graph

model = config.read_model({model_path!r})
model.parallel.data = 1
model.parallel.model = 1
graph = build_graph(model, {{"input": {size}}})
params = model_lib.init_params(graph, seed=0)
rng = np.random.RandomState(0)
batch = {{
    "input": jnp.asarray(rng.rand({batch}, {size}, {size}, 3).astype(np.float32) - 0.45),
    "labels": jnp.asarray(rng.randint(0, 1000, {batch}).astype(np.int32)),
}}
# f32 reference chain: same graph, full-precision compute
model32 = config.read_model({model_path!r})
model32.compute_dtype = ""
model32.activation_dtype = ""
model32.parallel.data = 1
model32.parallel.model = 1
g32 = build_graph(model32, {{"input": {size}}})
acts = model_lib.apply_fn(g32, params, batch, train=False)
loss, _ = model_lib.loss_fn(g32, params, batch, train=False)
grads = jax.grad(lambda p: model_lib.loss_fn(g32, p, batch, train=False)[0])(params)
out = {{"loss": np.float32(loss)}}
for k, v in acts.items():
    out["act_" + k] = np.asarray(v, np.float32)
for e, leaves in grads.items():
    out["gw_" + e] = np.asarray(leaves["w"], np.float32)
np.savez({out_path!r}, **out)
print("CPU reference written")
"""


def _rel_l2(a, b):
    d = np.linalg.norm((a - b).ravel())
    n = np.linalg.norm(b.ravel())
    return d / max(n, 1e-12)


def test_shipped_bf16_program_matches_cpu_f32():
    import jax
    import jax.numpy as jnp

    from convnet_tpu import config, model as model_lib
    from convnet_tpu.graph import build_graph

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model_path = os.path.join(here, "examples/imagenet/alexnet.pbtxt")

    with tempfile.TemporaryDirectory() as td:
        out_path = os.path.join(td, "cpu_ref.npz")
        script = _CPU_SCRIPT.format(
            repo=here, model_path=model_path, size=_SIZE, batch=_BATCH,
            out_path=out_path,
        )
        env = dict(os.environ)
        env.pop("CONVNET_TEST_TPU", None)
        r = subprocess.run(
            [sys.executable, "-c", script], env=env, capture_output=True,
            text=True, timeout=1200,
        )
        assert r.returncode == 0, f"CPU reference failed:\n{r.stderr[-2000:]}"
        ref = dict(np.load(out_path))

    # chip side: the SHIPPED bf16 graph
    model = config.read_model(model_path)
    model.parallel.data = 1
    model.parallel.model = 1
    graph = build_graph(model, {"input": _SIZE})
    assert graph.compute_dtype == "bfloat16", "alexnet.pbtxt no longer ships bf16?"
    params = model_lib.init_params(graph, seed=0)
    rng = np.random.RandomState(0)
    batch = {
        "input": jnp.asarray(rng.rand(_BATCH, _SIZE, _SIZE, 3).astype(np.float32) - 0.45),
        "labels": jnp.asarray(rng.randint(0, 1000, _BATCH).astype(np.int32)),
    }
    acts = jax.device_get(model_lib.apply_fn(graph, params, batch, train=False))
    loss, _ = model_lib.loss_fn(graph, params, batch, train=False)
    loss = float(loss)
    grads = jax.device_get(
        jax.jit(jax.grad(lambda p: model_lib.loss_fn(graph, p, batch, train=False)[0]))(params)
    )

    report = {}
    for k in sorted(acts):
        rk = "act_" + k
        if rk in ref:
            report[k] = _rel_l2(np.asarray(acts[k], np.float32), ref[rk])
    print("per-layer rel-L2 (chip bf16 vs CPU f32):")
    for k, v in report.items():
        print(f"  {k:12s} {v:.5f}")
    ref_loss = float(ref["loss"])
    print(f"loss: chip {loss:.6f} vs cpu {ref_loss:.6f}")

    # bf16 has ~2-3 significant decimal digits; drift accumulates down
    # the 8-layer chain. 3% rel-L2 is ~4x the observed r2 numbers and
    # far below any miscompile signature (those show 30%+ or NaN).
    for k, v in report.items():
        assert v < 0.03, f"layer {k}: rel-L2 {v:.4f} vs CPU f32"
    assert abs(loss - ref_loss) / abs(ref_loss) < 0.01

    cos_report = {}
    for e in grads:
        rk = "gw_" + e
        a = np.asarray(grads[e]["w"], np.float32).ravel()
        b = ref[rk].ravel()
        cos = float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12))
        cos_report[e] = cos
    print("per-edge grad cosine (chip bf16 vs CPU f32):")
    for e, c in cos_report.items():
        print(f"  {e:16s} {c:.5f}")
    for e, c in cos_report.items():
        assert c > 0.99, f"edge {e}: grad cosine {c:.4f}"

"""TPU performance sweep: batch size x dtype x LRN backend for the
headline AlexNet train step. Run on the real chip to pick bench.py's
configuration; prints one JSON line per variant.

    python tools/tpu_sweep.py [--steps 20] [--batches 512,1024,2048]

Round-2 sweep results (v5e-1, bf16): 13633@512, 14319@1024 (winner),
14294@2048 after the per-C LRN form + fused-ReLU kernels. Other knobs
worth sweeping on new hardware: CONVNET_LRN_BACKEND / CONVNET_LRN_FORM
/ CONVNET_DROPOUT_BACKEND (set in the environment before launching).
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_variant(batch, dtype, steps):
    import jax

    from convnet_tpu import config
    from convnet_tpu.data.jitter import JitterSpec
    from convnet_tpu.graph import build_graph
    from convnet_tpu.trainer import init_state, make_train_step
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
    model.parallel.data = 1
    model.parallel.model = 1
    model.compute_dtype = dtype
    model.activation_dtype = "bfloat16" if dtype == "bfloat16" else ""
    graph = build_graph(model)
    jitter = {
        "input": (
            JitterSpec(image_size=224, can_translate=True, can_flip=True, scale=1 / 255),
            np.full((3,), 0.45, np.float32),
            None,
        )
    }
    step = make_train_step(graph, jitter)
    state = init_state(graph)
    rng = np.random.RandomState(0)
    # on-device data: shipping ~300 MB through the tunnel dominates
    # sweep wall time (same rationale as bench.py)
    import jax.numpy as jnp

    @jax.jit
    def make_data(key):
        ki, kl = jax.random.split(key)
        return {
            "input": jax.random.randint(
                ki, (batch, 256, 256, 3), 0, 256, dtype=jnp.int32
            ).astype(jnp.uint8),
            "labels": jax.random.randint(kl, (batch,), 0, 1000, dtype=jnp.int32),
        }

    data = make_data(jax.random.PRNGKey(0))
    for _ in range(3):
        state, m = step(state, data)
    float(m["loss"])  # real sync (axon block_until_ready is a no-op)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, data)
    float(m["loss"])
    dt = time.perf_counter() - t0
    del state, data
    return {
        "batch": batch,
        "dtype": dtype,
        "ms_per_step": round(dt / steps * 1000, 2),
        "images_per_sec": round(batch * steps / dt, 1),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batches", default="512,1024,2048")
    p.add_argument("--dtypes", default="bfloat16,float32")
    args = p.parse_args()
    for batch, dtype in itertools.product(
        [int(b) for b in args.batches.split(",")], args.dtypes.split(",")
    ):
        try:
            print(json.dumps(time_variant(batch, dtype, args.steps)), flush=True)
        except Exception as e:  # OOM etc.
            print(json.dumps({"batch": batch, "dtype": dtype, "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()

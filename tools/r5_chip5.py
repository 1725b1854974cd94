"""Round-5 refresh of the SECONDARY headline metrics at shipped defaults.

The BASELINE.md rows for AlexNet inference (40,950 img/s), CIFAR-10
step time (5.6 ms @256) and aug-pipeline MB/s (8,828) date from round 2
— before the r2d LRN kernel forms, the serving s2d center-crop
prologue, and the cmajor einsum default. One ordered chip process
re-measures all three with today's defaults so the doc numbers describe
the shipped code. Run in background, never killed mid-compile:

    nohup python tools/r5_chip5.py > /tmp/r5_chip5.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("BENCH_DEBUG_LOG", "/tmp/r5_chip5_debug.log")


def bench_alexnet_inference(batch: int, steps: int = 30):
    """AOT-style jit'd forward incl. the on-device center-crop+normalize
    serving prologue (the s2d relayout eval path on TPU), bf16, fed a
    device-resident uint8 raw batch — the round-2 measurement's setup
    (BASELINE.md round-2 table) at round-5 defaults."""
    import jax
    import jax.numpy as jnp

    from convnet_tpu import config
    from convnet_tpu.data.jitter import JitterSpec
    from convnet_tpu.graph import build_graph
    from convnet_tpu.model import init_params
    from convnet_tpu.trainer import make_forward

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
    model.parallel.data = 1
    model.parallel.model = 1
    size, raw = 224, 256
    graph = build_graph(model, {"input": size})
    jitter = {
        "input": (
            JitterSpec(image_size=size, can_translate=False, can_flip=False,
                       scale=1 / 255),
            np.full((3,), 0.45, np.float32),
            None,
        )
    }
    fwd = make_forward(graph, ["output"], jitter)  # already jit'd
    params = init_params(graph)

    @jax.jit
    def make_data(key):
        return {
            "input": jax.random.randint(
                key, (batch, raw, raw, 3), 0, 256, dtype=jnp.int32
            ).astype(jnp.uint8)
        }

    data = make_data(jax.random.PRNGKey(0))
    # warm (compile) + sync via float() (block_until_ready is a no-op here)
    out = fwd(params, data)
    float(jnp.sum(out["output"]))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(params, data)
    float(jnp.sum(out["output"]))
    dt = time.perf_counter() - t0
    ms = dt / steps * 1e3
    return {
        "metric": "alexnet_infer_images_per_sec_per_chip",
        "batch": batch,
        "ms_per_batch": round(ms, 2),
        "value": round(batch * steps / dt, 1),
        "unit": "images/sec",
    }


def main():
    import jax

    from convnet_tpu.trainer import enable_compilation_cache

    enable_compilation_cache()
    print(f"platform={jax.devices()[0].platform}", flush=True)
    t0 = time.time()
    for batch in (1024, 256):
        r = bench_alexnet_inference(batch)
        print(json.dumps(r), flush=True)
    from tools.bench_pipeline import bench_aug, bench_cifar_step

    print(json.dumps(bench_aug()), flush=True)
    print(json.dumps(bench_cifar_step()), flush=True)
    print(f"total {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()

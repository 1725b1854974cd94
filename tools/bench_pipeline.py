"""Secondary benchmarks: augmentation pipeline MB/s and CIFAR-10 step time.

These are the other two BASELINE.json metrics ("CIFAR-10 step time;
aug pipeline MB/s"); the driver-run headline (bench.py) stays
one-JSON-line AlexNet img/s. Run manually:

    python tools/bench_pipeline.py          # on the TPU chip
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_aug(batch=256, raw=256, crop=224, steps=30):
    """On-device jitter throughput: uint8 (B,256,256,3) -> f32 crops."""
    import jax

    from convnet_tpu.data.jitter import JitterSpec, jitter_batch

    spec = JitterSpec(image_size=crop, can_translate=True, can_flip=True, scale=1 / 255)
    mean = np.full((3,), 0.45, np.float32)
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randint(0, 256, (batch, raw, raw, 3), dtype=np.uint8))

    @jax.jit
    def run(x, key):
        return jitter_batch(x, spec, key, True, mean).sum()

    key = jax.random.PRNGKey(0)
    float(run(x, key))
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(steps):
        acc = run(x, jax.random.fold_in(key, i))
    float(acc)
    dt = time.perf_counter() - t0
    mb = batch * raw * raw * 3 * steps / 1e6
    return {"metric": "aug_pipeline_throughput", "value": round(mb / dt, 1), "unit": "MB/s"}


def bench_cifar_step(batch=256, steps=30):
    """Full jit'd CIFAR-10 train step time (conv+LRN+dropout net)."""
    import jax

    from convnet_tpu import models
    from convnet_tpu.trainer import init_state, make_train_step

    g = models.cifar10()
    step = make_train_step(g)
    state = init_state(g)
    rng = np.random.RandomState(0)
    data = {
        "input": jax.device_put(
            rng.rand(batch, 32, 32, 3).astype(np.float32)
        ),
        "labels": jax.device_put(rng.randint(0, 10, (batch,), dtype=np.int32)),
    }
    for _ in range(3):
        state, m = step(state, data)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, data)
    float(m["loss"])
    dt = time.perf_counter() - t0
    return {
        "metric": "cifar10_train_step_time",
        "value": round(dt / steps * 1000, 3),
        "unit": "ms",
        "images_per_sec": round(batch * steps / dt, 1),
    }


def main():
    print(json.dumps(bench_aug()))
    print(json.dumps(bench_cifar_step()))


if __name__ == "__main__":
    main()

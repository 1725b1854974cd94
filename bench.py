"""Headline benchmark: AlexNet training images/sec/chip.

Runs the full jit'd train step (on-device jitter prologue + forward +
backward + per-edge SGD) on synthetic uint8 data — the BASELINE.json
north-star workload — and prints ONE JSON line.

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the
comparison point is the XLA-conv roofline BASELINE.json names: measured
images/sec divided by the bf16-peak-FLOPs-derived bound for this chip
(~3x forward FLOPs per train step). 1.0 would be speed-of-light.
"""

import json
import os
import time

import numpy as np


def conv_flops_per_image(graph):
    """MAC-based FLOPs (2*MACs) of conv/local/fc edges, forward pass."""
    from convnet_tpu.graph import ET

    total = 0
    for e in graph.edges:
        h, w, c = graph.shapes[e.dest]
        sh, sw, sc = graph.shapes[e.source]
        if e.edge_type in (ET.CONV, ET.LOCAL):
            total += 2 * h * w * c * e.kernel_size * e.kernel_size * sc
        elif e.edge_type == ET.FC:
            total += 2 * sh * sw * sc * c
        elif e.edge_type == ET.CONV_ONETOONE:
            total += 2 * h * w * sc * c
    return total


def main():
    import jax

    from convnet_tpu import config
    from convnet_tpu.trainer import enable_compilation_cache

    enable_compilation_cache()
    from convnet_tpu.data.jitter import JitterSpec
    from convnet_tpu.graph import build_graph
    from convnet_tpu.trainer import init_state, make_train_step

    here = os.path.dirname(os.path.abspath(__file__))
    model = config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
    model.parallel.data = 1  # single-chip benchmark
    model.parallel.model = 1
    # BENCH_IMAGE_SIZE: CPU smoke-testing hook (default: full 224 AlexNet)
    size = int(os.environ.get("BENCH_IMAGE_SIZE", "224"))
    raw = size + 32
    graph = build_graph(model, {"input": size})

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    jitter = {
        "input": (
            JitterSpec(image_size=size, can_translate=True, can_flip=True, scale=1 / 255),
            np.full((3,), 0.45, np.float32),
            None,
        )
    }
    step = make_train_step(graph, jitter)
    state = init_state(graph)
    rng = np.random.RandomState(0)
    data = {
        "input": jax.device_put(rng.randint(0, 256, (batch, raw, raw, 3), dtype=np.uint8)),
        "labels": jax.device_put(rng.randint(0, 1000, (batch,), dtype=np.int32)),
    }

    # warmup / compile (device_get forces a real sync: on the axon
    # platform block_until_ready returns before execution finishes)
    for _ in range(3):
        state, metrics = step(state, data)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, data)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)
    ips = batch * steps / dt

    # roofline: train step ~ 3x forward conv/fc FLOPs at bf16 peak
    peaks_tflops = {"tpu": 197.0}  # v5e bf16 peak per chip
    plat = jax.devices()[0].platform
    peak = peaks_tflops.get(plat, 197.0) * 1e12
    train_flops = 3 * conv_flops_per_image(graph)
    roofline_ips = peak / train_flops
    print(
        json.dumps(
            {
                "metric": "alexnet_train_images_per_sec_per_chip",
                "value": round(ips, 1),
                "unit": "images/sec",
                "vs_baseline": round(ips / roofline_ips, 4),
            }
        )
    )


def _watchdog_main():
    """Run the measurement in a child process under a watchdog: a wedged
    TPU tunnel (axon backend init can hang indefinitely — see
    BASELINE.md notes) must produce a JSON line, not a hung driver."""
    import subprocess
    import sys

    budget = int(os.environ.get("BENCH_TIMEOUT_S", "900"))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            capture_output=True,
            text=True,
            timeout=budget,
        )
        out = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and out:
            print(out[-1])
            return
        sys.stderr.write(proc.stderr[-2000:])
        reason = f"exit={proc.returncode}"
    except subprocess.TimeoutExpired:
        reason = f"timeout after {budget}s (TPU tunnel hung?)"
    sys.stderr.write(f"bench failed: {reason}\n")
    print(
        json.dumps(
            {
                "metric": "alexnet_train_images_per_sec_per_chip",
                "value": 0.0,
                "unit": "images/sec",
                "vs_baseline": 0.0,
            }
        )
    )


if __name__ == "__main__":
    import sys

    if "--inner" in sys.argv:
        main()
    else:
        _watchdog_main()

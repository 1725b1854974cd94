"""Headline benchmark: AlexNet training images/sec/chip.

Runs the full jit'd train step (on-device jitter prologue + forward +
backward + per-edge SGD) on synthetic uint8 data — the BASELINE.json
north-star workload — and prints ONE JSON line.

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the
comparison point is the XLA-conv roofline BASELINE.json names: measured
images/sec divided by the bf16-peak-FLOPs-derived bound for this chip
(~3x forward FLOPs per train step). 1.0 would be speed-of-light.

Resilience: the axon TPU tunnel can wedge (backend init hangs
indefinitely — BASELINE.md notes). The outer runner therefore
(1) pre-flight-probes the device in a short-timeout subprocess with
backoff before spending the budget on a full attempt, and (2) walks a
shrink-on-retry ladder (fewer steps, smaller batch) so *some* real
number lands even on a flaky tunnel. Children are SIGTERMed before
SIGKILL so the axon client can release its chip claim.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

METRIC = "alexnet_train_images_per_sec_per_chip"


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


def main(batch=None, steps=None):
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

    # 1024 won the round-2 sweep: 14090/14319/14294 img/s at 768/1024/
    # 2048 vs 13633 at 512 (fixed per-step costs — optimizer master-
    # weight traffic, weight-grad convs' setup — amortize with batch)
    batch = batch or int(os.environ.get("BENCH_BATCH", "1024"))
    steps = steps or int(os.environ.get("BENCH_STEPS", "20"))
    jitter = {
        "input": (
            JitterSpec(image_size=size, can_translate=True, can_flip=True, scale=1 / 255),
            np.full((3,), 0.45, np.float32),
            None,
        )
    }
    step = make_train_step(graph, jitter)
    state = init_state(graph)
    # synthetic batch generated ON DEVICE: shipping ~300 MB of host
    # random data through the axon tunnel both dominated bench wall
    # time and was the biggest transient-hang surface
    import jax.numpy as jnp

    @jax.jit
    def make_data(key):
        ki, kl = jax.random.split(key)
        return {
            "input": jax.random.randint(
                ki, (batch, raw, raw, 3), 0, 256, dtype=jnp.int32
            ).astype(jnp.uint8),
            "labels": jax.random.randint(kl, (batch,), 0, 1000, dtype=jnp.int32),
        }

    data = make_data(jax.random.PRNGKey(0))

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
                "metric": METRIC,
                "value": round(ips, 1),
                "unit": "images/sec",
                "vs_baseline": round(ips / roofline_ips, 4),
            }
        )
    )


# ---------------------------------------------------------------------------
# resilient outer runner
# ---------------------------------------------------------------------------

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "d = jax.devices();"
    "y = jnp.ones((128,128)) @ jnp.ones((128,128));"
    "print('PROBE_OK', d[0].platform, float(y[0,0]))"
)


def _run_child(argv, timeout_s):
    """Run a child, SIGTERM at timeout (axon claim release), SIGKILL 10s
    later. Returns (rc, stdout, stderr); rc None means timed out."""
    proc = subprocess.Popen(
        argv, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True,
    )
    try:
        out, err = proc.communicate(timeout=timeout_s)
        return proc.returncode, out, err
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGTERM)
            out, err = proc.communicate(timeout=10)
        except (subprocess.TimeoutExpired, ProcessLookupError):
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            out, err = proc.communicate()
        return None, out, err


def _probe(timeout_s):
    rc, out, err = _run_child([sys.executable, "-c", _PROBE_SRC], timeout_s)
    ok = rc == 0 and "PROBE_OK" in out
    if not ok:
        sys.stderr.write(
            f"bench probe: rc={rc} out={out.strip()[-200:]} err={err.strip()[-300:]}\n"
        )
    return ok


def _debug(msg):
    """Append watchdog diagnostics to a file that survives the run —
    the driver captures only the JSON line, so transient failures
    (probe timeouts, attempt kills) are otherwise invisible."""
    path = os.environ.get("BENCH_DEBUG_LOG", "/tmp/bench_debug.log")
    try:
        with open(path, "a") as f:
            f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    except OSError:
        pass


def _watchdog_main():
    """Budgeted staged runner: probe -> measure, shrinking on retry."""
    budget = int(os.environ.get("BENCH_TIMEOUT_S", "900"))
    deadline = time.monotonic() + budget
    me = os.path.abspath(__file__)
    _debug(f"=== bench start, budget={budget}s")

    # (batch, steps, attempt_timeout): first full-size, then shrink so a
    # slow/flaky tunnel still produces a real measurement. Explicit
    # BENCH_BATCH/BENCH_STEPS pin every attempt to the requested size.
    # One generous first attempt, then shrink. Killing a timed-out
    # attempt mid-compile can wedge the chip claim for minutes (the
    # axon failure mode), so a second full-size attempt right after a
    # kill mostly burns budget — give the first attempt room instead.
    ladder = [(1024, 20, 600), (512, 10, 300), (64, 5, 240)]
    if "BENCH_BATCH" in os.environ or "BENCH_STEPS" in os.environ:
        b = int(os.environ.get("BENCH_BATCH", "1024"))
        s = int(os.environ.get("BENCH_STEPS", "20"))
        ladder = [(b, s, t) for _, _, t in ladder]
    # first probe waits out the axon claim-release latency (minutes
    # after a prior process exits — killing and re-probing loses the
    # wait already invested); later probes stay short
    probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", "240"))
    backoff = 20.0
    attempt = 0
    last_err = "no attempts made"
    while time.monotonic() < deadline - 30:
        remaining = deadline - time.monotonic()
        if not _probe(min(probe_timeout, int(remaining))):
            last_err = "device probe failed (TPU tunnel wedged?)"
            _debug(f"probe FAILED, {remaining:.0f}s left, backoff={backoff}")
            probe_timeout = 120
            sleep_s = min(backoff, max(0.0, deadline - time.monotonic() - probe_timeout))
            if sleep_s <= 0:
                break
            time.sleep(sleep_s)
            backoff = min(backoff * 2, 240)
            continue
        batch, steps, t = ladder[min(attempt, len(ladder) - 1)]
        attempt += 1
        t = min(t, int(deadline - time.monotonic()))
        if t < 60:
            last_err = "budget exhausted after probe"
            break
        _debug(f"attempt {attempt} starting: batch={batch} steps={steps} timeout={t}s")
        env = dict(os.environ, BENCH_BATCH=str(batch), BENCH_STEPS=str(steps))
        proc = subprocess.Popen(
            [sys.executable, me, "--inner"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, start_new_session=True,
        )
        try:
            out, err = proc.communicate(timeout=t)
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGTERM)
                out, err = proc.communicate(timeout=10)
            except (subprocess.TimeoutExpired, ProcessLookupError):
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                out, err = proc.communicate()
            rc = None
        lines = [l for l in (out or "").splitlines() if l.startswith("{")]
        if rc == 0 and lines:
            _debug(f"attempt {attempt} (batch={batch}) OK: {lines[-1]}")
            print(lines[-1])
            return
        last_err = f"attempt {attempt} (batch={batch}) rc={rc}: {(err or '')[-400:]}"
        _debug(f"attempt FAILED: {last_err}")
        sys.stderr.write(f"bench: {last_err}\n")

    _debug(f"giving up: {last_err}")
    sys.stderr.write(f"bench failed: {last_err}\n")
    print(
        json.dumps(
            {"metric": METRIC, "value": 0.0, "unit": "images/sec", "vs_baseline": 0.0}
        )
    )


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        _watchdog_main()

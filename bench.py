"""Headline benchmark: AlexNet training images/sec/chip.

Runs the full jit'd train step (on-device jitter prologue + forward +
backward + per-edge SGD) on synthetic uint8 data — the BASELINE.json
north-star workload — and prints ONE JSON line.

`vs_baseline`: the reference publishes no numbers (BASELINE.md), so the
comparison point is the XLA-conv roofline BASELINE.json names: measured
images/sec divided by the bf16-peak-FLOPs-derived bound for this chip
(~3x forward FLOPs per train step). 1.0 would be speed-of-light.

Resilience: axon chip-claim acquisition can stall for minutes after
any other process releases the chip, and killed waiters lose their
queue position — so the outer runner makes ONE full-size attempt that
owns nearly the whole budget (the inner process shrinks its own
measured step count to fit BENCH_DEADLINE_TS) plus one tiny cached
fallback. Children are SIGTERMed before SIGKILL so the axon client
can release its claim; diagnostics append to /tmp/bench_debug.log.
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


def _ensure_bench_cache(n_rows: int, raw: int):
    """Synthetic RAW_CACHE dataset on disk (written once, ~200 KB/row):
    the honest input-path variant streams THESE bytes through
    DataHandler + prefetch instead of generating batches on device."""
    d = "/tmp/convnet_bench_cache"
    img = os.path.join(d, f"img_{n_rows}_{raw}.cache")
    lbl = os.path.join(d, f"lbl_{n_rows}.cache")
    if not (os.path.exists(img) and os.path.exists(lbl)):
        from convnet_tpu.data.native import write_raw_cache

        os.makedirs(d, exist_ok=True)
        rng = np.random.RandomState(42)
        write_raw_cache(img, rng.randint(0, 256, (n_rows, raw, raw, 3), dtype=np.uint8))
        write_raw_cache(lbl, rng.randint(0, 1000, (n_rows,)).astype(np.int32))
    return img, lbl


def _rawcache_handler(batch: int, raw: int):
    from convnet_tpu.data.datahandler import DataHandler
    from convnet_tpu.proto import convnet_config_pb2 as pb2

    img, lbl = _ensure_bench_cache(max(3 * batch, 3072), raw)
    ds = pb2.DatasetConfig()
    ds.batch_size = batch
    ds.pipeline_loads = True
    ds.prefetch_depth = 3
    # production shuffle mode: sequential disk reads + staged window
    ds.randomize_gpu = True
    s = ds.data_config.add()
    s.layer_name = "input"
    s.data_type = pb2.DataStreamConfig.RAW_CACHE
    s.file_pattern = img
    s2 = ds.data_config.add()
    s2.layer_name = "labels"
    s2.data_type = pb2.DataStreamConfig.RAW_CACHE
    s2.file_pattern = lbl
    return DataHandler(ds)


def main(batch=None, steps=None):
    import threading

    import jax
    import jax.numpy as jnp

    from convnet_tpu import config
    from convnet_tpu.trainer import enable_compilation_cache

    enable_compilation_cache()

    # Init deadline (VERDICT r3): during a tunnel outage the axon claim
    # acquisition hangs indefinitely and a hung inner process used to
    # hold the watchdog's whole attempt budget (799 s burned on one dead
    # attempt in the r3 driver capture). Self-enforce: if the first tiny
    # device op isn't live within the deadline, exit rc=3 so the outer
    # retries immediately — a warm-cache success needs only ~17 s, so
    # fast failures buy many retries per budget and catch any brief
    # tunnel recovery. Exiting pre-claim is safe (the never-kill rule
    # protects in-flight chip WORK, not a waiter that owns nothing yet);
    # once CHIP_LIVE is printed the process must never be fast-killed.
    init_deadline = float(os.environ.get("BENCH_INIT_DEADLINE_S", "120"))
    live = threading.Event()

    def _init_watchdog():
        if not live.wait(init_deadline):
            _debug(f"inner: chip not live within {init_deadline:.0f}s -> exit 3")
            sys.stderr.write("bench inner: init deadline exceeded (no live chip)\n")
            os._exit(3)

    if init_deadline > 0:
        threading.Thread(target=_init_watchdog, daemon=True).start()
    t_acq = time.perf_counter()
    # first tiny device op: forces backend init + axon claim acquisition
    # (compiles are chipless AOT; the claim is taken at first execution)
    float(jax.jit(lambda v: v + 1.0)(jnp.zeros((), jnp.float32)))
    live.set()
    print("CHIP_LIVE", flush=True)
    _debug(f"inner: chip live after {time.perf_counter() - t_acq:.1f}s")
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

    # 4096 won the round-4 batch sweep (17,370 img/s vs 17,165 at 2048
    # vs 16,552 at 1024, tools/r4_chip7.py): fixed per-step costs —
    # optimizer master-weight traffic, weight-grad convs' setup —
    # amortize with batch. (Round 2 measured 2048 flat pre-r2d-LRN;
    # the balance changed.)
    batch = batch or int(os.environ.get("BENCH_BATCH", "4096"))
    steps = steps or int(os.environ.get("BENCH_STEPS", "20"))
    jitter = {
        "input": (
            JitterSpec(image_size=size, can_translate=True, can_flip=True, scale=1 / 255),
            np.full((3,), 0.45, np.float32),
            None,
        )
    }
    # BENCH_UNROLL > 1: one launch scans k steps on device (lax.scan in
    # make_train_step), amortizing the per-launch dispatch latency the
    # tunnel adds; batches are stacked (k, B, ...) on the leading axis
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    step = make_train_step(graph, jitter, unroll=unroll)
    state = init_state(graph)
    # synthetic batch generated ON DEVICE: shipping ~300 MB of host
    # random data through the axon tunnel both dominated bench wall
    # time and was the biggest transient-hang surface
    lead = () if unroll == 1 else (unroll,)

    @jax.jit
    def make_data(key):
        ki, kl = jax.random.split(key)
        return {
            "input": jax.random.randint(
                ki, lead + (batch, raw, raw, 3), 0, 256, dtype=jnp.int32
            ).astype(jnp.uint8),
            "labels": jax.random.randint(
                kl, lead + (batch,), 0, 1000, dtype=jnp.int32
            ),
        }

    def sync_loss(metrics):
        # unroll>1 stacks metrics (one row per inner step)
        return float(np.asarray(metrics["loss"]).reshape(-1)[-1])

    data_mode = os.environ.get("BENCH_DATA", "synthetic")
    if unroll > 1 and data_mode != "synthetic":
        raise SystemExit("BENCH_UNROLL>1 supports only BENCH_DATA=synthetic")
    handler = None
    if data_mode == "rawcache":
        # input-path variant (VERDICT r2 missing #4): batches flow
        # host->device from a memory-mapped RAW_CACHE file through
        # DataHandler + prefetch, double-buffered against the async
        # step dispatch. Caveat recorded in BASELINE.md: on this axon
        # relay, host->device goes through a TCP tunnel, so the number
        # bounds the TUNNEL, not a real PCIe host.
        handler = _rawcache_handler(batch, raw)
        put = lambda b: {k: jax.device_put(v) for k, v in b.items()}
        data = put(handler.get_batch())
    else:
        data = make_data(jax.random.PRNGKey(0))

    # warmup / compile (device_get forces a real sync: on the axon
    # platform block_until_ready returns before execution finishes)
    for _ in range(3):
        state, metrics = step(state, data)
    sync_loss(metrics)

    # deadline awareness: chip-claim acquisition can eat minutes of the
    # watchdog budget before we ever get here, so shrink the measured
    # step count to what still fits instead of being killed mid-run
    deadline_ts = float(os.environ.get("BENCH_DEADLINE_TS", "0"))
    if deadline_ts:
        t0 = time.perf_counter()
        state, metrics = step(state, data)
        sync_loss(metrics)
        per_step = time.perf_counter() - t0
        left = deadline_ts - time.time() - 10.0  # sync + print margin
        steps = max(3, min(steps, int(left / max(per_step, 1e-3))))

    t0 = time.perf_counter()
    if handler is not None:
        nxt = data
        for i in range(steps):
            cur = nxt
            state, metrics = step(state, cur)  # async dispatch...
            if i + 1 < steps:
                # ...overlaps gather + H2D; only stage a batch another
                # step will consume — an extra unconsumed gather+H2D
                # inside the timed region deflated the reported img/s
                nxt = put(handler.get_batch())
    else:
        for _ in range(steps):
            state, metrics = step(state, data)
    final_loss = sync_loss(metrics)
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)
    ips = batch * steps * unroll / dt
    if handler is not None:
        handler.close()

    # roofline: train step ~ 3x forward conv/fc FLOPs at bf16 peak
    peaks_tflops = {"tpu": 197.0}  # v5e bf16 peak per chip
    plat = jax.devices()[0].platform
    peak = peaks_tflops.get(plat, 197.0) * 1e12
    train_flops = 3 * conv_flops_per_image(graph)
    roofline_ips = peak / train_flops
    print(
        json.dumps(
            {
                "metric": METRIC + ("_rawcache" if data_mode == "rawcache" else ""),
                "value": round(ips, 1),
                "unit": "images/sec",
                "vs_baseline": round(ips / roofline_ips, 4),
            }
        )
    )


# ---------------------------------------------------------------------------
# resilient outer runner
# ---------------------------------------------------------------------------

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


def _ledger_path():
    # /tmp persists across rounds on this VM; BENCH_LEDGER overrides
    return os.environ.get("BENCH_LEDGER", "/tmp/bench_ledger.json")


def _ledger_record(result: dict):
    """Remember the latest SUCCESSFUL capture per metric, so an outage
    round can still report what the code measures when the tunnel is
    up (clearly labeled as stale — never as the round's value)."""
    try:
        ledger = {}
        if os.path.exists(_ledger_path()):
            with open(_ledger_path()) as f:
                ledger = json.load(f)
        ledger[result["metric"]] = dict(
            result, ts=time.strftime("%Y-%m-%d %H:%M:%S")
        )
        with open(_ledger_path(), "w") as f:
            json.dump(ledger, f, indent=2)
    except (OSError, ValueError, KeyError):
        pass


def _ledger_last_good(metric: str):
    try:
        with open(_ledger_path()) as f:
            return json.load(f).get(metric)
    except (OSError, ValueError):
        return None


def _watchdog_main():
    """Budgeted runner.

    Empirically (debug log, 2026-08-17): axon chip-claim acquisition
    after another process exits can stall 9+ minutes; a pre-flight
    probe doubles the number of claims and each killed prober loses
    its place, so probing is strictly counterproductive. Instead: ONE
    full-size attempt that owns nearly the whole budget, whose inner
    process shrinks its own measured step count to fit the deadline
    (BENCH_DEADLINE_TS), plus one small cached fallback."""
    budget = int(os.environ.get("BENCH_TIMEOUT_S", "900"))
    deadline = time.monotonic() + budget
    me = os.path.abspath(__file__)
    _debug(f"=== bench start, budget={budget}s")

    # (batch, steps, reserve): reserve = budget to leave for later
    # attempts. The last attempt is tiny and cache-warm.
    ladder = [(4096, 20, 100), (64, 5, 0)]
    if "BENCH_BATCH" in os.environ or "BENCH_STEPS" in os.environ:
        b = int(os.environ.get("BENCH_BATCH", "4096"))
        s = int(os.environ.get("BENCH_STEPS", "20"))
        ladder = [(b, s, r) for _, _, r in ladder]
    attempt = 0
    fast_fails = 0  # consecutive deterministic fast failures (not rc=3)
    last_err = "no attempts made"
    while time.monotonic() < deadline - 30:
        # full-size attempts repeat while budget remains. The inner
        # process self-enforces an init deadline (rc=3 if the axon
        # claim isn't live in time), so a tunnel-outage attempt dies in
        # ~2 min instead of holding the whole budget — a warm-cache
        # success needs ~17 s, so this buys many retries per budget and
        # catches any brief recovery. The init deadline alternates
        # 120 s / 300 s across attempts: short catches flapping-tunnel
        # recoveries, long rides out the post-exit claim cooldown
        # (which can legitimately take minutes). The tiny cache-warm
        # fallback runs once when the window gets short.
        full_b, full_s, full_r = ladder[0]
        if deadline - time.monotonic() - full_r >= 240 and fast_fails < 3:
            batch, steps, reserve = ladder[0]
            final_try = False
        else:
            batch, steps, reserve = ladder[-1]
            final_try = True
        attempt += 1
        t = int(deadline - time.monotonic() - reserve)
        if t < 60:
            last_err = "budget exhausted"
            break
        init_dl = 120 if attempt % 2 == 1 else 300
        init_dl = min(init_dl, max(60, t - 60))
        _debug(
            f"attempt {attempt} starting: batch={batch} steps={steps} "
            f"timeout={t}s init_deadline={init_dl}s"
        )
        env = dict(
            os.environ,
            BENCH_BATCH=str(batch),
            BENCH_STEPS=str(steps),
            BENCH_DEADLINE_TS=str(time.time() + t - 15),
            BENCH_INIT_DEADLINE_S=str(init_dl),
        )
        t_start = time.monotonic()
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
        elapsed = time.monotonic() - t_start
        lines = [l for l in (out or "").splitlines() if l.startswith("{")]
        if rc == 0 and lines:
            _debug(f"attempt {attempt} (batch={batch}) OK: {lines[-1]}")
            try:
                _ledger_record(json.loads(lines[-1]))
            except ValueError:
                pass
            print(lines[-1])
            return
        if rc == 3:
            # init deadline: environmental (no live chip), retry freely
            fast_fails = 0
            last_err = f"attempt {attempt}: no live chip in {init_dl}s"
        else:
            # a deterministic inner bug (bad env, import error, OOM)
            # exits fast with a real rc — don't burn the whole budget
            # relaunching it; after 3 consecutive, drop to the final
            # tiny attempt and report
            if rc not in (0, None) and elapsed < 60:
                fast_fails += 1
            else:
                fast_fails = 0
            last_err = f"attempt {attempt} (batch={batch}) rc={rc}: {(err or '')[-400:]}"
        _debug(f"attempt FAILED ({elapsed:.0f}s): {last_err}")
        sys.stderr.write(f"bench: {last_err}\n")
        if final_try:
            break

    _debug(f"giving up: {last_err}")
    sys.stderr.write(f"bench failed: {last_err}\n")
    report = {
        "metric": METRIC, "value": 0.0, "unit": "images/sec",
        "vs_baseline": 0.0, "error": last_err[-200:],
    }
    last_good = _ledger_last_good(METRIC)
    if last_good:
        # stale context only — value stays 0.0 for a failed capture
        report["last_good"] = last_good
    print(json.dumps(report))


if __name__ == "__main__":
    if "--data=rawcache" in sys.argv:
        os.environ["BENCH_DATA"] = "rawcache"  # inherited by the inner process
    if "--inner" in sys.argv:
        main()
    else:
        _watchdog_main()

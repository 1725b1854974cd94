"""Hardened chip-batch runner (VERDICT r3 #9): one reusable harness for
running queued measurement scripts on the axon-tunneled chip, replacing
the per-session r3_*.py retry/chaining machinery.

Contract with the environment (CLAUDE.md / docs/performance.md traps):
  * NEVER kill a process that is mid-compile or mid-transfer on the
    chip — it wedges the server-side claim for 4-45 min. The runner
    therefore distinguishes a WAITER (no chip claim yet) from WORK:
    each job runs through a bootstrap child that arms an init-deadline
    watchdog and prints a CHIP_LIVE sentinel once the first tiny device
    op lands. Before the sentinel the child self-exits with rc=3 (a
    waiter owns nothing — exiting is safe); after the sentinel the
    runner never fast-kills, only a last-resort SIGTERM at 1.5x the
    job's post-live budget (recorded as wedge-risk + 300 s cooldown).
  * Claim acquisition can legitimately stall minutes after ANY process
    exits, so init deadlines alternate short/long (120 s / 300 s):
    short catches flapping-tunnel recoveries cheaply, long rides out
    the post-exit cooldown.
  * The ledger (JSON) is resumable: re-running the same command skips
    done jobs and retries pending/failed ones; every state change is
    flushed to disk. Job stdout+stderr stream to per-job log files so
    progress is observable while the batch runs.

Env chaining: a job may print lines of the form
    CHIPBATCH_SETENV NAME=value
and the runner applies them to every subsequent job's environment
(e.g. an A/B's winner config feeding the next greedy sweep).

Usage:
    python tools/chipbatch.py --ledger /tmp/chipbatch/r4.json \
        tools/r3_chip3.py tools/r3_chip5.py:4800 tools/r3_chip4.py
    # script[:post_live_budget_seconds]; resume = same command again
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


# ---------------------------------------------------------------------------
# child bootstrap: liveness sentinel + init-deadline self-exit
# ---------------------------------------------------------------------------

def _child(script: str, init_deadline: float):
    import threading

    live = threading.Event()

    def watchdog():
        if not live.wait(init_deadline):
            print(
                f"CHIPBATCH: no live chip in {init_deadline:.0f}s -> exit 3",
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()

    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp

    from convnet_tpu.trainer import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.perf_counter()
    # first tiny device op: forces backend init + axon claim acquisition
    float(jax.jit(lambda v: v + 1.0)(jnp.zeros((), jnp.float32)))
    live.set()
    print(f"CHIP_LIVE after {time.perf_counter() - t0:.1f}s", flush=True)

    import runpy

    runpy.run_path(script, run_name="__main__")


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------

def _load_ledger(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"jobs": [], "env": {}}


def _save_ledger(path, ledger):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ledger, f, indent=2)
    os.replace(tmp, path)


def _log_head(path, nbytes=8192):
    try:
        with open(path, "rb") as f:
            return f.read(nbytes).decode("utf-8", "replace")
    except OSError:
        return ""


def _terminate(proc):
    try:
        os.killpg(proc.pid, signal.SIGTERM)
        proc.wait(timeout=15)
    except (subprocess.TimeoutExpired, ProcessLookupError):
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()


def run_job(job, extra_env, logdir, say):
    """One job to completion or failure. Returns (status, setenv_dict)."""
    budget = job.get("budget", 3600)
    max_env_retries = int(os.environ.get("CHIPBATCH_MAX_ENV_RETRIES", "24"))
    attempt = 0
    while True:
        attempt += 1
        init_dl = 120 if attempt % 2 == 1 else 300
        log = os.path.join(
            logdir, f"{os.path.basename(job['script'])}.a{attempt}.log"
        )
        say(
            f"job {job['script']} attempt {attempt}: init_deadline={init_dl}s "
            f"post-live budget={budget}s log={log}"
        )
        env = dict(os.environ, **extra_env)
        # truncate: attempt numbers restart across ledger resubmissions,
        # and a stale CHIP_LIVE / CHIPBATCH_SETENV line from a previous
        # run in the same file poisons the liveness grep and env parse
        with open(log, "wb") as lf:
            proc = subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--run-child", job["script"],
                    "--init-deadline", str(init_dl),
                ],
                stdout=lf, stderr=subprocess.STDOUT,
                env=env, start_new_session=True, cwd=REPO,
            )
            t_start = time.monotonic()
            t_live = None
            wedge_kill = False
            while proc.poll() is None:
                time.sleep(5)
                if t_live is None and "CHIP_LIVE" in _log_head(log):
                    t_live = time.monotonic()
                    say(f"  CHIP_LIVE at +{t_live - t_start:.0f}s")
                if t_live is None and time.monotonic() - t_start > init_dl + 180:
                    # backstop: the child's own watchdog should have
                    # fired; a child hung before even arming it (import
                    # deadlock) is still a waiter — safe to stop
                    say("  backstop: child never armed/reported, terminating")
                    _terminate(proc)
                    break
                if t_live is not None and time.monotonic() - t_live > 1.5 * budget:
                    # last resort — this CAN wedge the claim; record it
                    say("  OVER 1.5x post-live budget: SIGTERM (wedge risk)")
                    wedge_kill = True
                    _terminate(proc)
                    break
        rc = proc.returncode
        head = _log_head(log, 4096)
        setenv = {}
        # parse env exports from the full log
        try:
            with open(log, "r", errors="replace") as f:
                for line in f:
                    if line.startswith("CHIPBATCH_SETENV "):
                        k, _, v = line[len("CHIPBATCH_SETENV "):].strip().partition("=")
                        if k:
                            setenv[k] = v
        except OSError:
            pass
        if wedge_kill:
            say(f"  job {job['script']}: killed post-live (wedge risk); cooling 300s")
            time.sleep(300)
            return "killed_post_live", setenv
        if rc == 0:
            say(f"  job {job['script']}: DONE (attempt {attempt})")
            return "done", setenv
        if rc == 3 or (rc is None and t_live is None):
            if attempt >= max_env_retries:
                say(f"  job {job['script']}: giving up after {attempt} env retries")
                return "env_exhausted", setenv
            backoff = 30 if attempt % 2 == 1 else 60
            say(f"  no live chip (rc={rc}); retrying in {backoff}s")
            time.sleep(backoff)
            continue
        # deterministic failure: record and move on so one bug doesn't
        # block the rest of the queue
        say(f"  job {job['script']}: FAILED rc={rc}; head of log:\n{head[-1500:]}")
        return "failed", setenv


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("jobs", nargs="*", help="script[:post_live_budget_s]")
    ap.add_argument("--ledger", default="/tmp/chipbatch/ledger.json")
    ap.add_argument("--run-child", help=argparse.SUPPRESS)
    ap.add_argument("--init-deadline", type=float, default=120.0,
                    help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    if args.run_child:
        _child(args.run_child, args.init_deadline)
        return

    logdir = os.path.dirname(os.path.abspath(args.ledger)) or "."
    os.makedirs(logdir, exist_ok=True)

    def say(msg):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        with open(os.path.join(logdir, "runner.log"), "a") as f:
            f.write(line + "\n")

    ledger = _load_ledger(args.ledger)
    known = {j["script"] for j in ledger["jobs"]}
    for spec in args.jobs:
        script, _, b = spec.partition(":")
        script = os.path.relpath(os.path.abspath(script), REPO)
        if script not in known:
            ledger["jobs"].append(
                {"script": script, "budget": int(b) if b else 3600,
                 "status": "pending"}
            )
    _save_ledger(args.ledger, ledger)

    for job in ledger["jobs"]:
        if job["status"] == "done":
            say(f"job {job['script']}: already done, skipping")
            continue
        job["status"] = "running"
        _save_ledger(args.ledger, ledger)
        status, setenv = run_job(job, ledger["env"], logdir, say)
        job["status"] = status
        if setenv:
            ledger["env"].update(setenv)
            say(f"env for subsequent jobs: {ledger['env']}")
        _save_ledger(args.ledger, ledger)
        if status == "env_exhausted":
            say("tunnel appears down; stopping the batch (resume later "
                "with the same command)")
            job["status"] = "pending"  # so a resume retries it
            _save_ledger(args.ledger, ledger)
            break
    say("batch complete: " + json.dumps(
        {j["script"]: j["status"] for j in ledger["jobs"]}
    ))


if __name__ == "__main__":
    main()

"""Smoke-test the benchmark's inner measurement path (bench.py).

The driver runs bench.py unattended at round end; a Python-level
regression there silently costs the round's headline number. These run
main() in-process on the CPU backend (conftest forces it) at a tiny
config.
"""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture()
def bench_module():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    return bench


def test_inner_main_prints_json(bench_module, capsys, monkeypatch):
    monkeypatch.setenv("BENCH_IMAGE_SIZE", "67")
    out = _run(bench_module, capsys, batch=4, steps=2)
    assert out["metric"] == "alexnet_train_images_per_sec_per_chip"
    assert out["value"] > 0
    assert out["unit"] == "images/sec"
    assert 0 <= out["vs_baseline"] < 10  # rounds to 0.0 at smoke scale


def test_inner_deadline_shrinks_steps(bench_module, capsys, monkeypatch):
    """With an almost-elapsed deadline the inner still lands a
    measurement (>=3 steps) instead of running past it."""
    import time

    monkeypatch.setenv("BENCH_IMAGE_SIZE", "67")
    monkeypatch.setenv("BENCH_DEADLINE_TS", str(time.time() + 5))
    out = _run(bench_module, capsys, batch=4, steps=1000)
    assert out["value"] > 0


def test_ledger_round_trip_and_failure_context(bench_module, tmp_path, monkeypatch):
    """A successful capture is remembered per-metric; a failed capture's
    report can surface it as clearly-labeled stale context (value stays
    0.0 either way — the ledger never substitutes for a measurement)."""
    monkeypatch.setenv("BENCH_LEDGER", str(tmp_path / "ledger.json"))
    m = bench_module.METRIC
    assert bench_module._ledger_last_good(m) is None
    bench_module._ledger_record(
        {"metric": m, "value": 15000.0, "unit": "images/sec", "vs_baseline": 0.52}
    )
    bench_module._ledger_record(
        {"metric": m + "_rawcache", "value": 14000.0, "unit": "images/sec",
         "vs_baseline": 0.48}
    )
    got = bench_module._ledger_last_good(m)
    assert got["value"] == 15000.0 and "ts" in got
    assert bench_module._ledger_last_good(m + "_rawcache")["value"] == 14000.0
    # newer success overwrites
    bench_module._ledger_record(
        {"metric": m, "value": 15500.0, "unit": "images/sec", "vs_baseline": 0.54}
    )
    assert bench_module._ledger_last_good(m)["value"] == 15500.0


def _run(bench_module, capsys, batch, steps):
    bench_module.main(batch=batch, steps=steps)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert lines, "no JSON line printed"
    return json.loads(lines[-1])


def test_roofline_derivation_matches_documented(bench_module):
    """Pins the BASELINE.md "Roofline derivation" paragraph: FLOP count
    of the shipped 224px AlexNet, the assumed bf16 peak, and the
    resulting roofline img/s constant that vs_baseline divides by."""
    import os

    from convnet_tpu import config
    from convnet_tpu.graph import build_graph

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    g = build_graph(
        config.read_model(os.path.join(here, "examples/imagenet/alexnet.pbtxt"))
    )
    flops = bench_module.conv_flops_per_image(g)
    assert flops == 2270512192  # 2.2705 GFLOP/image (documented)
    roofline = 197.0e12 / (3 * flops)
    np.testing.assert_allclose(roofline, 28921.5, atol=0.1)
    # and the documented headline ratio reproduces from its own numbers
    np.testing.assert_allclose(17451.7 / roofline, 0.6034, atol=5e-4)

"""The driver runs bench.py on real TPU every round — guard it against
bitrot with a tiny forced-CPU smoke run (subprocess, real entry point)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_smoke_cpu():
    env = dict(os.environ, GBNNS_BENCH_CPU="1", GBNNS_BENCH_N="3000",
               GBNNS_BENCH_Q="256", GBNNS_BENCH_STEPS="20")
    root = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run([sys.executable, "bench.py"], cwd=root, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in out, out
    assert out["value"] > 0
    assert out["recall_at_10"] > 0.5

"""bench.py must survive an unreachable backend.

BENCH_r02 recorded a stack trace as the round's metric of record because the
tunneled TPU was down and bench.py died inside jax backend init. The guard:
a bounded SUBPROCESS probe (in-process timeouts cannot bound a hung backend
init), then a structured one-line JSON skip record with exit code 0, so the
driver capture always parses. Ref analogue: the JUBE harness always produces
its table or a parseable diagnostic (benchmark/include/include_patternset.yml).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = dict(os.environ)
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=REPO,
    )


def test_skip_line_when_backend_unreachable():
    # Force the probe onto a nonexistent platform: backend init fails fast,
    # budget 0 allows exactly one attempt — the real outage path, just quick.
    r = _run_bench(
        {
            "CLOUDSC_BENCH_PROBE_PLATFORM": "no_such_platform",
            "CLOUDSC_BENCH_PROBE_BUDGET": "0",
        }
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in stdout: {r.stdout!r}"
    rec = json.loads(lines[-1])
    assert rec["skipped"] is True
    assert rec["reason"] == "tpu_unavailable"
    # the last measured number rides along so the record is never empty
    assert rec["last_measured"] is not None
    assert rec["last_measured"]["unit"] == "columns/s"
    assert rec["last_measured"]["value"] > 0


def test_fallback_chain_survives_kernel_compile_failure():
    """A Mosaic lowering failure in a new kernel body must DEGRADE the metric
    (fall back to the scan engine), never erase it. Simulated by forcing the
    pallas backend on CPU, where the Mosaic kernel genuinely cannot lower —
    the same failure class as a bad kernel body on TPU."""
    env = dict(os.environ)
    env.update(
        {
            "CLOUDSC_BENCH_CPU": "1",
            "CLOUDSC_BENCH_BACKEND": "pallas",
            "CLOUDSC_BENCH_NGPTOT": "512",
            "CLOUDSC_BENCH_ITERS": "1",
        }
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in stdout: {r.stdout!r}"
    rec = json.loads(lines[-1])
    assert "skipped" not in rec, rec
    assert rec["value"] > 0
    assert rec["config"].startswith("xla/")
    assert rec["fallback"] == "scan"
    assert "fallback_reason" in rec


def test_last_measured_file_parses():
    path = os.path.join(REPO, "bench", "last_measured.json")
    with open(path) as f:
        rec = json.load(f)
    assert rec["unit"] == "columns/s"
    assert rec["value"] > 0

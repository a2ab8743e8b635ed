"""The bench.py one-JSON-line contract must survive crashes.

Round 3's driver perf artifact (BENCH_r03.json) was lost because a transient
"TPU worker process crashed or restarted" escaped bench.py as a traceback and
the driver recorded no JSON line.  The guard (bench._run_guarded) must:

- convert ANY exception into a valid error-JSON line (the reference's
  defensive per-case pattern, baseline/cellseg_time_eval.py:96-97),
- retry ONCE in a fresh interpreter on a device-fault-shaped error
  (a crashed TPU worker can wedge the in-process backend handle),
- never print more than one JSON line on stdout.

These run the real `python bench.py --selftest` entry in a subprocess so the
argv plumbing, retry env flag, and exit codes are all exercised for real.
No device work happens in selftest mode (watchdog disabled, no jax import
needed on the measured path).
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")


def _run(*extra):
    env = dict(os.environ)
    env.pop("CELLSEG_BENCH_ATTEMPT", None)
    return subprocess.run(
        [sys.executable, BENCH, "--selftest", *extra],
        capture_output=True, text=True, timeout=120, env=env)


def _json_lines(stdout):
    out = []
    for ln in stdout.splitlines():
        if ln.startswith("{"):
            out.append(json.loads(ln))
    return out


def test_selftest_clean():
    p = _run()
    assert p.returncode == 0, p.stderr
    lines = _json_lines(p.stdout)
    assert len(lines) == 1
    assert lines[0]["metric"] == "bench_selftest"
    assert lines[0]["value"] == 1.0


def test_transient_fault_retries_to_success():
    """First attempt raises a device-fault; fresh-process retry succeeds."""
    p = _run("--inject-fault", "transient")
    assert p.returncode == 0, p.stderr
    lines = _json_lines(p.stdout)
    assert len(lines) == 1, p.stdout
    assert lines[0]["value"] == 1.0
    assert "retrying once in a fresh process" in p.stderr


def test_fatal_fault_yields_single_error_line():
    """A persistent fault still produces exactly one valid error-JSON line."""
    p = _run("--inject-fault", "fatal")
    assert p.returncode != 0
    lines = _json_lines(p.stdout)
    assert len(lines) == 1, p.stdout
    assert lines[0]["value"] == 0.0
    assert "error" in lines[0]
    # retried exactly once, not recursively
    assert p.stderr.count("retrying once in a fresh process") == 1


@pytest.mark.parametrize("msg,expect", [
    ("UNAVAILABLE: TPU worker process crashed or restarted. This can be "
     "caused by a kernel fault", True),
    ("DEADLINE_EXCEEDED: tunnel rpc timed out", True),
    ("ValueError: shapes do not match", False),
    ("FileNotFoundError: assets/model.ckpt", False),
])
def test_device_fault_classifier(msg, expect):
    sys.path.insert(0, os.path.dirname(BENCH))
    import importlib

    bench = importlib.import_module("bench")
    cls, text = msg.split(": ", 1)
    exc = type(cls, (RuntimeError,), {})(text)
    assert bench._is_device_fault(exc) is expect

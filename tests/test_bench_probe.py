"""Bench watchdog resilience: a transient tunnel outage must retry to
success (round 2 lost its artifact to a single fail-fast), a dead
tunnel must still exit 2 with a machine-readable error line."""

import json
import os
import subprocess
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench


def test_probe_retries_then_succeeds(monkeypatch):
    """Backend that comes up after the first probe window: the probe
    must retry (attempts > 1) and return instead of exiting."""
    t0 = time.monotonic()
    fake = types.ModuleType("jax")
    fake.devices = lambda: time.sleep(max(0.0, t0 + 0.5 - time.monotonic()))
    monkeypatch.setitem(sys.modules, "jax", fake)
    monkeypatch.setattr(bench, "_PROBE_ATTEMPTS", 0)
    bench._probe_backend(timeout_s=0.1, max_wait_s=30.0)
    assert bench._PROBE_ATTEMPTS > 1


def test_probe_gives_up_after_max_wait(tmp_path):
    """Backend that never comes up: exit 2 + one JSON error line with
    the attempt count (run in a subprocess — the probe uses os._exit)."""
    code = (
        "import sys, time, types\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "fake = types.ModuleType('jax')\n"
        "fake.devices = lambda: time.sleep(3600)\n"
        "sys.modules['jax'] = fake\n"
        "import bench\n"
        "bench._probe_backend(timeout_s=0.05, max_wait_s=0.3)\n"
        "print('UNREACHABLE')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=60
    )
    assert proc.returncode == 2
    assert "UNREACHABLE" not in proc.stdout
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["metric"] == "error"
    assert payload["probe_attempts"] >= 2
    assert "tunnel" in payload["error"]

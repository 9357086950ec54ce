"""Unit tests for tools/_measure_common.setup_device's probe-wait loop.

The tunneled TPU backend flaps on a minutes-to-hours scale (CLAUDE.md);
``ASR_TPU_PROBE_WAIT`` lets a measurement tool launched during an outage
arm itself and run the moment the backend returns instead of dying on
the first missed probe. These tests cover the wait/fail logic with the
probe stubbed — the real subprocess probe is exercised by every on-chip
tool run.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(__file__.rsplit("/", 2)[0], "tools"))

import _measure_common as mc  # noqa: E402


def test_fail_fast_without_wait(monkeypatch, capsys):
    monkeypatch.setattr(mc, "_probe_once", lambda t: False)
    monkeypatch.delenv("ASR_TPU_PROBE_WAIT", raising=False)
    with pytest.raises(SystemExit) as e:
        mc.setup_device(False)
    assert e.value.code == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert "unreachable" in json.loads(line)["error"]


def test_wait_retries_until_probe_recovers(monkeypatch, capsys):
    calls = {"n": 0}

    def probe(_t):
        calls["n"] += 1
        return calls["n"] >= 3          # down, down, up

    monkeypatch.setattr(mc, "_probe_once", probe)
    monkeypatch.setattr(mc, "_sleep", lambda s: None)
    monkeypatch.setenv("ASR_TPU_PROBE_WAIT", "3600")
    mc.setup_device(False)              # must not raise
    assert calls["n"] == 3
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert "device" in json.loads(out)


def test_wait_deadline_still_fails(monkeypatch):
    # patch the module-level indirections, NOT the shared stdlib time
    # module (a global patch + finite iterator made any concurrent
    # time.monotonic() caller raise StopIteration — ADVICE r4); the
    # unbounded clock below never exhausts
    monkeypatch.setattr(mc, "_probe_once", lambda t: False)
    monkeypatch.setattr(mc, "_sleep", lambda s: None)
    clock = {"t": -100.0}

    def monotonic():
        clock["t"] += 100.0             # 0, 100, 200, ... forever
        return clock["t"]

    monkeypatch.setattr(mc, "_monotonic", monotonic)
    monkeypatch.setenv("ASR_TPU_PROBE_WAIT", "150")
    with pytest.raises(SystemExit):
        mc.setup_device(False)


def test_malformed_probe_wait_env_falls_back(monkeypatch, capsys):
    """ASR_TPU_PROBE_WAIT='30m' must not break the JSON-error-line
    contract with a float() traceback (ADVICE r4): fall back to 0 with
    a stderr warning -> fail-fast path."""
    monkeypatch.setattr(mc, "_probe_once", lambda t: False)
    monkeypatch.setenv("ASR_TPU_PROBE_WAIT", "30m")
    with pytest.raises(SystemExit) as e:
        mc.setup_device(False)
    assert e.value.code == 1
    cap = capsys.readouterr()
    assert "malformed ASR_TPU_PROBE_WAIT" in cap.err
    assert "unreachable" in json.loads(
        cap.out.strip().splitlines()[-1])["error"]


def test_cpu_pin_skips_probe(monkeypatch, capsys):
    # --cpu must never touch the probe (and must not dispatch to axon)
    monkeypatch.setattr(mc, "_probe_once",
                        lambda t: (_ for _ in ()).throw(AssertionError))
    mc.setup_device(True)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["device"]

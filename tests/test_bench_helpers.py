"""Unit tests for bench.py's roofline accounting (VERDICT r2 #3).

The timing harness itself is validated on-chip by ``bench.py
--calibrate``; these cover the pure-python cost/roofline math so the
columns can't silently vanish or mis-scale again (XLA counts a while
body once per program — the round-3 bug that zeroed every slope).
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402

_BENCH = os.path.join(__file__.rsplit("/", 2)[0], "bench.py")


def test_cost_delta_while_body_counted_once():
    # lo and hi scans report ~the same cost -> the body cost IS per-iter
    clo = {"flops": 1e9, "bytes accessed": 5e8}
    chi = {"flops": 1.0000001e9, "bytes accessed": 5.0000001e8}
    out = bench._cost_delta(clo, chi, iters=100)
    assert out["flops"] == 1e9
    assert out["bytes"] == 5e8


def test_cost_delta_unrolled_slope():
    # an unrolled loop scales with trip count -> slope divides it out
    clo = {"flops": 10 * 1e9, "bytes accessed": 10 * 5e8}
    chi = {"flops": 110 * 1e9, "bytes accessed": 110 * 5e8}
    out = bench._cost_delta(clo, chi, iters=100)
    assert abs(out["flops"] - 1e9) < 1e3
    assert abs(out["bytes"] - 5e8) < 1e3


def test_cost_delta_missing_keys():
    assert bench._cost_delta({}, {}, 10) == {}
    out = bench._cost_delta({"flops": 1e9}, {}, 10)
    assert out == {"flops": 1e9}


def test_roofline_verdicts():
    # 1e12 flops at peak 100 TFLOP/s -> 10 ms compute roof;
    # 1e9 mandatory bytes at 800 GB/s -> 1.25 ms hbm roof -> compute-bound
    import unittest.mock as mock
    with mock.patch.object(bench, "_peaks", return_value=(100.0, 800.0)):
        out = bench._roofline(0.02, {"flops": 1e12, "bytes": 9e9},
                              min_bytes=1e9)
    assert out["bound"] == "compute"
    assert abs(out["roof_ms"] - 10.0) < 1e-6
    assert abs(out["mfu_pct"] - 50.0) < 1e-6       # 50 of 100 TFLOP/s
    assert abs(out["achieved_tflops"] - 50.0) < 1e-6
    # XLA's (over-counting) byte tally is informational only
    assert abs(out["xla_bytes_gb"] - 9.0) < 1e-6
    assert abs(out["hbm_gbps_lb"] - 50.0) < 1e-6
    assert abs(out["pct_of_roof"] - 50.0) < 1e-6
    with mock.patch.object(bench, "_peaks", return_value=(100.0, 800.0)):
        out = bench._roofline(0.02, {"flops": 1e11}, min_bytes=1e10)
    assert out["bound"] == "hbm"
    # HBM roof divides by _BW_ROOF_MARGIN x published BW (the chip
    # out-reads its spec — see --calibrate): 1e10 B / (800e9 x 1.15)
    assert abs(out["roof_ms"] - 12.5 / bench._BW_ROOF_MARGIN) < 1e-3


def test_roofline_inflated_xla_bytes_cannot_beat_the_roof():
    # round-3 bug class: XLA claimed 23 GB/step for a 14 ms program, which
    # drove pct_of_roof to 198%. With the roof built from mandatory
    # traffic, pct_of_roof <= 100 no matter what XLA's byte tally says.
    import unittest.mock as mock
    with mock.patch.object(bench, "_peaks", return_value=(197.0, 819.0)):
        out = bench._roofline(0.01415, {"flops": 1.0528e12,
                                        "bytes": 2.2984e10},
                              min_bytes=2 * 502.8e6)
    assert out["pct_of_roof"] <= 100.0
    assert out["roof_ms"] <= 14.15 + 1e-6


def test_roofline_without_peaks():
    import unittest.mock as mock
    with mock.patch.object(bench, "_peaks", return_value=(None, None)):
        out = bench._roofline(0.01, {"flops": 1e12, "bytes": 1e9},
                              min_bytes=1e9)
    assert "mfu_pct" not in out and "bound" not in out
    assert out["achieved_tflops"] == 100.0


def test_sanitize_strips_non_finite_and_numpy():
    import numpy as np
    out = bench._sanitize({"a": float("nan"), "b": float("inf"),
                           "c": np.float32(1.5), "d": [np.int64(3),
                                                       float("-inf")]})
    assert out == {"a": None, "b": None, "c": 1.5, "d": [3, None]}


def test_strict_line_fits_tail_capture_and_reparses():
    # BENCH_r03 postmortem: the driver records only the last ~2000 chars;
    # the emitted line must always fit and strictly re-parse.
    import json
    suite = {f"config_{i:02d}": {"utts_per_sec": 1234.56 + i,
                                 "mfu_pct": float("nan"),
                                 "pct_of_roof": 63.0,
                                 "stale": i % 3 == 0} for i in range(21)}
    record = {"metric": "m", "value": 1234.56, "unit": "u",
              "vs_baseline": 1.2,
              "extra": {"device": "TPU v5 lite", "fresh": 14, "stale": 7,
                        "suite": bench._compact_suite(suite),
                        "full": "BENCH_FULL.json"}}
    line = bench._strict_line(record)
    assert len(line) <= bench._EMIT_LIMIT and "\n" not in line
    parsed = json.loads(line)   # strict: would reject NaN/Infinity
    assert parsed["value"] == 1234.56
    assert "NaN" not in line and "Infinity" not in line


def test_strict_line_degrades_oversized_suite():
    import json
    suite = {f"very_long_configuration_name_{i:03d}":
             {"utts_per_sec": float(i), "latency_ms": float(i),
              "chunk_ms": float(i), "mfu_pct": 1.0, "pct_of_roof": 2.0}
             for i in range(60)}
    record = {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1.0,
              "extra": {"device": "d", "suite": bench._compact_suite(suite),
                        "full": "BENCH_FULL.json"}}
    line = bench._strict_line(record)
    assert len(line) <= bench._EMIT_LIMIT
    json.loads(line)


def test_compact_suite_keeps_primary_fields_and_errors():
    suite = {"a": {"utts_per_sec": 10.0, "ms_per_batch": 5.0,
                   "mfu_pct": 1.0, "pct_of_roof": 2.0, "rtfx": 9.9},
             "b": {"error": "X" * 500}}
    comp = bench._compact_suite(suite)
    assert comp["a"] == {"utts_per_sec": 10.0, "mfu_pct": 1.0,
                         "pct_of_roof": 2.0}
    assert len(comp["b"]["error"]) == 60


def test_bench_unknown_only_fails_fast(tmp_path):
    """A mistyped --only must exit 2 with the valid names on stderr —
    it used to fall through every config and exit 0 with NO output."""
    env = dict(os.environ, ASR_TPU_BENCH_CPU="1",
               ASR_TPU_COMPILE_CACHE=str(tmp_path))
    r = subprocess.run([sys.executable, str(_BENCH), "--only", "nope"],
                       env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode == 2, (r.returncode, r.stderr[-300:])
    assert "unknown --only" in r.stderr and "lm_only" in r.stderr
    assert not r.stdout.strip()


@pytest.mark.slow
def test_bench_deadline_watchdog_emits_partial_line(tmp_path):
    """A deadline hit mid-suite must still print ONE strictly parseable
    JSON line (rc=3) — the no-stdout-line failure mode of round 3."""
    env = dict(os.environ, ASR_TPU_BENCH_CPU="1",
               ASR_TPU_BENCH_DEADLINE="25", ASR_TPU_BENCH_PROBE_WAIT="120",
               ASR_TPU_COMPILE_CACHE=str(tmp_path))
    r = subprocess.run([sys.executable, str(_BENCH)], env=env,
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 3, (r.returncode, r.stderr[-500:])
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert isinstance(rec["value"], (int, float))
    assert "deadline" in rec["extra"]["note"]


@pytest.mark.slow
def test_bench_sigterm_during_probe_wait_emits_line(tmp_path):
    """A TERM while bench is still waiting for the tunnel (the probe loop
    can hold for ~65 min during an outage — exactly when an external
    wall-clock cap fires) must also flush the one strict line: the
    handlers are installed BEFORE the probe loop."""
    env = dict(os.environ,
               # a guaranteed-unknown platform name: the probe subprocess
               # fails on ANY machine (JAX_PLATFORMS="tpu" would succeed
               # on a real TPU host and silently skip the probe loop) ->
               # bench stays in the loop
               JAX_PLATFORMS="no_such_platform",
               ASR_TPU_BENCH_DEADLINE="600", ASR_TPU_BENCH_PROBE_WAIT="300",
               ASR_TPU_COMPILE_CACHE=str(tmp_path))
    env.pop("ASR_TPU_BENCH_CPU", None)
    # sitecustomize would re-register axon and override JAX_PLATFORMS,
    # letting the probe SUCCEED against a live tunnel (the TERM would then
    # test the mid-suite path on the real TPU instead of the probe loop)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    p = subprocess.Popen([sys.executable, str(_BENCH)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    time.sleep(20)          # inside the probe loop (first probe ~5-10 s)
    p.send_signal(signal.SIGTERM)
    out, err = p.communicate(timeout=120)
    assert p.returncode == 4, (p.returncode, err[-500:])
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert "terminated by signal" in rec["extra"]["note"]


@pytest.mark.slow
def test_bench_sigterm_emits_partial_line(tmp_path):
    """An external TERM (driver wall-clock cap) must flush the partial
    line before dying (rc=4)."""
    env = dict(os.environ, ASR_TPU_BENCH_CPU="1",
               ASR_TPU_BENCH_DEADLINE="600", ASR_TPU_BENCH_PROBE_WAIT="120",
               ASR_TPU_COMPILE_CACHE=str(tmp_path))
    p = subprocess.Popen([sys.executable, str(_BENCH)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    time.sleep(30)          # past the CPU probe, inside the suite build
    p.send_signal(signal.SIGTERM)
    out, err = p.communicate(timeout=120)
    assert p.returncode == 4, (p.returncode, err[-500:])
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert "terminated by signal" in rec["extra"]["note"]


# ---- _EmitOnce: the signal-safe single-shot emit guard ----------------


def test_emit_once_runs_exactly_once():
    g = bench._EmitOnce(_exit=lambda code: None)
    calls = []
    assert g.run(lambda: calls.append(1)) is True
    assert g.run(lambda: calls.append(2)) is False
    assert calls == [1]


def test_emit_once_reentry_from_same_thread_noops():
    """A signal handler interrupting its own thread's emit re-enters
    run(); the inner call must no-op (NOT deadlock — the round-4
    incident) and the outer call must still land the line."""
    g = bench._EmitOnce(_exit=lambda code: None)
    calls = []

    def fn():
        # simulate the handler firing mid-emit on the same thread
        assert g.run(lambda: calls.append("inner")) is False
        calls.append("outer")

    assert g.run(fn) is True
    assert calls == ["outer"]


def test_emit_once_defer_exit_fires_after_emit_completes():
    exits = []
    g = bench._EmitOnce(_exit=exits.append)
    calls = []

    def fn():
        # handler arrives mid-emit: defers instead of exiting
        assert g.defer_exit(4) is True
        assert exits == []          # not yet — the line must land first
        calls.append("line")

    g.run(fn)
    assert calls == ["line"] and exits == [4]


def test_emit_once_defer_exit_outside_run_is_false():
    g = bench._EmitOnce(_exit=lambda code: None)
    assert g.defer_exit(4) is False


def test_emit_once_cross_thread_single_shot():
    import threading

    g = bench._EmitOnce(_exit=lambda code: None)
    calls = []
    ran = []

    def worker():
        ran.append(g.run(lambda: (time.sleep(0.05), calls.append(1))))

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert calls == [1] and sorted(ran) == [False, False, False, True]


def test_measure_autos_smoke_harness(tmp_path):
    """tools/measure_autos.py must stay runnable: it is the script a
    short TPU tunnel window depends on for the two pending ``auto``
    crossovers (Stride2Conv layout, matfft epilogue). --cpu --smoke
    exercises the full harness (both experiments, incl. the Pallas
    epilogue in interpret mode) on tiny shapes."""
    tools = os.path.join(_BENCH.rsplit("/", 1)[0], "tools",
                         "measure_autos.py")
    env = dict(os.environ, ASR_TPU_COMPILE_CACHE=str(tmp_path))
    r = subprocess.run([sys.executable, tools, "--cpu", "--smoke"],
                       env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    recs = [json.loads(ln) for ln in r.stdout.splitlines() if ln.strip()]
    keys = {k for rec in recs for k in rec}
    assert {"device", "stride2conv", "fft_epilogue"} <= keys, recs
    s2c = next(rec for rec in recs if "stride2conv" in rec)["stride2conv"]
    for b in (8, 64):
        for layout in ("plain", "pack"):
            cfg = s2c[f"b{b}_{layout}"]
            assert cfg["fwd_ms"] > 0 and cfg["fwdbwd_ms"] > 0, s2c
    fft = next(rec for rec in recs if "fft_epilogue" in rec)["fft_epilogue"]
    assert "xla_ms" in fft and "pallas_ms" in fft, fft


def test_profile_am_fwd_smoke_harness(tmp_path):
    """tools/profile_am_fwd.py must stay runnable: it is the script the
    DESIGN §9 AM-forward stage ledger comes from (slope-timed per-stage
    decomposition of the pipeline's dominant cost). --cpu --smoke runs
    every stage plus the f32/bf16 logits comparison on tiny shapes."""
    tools = os.path.join(_BENCH.rsplit("/", 1)[0], "tools",
                         "profile_am_fwd.py")
    env = dict(os.environ, ASR_TPU_COMPILE_CACHE=str(tmp_path))
    r = subprocess.run([sys.executable, tools, "--cpu", "--smoke"],
                       env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    recs = [json.loads(ln) for ln in r.stdout.splitlines() if ln.strip()]
    stages = next(rec for rec in recs if "am_fwd_stages" in rec
                  )["am_fwd_stages"]
    for k in ("cell1_pooled_fullres", "stage1_rest", "stage2", "stage3",
              "stages45_head", "logits_dense_f32",
              "logits_dense_bf16acc32", "full_sedfcnn_logits_f32",
              "full_sedfcnn_logits_bf16"):
        assert k in stages, (k, stages)


def test_bench_unreachable_tunnel_emits_line_with_prior(tmp_path):
    """probe_wait exhausted -> rc=1 and ONE strict line whose note says
    no measurements were taken and cites the last recorded suite (so an
    outage round doesn't read as a perf regression)."""
    env = dict(os.environ,
               JAX_PLATFORMS="no_such_platform",  # probe fails anywhere
               ASR_TPU_BENCH_DEADLINE="600", ASR_TPU_BENCH_PROBE_WAIT="1",
               ASR_TPU_COMPILE_CACHE=str(tmp_path))
    env.pop("ASR_TPU_BENCH_CPU", None)
    # The image's sitecustomize registers the axon backend for every
    # interpreter when PALLAS_AXON_POOL_IPS is set, OVERRIDING
    # JAX_PLATFORMS — with a live tunnel the probe then SUCCEEDS and
    # bench runs the real suite (observed: this test timing out at 300 s
    # mid-benchmark). Dropping the var keeps sitecustomize inert so the
    # bogus platform genuinely fails the probe subprocess everywhere.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, str(_BENCH)], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 1, (r.returncode, r.stderr[-300:])
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert rec["value"] == 0.0
    note = rec["extra"]["note"]
    assert "unreachable" in note and "no measurements" in note
    if os.path.exists(os.path.join(os.path.dirname(_BENCH),
                                   "BENCH_FULL.json")):
        assert "last recorded suite" in note and "utt/s" in note


def test_full_record_merges_stale_stamped_prior_suite(tmp_path):
    """EVERY run (full or --only) seeds from the prior record with stale
    stamps; fresh configs overwrite their slot. Round-4 postmortem: a
    full run used to start fresh, so a mid-suite kill at 3/14 configs
    ERASED the previous complete ledger."""
    path = str(tmp_path / "BENCH_FULL.json")
    bench._write_full_record(path, "devA", 128,
                             {"am_lm_b128": {"utts_per_sec": 2000.0,
                                             "run": 4},
                              "lm_only": {"utts_per_sec": 17000.0}},
                             run=4)
    prior = bench._load_prior_suite(path)
    assert set(prior) == {"am_lm_b128", "lm_only"}
    # stale stamps everywhere; per-entry run kept, file-level run
    # backfills entries that predate run-stamping
    assert prior["am_lm_b128"] == {"utts_per_sec": 2000.0, "run": 4,
                                   "stale": True}
    assert prior["lm_only"]["stale"] and prior["lm_only"]["run"] == 4
    # a partial run of ONE config must preserve the other slot
    bench._write_full_record(path, "devA", 128,
                             {"lm_only": {"utts_per_sec": 18000.0,
                                          "run": 5}},
                             prior, run=5)
    rec = json.load(open(path))
    assert rec["run"] == 5
    assert rec["suite"]["am_lm_b128"]["utts_per_sec"] == 2000.0  # kept
    assert rec["suite"]["am_lm_b128"]["stale"] is True
    assert rec["suite"]["lm_only"] == {"utts_per_sec": 18000.0, "run": 5}
    # a missing/corrupt prior file is fine
    assert bench._load_prior_suite(str(tmp_path / "nope.json")) == {}


def test_coverage_counts_fresh_stale_errors():
    merged = {"a": {"utts_per_sec": 1.0},
              "b": {"utts_per_sec": 2.0, "stale": True},
              "c": {"error": "boom"},
              "d": {"utts_per_sec": 3.0, "stale": True,
                    "last_error": "x"}}
    assert bench._coverage(merged) == (1, 2, 1)


def test_compact_suite_marks_stale_entries():
    comp = bench._compact_suite(
        {"a": {"utts_per_sec": 10.0, "stale": True, "run": 3},
         "b": {"utts_per_sec": 11.0, "run": 5}})
    assert comp["a"] == {"utts_per_sec": 10.0, "stale": True}
    assert comp["b"] == {"utts_per_sec": 11.0}


def test_current_run_is_one_past_driver_records():
    # the repo holds BENCH_r01..r04 -> the running round is 5
    import glob
    import re
    here = os.path.dirname(_BENCH)
    expect = max(int(re.search(r"BENCH_r(\d+)", p).group(1))
                 for p in glob.glob(os.path.join(here, "BENCH_r*.json"))) + 1
    assert bench._current_run() == expect


def test_roofline_flags_impossible_pct_of_roof():
    """pct_of_roof > 100 means the measurement (not the model) is wrong —
    the entry must carry a roof_note flag instead of shipping silently."""
    import unittest.mock as mock
    with mock.patch.object(bench, "_peaks", return_value=(100.0, 800.0)):
        # dt far below the compute roof: 1e12 flops can't run in 1 ms
        # at 100 TFLOP/s
        out = bench._roofline(0.001, {"flops": 1e12}, min_bytes=1e6)
    assert out["pct_of_roof"] > 100.0
    assert "roof_note" in out
    with mock.patch.object(bench, "_peaks", return_value=(100.0, 800.0)):
        ok = bench._roofline(0.02, {"flops": 1e12}, min_bytes=1e6)
    assert "roof_note" not in ok

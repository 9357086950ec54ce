"""Unit tests for bench.py's roofline accounting (VERDICT r2 #3).

The timing harness itself is validated on-chip by ``bench.py
--calibrate``; these cover the pure-python cost/roofline math so the
columns can't silently vanish or mis-scale again (XLA counts a while
body once per program — the round-3 bug that zeroed every slope).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402


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
    # 1e9 bytes at 800 GB/s -> 1.25 ms hbm roof -> compute-bound
    import unittest.mock as mock
    with mock.patch.object(bench, "_peaks", return_value=(100.0, 800.0)):
        out = bench._roofline(0.02, {"flops": 1e12, "bytes": 1e9})
    assert out["bound"] == "compute"
    assert abs(out["roof_ms"] - 10.0) < 1e-6
    assert abs(out["mfu_pct"] - 50.0) < 1e-6       # 50 of 100 TFLOP/s
    assert abs(out["achieved_tflops"] - 50.0) < 1e-6
    assert abs(out["hbm_gbps"] - 50.0) < 1e-6
    assert abs(out["pct_of_roof"] - 50.0) < 1e-6
    with mock.patch.object(bench, "_peaks", return_value=(100.0, 800.0)):
        out = bench._roofline(0.02, {"flops": 1e11, "bytes": 1e10})
    assert out["bound"] == "hbm"


def test_roofline_without_peaks():
    import unittest.mock as mock
    with mock.patch.object(bench, "_peaks", return_value=(None, None)):
        out = bench._roofline(0.01, {"flops": 1e12, "bytes": 1e9})
    assert "mfu_pct" not in out and "bound" not in out
    assert out["achieved_tflops"] == 100.0

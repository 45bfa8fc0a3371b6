"""bench.py's control-spread gate (verdict r09 item 5): BENCH_r09's
vs_prev false-alarmed (normalized_total_ratio 1.215 on an untouched
headline set) because the ~0.5 s control drifted between rounds. The
hardened protocol measures a ≥2 s control BEFORE and AFTER the headline
set and refuses to emit normalized ratios when the pair's spread exceeds
the bound — pure-function logic, unit-tested here without a session."""

from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _bench()


def test_control_spread_is_relative_to_the_faster_run(bench):
    assert bench._control_spread(2.0, 2.0) == 0.0
    assert bench._control_spread(2.0, 2.2) == pytest.approx(0.1)
    assert bench._control_spread(2.2, 2.0) == pytest.approx(0.1)  # symmetric
    assert bench._control_spread(0.0, 2.0) == float("inf")


def test_gate_is_asymmetric(bench):
    """Slowdowns (post > pre) are weather and gate at 20% (the measured
    idle-box pre/post envelope is ±13%); speedups are the benign
    deep-JIT direction and gate only past 35%."""
    assert bench._control_gate_ok(2.0, 2.0)
    assert bench._control_gate_ok(2.0, 2.4)          # +20% slowdown: at bound
    assert not bench._control_gate_ok(2.0, 2.5)      # +25% slowdown: weather
    assert bench._control_gate_ok(2.0, 1.7)          # −15%: JIT envelope
    assert not bench._control_gate_ok(2.0, 1.4)      # −43%: implausible
    assert not bench._control_gate_ok(0.0, 1.0)


def _prev(queries, control=0.5):
    return {
        "_round": 9,
        "queries": queries,
        "control_sec": control,
        "control_workload": "synthetic-v1",
        "method": "warm-best-of-3",
    }


def test_gate_withholds_ratios_on_wide_spread(bench):
    timings = {"q1": 1.0}
    out = bench._vs_prev_normalized(
        timings, 1.0, 0.5, spread=(2.0, 2.5), prev=_prev({"q1": 1.0})
    )
    assert set(out) == {"status"}
    assert "inconclusive" in out["status"] and "re-run" in out["status"]
    assert "0.25" in out["status"]


def test_gate_passes_ratios_on_tight_spread(bench):
    timings = {"q1": 2.0, "q2": 1.0}
    out = bench._vs_prev_normalized(
        timings, 3.0, 1.0, spread=(2.0, 2.05),
        prev=_prev({"q1": 1.0, "q2": 1.0}, control=0.5),
    )
    # control doubled (box 2× slower): q1 at 2.0 vs prev 1.0 is UNCHANGED
    # code speed, q2 at 1.0 is 2× faster code
    assert out["control_ratio"] == pytest.approx(2.0)
    assert out["normalized_query_ratio"]["q1"] == pytest.approx(1.0)
    assert out["normalized_query_ratio"]["q2"] == pytest.approx(0.5)
    assert out["baseline_round"] == 9


def test_gate_passes_the_benign_jit_speedup(bench):
    """The measured idle-box shape — pre≈1.91, post≈1.70 — must emit
    ratios, not cry wolf."""
    out = bench._vs_prev_normalized(
        {"q1": 1.0}, 1.0, 0.5,
        spread=(1.91, 1.70), prev=_prev({"q1": 1.0}),
    )
    assert "normalized_query_ratio" in out


def test_incomparable_previous_artifact_yields_none(bench):
    prev = _prev({"q1": 1.0})
    prev["control_workload"] = "something-else"
    assert bench._vs_prev_normalized(
        {"q1": 1.0}, 1.0, 0.5, spread=(2.0, 2.0), prev=prev
    ) is None


# ---------------------------------------------------------------------------
# Run-time calibration (verdict r10 item 7): bounds derived from the
# run's own within-regime rep spread — not one box's constants
# ---------------------------------------------------------------------------


def test_calibration_derives_bounds_from_rep_spread(bench):
    """A quiet box (tight reps) earns a tight gate; a noisy one a wide
    gate — 3x the worst within-regime spread, floored and capped."""
    quiet = bench._calibrate_gate_bounds([2.00, 2.02, 2.01], [1.98, 2.00, 1.99])
    assert quiet["calibration"] == "3x-within-regime-rep-spread"
    assert quiet["slowdown_bound"] == bench.GATE_MIN_SLOW_BOUND  # floored
    assert quiet["speedup_bound"] == pytest.approx(
        quiet["slowdown_bound"] + bench.GATE_JIT_ALLOWANCE
    )
    assert quiet["reps"] == 6
    noisy = bench._calibrate_gate_bounds([2.0, 2.3, 2.1], [2.0, 2.2, 2.05])
    assert noisy["slowdown_bound"] == pytest.approx(3 * 0.15, abs=1e-3)
    assert noisy["slowdown_bound"] > quiet["slowdown_bound"]
    crazy = bench._calibrate_gate_bounds([2.0, 4.0, 2.0], [2.0, 2.0, 2.0])
    assert crazy["slowdown_bound"] == bench.GATE_MAX_SLOW_BOUND  # capped


def test_calibration_fails_safe_to_constants(bench):
    """Degenerate rep lists (empty, zero times) must never produce a
    meaningless bound — the documented constants take over."""
    for pre, post in ([], []), ([2.0, 2.1, 2.0], []), ([0.0, 2.0], [2.0]):
        got = bench._calibrate_gate_bounds(pre, post)
        assert got["calibration"] == "fallback-constants"
        assert got["slowdown_bound"] == bench.CONTROL_SPREAD_BOUND
        assert got["speedup_bound"] == bench.CONTROL_SPEEDUP_BOUND


def test_derived_bounds_drive_the_gate(bench):
    """The same pre/post pair passes under a wide derived bound and is
    withheld under a tight one — and the status line names the bound it
    was judged against."""
    timings = {"q1": 1.0}
    prev = _prev({"q1": 1.0})
    tight = {"slowdown_bound": 0.10, "speedup_bound": 0.25}
    wide = {"slowdown_bound": 0.45, "speedup_bound": 0.60}
    pair = (2.0, 2.4)  # +20% slowdown
    out_tight = bench._vs_prev_normalized(
        timings, 1.0, 0.5, spread=pair, prev=prev, bounds=tight
    )
    assert set(out_tight) == {"status"}
    assert "0.1" in out_tight["status"]
    out_wide = bench._vs_prev_normalized(
        timings, 1.0, 0.5, spread=pair, prev=prev, bounds=wide
    )
    assert "normalized_query_ratio" in out_wide

"""Pure-python tests for the bench regression gate
(scripts/bench_all.py::regressions) — verdict item: the gate must fail
on an injected regression and pass on host noise / new queries."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench_all",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "bench_all.py"),
)
bench_all = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_all)
regressions = bench_all.regressions


BASE = {"q01": 1.0, "q20": 4.0, "q23": 0.2}


def test_injected_regression_is_flagged():
    bad = regressions({"q01": 1.0, "q20": 13.0, "q23": 0.2}, BASE)
    assert any(m.startswith("q20:") for m in bad)
    assert not any(m.startswith(("q01:", "q23:")) for m in bad)


def test_measured_noise_envelope_passes():
    # 2.7x on one query (the amplitude observed between two quiet runs
    # of the SAME build) must not flake the gate
    assert regressions({"q01": 1.0, "q20": 4.0 * 2.7, "q23": 0.2},
                       BASE, total_tolerance=4.0) == []


def test_small_absolute_jitter_ignored_by_abs_floor():
    # 0.2s -> 1.1s is 5.5x but only +0.9s absolute: noise, not a fail
    assert regressions({"q01": 1.0, "q20": 4.0, "q23": 1.1}, BASE) == []


def test_total_gate_catches_broad_slowdown():
    # every query 1.8x: no single query trips 3x, the TOTAL trips 1.5x
    cur = {k: v * 1.8 for k, v in BASE.items()}
    bad = regressions(cur, BASE)
    assert len(bad) == 1 and bad[0].startswith("TOTAL:")


def test_added_and_removed_queries_are_skipped():
    cur = {"q01": 1.0, "q99_new": 60.0}  # q20/q23 removed, q99 added
    assert regressions(cur, BASE) == []


def test_tolerance_override():
    assert regressions({"q01": 3.2, "q20": 4.0, "q23": 0.2}, BASE,
                       tolerance=3.0, total_tolerance=2.0) == [
        "q01: 3.20s vs baseline 1.00s (3.2x > 3.0x)"
    ]

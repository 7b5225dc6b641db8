"""Pure-python tests for the bench regression gate
(scripts/bench_all.py::regressions) — verdict item: the gate must fail
on an injected regression and pass on noise/new queries."""

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
    bad = regressions({"q01": 1.0, "q20": 7.0, "q23": 0.2}, BASE)
    assert len(bad) == 1 and bad[0].startswith("q20:")


def test_within_tolerance_passes():
    assert regressions({"q01": 1.4, "q20": 5.9, "q23": 0.25}, BASE) == []


def test_subsecond_jitter_ignored_by_abs_floor():
    # 0.2s -> 0.45s is 2.25x but only +0.25s absolute: noise, not a fail
    assert regressions({"q01": 1.0, "q20": 4.0, "q23": 0.45}, BASE) == []


def test_added_and_removed_queries_are_skipped():
    cur = {"q01": 1.0, "q99_new": 60.0}  # q20/q23 removed, q99 added
    assert regressions(cur, BASE) == []


def test_tolerance_override():
    assert regressions({"q01": 2.2, "q20": 4.0, "q23": 0.2}, BASE,
                       tolerance=2.0) == ["q01: 2.20s vs baseline 1.00s (2.2x > 2.0x)"]

#!/usr/bin/env python
"""Full-registry timing evidence: run EVERY registry query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and write per-query
wall-clock JSON, so a slow non-headline query cannot hide behind
bench.py's 19-query headline set.

    python scripts/bench_all.py --json BENCH_SELF_r05.json

Timing matches bench.py: adaptive best-of-N per query (re-run until
the two fastest samples agree within 20%, up to a cap), caches cleared
between runs (see bench.py for why: the sandbox VM shows multi-second
CPU-steal stalls that a fixed best-of-2 doesn't filter).

Regression gate (CI role): compare against a committed baseline and
exit nonzero when any query regresses past tolerance —

    python scripts/bench_all.py --json cur.json --gate BENCH_SELF_r05.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_scraping_spark.queries import REGISTRY  # noqa: E402
from datapipeline_scraping_spark.session import build_spark  # noqa: E402


def _host_calib() -> float:
    """Same host-speed constant as bench.py (single-thread md5 over
    128 MiB, best of 3) — normalizes cross-round totals against VM
    clock variance."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return round(mod.host_calibration(), 4)


def _spark_calib(spark) -> float:
    """Fixed PARALLEL probe (best of 2): a constant-size 32-partition
    shuffle+aggregate whose wall-clock tracks what the queries actually
    feel — executor-thread throughput and stage-barrier latency.

    Why a second probe (r13, VERDICT r12 watch item): the single-thread
    md5 probe missed a contention episode that inflated a run of short
    queries x1.7-2.5 — steal/contention over a SUBSET of the VM's CPUs
    slows every 32-thread stage barrier while leaving a 1-thread CPU
    probe untouched (the regressed bodies were unchanged and re-measured
    at r11-level on a quiet host, standalone AND in suite order). A
    group is now suspect when EITHER probe's brackets drift."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(32 * 500_000).selectExpr("id % 97 AS k").groupBy(
            "k"
        ).count().count()
        best = min(best, time.perf_counter() - t0)
    return best


def regressions(
    current: dict[str, float],
    baseline: dict[str, float],
    *,
    tolerance: float = 3.0,
    abs_floor: float = 1.0,
    total_tolerance: float = 1.5,
) -> list[str]:
    """Regression report: per-query AND total-time checks.

    Per-query: slower than ``tolerance x`` baseline AND ``abs_floor``
    seconds absolute. The 3x default sits above this host's MEASURED
    noise floor — two back-to-back quiet runs of the same build showed
    individual queries at 2.5-2.7x even with adaptive best-of-2
    sampling — while still catching the regressions that matter
    (a lost broadcast, an accidental cartesian, a Python fallback are
    all >=3x; structural regressions are ALSO caught deterministically
    by tests/test_plan_lint.py).

    Total: the summed time over queries present in both runs must stay
    within ``total_tolerance x`` — noise averages out across 100+
    queries (quiet-machine totals repeat within ~1%), so the total is
    sensitive to broad slowdowns no single query trips.

    Queries missing from either side (added/removed since the
    baseline) are skipped — the gate protects existing coverage, it
    doesn't freeze the registry."""
    out = []
    cur_total = base_total = 0.0
    for name, base in baseline.items():
        cur = current.get(name)
        if cur is None or base <= 0:
            continue
        cur_total += cur
        base_total += base
        if cur > base * tolerance and cur - base > abs_floor:
            out.append(
                f"{name}: {cur:.2f}s vs baseline {base:.2f}s "
                f"({cur / base:.1f}x > {tolerance}x)"
            )
    if base_total > 0 and cur_total > base_total * total_tolerance:
        out.append(
            f"TOTAL: {cur_total:.1f}s vs baseline {base_total:.1f}s "
            f"({cur_total / base_total:.2f}x > {total_tolerance}x)"
        )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    max_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_RUNS", "5")))
    json_path = None
    if "--json" in sys.argv:
        json_path = sys.argv[sys.argv.index("--json") + 1]
    gate_path = None
    if "--gate" in sys.argv:
        gate_path = sys.argv[sys.argv.index("--gate") + 1]

    spark = build_spark(app_name="dps-bench-all")
    spark.range(1).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").count()
    # warm the parallel probe to CONVERGENCE before the first bracket:
    # its shuffle+agg shape JIT-tiers over repeated executions (first
    # run ~1.9x, and it keeps dropping for several more), which would
    # otherwise mark the early groups suspect on every clean run —
    # warm until two consecutive probes agree within 10% (bounded)
    prev = _spark_calib(spark)
    for _ in range(10):
        cur = _spark_calib(spark)
        if cur >= prev * 0.9:
            break
        prev = cur

    # host calibration re-runs BETWEEN query groups (VERDICT r11 item
    # 6): this VM shows ~25-minute CPU-steal EPISODES during which the
    # adaptive agreement filter can accept two agreeing-but-inflated
    # samples; a single whole-run calibration cannot localize them.
    # Each group of queries is BRACKETED by calibration probes, so an
    # episode marks exactly its own rows suspect in the artifact.
    calib_every = max(
        1, int(os.environ.get("SPARK_GRAFT_BENCH_CALIB_EVERY", "25"))
    )
    per_query: dict[str, float] = {}
    rejected: dict[str, int] = {}
    query_group: dict[str, int] = {}
    group_calib: list[float] = []
    group_spark_calib: list[float] = []
    total = 0.0
    for i, (name, spec) in enumerate(REGISTRY.items()):
        if i % calib_every == 0:
            group_calib.append(_host_calib())
            group_spark_calib.append(_spark_calib(spark))
        query_group[name] = len(group_calib) - 1
        samples: list[float] = []
        n = -1
        while len(samples) < max_runs:
            t0 = time.perf_counter()
            n = spec.fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            if len(samples) >= n_runs:
                if len(samples) < 2:
                    break  # RUNS=1: explicit single-sample quick mode
                lo = sorted(samples)[:2]
                if lo[1] <= lo[0] * 1.2:
                    break
        best = min(samples)
        per_query[name] = round(best, 3)
        rejected[name] = len(samples) - 1
        total += best
        print(
            f"# {name}: {best:.3f}s ({n} rows, {len(samples)} runs)",
            file=sys.stderr, flush=True,
        )
    group_calib.append(_host_calib())  # closing bracket for the tail
    group_spark_calib.append(_spark_calib(spark))

    # a group is suspect when EITHER bracketing probe of EITHER kind
    # ran >=1.4x the run's MEDIAN probe — steal starting mid-group
    # surfaces at the next checkpoint, steal ending mid-group at the
    # previous one; partial-CPU contention surfaces only in the
    # parallel probe (r13). Median, not min: the parallel probe keeps
    # JIT-tiering slowly downward across a 20-minute run, and a
    # min-anchored threshold read that drift as a fleet-wide episode
    # (an episode is a SPIKE against the run's typical probe, which
    # the median tracks and the min does not).
    import statistics

    best_calib = min(group_calib)
    best_spark_calib = min(group_spark_calib)
    med_calib = statistics.median(group_calib)
    med_spark_calib = statistics.median(group_spark_calib)
    suspect_groups = sorted(
        gi
        for gi in range(len(group_calib) - 1)
        if max(group_calib[gi], group_calib[gi + 1]) > med_calib * 1.4
        or max(group_spark_calib[gi], group_spark_calib[gi + 1])
        > med_spark_calib * 1.4
    )
    suspect = sorted(
        n for n, gi in query_group.items() if gi in suspect_groups
    )
    if suspect:
        print(
            f"# WARNING: calib drift marks {len(suspect)} queries "
            f"suspect (groups {suspect_groups}) — re-measure them "
            f"standalone before trusting regressions",
            file=sys.stderr,
        )

    # cold streaming-lifecycle rows (r13, VERDICT r12 item 7): the
    # ledger memoization makes the suite fast but hides streaming cost
    # drift — force ONE cold lifecycle per round for a sliding-window
    # aggregation and a stream-stream join so a stateful-shuffle
    # regression stays observable. Cold = the memo ledger removed, so
    # the timed run pays the full AvailableNow lifecycle (stage +
    # checkpoint + stateful shuffle + commit); the warm number for the
    # same query sits in `queries`.
    import shutil

    from datapipeline_scraping_spark.streaming.events import (
        SCRATCH as _SCRATCH,
    )

    cold_streaming: dict[str, float] = {}
    skey = sf_dir.rstrip("/").replace("/", "_").lstrip("_").replace(".", "_")
    # bracket the cold block with its own probe pair — it runs after
    # the last per-group bracket, and an unguarded steal episode here
    # would read as a stateful-shuffle regression in round evidence
    cold_probes = [_spark_calib(spark)]
    for name, tag in (
        ("q47_stream_sliding_window", "q47sw"),
        ("q97_stream_stream_join", "q97sj"),
    ):
        if name not in REGISTRY:
            continue
        shutil.rmtree(
            os.path.join(_SCRATCH, f"{tag}_{skey}"), ignore_errors=True
        )
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        cold_streaming[name] = round(time.perf_counter() - t0, 3)
        print(
            f"# cold {name}: {cold_streaming[name]:.3f}s",
            file=sys.stderr, flush=True,
        )
    cold_probes.append(_spark_calib(spark))
    cold_suspect = max(cold_probes) > med_spark_calib * 1.4

    out = {
        "metric": "bench_all_total_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        # samples the agreement filter discarded per query (runs - 1):
        # high counts flag host CPU-steal noise, not code regressions
        "rejected_samples": rejected,
        "host_calib_sec": best_calib,
        "spark_calib_sec": best_spark_calib,
        # bracketing calibration probes: group_calib_sec[i] ran before
        # the queries whose query_calib_group == i (and [i+1] after)
        "group_calib_sec": [round(c, 4) for c in group_calib],
        # parallel (32-thread shuffle) probe at the same brackets —
        # catches partial-CPU contention the 1-thread probe misses
        "group_spark_calib_sec": [round(c, 4) for c in group_spark_calib],
        "calib_every": calib_every,
        "query_calib_group": query_group,
        # one forced-cold streaming lifecycle per family (warm twin in
        # `queries`) — keeps stateful-shuffle cost drift observable
        # despite the memoization; suspect=true when the block's own
        # probe brackets drifted (host noise, re-measure standalone)
        "cold_streaming_sec": cold_streaming,
        "cold_streaming_probes_sec": [round(c, 4) for c in cold_probes],
        "cold_streaming_suspect": cold_suspect,
        "suspect_queries": suspect,
        "sf": sf_dir,
        "runs": n_runs,
        "slowest": sorted(per_query, key=per_query.get, reverse=True)[:5],
    }
    print(json.dumps(out))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(out, fh, indent=2)
    spark.stop()

    if gate_path:
        with open(gate_path) as fh:
            baseline = json.load(fh)["queries"]
        tol = float(os.environ.get("SPARK_GRAFT_BENCH_TOLERANCE", "3.0"))
        bad = regressions(per_query, baseline, tolerance=tol)
        for msg in bad:
            print(f"REGRESSION {msg}", file=sys.stderr)
        if bad:
            sys.exit(2)
        print(f"# gate ok: no query regressed past {tol}x vs {gate_path}",
              file=sys.stderr)


if __name__ == "__main__":
    main()

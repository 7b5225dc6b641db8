#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of all benchmark queries (each
executed to completion via a count-collapsing action so the full plan
runs but the driver doesn't pay collect-to-python cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_orders",
    "q07_first_wins_dedup",
    "q08_customer_order_analytics",
    "q12_delta_detection",
    "q17_event_daily_rollup",
    # r14: q19 retired; the banded-LSH family slot moved to the
    # MLlib production path (same shingle->minhash->band shape)
    "q74_ml_minhash_lsh",
    "q20_jaccard_neardup",
    "q21_cosine_topk",
    "q22_simhash",
    "q23_text_metrics",
    "q27_classify_backend",
    "q32_sessionization",
    "q53_tfidf_topterms",
    "q61_asof_join",
    "q62_bucketed_join",
    "q84_volume_shipping",
    "q85_product_profit",
]


def host_calibration() -> float:
    """Fixed single-thread CPU workload (md5 over 128 MiB in 1 KiB
    chunks, best of 3): a host-speed constant that lets a reader
    separate engine regressions from VM-speed variance across rounds.
    Observed motivation: consecutive round benches of UNCHANGED plans
    have differed by a uniform 30-50 % across every query including
    constant-plan trivials — i.e. the host clock, not the engine.
    Compare two rounds' totals as total/host_calib_sec."""
    import hashlib

    blob = bytes(range(256)) * 4
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        h = hashlib.md5()
        for _ in range(131072):
            h.update(blob)
        best = min(best, time.perf_counter() - t0)
    return best


def host_calibration_parallel(n_threads: int) -> float:
    """The same md5 workload on ``n_threads`` OS threads at once (md5
    releases the GIL for >2 KiB buffers, so the threads genuinely run
    in parallel), wall-clock best of 3. Motivation (r16 verdict item
    3): the single-thread probe provably cannot see multi-core CPU
    steal — in r16 it got FASTER (0.235 -> 0.217) while every parallel
    query slowed 20-50 %. A reader normalizes parallel-stage drift
    against this number the way single-stage drift is normalized
    against host_calib_sec."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    blob = bytes(range(256)) * 4
    # per-thread chunk sized so total work ~= 3x the single-thread
    # probe regardless of thread count (bounded wall time on any host)
    per_thread = max(1, (131072 * 3) // max(1, n_threads))

    def one() -> None:
        h = hashlib.md5()
        for _ in range(per_thread):
            h.update(blob)

    best = float("inf")
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        for _ in range(3):
            t0 = time.perf_counter()
            list(pool.map(lambda _i: one(), range(n_threads)))
            best = min(best, time.perf_counter() - t0)
    return best


def read_steal_ticks() -> int | None:
    """Cumulative host steal ticks from /proc/stat (column 8 of the
    aggregate cpu line), or None when unreadable. The delta across the
    bench run is the direct CPU-steal bracket the r16 verdict asked
    for: sustained multi-core steal inflates every parallel stage while
    leaving the single-thread calibration flat."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8]) if parts and parts[0] == "cpu" else None
    except (OSError, IndexError, ValueError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from datapipeline_scraping_spark.queries import REGISTRY
    from datapipeline_scraping_spark.session import build_spark

    steal_t0 = read_steal_ticks()
    spark = build_spark(app_name="dps-bench")
    # warm the JVM + parquet footers with a trivial action, and pre-spawn
    # the Python worker pool (pandas/pyarrow import storm) so the first
    # pandas-UDF query isn't charged the one-time worker startup
    spark.range(1).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").count()

    # adaptive best-of-N timing: the sandboxed VM shows multi-second
    # CPU-steal stalls (the same plan measured 2.7 s and 55 s in
    # consecutive bench invocations), so a single cold sample — and
    # even a fixed best-of-2 — conflates engine cost with host noise
    # and JIT warmup.  Each query runs at least MIN_RUNS times and
    # keeps re-running (up to MAX_RUNS) until the two fastest samples
    # agree within 20 %; the reported number is the fastest complete
    # execution (caches cleared between runs, so every run recomputes
    # the full plan).
    min_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    max_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_RUNS", "5")))
    # The minhash/cosine/simhash trio runs partly in INTERPRETED
    # expression eval (their shingle/signature stages opt out of
    # whole-stage codegen — see queries_llm), so their speed depends on
    # how warm the JVM's C2 tier is for those evaluator paths, which in
    # turn depends on what ran earlier in the session: measured 25-35 %
    # round-to-round swing with UNCHANGED plans (VERDICT r7 item 6).
    # Floor them at more samples with a tighter agreement band so the
    # reported min reflects the warmed steady state, not the session's
    # JIT history.
    extra_runs = {
        "q74_ml_minhash_lsh": 4,
        "q21_cosine_topk": 4,
        "q22_simhash": 4,
    }
    per_query: dict[str, float] = {}
    # noise bookkeeping: per query, how many samples the agreement
    # filter discarded (= runs - 1; the reported number is the fastest)
    # — lets a later reader separate host CPU-steal from regressions
    # without re-deriving the swing from raw logs
    rejected: dict[str, int] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        q_min = max(min_runs, extra_runs.get(name, 0)) if min_runs > 1 \
            else min_runs  # RUNS=1 quick mode stays single-sample
        q_max = max(max_runs, q_min + 1) if min_runs > 1 else max_runs
        agree = 1.1 if name in extra_runs else 1.2
        samples: list[float] = []
        n = -1
        while len(samples) < q_max:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            samples.append(time.perf_counter() - t0)
            # release intra-query persisted intermediates (LSH bucket/
            # shingle tables) so every run recomputes the full plan and
            # one query's cache doesn't skew the next one's timing
            spark.catalog.clearCache()
            if len(samples) >= q_min:
                if len(samples) < 2:
                    break  # RUNS=1: explicit single-sample quick mode
                lo = sorted(samples)[:2]
                if lo[1] <= lo[0] * agree:
                    break  # two samples agree — not a noise artifact
        best = min(samples)
        per_query[name] = round(best, 3)
        rejected[name] = len(samples) - 1
        total += best
        print(
            f"# {name}: {best:.3f}s ({n} rows, {len(samples)} runs)",
            file=sys.stderr,
        )

    steal_t1 = read_steal_ticks()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    out = {
        "metric": "bench_total_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "rejected_samples": rejected,
        "host_calib_sec": round(host_calibration(), 4),
        # additive fields (r17, verdict item 3): multi-core calibration
        # + a /proc/stat steal bracket so a reader can attribute
        # round-over-round drift without a same-host re-run
        "host_calib_parallel_sec": round(host_calibration_parallel(cpus), 4),
        "steal_ticks_delta": (
            steal_t1 - steal_t0
            if steal_t0 is not None and steal_t1 is not None
            else None
        ),
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

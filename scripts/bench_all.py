#!/usr/bin/env python
"""Full-registry timing evidence: run EVERY registry query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and write per-query
wall-clock JSON, so a slow non-headline query cannot hide behind
bench.py's 19-query headline set.

    python scripts/bench_all.py --json BENCH_SELF_r03.json

Timing matches bench.py: best of N_RUNS (default 2) complete
executions per query, caches cleared between runs (see bench.py for
why best-of-N: the sandbox VM shows multi-second CPU-steal stalls).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_scraping_spark.queries import REGISTRY  # noqa: E402
from datapipeline_scraping_spark.session import build_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    json_path = None
    if "--json" in sys.argv:
        json_path = sys.argv[sys.argv.index("--json") + 1]

    spark = build_spark(app_name="dps-bench-all")
    spark.range(1).count()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name, spec in REGISTRY.items():
        best = float("inf")
        n = -1
        for _ in range(n_runs):
            t0 = time.perf_counter()
            n = spec.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        per_query[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr, flush=True)

    out = {
        "metric": "bench_all_total_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf_dir,
        "runs": n_runs,
        "slowest": sorted(per_query, key=per_query.get, reverse=True)[:5],
    }
    print(json.dumps(out))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(out, fh, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()

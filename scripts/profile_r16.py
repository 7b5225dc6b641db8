#!/usr/bin/env python
"""r16 optimization round: capture .explain('formatted') + timing for
the headline bench queries (and any registry query named on argv).

    python scripts/profile_r16.py before q01_pricing_summary ...
    python scripts/profile_r16.py after  q01_pricing_summary ...

Writes plans/r16/<name>_<tag>.txt and prints build (plan-construction)
wall, first-run (cold) wall and best-of-3 warm wall per query using the
noop sink (guide §1.4) so the computation is timed, not the collect.
"""
from __future__ import annotations

import io
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_scraping_spark.queries import REGISTRY  # noqa: E402
from datapipeline_scraping_spark.session import build_spark  # noqa: E402

DEFAULT = [
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_top_orders",
    "q07_first_wins_dedup", "q08_customer_order_analytics",
    "q12_delta_detection", "q17_event_daily_rollup", "q74_ml_minhash_lsh",
    "q20_jaccard_neardup", "q21_cosine_topk", "q22_simhash",
    "q23_text_metrics", "q27_classify_backend", "q32_sessionization",
    "q53_tfidf_topterms", "q61_asof_join", "q62_bucketed_join",
    "q84_volume_shipping", "q85_product_profit",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_spark(app_name=f"dps-profile-{tag}")
    spark.range(1).count()
    spark.range(128).repartition(32).mapInPandas(lambda it: it, schema="id long").count()
    for name in names:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build = time.perf_counter() - t0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_py = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow", plan))
        joins = "/".join(sorted(set(re.findall(r"(\w*HashJoin|SortMergeJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan))))
        runs = []
        for i in range(4):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            d = fn(spark, sf_dir) if i else df
            d.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{name:32s} build={build:5.2f}s cold={runs[0]:6.2f}s warm={min(runs[1:]):6.2f}s "
              f"ex={n_ex} py={n_py} joins={joins or '-'}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

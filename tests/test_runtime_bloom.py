"""Runtime bloom-filter join pruning (Spark's row-level runtime
filter) — the 100 TB lever that turns a selective dimension filter
into a pre-shuffle prune of the fact side: the optimizer injects a
BloomFilterAggregate on the filtered build side and a
``might_contain`` probe below the fact side's shuffle, so fact rows
that cannot join are dropped BEFORE the exchange instead of after.

The thresholds gate injection by estimated sizes
(``creationSideThreshold`` / ``applicationSideScanSizeThreshold`` —
production defaults assume a multi-GB fact scan); at test scale they
are lowered so the rewrite fires on sf0.001, which is exactly how the
feature is exercised on a cluster: conf-driven, no query change.
Correctness is asserted by equality against the un-filtered plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_scraping_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

_CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    # force a shuffle join: runtime filters exist to protect shuffles,
    # a broadcast join already prunes on the build side
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _joined(spark):
    l = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
        )
    )


def test_runtime_bloom_filter_fires_and_preserves_result(spark):
    saved = {}
    for k, v in _CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        df = _joined(spark)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan or "might_contain" in plan, (
            "runtime bloom filter did not inject — thresholds or join "
            f"shape changed:\n{plan[:2000]}"
        )
        with_filter = {tuple(r) for r in df.collect()}
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
    # same query without the runtime filter must agree exactly
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        baseline = {tuple(r) for r in _joined(spark).collect()}
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            saved.get(
                "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
            )
            or "true",
        )
    assert with_filter == baseline and len(baseline) == 1

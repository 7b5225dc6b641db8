"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship condensed pipeline; ``queries()``
exposes every implemented operator from SURVEY.md §2 (plus the
north-star LLM-pipeline operators) as named callables;
``oracle_sql()`` returns the matching DuckDB SQL for the
hash-compared correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_scraping_spark.functions.checksum import row_checksum
from datapipeline_scraping_spark.functions.numeric import exact_sum
from datapipeline_scraping_spark.operators.dedup import first_wins
from datapipeline_scraping_spark.operators.delta import delta_split
from datapipeline_scraping_spark.queries import REGISTRY
from datapipeline_scraping_spark.session import prepare
from datapipeline_scraping_spark.sources.tables import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY §7.1 step 1):
    a condensation of the reference's whole pipeline — scan → canonical
    checksum (H1) → delta split against a simulated prior-scan ledger
    (H2) → first-wins dedup (H4) → rollup aggregation."""
    prepare(spark)
    sf_dir = "/root/testdata/sf0.001"
    l = load_table(spark, sf_dir, "lineitem")

    hashed = l.withColumn(
        "row_hash",
        row_checksum(["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"]),
    )
    # simulated prior-scan state: everything except keys ≡3 (mod 10)
    state = hashed.filter(F.col("l_orderkey") % 10 != 3).select(
        F.col("l_orderkey").alias("k"), F.col("row_hash")
    )
    changed, _bypass = delta_split(
        hashed, state.withColumnRenamed("k", "l_orderkey"), "l_orderkey"
    )
    deduped = first_wins(changed, ["l_orderkey"], ["l_linenumber", "l_partkey"])
    return deduped.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        exact_sum("l_quantity", 18, 2).alias("sum_qty"),
        exact_sum("l_extendedprice", 18, 2).alias("sum_price"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys (streaming /
    float-bucket-boundary ops) get the driver's rows-only check."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }

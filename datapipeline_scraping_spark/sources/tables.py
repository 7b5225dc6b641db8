"""Parquet table catalog over the driver test-data layout.

Stands in for the reference's JDBC state/final tables
(reference: ``src/storage.py:67-88``) and its remote paginated HTML
source (``src/scrapers/scraper.py:67-81``) — in this engine every
source is a columnar scan so Catalyst gets pushdown + pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning + predicate pushdown are applied
    by Catalyst from whatever the caller selects/filters downstream.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark 4
    refuses to map to a timestamp type; the engine reads it via the
    ``nanosAsLong`` escape hatch and truncates to microseconds
    (integral ``div`` — never double division, which loses precision
    above 2^53 ns) as TIMESTAMP_NTZ, matching both DuckDB's read of
    the same file and the ms-precision columns of the other tables."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # scope the legacy conf to this read: left set session-wide it
        # would silently map OTHER nanosecond-timestamp parquet reads
        # to LongType instead of failing loudly
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prior = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(path)
            # force schema resolution (footer read) while the conf is on;
            # execution later replays the read with the plan's resolved
            # schema, so restoring the conf afterwards is safe
            if isinstance(df.schema["ts"].dataType, T.LongType):
                df = df.withColumn(
                    "ts",
                    F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
                )
        finally:
            if prior is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prior)
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    if not names:
        names = TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}

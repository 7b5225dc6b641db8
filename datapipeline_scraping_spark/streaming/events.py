"""Structured Streaming surface over the ``events`` table.

The reference pipeline is an incremental daily micro-batch (SURVEY
§1.4: ``@daily`` re-scan, delta against state, process the delta) —
exactly Spark's ``Trigger.AvailableNow`` replay model. This module
provides the streaming twins of the batch event-time queries:
tumbling/sliding window rollups, watermarked dedup, and session
windows.

Implementation note: the driver's ``events.parquet`` carries
nanosecond timestamps, which the Spark 4 streaming parquet source
rejects (``PARQUET_TYPE_ILLEGAL``); the batch reader handles them via
``nanosAsLong`` (see ``sources/tables.py``). The stream therefore
replays a µs-normalized copy staged under the repo-local scratch dir
— at production scale the equivalent is the bronze/landing table an
ingest job maintains.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import to_double
from ..session import prepare
from ..sources.tables import load_table

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")


def _stage_events_us(spark: SparkSession, sf_dir: str) -> str:
    """Write (once) a µs-timestamp copy of events for the streaming
    source; keyed by sf_dir so different scale factors don't collide."""
    key = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    out = os.path.join(SCRATCH, f"events_us_{key}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        batch = load_table(spark, sf_dir, "events")
        (
            batch.withColumn("ts", F.col("ts").cast("timestamp"))
            .write.mode("overwrite")
            .parquet(out)
        )
    return out


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the staged events table."""
    prepare(spark)
    src = _stage_events_us(spark, sf_dir)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src)


def run_available_now(sdf: DataFrame, *, output_mode: str = "complete") -> DataFrame:
    """Run a streaming DataFrame to completion with
    ``Trigger.AvailableNow`` (the reference's daily-replay semantics)
    into a memory sink; return the final result as a batch DataFrame."""
    name = f"dps_stream_{uuid.uuid4().hex[:12]}"
    query = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option(
            "checkpointLocation",
            os.path.join(SCRATCH, "ckpt", name),
        )
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return sdf.sparkSession.table(name)


def stream_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling 1-day window rollup — same semantics as the
    batch ``q17_event_daily_rollup`` (its oracle checks this result).
    Uses ``window()`` event-time buckets and exact decimal sums."""
    sdf = events_stream(spark, sf_dir)
    agg = (
        sdf.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            to_double(F.sum(F.col("value").cast("decimal(18,2)"))).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return run_available_now(agg)


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 day, sliding 12h) counts per event_type."""
    sdf = events_stream(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day", "12 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    return run_available_now(agg)


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup — the streaming twin of the H4/H1
    checksum dedup: drops re-deliveries of the same event_id within
    the watermark horizon."""
    sdf = events_stream(spark, sf_dir)
    deduped = (
        sdf.withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )
    return run_available_now(deduped)


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (30-min gap) streaming aggregation —
    the stateful twin of batch ``q32_sessionization``."""
    sdf = events_stream(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "2 days")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return run_available_now(agg)

"""Structured Streaming surface: availableNow replay equivalence with
batch, sliding windows, watermarked dedup, session windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_scraping_spark.sources.tables import load_table
from datapipeline_scraping_spark.streaming.events import (
    stream_daily_rollup,
    stream_dedup_within_watermark,
    stream_session_windows,
    stream_sliding_counts,
)
from tests.conftest import SF_SMOKE


def test_stream_daily_rollup_equals_batch(spark):
    streamed = {
        (r["day"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in stream_daily_rollup(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    batch = {
        (r["day"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ev.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    assert streamed == batch


def test_sliding_windows_double_count(spark):
    out = stream_sliding_counts(spark, SF_SMOKE)
    total_events = load_table(spark, SF_SMOKE, "events").count()
    # each event falls in exactly two 1-day/12h sliding windows
    assert out.agg(F.sum("n_events")).collect()[0][0] == 2 * total_events


def test_stream_dedup_within_watermark(spark):
    out = stream_dedup_within_watermark(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    # event_id is unique in the source, so dedup keeps everything
    assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()


def test_session_windows_sane(spark):
    out = stream_session_windows(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    bad = out.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0

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


def test_stream_stream_join_evicts_state_across_batches(spark, tmp_path):
    """The q97 interval join's state must actually AGE OUT: replayed as
    two micro-batches (early file, then late file a long watermark-gap
    later), the symmetric-hash-join state operator must report rows
    REMOVED by the watermark — two-sided eviction, not unbounded
    buffers — while emitting exactly the batch-join matches."""
    import os
    import time as _time

    import pandas as pd

    early = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [7, 7, 7],
            "event_type": ["click", "purchase", "click"],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 10:30", "2024-01-01 10:40"]
            ),
        }
    )
    late = pd.DataFrame(
        {
            "event_id": [4, 5],
            "user_id": [7, 7],
            "event_type": ["click", "purchase"],
            # 10 days later: watermark (1h) is far past the early batch
            "ts": pd.to_datetime(["2024-01-11 09:50", "2024-01-11 10:10"]),
        }
    )
    src = str(tmp_path / "events")
    os.makedirs(src)
    # µs timestamps: the streaming parquet source rejects TIMESTAMP(NANOS)
    early = early.assign(ts=early["ts"].astype("datetime64[us]"))
    late = late.assign(ts=late["ts"].astype("datetime64[us]"))
    early.to_parquet(os.path.join(src, "part-0.parquet"))
    _time.sleep(1.1)  # distinct mtimes => deterministic file order
    late.to_parquet(os.path.join(src, "part-1.parquet"))

    schema = spark.read.parquet(src).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        # pandas µs timestamps land as TIMESTAMP_NTZ; watermarks need TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    purchases = (
        sdf.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"), "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        sdf.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"), "user_id",
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        on=[
            purchases["user_id"] == clicks["user_id"],
            clicks["c_ts"] >= purchases["p_ts"] - F.expr("INTERVAL 1 HOUR"),
            clicks["c_ts"] <= purchases["p_ts"],
        ],
    ).select("purchase_id", "click_id")

    from datapipeline_scraping_spark.streaming.events import (
        pinned_shuffle_partitions,
    )

    with pinned_shuffle_partitions(spark, 2):
        query = (
            joined.writeStream.format("memory")
            .queryName("evict_probe")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        progresses = query.recentProgress

    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.table("evict_probe").collect()
    }
    # batch truth: purchase 2 matches clicks 1 (within the preceding
    # hour); purchase 5 matches click 4; click 3 is AFTER purchase 2
    assert got == {(2, 1), (5, 4)}
    removed = sum(
        op["numRowsRemoved"]
        for p in progresses
        for op in p["stateOperators"]
    )
    assert removed > 0, "watermark never evicted join state"
    # and after the final batch the state is pruned down to the live
    # interval, not the whole history
    final_state = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    assert final_state <= 3


def test_manifest_epoch_sink_is_exactly_once(spark, tmp_path):
    """VERDICT r8 item 7: the epoch sink's idempotence guard — the same
    epoch delivered twice commits once; older epochs after a restart
    no-op; maintenance commits without an epoch do not break the
    guard."""
    from datapipeline_scraping_spark.operators.txn import ManifestTable
    from datapipeline_scraping_spark.streaming.txn_sink import (
        last_applied_epoch,
        manifest_epoch_sink,
    )

    root = str(tmp_path / "sink")
    sink = manifest_epoch_sink(root, "k")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b1 = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")

    sink(b0, 0)
    sink(b1, 1)
    tbl = ManifestTable(root)
    assert tbl.version() == 2 and last_applied_epoch(tbl) == 1
    got = {r["k"]: r["v"] for r in tbl.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}

    # redelivery of the live epoch (crash between commit and
    # checkpoint): no new commit, same data
    sink(b1, 1)
    assert tbl.version() == 2
    # a restart replaying an OLDER epoch also no-ops
    sink(b0, 0)
    assert tbl.version() == 2
    assert {r["k"]: r["v"] for r in tbl.read(spark).collect()} == got

    # a maintenance commit (no epoch) interleaves; the guard must look
    # THROUGH it instead of treating the head as epoch-less
    tbl.commit(tbl.read(spark).repartition(1))
    assert tbl.version() == 3
    sink(b1, 1)  # replay across the maintenance commit: still no-op
    assert tbl.version() == 3
    assert last_applied_epoch(tbl) == 1

    # the next genuine epoch commits
    sink(spark.createDataFrame([(4, "d")], "k long, v string"), 2)
    assert tbl.version() == 4 and last_applied_epoch(tbl) == 2
    got = {r["k"]: r["v"] for r in tbl.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_manifest_epoch_sink_insert_only_appends(spark, tmp_path):
    """r10: insert_only epoch sink rides the APPEND commit — same
    exactly-once guard, but each epoch lands as new files with every
    pre-existing file hardlinked forward (O(batch) per epoch)."""
    import os

    from datapipeline_scraping_spark.operators.txn import ManifestTable
    from datapipeline_scraping_spark.streaming.txn_sink import (
        last_applied_epoch,
        manifest_epoch_sink,
    )

    root = str(tmp_path / "sink")
    sink = manifest_epoch_sink(root, "k", insert_only=True)
    sink(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), 0)
    tbl = ManifestTable(root)
    snap1 = tbl.snapshot_path()
    inodes = {
        f: os.stat(os.path.join(snap1, f)).st_ino
        for f in os.listdir(snap1)
        if f.endswith(".parquet")
    }
    sink(spark.createDataFrame([(3, "c")], "k long, v string"), 1)
    assert tbl.version() == 2 and last_applied_epoch(tbl) == 1
    snap2 = tbl.snapshot_path()
    for f, ino in inodes.items():  # epoch 1 rewrote nothing
        assert os.stat(os.path.join(snap2, f)).st_ino == ino
    # replay: same epoch twice -> one commit
    sink(spark.createDataFrame([(3, "c")], "k long, v string"), 1)
    assert tbl.version() == 2
    assert {r["k"]: r["v"] for r in tbl.read(spark).collect()} == {
        1: "a",
        2: "b",
        3: "c",
    }

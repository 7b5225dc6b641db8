"""Two-pass (scan) prefix sum tests (operators/packing.py) — the
hot-source fix promised by q120's docstring (VERDICT r6 item 4).

Correctness bar: bit-identical to the one-pass keyed window on every
input, including a pathologically hot key, and for any chunk count
(the result must be invariant to where the range boundaries land)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datapipeline_scraping_spark.operators.packing import (
    pack_sequences,
    prefix_sum_two_pass,
)


def _one_pass(df, key, order, weight, out):
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(weight).over(w))


def _skewed(spark, n=5000, hot_share=0.7):
    """hot key owns ``hot_share`` of all rows; weights vary."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < int(hot_share * 10), F.lit("hot"))
        .otherwise(F.concat(F.lit("src_"), (F.col("id") % 7).cast("string")))
        .alias("source"),
        ((F.col("id") * 37) % 90 + 1).alias("n_tok"),
    )


@pytest.mark.parametrize("n_chunks", [1, 4, 32])
def test_two_pass_matches_one_pass_under_skew(spark, n_chunks):
    df = _skewed(spark)
    got = prefix_sum_two_pass(
        df, key="source", order="doc_id", weight="n_tok", out="ps",
        n_chunks=n_chunks,
    )
    want = _one_pass(df, "source", "doc_id", "n_tok", "ps")
    assert got.columns == df.columns + ["ps"]
    diff = got.join(want, ["doc_id", "source"], "full").filter(
        got["ps"] != want["ps"]
    )
    assert diff.count() == 0
    assert got.count() == df.count()


def test_pack_sequences_matches_window_packer(spark):
    df = _skewed(spark, n=2000)
    ctx = 512
    packed = pack_sequences(
        df, key="source", order="doc_id", weight="n_tok", ctx=ctx,
        n_chunks=8,
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn(
        "seq_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / float(ctx)).cast(
            "long"
        ),
    )
    diff = packed.join(want, ["doc_id", "source"], "full").filter(
        packed["seq_id"] != want["seq_id"]
    )
    assert diff.count() == 0
    # packing invariant: every sequence's token mass fits the budget
    # plus at most one overflowing document (streaming packer contract)
    mass = packed.groupBy("source", "seq_id").agg(
        F.sum("n_tok").alias("m"), F.max("n_tok").alias("mx")
    )
    bad = mass.filter(F.col("m") - F.col("mx") >= ctx + 90)
    assert bad.count() == 0


def test_two_pass_no_global_sort_in_plan(spark):
    """The point of the exercise: the physical plan must not contain a
    single-partition global sort or a window partitioned ONLY by the
    key over the full input — pass 1 windows over (_chunk, key)."""
    df = _skewed(spark, n=500)
    got = prefix_sum_two_pass(
        df, key="source", order="doc_id", weight="n_tok", out="ps"
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # offsets-side window over (key) exists but only on the tiny
    # totals relation; the full-input window must carry _chunk
    assert "_chunk" in plan


def test_null_key_rows_survive_and_match_one_pass(spark):
    """A NULL key forms its own group in both the one-pass window and
    the two-pass scan — the offsets join is null-safe (ADVICE r8: a
    plain equi-join dropped NULL-key rows entirely)."""
    rows = [(None, 1, 10), (None, 2, 5), ("a", 1, 7), (None, 3, 1), ("a", 2, 2)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    got = prefix_sum_two_pass(
        df, key="source", order="doc_id", weight="n_tok", out="ps",
        n_chunks=3,
    )
    want = _one_pass(df, "source", "doc_id", "n_tok", "ps")
    assert got.count() == 5  # nothing dropped
    key = lambda t: (t[0] is not None, t[0], t[1])
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )

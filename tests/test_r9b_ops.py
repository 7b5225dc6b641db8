"""Unit tests for the round-9 second-wave operators: duplicate-span
detection (Lee et al. substring dedup), overlapping token chunking,
and feature-hashed linear scoring."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datapipeline_scraping_spark.operators.classify import (
    hashed_feature_weights,
    hashed_linear_score,
)
from datapipeline_scraping_spark.operators.dedup import (
    duplicate_spans,
    positional_shingles,
)
from datapipeline_scraping_spark.operators.packing import overlapping_chunks


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------------------
# duplicate_spans
# ---------------------------------------------------------------------------


def test_duplicate_spans_cross_doc_merge(spark):
    # docs 1 and 2 share an 8-token run -> two overlapping 7-windows
    # each (pos 3,4 in doc 1; pos 1,2 in doc 2), merging to ONE span of
    # 8 tokens per doc.
    shared = "a b c d e f g h"
    d1 = "x y " + shared + " z"  # run at tokens 3..10 of 11
    d2 = shared + " p q r"  # run at tokens 1..8 of 11
    d3 = "unique tokens only here nothing repeats at all ok fine yes"
    out = {
        r["doc_id"]: r
        for r in duplicate_spans(
            _docs(spark, [(1, d1), (2, d2), (3, d3)]), "doc_id", "text", k=7
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_dup_spans"] == 1
    assert out[1]["dup_tokens"] == 8
    assert out[1]["max_span"] == 8
    assert out[2]["dup_tokens"] == 8


def test_duplicate_spans_within_doc_repeat_counts(spark):
    # a 7-gram repeated WITHIN one doc reaches min_count=2 on its own
    # (as in Lee et al.: any second occurrence marks both).
    seven = "t1 t2 t3 t4 t5 t6 t7"
    doc = seven + " mid " + seven
    out = duplicate_spans(
        _docs(spark, [(1, doc)]), "doc_id", "text", k=7
    ).collect()
    assert len(out) == 1
    # occurrences at pos 1 and pos 9: gap 8 > k=7 -> two separate spans
    assert out[0]["n_dup_spans"] == 2
    assert out[0]["dup_tokens"] == 14


def test_duplicate_spans_short_and_clean_docs_absent(spark):
    out = duplicate_spans(
        _docs(spark, [(1, "too short"), (2, "all these words differ fully now yes")]),
        "doc_id",
        "text",
        k=7,
    ).collect()
    assert out == []


def test_positional_shingles_positions(spark):
    rows = positional_shingles(
        _docs(spark, [(1, "a b c d")]), "doc_id", "text", k=3
    ).collect()
    got = {(r["pos"], r["s"]) for r in rows}
    assert got == {(1, "a b c"), (2, "b c d")}


# ---------------------------------------------------------------------------
# overlapping_chunks
# ---------------------------------------------------------------------------


def test_overlapping_chunks_grid_and_tail(spark):
    toks = [f"w{i}" for i in range(1, 57)]  # 56 tokens
    out = (
        overlapping_chunks(
            _docs(spark, [(1, " ".join(toks))]), "doc_id", "text"
        )
        .orderBy("chunk_id")
        .collect()
    )
    # cap = n - chunk + stride = 48, so starts are 1 and 25; the
    # 25-start window reaches token 56 — full coverage, no third chunk
    assert [r["start_tok"] for r in out] == [1, 25]
    assert [r["chunk_tokens"] for r in out] == [32, 32]
    # the last chunk reaches the final token
    assert out[-1]["chunk_text"].split(" ")[-1] == "w56"
    # overlap: chunk 1 ends at token 32, chunk 2 starts at 25
    assert out[1]["chunk_text"].split(" ")[0] == "w25"
    # content hash matches md5 of the chunk text
    assert (
        out[0]["chunk_hash"]
        == hashlib.md5(out[0]["chunk_text"].encode()).hexdigest()
    )


def test_overlapping_chunks_short_doc_single_chunk(spark):
    out = overlapping_chunks(
        _docs(spark, [(1, "a b c")]), "doc_id", "text"
    ).collect()
    assert len(out) == 1
    assert out[0]["chunk_tokens"] == 3
    assert out[0]["chunk_text"] == "a b c"


def test_overlapping_chunks_is_shuffle_free(spark):
    plan = overlapping_chunks(
        _docs(spark, [(1, "a b c")]), "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# hashed_linear_score
# ---------------------------------------------------------------------------


def _py_bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def _py_weight(b: int) -> int:
    return int(hashlib.md5(f"w|{b}".encode()).hexdigest()[:8], 16) % 2001 - 1000


def test_hashed_linear_score_matches_pure_python(spark):
    text = "spark filter join group filter spark"
    out = hashed_linear_score(
        _docs(spark, [(1, text)]), "doc_id", "text", n_buckets=512
    ).collect()
    toks = text.split(" ")
    expect = sum(_py_weight(_py_bucket(t, 512)) for t in toks)
    assert out[0]["n_tokens"] == len(toks)
    assert out[0]["sum_w"] == expect


def test_hashed_linear_score_custom_weights(spark):
    # all-ones model: sum_w == token count
    w = spark.range(8).select(
        F.col("id").alias("b"), F.lit(1).cast("long").alias("w_milli")
    )
    out = hashed_linear_score(
        _docs(spark, [(1, "a b c d e")]), "doc_id", "text", n_buckets=8, weights=w
    ).collect()
    assert out[0]["sum_w"] == 5


def test_hashed_feature_weights_range_and_determinism(spark):
    rows = hashed_feature_weights(spark, 64).collect()
    assert len(rows) == 64
    assert all(-1000 <= r["w_milli"] <= 1000 for r in rows)
    again = hashed_feature_weights(spark, 64).collect()
    assert rows == again


# ---------------------------------------------------------------------------
# scrape DataSource (Python DataSource API)
# ---------------------------------------------------------------------------


def _register_scrape(spark):
    from datapipeline_scraping_spark.sources.scrape_datasource import register

    register(spark)


def test_scrape_datasource_batch_matches_mapinpandas_form(spark):
    from datapipeline_scraping_spark.sources.scrape import paginated_list_scan

    _register_scrape(spark)
    ds = spark.read.format("scrape").option("max_pages", 4).load()
    classic = paginated_list_scan(spark, max_pages=4)
    assert ds.rdd.getNumPartitions() == 4  # one task per page (S3)
    a = sorted(map(tuple, ds.collect()))
    b = sorted(map(tuple, classic.collect()))
    assert a == b


def test_scrape_datasource_sql_view(spark):
    _register_scrape(spark)
    spark.sql("DROP VIEW IF EXISTS crawl_pages")
    spark.sql(
        "CREATE TEMPORARY VIEW crawl_pages USING scrape OPTIONS (max_pages '3')"
    )
    got = spark.sql(
        "SELECT page, COUNT(*) AS n FROM crawl_pages GROUP BY page ORDER BY page"
    ).collect()
    assert [(r["page"], r["n"]) for r in got] == [(0, 10), (1, 10), (2, 10)]
    spark.sql("DROP VIEW crawl_pages")


def test_scrape_stream_frontier_growth_and_idempotent_restart(spark, tmp_path):
    _register_scrape(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(max_pages: int):
        q = (
            spark.readStream.format("scrape")
            .option("max_pages", str(max_pages))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            {r["page"] for r in spark.read.parquet(out).select("page").collect()}
        )

    assert run(2) == [0, 1]  # initial frontier
    assert run(4) == [0, 1, 2, 3]  # frontier grew: only new pages fetched
    assert run(4) == [0, 1, 2, 3]  # unchanged frontier: no-op restart
    total = spark.read.parquet(out).count()
    assert total == 40  # exactly once — no page double-ingested


# ---------------------------------------------------------------------------
# incremental view maintenance (operators/ivm.py)
# ---------------------------------------------------------------------------


def _cdf(spark, rows):
    return spark.createDataFrame(
        rows, "_change_type string, k string, g string, v double"
    )


def _mv(spark, rows):
    df = spark.createDataFrame(rows, "g string, n long, s double")
    return df.select("g", "n", F.col("s").cast("decimal(38,2)").alias("s"))


def _refresh(spark, mv_rows, cdf_rows):
    from datapipeline_scraping_spark.operators.ivm import (
        apply_agg_delta,
        delta_aggregate,
    )

    delta = delta_aggregate(
        _cdf(spark, cdf_rows),
        ["g"],
        {"s": F.col("v").cast("decimal(18,2)")},
        count_name="n",
    )
    return {
        r["g"]: (r["n"], float(r["s"]))
        for r in apply_agg_delta(
            _mv(spark, mv_rows), delta, ["g"], count_name="n", sum_names=("s",)
        ).collect()
    }


def test_ivm_group_migration_moves_both_sides(spark):
    # row k1 moves from group a to group b with a value change
    out = _refresh(
        spark,
        [("a", 2, 10.0), ("b", 1, 5.0)],
        [
            ("update_preimage", "k1", "a", 4.0),
            ("update_postimage", "k1", "b", 6.0),
        ],
    )
    assert out == {"a": (1, 6.0), "b": (2, 11.0)}


def test_ivm_zero_count_group_vanishes_and_new_group_appears(spark):
    out = _refresh(
        spark,
        [("a", 1, 4.0)],
        [
            ("delete", "k1", "a", 4.0),
            ("insert", "k2", "c", 7.0),
        ],
    )
    assert out == {"c": (1, 7.0)}


def test_ivm_null_group_key_is_matched_null_safe(spark):
    out = _refresh(
        spark,
        [(None, 1, 1.0)],
        [("insert", "k9", None, 2.0)],
    )
    assert out == {None: (2, 3.0)}


def test_ivm_refresh_equals_rebuild_over_random_churn(spark):
    import random

    rng = random.Random(7)
    base = {f"k{i}": (rng.choice("abc"), rng.randrange(100) / 4.0) for i in range(40)}
    mv_rows = {}
    for g in "abc":
        rows = [v for (gg, v) in base.values() if gg == g]
        mv_rows[g] = (len(rows), sum(rows))
    cdf, new = [], dict(base)
    for k in list(base)[::3]:  # delete a third
        g, v = new.pop(k)
        cdf.append(("delete", k, g, v))
    for k in list(new)[::4]:  # migrate a quarter
        g, v = new[k]
        g2 = "d" if g == "a" else "a"
        new[k] = (g2, v + 1.0)
        cdf.append(("update_preimage", k, g, v))
        cdf.append(("update_postimage", k, g2, v + 1.0))
    for i in range(5):  # fresh inserts
        new[f"n{i}"] = ("e", float(i))
        cdf.append(("insert", f"n{i}", "e", float(i)))
    got = _refresh(spark, [(g, n, s) for g, (n, s) in mv_rows.items()], cdf)
    want = {}
    for g in "abcde":
        rows = [v for (gg, v) in new.values() if gg == g]
        if rows:
            want[g] = (len(rows), round(sum(rows), 2))
    assert {g: (n, round(s, 2)) for g, (n, s) in got.items()} == want


def test_ivm_repeated_refresh_keeps_sum_type(spark):
    from datapipeline_scraping_spark.operators.ivm import (
        apply_agg_delta,
        delta_aggregate,
    )

    mv = _mv(spark, [("a", 1, 1.0)])
    for i in range(3):
        delta = delta_aggregate(
            _cdf(spark, [("insert", f"k{i}", "a", 1.0)]),
            ["g"],
            {"s": F.col("v").cast("decimal(18,2)")},
            count_name="n",
        )
        mv = apply_agg_delta(mv, delta, ["g"], count_name="n", sum_names=("s",))
    [row] = mv.collect()
    assert (row["n"], float(row["s"])) == (4, 4.0)
    assert dict(mv.dtypes)["s"] == "decimal(38,2)"  # no precision creep

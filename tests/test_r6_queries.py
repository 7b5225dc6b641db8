"""Invariant tests for the round-6 queries: funnel monotonicity,
multi-key ER recall dominance, and rarity-score consistency — the
semantic properties the DuckDB hash parity alone doesn't state."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_scraping_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE


def test_curation_funnel_monotone_and_exact_head(spark):
    """Every funnel stage can only shrink the corpus (docs and chars),
    stage 0 equals the raw table mass, and no stage is empty at the
    smoke scale (an empty stage would make downstream stages
    vacuously 'correct')."""
    rows = {
        r["stage"]: r
        for r in REGISTRY["q118_curation_funnel"].fn(spark, SF_SMOKE).collect()
    }
    spark.catalog.clearCache()
    assert set(rows) == {
        "0_ingest", "1_quality", "2_exact_dedup", "3_decontaminate",
        "4_domain_cap",
    }
    order = sorted(rows.values(), key=lambda r: r["stage_idx"])
    for prev, cur in zip(order, order[1:]):
        assert cur["docs_out"] <= prev["docs_out"], (prev, cur)
        assert cur["chars_out"] <= prev["chars_out"], (prev, cur)
    assert order[-1]["docs_out"] > 0
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert order[0]["docs_out"] == docs.count()


def test_er_multikey_recall_dominates_single_key(spark):
    """The multi-key candidate set is a superset of the prefix-only
    set, so its recall and candidate volume must both be >= the
    single-key strategy's — and the dirty-set construction (each
    perturbation class defeats a different key) must make the gap
    strict at the smoke scale."""
    rows = {
        r["strategy"]: r
        for r in REGISTRY["q116_er_multikey_recall"].fn(spark, SF_SMOKE).collect()
    }
    spark.catalog.clearCache()
    pre, multi = rows["prefix"], rows["multi"]
    assert pre["n_dirty"] == multi["n_dirty"] > 0
    assert multi["n_candidates"] >= pre["n_candidates"]
    assert multi["recall"] > pre["recall"], (
        "multi-key blocking should recover perturbations that break "
        "the prefix key"
    )
    assert multi["n_correct"] <= multi["n_matched"] <= multi["n_dirty"]


def test_rarity_quality_consistency(spark):
    """Per-doc rarity stats are internally consistent: hapax <= rare
    tokens <= all tokens, min corpus count >= 1, the mean token count
    is bounded by the most/least common token, and summing n_tokens
    over docs reproduces the corpus token total."""
    out = REGISTRY["q117_rarity_quality"].fn(spark, SF_SMOKE)
    agg = out.agg(
        F.sum("n_tokens").alias("tot"),
        F.min("min_count").alias("mn"),
        F.sum(
            (
                (F.col("n_hapax") > F.round(F.col("rare_frac") * F.col("n_tokens")))
                | (F.col("min_count") < 1)
                | (F.col("mean_tok_count") < F.col("min_count"))
                | (F.col("sum_count") < F.col("n_tokens"))
            ).cast("int")
        ).alias("violations"),
    ).collect()[0]
    spark.catalog.clearCache()
    assert agg["violations"] == 0
    assert agg["mn"] >= 1
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    corpus_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    assert agg["tot"] == corpus_tokens


def test_image_decode_matches_encoded_dims(spark):
    """q115 parses dimensions back OUT of real image bytes; every row
    must reproduce the encoded width/height arithmetic for its format
    (a parser misread of any header field breaks this)."""
    out = REGISTRY["q115_image_decode"].fn(spark, SF_SMOKE)
    bad = out.filter(
        (F.col("width") != F.col("doc_id") % 640 + 1)
        | (F.col("height") != F.col("doc_id") % 480 + 1)
    ).count()
    spark.catalog.clearCache()
    assert bad == 0

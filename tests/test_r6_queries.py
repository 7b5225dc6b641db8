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


def test_paragraph_dedup_conservation(spark):
    """Chunk accounting must balance: kept <= total per doc, the
    corpus-wide kept count equals the number of DISTINCT chunks (first
    occurrence of each survives, exactly once), and no doc gains
    chunks."""
    out = REGISTRY["q119_paragraph_dedup"].fn(spark, SF_SMOKE)
    agg = out.agg(
        F.sum((F.col("n_kept") > F.col("n_chunks")).cast("int")).alias("bad"),
        F.sum("n_kept").alias("kept"),
    ).collect()[0]
    spark.catalog.clearCache()
    assert agg["bad"] == 0
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    from datapipeline_scraping_spark.queries_r6 import _P_CHUNK

    toks = F.split("text", " ")
    chunks = (
        docs.select("doc_id", toks.alias("t"))
        .select(
            F.explode(
                F.sequence(F.lit(1), F.size("t"), F.lit(_P_CHUNK))
            ).alias("pos"),
            "t",
        )
        .select(F.concat_ws(" ", F.slice("t", F.col("pos"), _P_CHUNK)).alias("c"))
    )
    n_distinct = chunks.select("c").distinct().count()
    spark.catalog.clearCache()
    assert agg["kept"] == n_distinct


def test_sequence_packing_conserves_tokens(spark):
    """The packing manifest must account for every token exactly once,
    and every sequence except possibly the last per source must have
    reached the context budget (concat-and-chunk never leaves an
    interior sequence short)."""
    from datapipeline_scraping_spark.queries_r6 import _PACK_CTX

    out = REGISTRY["q120_sequence_packing"].fn(spark, SF_SMOKE).collect()
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    corpus_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    assert sum(r["n_tokens"] for r in out) == corpus_tokens
    by_source = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        rows.sort(key=lambda r: r["seq_id"])
        # seq_ids are dense from 0
        assert [r["seq_id"] for r in rows] == list(range(len(rows)))
        # a sequence only closes once the running token stream has
        # crossed its budget boundary: through interior sequence k the
        # cumulative mass must be >= (k+1) * ctx
        running = 0
        for r in rows[:-1]:
            running += r["n_tokens"]
            assert running >= (r["seq_id"] + 1) * _PACK_CTX, rows

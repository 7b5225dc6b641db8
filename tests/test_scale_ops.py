"""Unit tests for the scale-tier operators: as-of join boundary
semantics, tf-idf ranking, IVF probe behavior, frame fan-out, and the
bucketed-join plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datapipeline_scraping_spark.operators.asof import asof_join
from datapipeline_scraping_spark.operators.text import tfidf_topk
from tests.conftest import SF_SMOKE


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_boundary_and_missing(spark):
    """<= boundary: a right row at exactly left.ts matches; a left row
    before any right row gets nulls; matches never look forward."""
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), "early"),   # before any click
            (1, _ts("2024-01-01T10:00:00"), "exact"),   # == right ts
            (1, _ts("2024-01-01T11:00:00"), "after"),
            (2, _ts("2024-01-01T05:00:00"), "otherkey"),
        ],
        "key long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T10:30:00"), 101),
            (2, _ts("2024-01-01T09:00:00"), 200),  # after key-2 left row
        ],
        "key long, ts timestamp, val long",
    )
    out = {
        r["tag"]: r["asof_val"]
        for r in asof_join(
            left, right, key="key", ts="ts", right_cols=["val"]
        ).collect()
    }
    assert out == {"early": None, "exact": 100, "after": 101, "otherkey": None}


def test_tfidf_rare_term_outranks_common(spark):
    df = spark.createDataFrame(
        [(1, "common rare common"), (2, "common common"), (3, "common other")],
        "doc_id long, text string",
    )
    out = tfidf_topk(df, "doc_id", "text", top=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'rare' (df=1) must beat 'common' (df=3) for doc 1 despite tf 1 < 2
    assert top[1] == "rare"
    assert out[0]["rank"] == 1


def test_ivf_probes_restrict_candidates(spark):
    """With nprobe < n_centroids, neighbors must come only from probed
    lists (approximation is structural, not a bug)."""
    from datapipeline_scraping_spark.operators.similarity import ivf_assign, as_double

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cent = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("cid"), as_double("embedding").alias("cv")
    )
    corp = emb.select("vec_id", as_double("embedding").alias("v"))
    assigned = ivf_assign(corp, cent, "vec_id", "v")
    # every vector lands in exactly one list
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()


def test_frame_fanout_counts(spark):
    from datapipeline_scraping_spark.operators.multimodal import (
        attach_blob,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abc")], "doc_id long, text string"
    )
    out = sample_frames(attach_blob(docs, "doc_id", "text"), "doc_id").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # len 10 -> 10 % 5 + 1 = 1 frame; len 3 -> 3 % 5 + 1 = 4 frames
    assert len(by_doc[1]) == 1
    assert len(by_doc[2]) == 4
    # offsets evenly strided by n // n_frames
    assert [r["frame_offset"] for r in sorted(by_doc[2], key=lambda r: r["frame_idx"])] == [
        0,
        0,
        0,
        0,
    ]  # 3 // 4 == 0 stride


def test_bucketed_join_plan_has_no_extra_exchange(spark):
    from datapipeline_scraping_spark.queries import REGISTRY

    df = REGISTRY["q62_bucketed_join"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the only exchange is the final groupBy aggregation; the join
    # itself reads pre-bucketed, pre-sorted tables
    assert plan.count("Exchange") == 1
    assert plan.count("Sort (") == 0


def test_partitioned_sink_scan_is_pruned(spark):
    from datapipeline_scraping_spark.queries import REGISTRY

    df = REGISTRY["q64_partitioned_sink"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:120]


def test_incremental_ledger_two_rounds(spark):
    """Round 2 must classify unseen keys as new and mutated-content
    keys as changed — the H2 semantics across a persisted ledger."""
    from datapipeline_scraping_spark.queries import REGISTRY

    rows = {
        r["change_type"]: r["n_rows"]
        for r in REGISTRY["q63_incremental_ledger"].fn(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"new", "changed"}
    assert rows["new"] > 0 and rows["changed"] > 0


def test_delta_state_probe_broadcasts(spark):
    """H5: the small ledger side of the delta anti-join must be planned
    as a broadcast hash join (SCALE.md's claim for q12)."""
    from datapipeline_scraping_spark.queries import REGISTRY

    df = REGISTRY["q12_delta_detection"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_cli_list_and_oracle():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "datapipeline_scraping_spark", "list"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0
    assert "q01_pricing_summary" in out.stdout
    out = subprocess.run(
        [sys.executable, "-m", "datapipeline_scraping_spark", "oracle",
         "q01_pricing_summary"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0 and "SELECT" in out.stdout.upper()


def test_stratified_sample_plan_is_map_only(spark):
    """q92: hash-threshold sampling must not shuffle — membership is a
    per-row expression, so the plan has zero exchanges."""
    from datapipeline_scraping_spark.queries import REGISTRY

    df = REGISTRY["q92_stratified_sample"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_incremental_dedup_plan_has_no_cartesian(spark):
    """q95: the batch-vs-corpus probe is a (band,bucket) equi-join —
    never a cross/nested-loop product."""
    from datapipeline_scraping_spark.queries import REGISTRY

    df = REGISTRY["q95_incremental_dedup"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_length_outliers_plan_broadcasts_moments(spark):
    """q98: the per-language moment table (≤ |langs| rows) joins back
    to documents as a broadcast — no shuffle of the fact side."""
    from datapipeline_scraping_spark.queries import REGISTRY

    df = REGISTRY["q98_length_outliers"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_scrub_pii_redacts_and_counts(spark):
    from datapipeline_scraping_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.org or ping 192.168.0.1 twice 10.0.0.2"),
            (2, "no pii here"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in scrub_pii(df, "text").collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_ips"] == 2
    assert "<EMAIL>" in out[1]["text"] and "<IP>" in out[1]["text"]
    assert "@" not in out[1]["text"] and "192.168" not in out[1]["text"]
    assert out[2]["n_emails"] == 0 and out[2]["text"] == "no pii here"

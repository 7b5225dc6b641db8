#!/usr/bin/env python
"""Synthesize a 10x derived corpus (skew + near-dup heavy) and measure
how the dedup / ANN / join / sessionization families scale, writing the
results (timings, AQE skew-split plan excerpt, incremental-probe cost,
streaming state bounds) to SCALE_EVIDENCE.md.

The 10x corpus is DERIVED from the driver's sf0.1 tables (never
regenerated from scratch): 10 id-shifted copies of documents /
embeddings / events where odd copies are slightly perturbed (near-dup
heavy by construction), even copies are byte-identical (exact-dup
heavy), 500 documents share one identical text (a hot LSH bucket), and
30% of one events copy is remapped to a single user (a hot join key).
That makes it a WORST-CASE 10x, deliberately more skewed than a real
10x corpus — if scaling holds here it holds on organic growth.

Run: python scripts/scale_evidence.py          (~3-5 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_scraping_spark.functions.numeric import exact_sum
from datapipeline_scraping_spark.operators import dedup as D
from datapipeline_scraping_spark.operators import similarity as SIM
from datapipeline_scraping_spark.operators.skew import salted_join
from datapipeline_scraping_spark.session import build_spark
from datapipeline_scraping_spark.sources.tables import load_table
from datapipeline_scraping_spark.streaming.events import SCRATCH

SF1 = "/root/testdata/sf0.1"
OUT10 = os.path.join(SCRATCH, "scale10x")
# curation-family corpus: written with driver table names
# (documents.parquet / part.parquet) so the REGISTRY query functions
# run against it verbatim as an sf_dir — evidence measures the exact
# registered plans, not re-implementations
OUT10C = os.path.join(SCRATCH, "scale10x_curation")
HOT_SOURCE = "src9999999"  # keeps q113's numeric-suffix parse valid
HOT_PREFIX = "zqx"  # no real part name starts with this
REPORT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "SCALE_EVIDENCE.md")

HOT_TEXT = "hot cluster identical document text payload shared by five hundred rows"


def synth(spark) -> None:
    """Write the 10x derived corpus (once; keyed by _SUCCESS markers)."""
    if not os.path.exists(os.path.join(OUT10, "documents", "_SUCCESS")):
        docs = load_table(spark, SF1, "documents").select("doc_id", "text", "lang")
        parts = []
        for i in range(10):
            c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
            if i % 2 == 1:
                # near-dup: ~3 extra tokens on a ~50-token doc keeps
                # 3-gram Jaccard vs the original copy well above 0.7
                c = c.withColumn(
                    "text", F.concat_ws(" ", "text", F.lit(f"variant tail {i}"))
                )
            parts.append(c)
        d10 = parts[0]
        for c in parts[1:]:
            d10 = d10.unionByName(c)
        # hot LSH bucket: 50 docs/copy x 10 copies share ONE text
        d10 = d10.withColumn(
            "text",
            F.when(F.col("doc_id") % 1_000_000 < 50, F.lit(HOT_TEXT)).otherwise(
                F.col("text")
            ),
        )
        d10.repartition(32).write.mode("overwrite").parquet(f"{OUT10}/documents")

    if not os.path.exists(os.path.join(OUT10, "embeddings", "_SUCCESS")):
        emb = load_table(spark, SF1, "embeddings").select("vec_id", "embedding")
        parts = []
        for i in range(10):
            c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
            if i > 0:
                # tiny per-copy rotation-ish perturbation: near-identical
                # directions => ANN-near-dup heavy corpus
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding", lambda x: x * (1.0 + F.lit(i) * 0.001) + F.lit(i) * 0.0005
                    ),
                )
            parts.append(c)
        e10 = parts[0]
        for c in parts[1:]:
            e10 = e10.unionByName(c)
        e10.repartition(32).write.mode("overwrite").parquet(f"{OUT10}/embeddings")

    if not os.path.exists(os.path.join(OUT10, "events", "_SUCCESS")):
        ev = load_table(spark, SF1, "events").select(
            "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
            "event_type", "value",
        )
        parts = []
        for i in range(10):
            c = ev.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 10_000_000)
            ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 40} DAYS"))
            if i == 9:
                # hot key: ~30% of the last copy lands on user_id 1
                c = c.withColumn(
                    "user_id",
                    F.when(F.col("event_id") % 10 < 3, F.lit(1)).otherwise(
                        F.col("user_id")
                    ),
                )
            parts.append(c)
        v10 = parts[0]
        for c in parts[1:]:
            v10 = v10.unionByName(c)
        # range-layout by ts => the streaming maxFilesPerTrigger replay
        # sees batches in event-time order (watermark advances per batch)
        v10.repartitionByRange(10, "ts").sortWithinPartitions("ts").write.mode(
            "overwrite"
        ).parquet(f"{OUT10}/events")


def synth_curation(spark) -> None:
    """Write the 10x curation corpus (driver table names, so REGISTRY
    functions read it as an sf_dir): documents with a 30%-hot source
    (one domain owns ~30% of all rows — q110's worst case) and part
    with a 5,000-name hot blocking prefix (every name in the block
    shares its first 3 chars — q112/q116's worst case)."""
    if not os.path.exists(os.path.join(OUT10C, "documents.parquet", "_SUCCESS")):
        docs = load_table(spark, SF1, "documents").select(
            "doc_id", "text", "lang", "source"
        )
        parts = []
        for i in range(10):
            c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
            if i % 2 == 1:
                c = c.withColumn(
                    "text", F.concat_ws(" ", "text", F.lit(f"variant tail {i}"))
                )
            parts.append(c)
        d10 = parts[0]
        for c in parts[1:]:
            d10 = d10.unionByName(c)
        d10 = (
            d10.withColumn(
                "source",
                F.when(F.col("doc_id") % 10 < 3, F.lit(HOT_SOURCE)).otherwise(
                    F.col("source")
                ),
            )
            .withColumn("n_chars", F.length("text").cast("long"))
        )
        d10.repartition(32).write.mode("overwrite").parquet(
            f"{OUT10C}/documents.parquet"
        )

    if not os.path.exists(os.path.join(OUT10C, "embeddings.parquet", "_SUCCESS")):
        # ANN-near-dup-heavy embeddings under the driver table name so
        # q134 (semantic dedup) runs verbatim at 10x: same construction
        # as OUT10's embeddings — copies' tiny scale+shift perturbation
        # keeps directions near-identical (cosine ~1), so the within-
        # cluster prune faces both a big drop set AND effectively ~5
        # oversized clusters (the 50 per-copy centroids are themselves
        # near-dups; rounded-cosine ties collapse assignment onto the
        # originals) — the oversized-cluster worst case on purpose
        emb = load_table(spark, SF1, "embeddings").select(
            "vec_id", "embedding", "label"
        )
        parts = []
        for i in range(10):
            c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
            if i > 0:
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x: x * (1.0 + F.lit(i) * 0.001) + F.lit(i) * 0.0005,
                    ),
                )
            parts.append(c)
        e10 = parts[0]
        for c in parts[1:]:
            e10 = e10.unionByName(c)
        e10.repartition(16).write.mode("overwrite").parquet(
            f"{OUT10C}/embeddings.parquet"
        )

    if not os.path.exists(os.path.join(OUT10C, "part.parquet", "_SUCCESS")):
        part = load_table(spark, SF1, "part")
        cols = part.columns
        parts = []
        for i in range(10):
            c = part.withColumn(
                "p_partkey", F.col("p_partkey") + F.lit(i * 10_000_000)
            )
            if i > 0:
                # distinct names per copy (suffix token) so canon
                # doesn't collapse the copies back to 1x
                c = c.withColumn(
                    "p_name", F.concat_ws(" ", "p_name", F.lit(f"v{i}"))
                )
            parts.append(c)
        # hot blocking key: 5,000 DISTINCT names sharing one 3-char
        # prefix — the prefix block every blocked-ER strategy hashes on
        hot = spark.range(5000).select(
            (F.col("id") + 90_000_000).alias("p_partkey"),
            F.concat(
                F.lit(HOT_PREFIX + " hotblock name "), F.col("id").cast("string")
            ).alias("p_name"),
            *[
                F.lit(None).cast(part.schema[c].dataType).alias(c)
                for c in cols
                if c not in ("p_partkey", "p_name")
            ],
        ).select(*cols)
        p10 = parts[0]
        for c in parts[1:]:
            p10 = p10.unionByName(c)
        p10.unionByName(hot).repartition(16).write.mode("overwrite").parquet(
            f"{OUT10C}/part.parquet"
        )


def timed(fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def bench_family(spark, docs, emb, events) -> dict[str, tuple[float, int]]:
    out: dict[str, tuple[float, int]] = {}

    out["exact_dedup"] = timed(
        lambda: D.exact_dup_groups(docs, F.md5("text"), "doc_id").count()
    )
    out["minhash_lsh_pairs"] = timed(
        lambda: D.minhash_lsh_pairs(docs, "doc_id", "text", k=3, n_hashes=8,
                                    n_bands=4).count()
    )

    def jacc():
        sh = D.shingle_relation(docs, "doc_id", "text", k=3).persist()
        pairs = D.minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, n_hashes=8, n_bands=4, shingle_rel=sh
        )
        n = D.jaccard_verify(
            docs, pairs, "doc_id", "text", k=3, threshold=0.7, shingle_rel=sh
        ).count()
        sh.unpersist()
        return n

    out["jaccard_verify"] = timed(jacc)

    def clusters():
        from datapipeline_scraping_spark.operators.graph import (
            connected_components,
        )

        pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", k=3, n_hashes=8,
                                    n_bands=4)
        return connected_components(pairs, "id_a", "id_b").count()

    out["dedup_clusters"] = timed(clusters)
    out["simhash"] = timed(lambda: D.simhash(docs, "doc_id", "text", bits=32).count())

    q8 = emb.filter(F.col("vec_id") % 1_000_000 < 8).filter(F.col("vec_id") < 8)
    out["srp_ann_topk"] = timed(
        lambda: SIM.lsh_cosine_topk(emb, q8, "vec_id", "embedding", k=5,
                                    n_planes=6).count()
    )
    out["ivf_ann_topk"] = timed(
        lambda: SIM.ivf_topk(emb, q8, "vec_id", "embedding", k=5, nprobe=2).count()
    )

    users = events.select("user_id").distinct().withColumn(
        "tier", (F.col("user_id") % 5).cast("string")
    )
    out["salted_join_agg"] = timed(
        lambda: salted_join(
            events.select("event_id", "user_id", "value"), users, "user_id",
            salt_from="event_id", n_salt=8,
        ).groupBy("tier").agg(F.count("*").alias("n")).count()
    )

    def sess():
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        w = Window.partitionBy("user_id").orderBy("us", "event_id")
        wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        flagged = events.select("user_id", "event_id", "value", us.alias("us")).withColumn(
            "new_session",
            F.when(F.lag("us").over(w).isNull(), 1)
            .when(F.col("us") - F.lag("us").over(w) > 30 * 60 * 1_000_000, 1)
            .otherwise(0),
        )
        return (
            flagged.withColumn("session_id", F.sum("new_session").over(wf))
            .groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 exact_sum("value", 18, 2).alias("total_value"))
            .count()
        )

    out["sessionization"] = timed(sess)
    return out


def synth_txn(spark) -> None:
    """10x id-shifted copies of customer / orders / events under driver
    table names, so the round-8 txn/scheduling queries (time travel,
    partitioned manifest sink, schema-evolving MERGE, CDF, queue
    folds) run VERBATIM against OUT10C as an sf_dir. events keeps its
    original 30-day ts span — the partition COUNT of q139's
    date-partitioned snapshot stays constant while the data grows 10x,
    which is exactly the pruning claim (scan cost tracks the filtered
    window, not the table)."""
    for name, idcol, shift in (
        ("customer", "c_custkey", 1_000_000),
        ("orders", "o_orderkey", 10_000_000),
        ("events", "event_id", 10_000_000),
        # lineitem keeps its ~7-year l_shipdate span at 10x, so q152's
        # stats-pruned read must keep scanning only the files covering
        # its one-quarter window — file skipping's claim at scale
        ("lineitem", "l_orderkey", 10_000_000),
    ):
        if os.path.exists(os.path.join(OUT10C, f"{name}.parquet", "_SUCCESS")):
            continue
        t = load_table(spark, SF1, name)
        if name == "events":
            t = t.withColumn("ts", F.col("ts").cast("timestamp"))
        parts = [
            t.withColumn(idcol, F.col(idcol) + F.lit(i * shift))
            for i in range(10)
        ]
        u = parts[0]
        for c in parts[1:]:
            u = u.unionByName(c)
        u.repartition(16).write.mode("overwrite").parquet(
            f"{OUT10C}/{name}.parquet"
        )


#: round-8 txn + scheduling queries, run verbatim at 1x and 10x. The
#: 30%-hot source in the 10x documents makes q145/q146 fold ONE queue
#: with ~30% of all tasks — the adversarial case where a single
#: sequential fold dominates (a hot domain serializes only itself).
TXN_QUERIES = (
    "q138_time_travel_ledger",
    "q139_partitioned_manifest_sink",
    "q140_schema_evolution_upsert",
    "q147_version_changes",
    "q145_requeue_policy",
    "q146_adaptive_concurrency",
    # batch construction: q148's two-pass global rank vs the 30%-hot
    # source (the skew its rewrite exists for), q149's shard balance
    "q148_length_buckets",
    "q149_epoch_shuffle_shards",
    # r9: CDF-maintained derived index, stats-pruned range scan, and
    # the exactly-once epoch sink (multi-epoch replay + CAS commits)
    "q151_cdf_incremental_index",
    "q152_file_skipping_scan",
    "q153_exactly_once_stream_sink",
    # r9b: z-order keeps BOTH query dimensions pruning as lineitem
    # grows 10x (the cut count is pinned, so per-file rectangles
    # cover the same key fractions); restore stays metadata-only
    # (hardlinks — cost tracks file count, not the 10x bytes);
    # constraint enforcement rides the write job (no extra scan, and
    # the rejected 10x batch must abort without moving the pointer)
    "q154_zorder_clustering",
    "q155_restore_rollback",
    "q156_check_constraints",
    # r9c: merge-on-read DELETE must stay O(matched keys) as the table
    # grows 10x (hardlink + churn-sized _dv — the inode assert inside
    # the query proves zero data-file rewrites at BOTH scales); the
    # materialized change feed's consumer cost tracks churn (the 10x
    # feed is 10x the churn, never 10x the table scan); renames stay
    # one log write regardless of bytes
    "q167_deletion_vectors",
    "q168_cdf_stream_view",
    "q169_column_mapping_rename",
    "q170_mor_update",
    # zero-copy clone + divergence: both lineages DML on the 10x table
    "q176_zero_copy_clone",
    # metadata-only DROP + rename composition on the 10x ledger
    "q178_drop_column",
    # add + MoR backfill rollout on the 10x ledger
    "q179_add_column_backfill",
    # r10: bloom point lookups must stay O(1-2 files) as the table
    # grows 10x (the sidecar scales with keys, the probe with files);
    # append ingest must stay O(batch) with the whole 10x base
    # hardlinking forward (inode-asserted inside the query); the
    # bin-pack rewrite cost must track small-file bytes, not the 10x
    # table (big-file inodes asserted unchanged)
    "q180_bloom_point_lookup",
    "q181_append_only_ingest",
    "q182_small_file_compaction",
    # r10 tail: SQL INSERT ingest must stay O(batch) through the Arrow
    # datasource writer (inode-asserted in-query); the composed
    # partition+stats pruned read must keep scanning only the
    # window-within-partition files as lineitem grows 10x; WAP's
    # audit/rebase/fast paths run on the 10x doc corpus (the fast
    # publish stays O(1) hardlinks regardless of bytes); the clustered
    # ledger join pays its ingest shuffle once at 10x and still plans
    # exchange-free
    "q183_sql_insert_ledger",
    "q184_partitioned_pruned_scan",
    "q185_write_audit_publish",
    "q186_clustered_ledger_join",
    # r11: the SQL DML chain (UPDATE/DELETE merge-on-read, MERGE
    # copy-on-write) must keep its statement cost tracking churn /
    # join size, not the 10x table; the partitioned epoch sink's
    # per-epoch append cost tracks the batch while partition pruning
    # keeps the catch-up read constant-fraction
    "q187_sql_dml_ledger",
    "q188_partitioned_epoch_sink",
    # r11: incremental clustered ingest — per-epoch bucket-preserving
    # append cost must track the batch (base inode-asserted in-query),
    # per-bucket compaction cost the multi-file buckets, and the join
    # stays exchange-free at 10x
    "q189_clustered_incremental_ingest",
    # r12: merge-on-read DML on the CLUSTERED layout — the DELETE/
    # UPDATE statements must stay churn-sized (base bucket inodes
    # asserted in-query) and the per-bucket fold must track affected
    # buckets, not the 10x table; the group-committed corpus-append +
    # index-maintenance pair must keep its per-batch cost at O(batch +
    # index) while both tables grow 10x
    "q190_clustered_mor_dml",
    "q191_group_incremental_pair",
    # r12: partition evolution — the spec change itself is metadata-
    # only (inode-asserted in-query), so the 10x cost must track the
    # streaming build of the evolved ledger (commit + append + DML),
    # never a rewrite; the union read's per-spec pruning is asserted
    # in-query at both scales
    "q192_partition_evolution",
    # r14: predicate views — the time-window view must keep launching
    # O(window) tasks as the ledger grows 10x with the SAME 30-day
    # span (its in-query assert pins kept < total at both scales);
    # the bloom point lookup must keep pruning to the probed keys'
    # files while every min/max envelope still spans the domain; the
    # null-count IS NOT NULL view must keep skipping the all-null
    # files (all three assert their reductions IN-QUERY, so a scale
    # where pruning stopped working fails the run, not just the ratio)
    "q196_temporal_predicate_view",
    "q197_bloom_point_lookup",
    "q198_nullcount_skipping",
    # r15: the DNF view must keep launching the UNION of its two
    # windows' tasks at 10x (kept == kept_a + kept_b asserted
    # in-query), and the LIKE-prefix view must keep touching only the
    # prefix interval's files on the url-sorted ledger while the
    # %inner% control keeps everything
    "q199_dnf_predicate_view",
    "q200_like_prefix_skipping",
)

CURATION_QUERIES = (
    "q108_quality_rules",      # Gopher/C4 repetition + shape rules
    "q109_decontaminate",      # benchmark n-gram decontamination
    "q110_domain_caps",        # per-domain caps (hot-domain window)
    "q112_fuzzy_match",        # blocked ER (hot prefix block)
    "q113_source_mixing",      # mixture sampling
    "q116_er_multikey_recall", # multi-key blocked ER + recall
    "q117_rarity_quality",     # unigram corpus-frequency scoring
    "q118_curation_funnel",    # composed quality->dedup->decontam->cap
    "q119_paragraph_dedup",    # sub-document first-occurrence dedup
    "q120_sequence_packing",   # keyed prefix-sum packing manifest
    "q132_sequence_packing_twopass",  # two-pass scan: hot source spread
    "q134_semantic_dedup",     # SemDeDup: oversized-cluster worst case
    # r9b: the hot shared text makes EVERY window of 500 docs a
    # duplicated span (hot group key + hot doc windows — worst case for
    # the count/join/island stages); chunking must stay map-only at
    # 10x; the hashed classifier's broadcast model is size-invariant
    "q160_duplicate_spans",
    "q161_overlapping_chunks",
    "q162_hashed_classifier",
    # r9c: SQ8 candidate generation faces near-dup-heavy embeddings
    # (ties in integer scores — worst case for the candidate window);
    # boilerplate removal faces the 30%-hot source whose shared hot
    # text makes whole documents boilerplate (maximal anti-join hit
    # rate AND a hot (source, chunk) aggregation key)
    "q173_boilerplate_removal",
    # the composed IVF-SQ8 index on the same near-dup-heavy corpus:
    # centroid ties + integer-score ties together are its worst case
    "q174_ivf_sq8_topk",
    # near-dup-heavy copies of the eval slice flood q175 with organic
    # contamination hits (output grows with real leak mass, not corpus)
    "q175_semantic_decontamination",
    # recall of the quantized tier vs exact ground truth at 10x
    "q177_quantized_ann_recall",
)


def bench_curation(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    """Run the REGISTERED curation queries verbatim against an sf_dir
    (the 10x corpus is written under driver table names precisely so
    the measured plan IS the registry plan)."""
    from datapipeline_scraping_spark.queries import REGISTRY

    out: dict[str, tuple[float, int]] = {}
    for name in CURATION_QUERIES:
        fn = REGISTRY[name].fn
        out[name] = timed(lambda: fn(spark, sf_dir).count())
        spark.catalog.clearCache()
    return out


def skew_split_evidence(spark, docs) -> tuple[str, float, int]:
    """Demonstrate AQE's skew split firing on the LSH bucket self-join.

    A 5,000-doc hot block (one shared text => one bucket per band)
    is unioned in so a single join key dominates its shuffle
    partition, and the AQE skew thresholds are scaled DOWN to this
    corpus's partition sizes: the defaults
    (skewedPartitionThresholdInBytes=256m, advisory=64m) assume
    production-sized partitions, while the whole 10x bucket table is
    a few MB of highly-compressible shuffle bytes, so the equivalent
    relative skew sits at KB scale here. Broadcast is disabled so the
    join actually shuffles, and the raw pre-distinct bucket join is
    executed (that is the stage the split parallelizes).

    The executed-plan capture must run the DATAFRAME'S OWN
    AdaptiveSparkPlanExec (``executedPlan().execute()``): a
    ``df.count()`` builds a separate QueryExecution, leaving this
    one's adaptive plan un-finalized (isFinalPlan=false, no
    AQEShuffleRead nodes)."""
    conf = spark.conf
    keys = (
        "spark.sql.shuffle.partitions",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
    )
    saved = {}
    for k in keys:
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
    try:
        conf.set("spark.sql.shuffle.partitions", "128")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4k")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2k")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        hot = spark.range(5000).select(
            (F.col("id") + 90_000_000).alias("doc_id"), F.lit(HOT_TEXT).alias("text")
        )
        buckets = D.lsh_buckets(
            D.minhash_signatures(
                docs.unionByName(hot), "doc_id", "text", k=3, n_hashes=8
            ),
            "doc_id", 8, 4,
        )
        a = buckets.select(F.col("doc_id").alias("id_a"), "band", "bucket")
        b = buckets.select(F.col("doc_id").alias("id_b"), "band", "bucket")
        pairs = a.join(b, on=["band", "bucket"]).filter(F.col("id_a") < F.col("id_b"))
        ep = pairs._jdf.queryExecution().executedPlan()
        t0 = time.perf_counter()
        n = ep.execute().count()
        wall = round(time.perf_counter() - t0, 2)
        plan = ep.toString()
        excerpt = "\n".join(
            ln.strip()[:120]
            for ln in plan.splitlines()
            if "AQEShuffleRead" in ln or "SortMergeJoin" in ln
            or "isFinalPlan" in ln
        )
        assert "skewed" in plan, "AQE skew split did not fire — probe is stale"
        return excerpt, wall, n
    finally:
        for k, v in saved.items():
            if v is not None:
                conf.set(k, v)


def incremental_probe_evidence(spark, docs1, docs10) -> dict[str, float]:
    """q95's claim, measured: with the corpus LSH bucket table
    PERSISTED (the maintained index), probing a fixed 500-doc batch
    costs O(batch), not O(corpus) — the 10x corpus probe must not cost
    10x the 1x probe."""
    out: dict[str, float] = {}
    batch = (
        load_table(spark, SF1, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 10 == 0)
        .limit(500)
        .withColumn("doc_id", F.col("doc_id") + 50_000_000)
    )
    for tag, docs in (("1x", docs1), ("10x", docs10)):
        idx_path = os.path.join(OUT10, f"lsh_index_{tag}")
        if not os.path.exists(os.path.join(idx_path, "_SUCCESS")):
            D.lsh_buckets(
                D.minhash_signatures(docs, "doc_id", "text", k=3, n_hashes=8),
                "doc_id", 8, 4,
            ).write.mode("overwrite").parquet(idx_path)
        index = spark.read.parquet(idx_path)
        bkt_b = D.lsh_buckets(
            D.minhash_signatures(batch, "doc_id", "text", k=3, n_hashes=8),
            "doc_id", 8, 4,
        ).select(F.col("doc_id").alias("id_new"), "band", "bucket")
        t0 = time.perf_counter()
        (
            bkt_b.join(
                index.select(F.col("doc_id").alias("id_corpus"), "band", "bucket"),
                on=["band", "bucket"],
            )
            .select("id_corpus", "id_new")
            .distinct()
            .count()
        )
        out[tag] = round(time.perf_counter() - t0, 2)
    return out


def cdf_catchup_evidence(spark) -> dict[str, dict[str, float]]:
    """VERDICT r8 item 3's done criterion, measured directly: with a
    FIXED-SIZE churn (500 updates + 100 deletes + 100 inserts), the
    CDF catch-up of a derived SRP-bucket index must cost roughly the
    same on a 10x base as on the 1x base — the expensive derivation
    (64-dim integer projections x 6 planes) runs only on the change
    rows — while a full rebuild's derivation cost grows with the
    table. The diff itself is one cheap keyed column-compare join
    (O(table) shuffle of raw values, no derivation), which is why the
    catch-up curve stays nearly flat rather than perfectly flat."""
    from datapipeline_scraping_spark.operators.txn import (
        ManifestTable,
        apply_diff,
    )

    out: dict[str, dict[str, float]] = {}
    for tag, src in (("1x", SF1), ("10x", OUT10C)):
        emb = (
            load_table(spark, src, "embeddings")
            .select("vec_id", SIM.as_double("embedding").alias("v"))
        )
        root = os.path.join(OUT10, f"cdf_evidence_{tag}")
        import shutil as _sh

        _sh.rmtree(root, ignore_errors=True)
        base = ManifestTable(root)
        base.commit(emb)
        churn_upd = emb.filter(F.col("vec_id") % 97 == 0).limit(500).select(
            "vec_id", F.transform("v", lambda x: -x).alias("v")
        )
        gone = emb.select("vec_id").filter(F.col("vec_id") % 101 == 0).limit(100)
        new = emb.limit(100).select(
            (F.col("vec_id") + 77_000_000).alias("vec_id"), "v"
        )
        v2 = (
            emb.join(gone, "vec_id", "left_anti")
            .join(churn_upd.select("vec_id", F.col("v").alias("nv")),
                  "vec_id", "left")
            .select("vec_id", F.coalesce("nv", "v").alias("v"))
            .unionByName(new)
        )
        base.commit(v2)

        def bucketed(df):
            return df.select(
                "vec_id",
                SIM.srp_bucket(F.col("v"), 6, 64).cast("long").alias("bucket"),
            )

        derived_v1 = bucketed(base.read(spark, version=1))
        derived_v1.count()  # the maintained index exists already

        t0 = time.perf_counter()
        changes = base.diff(spark, 1, 2, ["vec_id"])
        applied = apply_diff(
            derived_v1,
            changes.select(
                "_change_type", "vec_id",
                SIM.srp_bucket(F.col("v"), 6, 64).cast("long").alias("bucket"),
            ),
            ["vec_id"],
        )
        n_inc = applied.count()
        t_inc = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        n_full = bucketed(base.read(spark, version=2)).count()
        t_full = round(time.perf_counter() - t0, 2)
        assert n_inc == n_full
        out[tag] = {"catchup_sec": t_inc, "rebuild_sec": t_full,
                    "rows": n_full}
        _sh.rmtree(root, ignore_errors=True)
    return out


def predicate_view_evidence(spark) -> dict:
    """r14 (VERDICT r13 item 7): measure — don't just assert — that a
    predicate view's task count and wall time track the PREDICATE, not
    the table. Over the ledgers q196/q197 build (roots keyed by
    sf_dir; run AFTER the txn passes so they exist): tasks launched
    (InputPartitions) and wall for the 7-of-30-day time-window view
    and the bloom point lookup, at 1x and 10x. The 10x events ledger
    keeps its 30-day span, so the window's share of files — and the
    scan's task count — must stay the window's fraction while total
    bytes grow 10x."""
    import json as _json

    from pyspark.sql.types import StructType as _St

    from datapipeline_scraping_spark.queries_r14 import (
        _Q196_HI, _Q196_LO, _Q197_KEYS, _key,
    )
    from datapipeline_scraping_spark.queries_r15 import (
        _Q199_WHERE, _Q200_PREFIX,
    )
    from datapipeline_scraping_spark.operators.txn import ManifestTable
    from datapipeline_scraping_spark.sources.manifest_datasource import (
        ManifestReader, register,
    )

    register(spark)
    in_list = ", ".join(str(k) for k in _Q197_KEYS)
    out: dict = {}
    for tag, sf in (("1x", SF1), ("10x", OUT10C)):
        row = {}
        for fam, prefix, where in (
            (
                "window",
                "tpv",
                f"ts >= TIMESTAMP '{_Q196_LO}' AND ts < TIMESTAMP '{_Q196_HI}'",
            ),
            ("point", "bloomq2", f"l_orderkey IN ({in_list})"),
            # r15 (VERDICT r14 item 8): the q198 "backlog scan" shape —
            # IS NULL over a mostly-filled column touches only the
            # unfilled tail's files at both scales
            ("nullscan", "nullsk", "status_audit IS NULL"),
            # r15: DNF union-of-windows and LIKE host-prefix — the two
            # new grammar shapes' kept-file fractions at 1x vs 10x
            ("dnf_union", "tpv", _Q199_WHERE),
            ("like_prefix", "likeurl", f"url LIKE '{_Q200_PREFIX}%'"),
        ):
            root = os.path.join(SCRATCH, f"{prefix}_{_key(sf)}")
            mt = ManifestTable(root)
            entry = mt._log_entry(mt.version()) or {}
            schema = _St.fromJson(_json.loads(entry["schema"]))
            total = len(ManifestReader({"root": root}, schema).partitions())
            kept = len(
                ManifestReader(
                    {"root": root, "where": where}, schema
                ).partitions()
            )
            t0 = time.perf_counter()
            n = (
                spark.read.format("manifest")
                .option("root", root)
                .option("where", where)
                .load()
                .count()
            )
            wall = round(time.perf_counter() - t0, 2)
            row[fam] = {
                "files_total": total,
                "files_kept": kept,
                "wall_sec": wall,
                "rows": n,
            }
        out[tag] = row
    return out


def streaming_state_evidence(spark) -> list[dict]:
    """Replay the 10x events through the q97 interval join in 10
    time-ordered micro-batches and record the join state size per
    batch: with both sides watermarked at 1h, numRowsTotal must stay
    bounded (a fraction of total input), not accumulate."""
    import uuid as _uuid

    src = f"{OUT10}/events"
    schema = spark.read.parquet(src).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    purchases = (
        sdf.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        sdf.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        on=[
            purchases["user_id"] == clicks["user_id"],
            clicks["c_ts"] >= purchases["p_ts"] - F.expr("INTERVAL 1 HOUR"),
            clicks["c_ts"] <= purchases["p_ts"],
        ],
    )
    name = f"state_ev_{_uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(SCRATCH, "ckpt", name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prog = []
    for p in q.recentProgress:
        for sop in p.get("stateOperators", []):
            prog.append(
                {
                    "batch": p["batchId"],
                    "input_rows": p["numInputRows"],
                    "state_rows_total": sop["numRowsTotal"],
                    "state_rows_removed": sop["numRowsRemoved"],
                }
            )
    return prog


def main() -> None:
    spark = build_spark(app_name="dps-scale-evidence")
    spark.range(1).count()
    synth(spark)
    synth_curation(spark)
    synth_txn(spark)

    docs1 = load_table(spark, SF1, "documents").select("doc_id", "text")
    emb1 = load_table(spark, SF1, "embeddings")
    ev1 = load_table(spark, SF1, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "value",
    )
    docs10 = spark.read.parquet(f"{OUT10}/documents").select("doc_id", "text")
    emb10 = spark.read.parquet(f"{OUT10}/embeddings")
    ev10 = spark.read.parquet(f"{OUT10}/events")

    sizes = {
        "documents": (docs1.count(), docs10.count()),
        "embeddings": (emb1.count(), emb10.count()),
        "events": (ev1.count(), ev10.count()),
    }

    print("# 1x pass", file=sys.stderr)
    t1 = bench_family(spark, docs1, emb1, ev1)
    spark.catalog.clearCache()
    print("# 10x pass", file=sys.stderr)
    t10 = bench_family(spark, docs10, emb10, ev10)
    spark.catalog.clearCache()

    print("# curation 1x pass", file=sys.stderr)
    c1 = bench_curation(spark, SF1)
    print("# curation 10x pass", file=sys.stderr)
    c10 = bench_curation(spark, OUT10C)
    spark.catalog.clearCache()

    def bench_list(names, sf_dir):
        """Each query runs TWICE: the first pass pays any build-once
        scratch construction (version-memoized ledgers, staged stream
        copies), the second measures the steady-state read. Reporting
        the WARM run keeps the 1x/10x ratio apples-to-apples — before
        r11 the 1x side was usually warm from earlier driver_sim/bench
        runs while the 10x side built inside the measured run, so
        build-once queries showed 15-28x 'ratios' that were really
        cold-build-vs-warm-read artifacts, not scaling behavior. The
        first-pass (build-inclusive) time is kept alongside: for the
        ledger-ingest family the BUILD is itself a claim (append cost
        tracks the batch; compaction the small files) and its own
        10x/1x ratio should sit near the data growth, i.e. linear."""
        from datapipeline_scraping_spark.queries import REGISTRY
        out = {}
        for name in names:
            fn = REGISTRY[name].fn
            first = timed(lambda: fn(spark, sf_dir).count())
            spark.catalog.clearCache()
            warm = timed(lambda: fn(spark, sf_dir).count())
            spark.catalog.clearCache()
            # (warm sec, rows, first/build-inclusive sec)
            out[name] = (warm[0], warm[1], first[0])
        return out

    def fresh_txn_scratch(sf_dir: str) -> int:
        """Delete the build-once scratch roots keyed to ``sf_dir`` so
        the txn pass's FIRST run is a true cold build (the `build`
        column) — without this the 1x side is usually pre-warmed by
        earlier driver_sim/bench runs and the build ratio is
        meaningless. The 10x corpus dirs themselves are preserved;
        every removed root is rebuilt idempotently by its query."""
        import shutil as _sh

        key = (
            sf_dir.rstrip("/").replace("/", "_").lstrip("_").replace(".", "_")
        )
        keep = {"scale10x", "scale10x_curation", "ckpt"}
        n = 0
        for e in os.listdir(SCRATCH):
            if e in keep or not e.endswith(key):
                continue
            _sh.rmtree(os.path.join(SCRATCH, e), ignore_errors=True)
            n += 1
        return n

    print(
        f"# txn/scheduling 1x pass (cleared "
        f"{fresh_txn_scratch(SF1)} scratch roots)",
        file=sys.stderr,
    )
    x1 = bench_list(TXN_QUERIES, SF1)
    print(
        f"# txn/scheduling 10x pass (cleared "
        f"{fresh_txn_scratch(OUT10C)} scratch roots)",
        file=sys.stderr,
    )
    x10 = bench_list(TXN_QUERIES, OUT10C)
    spark.catalog.clearCache()

    pview = predicate_view_evidence(spark)

    skew_excerpt, skew_wall, skew_rows = skew_split_evidence(spark, docs10)
    probe = incremental_probe_evidence(spark, docs1, docs10)
    cdf = cdf_catchup_evidence(spark)
    state = streaming_state_evidence(spark)

    lines = [
        "# SCALE EVIDENCE — 10x derived corpus, skew + near-dup heavy",
        "",
        "Produced by `scripts/scale_evidence.py` (re-runnable; corpus is",
        "derived deterministically from the driver's sf0.1 tables — see the",
        "script docstring for the construction: 10 id-shifted copies, odd",
        "copies token-perturbed (near-dups), even copies identical (exact",
        "dups), 500 documents sharing ONE text (hot LSH bucket), 30% of one",
        "events copy on a single hot user key).",
        "",
        "## Corpus",
        "",
        "| table | 1x rows | 10x rows |",
        "| --- | --- | --- |",
    ]
    for t, (a, b) in sizes.items():
        lines.append(f"| {t} | {a:,} | {b:,} |")
    lines += [
        "",
        "## Family timings (wall sec, local[32], single run)",
        "",
        "A 10x/1x ratio near (or below) 10 = at-most-linear scaling. Pair-",
        "producing ops (LSH candidates, Jaccard) are super-linear in the",
        "OUTPUT on this corpus by construction — every copy matches every",
        "other copy, so the true pair count grows ~45x, and the hot bucket",
        "contributes 500-choose-2 pairs alone. For those rows the right",
        "read is the `out 10x/1x` column: time ratio tracking the output",
        "ratio (not the input ratio) means cost is proportional to work.",
        "",
        "| op | 1x sec | 10x sec | time 10x/1x | out 1x | out 10x | out 10x/1x |",
        "| --- | --- | --- | --- | --- | --- | --- |",
    ]
    for op in t1:
        (s1, n1), (s10, n10) = t1[op], t10[op]
        ratio = round(s10 / s1, 1) if s1 > 0 else float("inf")
        oratio = round(n10 / n1, 1) if n1 else float("nan")
        lines.append(
            f"| {op} | {s1} | {s10} | {ratio} | {n1:,} | {n10:,} | {oratio} |"
        )
    lines += [
        "",
        "## Curation family (registered plans, run verbatim)",
        "",
        "The 10x curation corpus is WRITTEN UNDER DRIVER TABLE NAMES and",
        "the registry query functions run against it unchanged — the",
        "measured plan is the shipped plan. Worst-case skew is built in:",
        f"one domain (`{HOT_SOURCE}`) owns ~30% of all 10x documents",
        "(q110's hot-domain window), and 5,000 distinct part names share",
        f"one 3-char blocking prefix (`{HOT_PREFIX}`) so q112/q116's",
        "candidate joins hit a hot block. q109's output is quadratic in",
        "the copy count by construction (every corpus copy collides with",
        "every benchmark copy) — read its `out 10x/1x` column.",
        "",
        "| query | 1x sec | 10x sec | time 10x/1x | out 1x | out 10x | out 10x/1x |",
        "| --- | --- | --- | --- | --- | --- | --- |",
    ]
    for op in c1:
        (s1, n1), (s10, n10) = c1[op], c10[op]
        ratio = round(s10 / s1, 1) if s1 > 0 else float("inf")
        oratio = round(n10 / n1, 1) if n1 else float("nan")
        lines.append(
            f"| {op} | {s1} | {s10} | {ratio} | {n1:,} | {n10:,} | {oratio} |"
        )
    lines += [
        "",
        "q110's hot-domain window stays cheap because the registered plan",
        "filters `row_number() <= cap` directly on the window, which",
        "Catalyst rewrites to a PARTIAL (map-side) `WindowGroupLimit`:",
        "the hot domain ships at most cap rows per map partition into the",
        "window shuffle, so a domain with a billion documents costs",
        "`cap * n_map_partitions` shuffled rows, not a billion",
        "(CI-asserted in `tests/test_plan_lint.py` MUST_GROUP_LIMIT).",
        "q112/q116 bound the hot block by the length band at the probe",
        "plus the threshold-form `levenshtein(.., 3)` verify; the",
        "candidate join is an equi-join on the blocking key, so at",
        "production partition sizes the AQE skew split applies to it",
        "exactly as demonstrated for the LSH bucket join below.",
        "q132 is q120's two-pass (scan) packer: identical output (same",
        "out columns above, oracle-hash-equal), per-source prefix sums",
        "computed over range slices so the 30%-hot source never",
        "serializes into one window partition's sort. At this corpus",
        "size the extra slice/offset round trip costs ~0.6 s of fixed",
        "overhead (one-pass wins in absolute time); the crossover is",
        "where one source outgrows a single partition — the regime the",
        "two-pass path exists for, with per-partition window state",
        "bounded by the slice size instead of the hot source's total.",
        "q134 (semantic dedup) runs its oversized-cluster worst case by",
        "construction: the 10x copies are near-identical DIRECTIONS, so",
        "rounded-cosine ties collapse centroid assignment onto ~5 hot",
        "clusters and the within-cluster pair count grows ~100x — yet",
        "wall time grows only ~4-5x because the pairwise step is an",
        "equi-join on the cluster id (hash-partitioned, partial-agg'd).",
        "In production SemDeDup picks k ~ corpus/target-cluster-size, so",
        "sum(cluster_size^2) stays linear in the corpus; this corpus",
        "deliberately violates that sizing and the join still holds.",
        "",
        "Notes: `ivf_ann_topk` (q52's shape) rebuilds the IVF index —",
        "centroid table + list assignment, O(corpus) — inside the query,",
        "and the default centroid count grows with the corpus, so its cost",
        "is index BUILD, not probe; in production the index is maintained",
        "incrementally (see the incremental-probe section below and",
        "q106's persisted SRP index) and per-query cost is",
        "O(probed lists) only. `srp_ann_topk` (the scale path) stays flat",
        "because bucket hashing is map-side and the probe joins only",
        "matching buckets. q174 (IVF-SQ8) carries the same in-query",
        "index-build artifact AMPLIFIED: the deterministic every-100th-id",
        "centroid rule grows the centroid set 10x with the corpus, so",
        "assignment work grows ~100x (corpus x centroids) — wall grows",
        "only ~3-4x because assignment is a broadcast map stage. In",
        "production k is fixed by the k-means training budget and the",
        "code table is PERSISTED (q106's maintenance pattern applies",
        "verbatim to SQ8 codes); the per-query cost is the probe join +",
        "candidate rerank only.",
        "",
        "## AQE skew split on the LSH bucket self-join",
        "",
        "A 5,000-doc hot block (one shared text = one bucket per band) is",
        "unioned into the 10x corpus so a single join key dominates its",
        "shuffle partition, and the raw bucket self-join (the stage a hot",
        "key actually stresses) is executed with broadcast disabled. AQE",
        "skew thresholds are scaled to this corpus's compressed KB-sized",
        "partitions (defaults assume 256 MB-scale production partitions:",
        "threshold 4k / factor 1.2 / advisory 2k here). AQE's runtime",
        f"re-plan splits the skewed partition on BOTH sides —",
        f"{skew_rows:,} join rows in {skew_wall}s:",
        "",
        "```",
        skew_excerpt,
        "```",
        "",
        "`SortMergeJoin(skew=true)` with `AQEShuffleRead skewed` on both",
        "inputs is the exact mechanism that fires — at DEFAULT thresholds —",
        "once partitions reach production sizes on a real cluster; nothing",
        "in the operator changes (`session.py` keeps",
        "`spark.sql.adaptive.skewJoin.enabled=true`). The one-key-bigger-",
        "than-an-executor case beyond AQE's reach is covered by the salting",
        "operator (`operators/skew.py`, q67).",
        "",
        "## Incremental dedup probe: cost is O(batch), not O(corpus)",
        "",
        "With the corpus LSH bucket table persisted (the maintained index),",
        "probing the SAME fixed 500-doc batch against a 10x corpus must not",
        "cost 10x — q95's sustainability claim, measured:",
        "",
        "| corpus | probe wall sec |",
        "| --- | --- |",
        f"| 1x (5,000 docs) | {probe['1x']} |",
        f"| 10x (50,000 docs) | {probe['10x']} |",
        "",
        "## CDF catch-up cost tracks churn, not the table (q151)",
        "",
        "A FIXED churn (500 updates + 100 deletes + 100 inserts) is",
        "applied to a 1x and a 10x base ledger; the derived SRP-bucket",
        "index catches up via diff + apply_diff (derivation runs only on",
        "the change rows) vs a full rebuild (derivation over the whole",
        "head state). The catch-up column must stay nearly flat across",
        "the 10x growth while the rebuild grows with the table:",
        "",
        "| base | catch-up sec | full rebuild sec | rows |",
        "| --- | --- | --- | --- |",
        f"| 1x | {cdf['1x']['catchup_sec']} | {cdf['1x']['rebuild_sec']} "
        f"| {cdf['1x']['rows']:,} |",
        f"| 10x | {cdf['10x']['catchup_sec']} | {cdf['10x']['rebuild_sec']} "
        f"| {cdf['10x']['rows']:,} |",
        "",
        "## Stream-stream join state stays bounded (q97)",
        "",
        "10x events replayed in 10 event-time-ordered micro-batches",
        "(`maxFilesPerTrigger=1`) through the watermarked interval join.",
        "State rows per batch — eviction (`removed` > 0) keeps the total",
        "far below cumulative input:",
        "",
        "| batch | input rows | state rows total | state rows removed |",
        "| --- | --- | --- | --- |",
    ]
    for p in state:
        lines.append(
            f"| {p['batch']} | {p['input_rows']:,} | {p['state_rows_total']:,} "
            f"| {p['state_rows_removed']:,} |"
        )
    lines += [
        "",
        "## Txn + scheduling family (registered r8 plans, run verbatim)",
        "",
        "customer / orders / events get 10x id-shifted copies under",
        "driver table names. events keeps its 30-day span, so q139's",
        "date-partitioned snapshot has the SAME partition count at 10x —",
        "its pruned read cost must track the 5-day filter window, not",
        "the table. q145/q146 fold one queue per source; the 30%-hot",
        "source makes one sequential fold own ~30% of all tasks (the",
        "documented worst case: a hot domain serializes only itself,",
        "every other source folds in parallel). q147's CDF output is",
        "proportional to churn (here churn scales with the table, so",
        "out 10x/1x ~ 10 is expected; on organic data it tracks the",
        "delta).",
        "",
        "Timings are the WARM (steady-state) run; `build 1x/10x` is the",
        "first, build-inclusive pass — for build-once ledger queries the",
        "build IS the ingest claim (append tracks the batch, compaction",
        "the small files), so ITS ratio sitting near the 10x data growth",
        "means linear ingest, while the warm ratio tests the read path.",
        "",
        "| query | 1x sec | 10x sec | time 10x/1x | build 1x | build 10x | out 1x | out 10x | out 10x/1x |",
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    for op in x1:
        (s1_, n1_, b1_), (s10_, n10_, b10_) = x1[op], x10[op]
        ratio = round(s10_ / s1_, 1) if s1_ > 0 else float("inf")
        oratio = round(n10_ / n1_, 1) if n1_ else float("nan")
        lines.append(
            f"| {op} | {s1_} | {s10_} | {ratio} | {b1_} | {b10_} "
            f"| {n1_:,} | {n10_:,} | {oratio} |"
        )
    lines += [
        "",
        "## Predicate views: tasks launched track the predicate (r14/r15)",
        "",
        "The `where`-option view's InputPartition count and wall time for",
        "a 7-of-30-day time window (q196's date-partitioned events",
        "ledger; the 10x ledger keeps the SAME 30-day span), a",
        "bloom-sidecar point lookup (q197's unclustered lineitem ledger,",
        "every min/max envelope spans the key domain), the IS NULL",
        "backlog scan (q198's unfilled-tail files only), the DNF",
        "union-of-two-windows (q199 — kept = sum of the disjoint",
        "windows' kept sets), and the LIKE host-prefix interval on the",
        "url-sorted ledger (q200). The O(predicate) claim measured, not",
        "asserted: each kept-file fraction must hold as the table grows",
        "10x.",
        "",
        "| view | scale | files kept/total | wall sec | rows |",
        "| --- | --- | --- | --- | --- |",
    ]
    for fam in ("window", "point", "nullscan", "dnf_union", "like_prefix"):
        for tag in ("1x", "10x"):
            r = pview[tag][fam]
            lines.append(
                f"| {fam} | {tag} | {r['files_kept']}/{r['files_total']} "
                f"| {r['wall_sec']} | {r['rows']:,} |"
            )
    lines += [
        "",
        "Raw JSON: see `scale_evidence.json` next to this file.",
        "",
    ]
    with open(REPORT, "w") as f:
        f.write("\n".join(lines))
    with open(REPORT.replace("SCALE_EVIDENCE.md", "scale_evidence.json"), "w") as f:
        json.dump(
            {"sizes": sizes, "t1x": t1, "t10x": t10,
             "curation_1x": c1, "curation_10x": c10,
             "txn_1x": x1, "txn_10x": x10, "probe": probe, "cdf": cdf,
             "state": state, "skew_wall": skew_wall, "skew_rows": skew_rows,
             "predicate_views": pview},
            f, indent=1,
        )
    print(f"wrote {REPORT}")
    spark.stop()


if __name__ == "__main__":
    main()

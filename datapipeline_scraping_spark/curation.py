"""Shared curation-policy constants (quality-rule thresholds, domain
cap) used by both the round-5 single-operator queries (q108/q110) and
the round-6 composed funnel (q118). Lives in its own leaf module so
query modules can share them without importing each other (the query
modules form an import chain through the registry in queries.py, so a
cross-import between them is circular)."""

from __future__ import annotations

# Gopher/C4-style quality-rule thresholds (q108, q118 stage 1)
QR_MIN_TOK, QR_MAX_TOK = 20, 2000
QR_MIN_MWL, QR_MAX_MWL = 2.0, 10.0
QR_MAX_TBF, QR_MAX_DTF = 0.2, 0.6

# per-domain document cap (q110, q118 stage 4)
DOMAIN_CAP = 15


# ===========================================================================
# the composed curation funnel (q118), in-memory OR manifest-checkpointed
# ===========================================================================

def run_funnel(spark, sf_dir, checkpoint_root=None, _fail_before=None):
    """The q118 curation funnel — quality rules -> exact dedup ->
    decontamination -> domain caps — with two execution modes:

    ``checkpoint_root=None`` (reference semantics): one lazy DAG with
    the two reused stage sets persisted MEMORY_AND_DISK; the funnel
    rows are computed in a single eager action and the stage sets are
    explicitly unpersisted before returning (VERDICT r6: the query no
    longer relies on the driver's clearCache), so the returned 5-row
    DataFrame is local and self-contained.

    ``checkpoint_root=<dir>`` (the 100 TB production path the q118
    docstring sketches): each reused stage boundary (s1 quality
    survivors, s3 decontaminated) is committed through
    :class:`..operators.txn.ManifestTable` (atomic pointer commit) and
    downstream stages read the COMMITTED snapshot — durable
    intermediates, and a mid-funnel crash resumes from the last
    committed stage instead of recomputing (a stage table that already
    exists is not recomputed). The funnel rows are then lazy
    aggregations over the committed parquet.

    ``_fail_before``: test-only failpoint ('s1'/'s3') raising just
    before that stage's commit — the crash-resume test's hook.

    Reference anchor: the reference's staged clean->dedup->store DAG
    (``dags/scraping_etl.py:41-88``) with XCom hand-offs replaced by
    manifest-committed parquet checkpoints (SURVEY §3.1)."""
    import os

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from .operators import dedup as D
    from .operators.txn import ManifestTable
    from .sources.tables import load_table
    from .session import prepare

    prepare(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )

    durable = checkpoint_root is not None

    def boundary(name, build):
        """Materialize a reused stage set: manifest-commit (durable
        mode, resuming from an existing commit) or persist."""
        if durable:
            tbl = ManifestTable(os.path.join(checkpoint_root, name))
            if not tbl.exists():
                if _fail_before == name:
                    raise RuntimeError(f"injected crash before {name} commit")
                tbl.commit(build())
            return tbl.read(spark)
        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        return df

    # -- stage 1: quality rules (q108's predicate) ------------------------
    def build_s1():
        toks = F.split(F.col("text"), " ")
        qdocs = docs.filter(F.size(toks) >= 4)
        nt = F.size(toks).cast("long")
        stats = qdocs.select(
            "doc_id", "text", "source", "n_chars",
            nt.alias("n"),
            F.round(
                (F.length("text") - (nt - 1)) / nt.cast("double"), 4
            ).alias("mwl"),
        )
        top2 = (
            D.shingle_relation(qdocs, "doc_id", "text", k=2)
            .groupBy("doc_id", "s").count()
            .groupBy("doc_id").agg(F.max("count").alias("max_c"))
        )
        dup3 = (
            D.shingle_relation(qdocs, "doc_id", "text", k=3)
            .groupBy("doc_id", "s").count()
            .groupBy("doc_id")
            .agg(
                F.sum(
                    F.when(F.col("count") >= 2, F.col("count")).otherwise(0)
                ).alias("dup_c")
            )
        )
        return (
            stats.join(top2, "doc_id").join(dup3, "doc_id")
            .filter(
                F.col("n").between(QR_MIN_TOK, QR_MAX_TOK)
                & F.col("mwl").between(QR_MIN_MWL, QR_MAX_MWL)
                & (
                    F.col("max_c") / (F.col("n") - 1).cast("double")
                    < QR_MAX_TBF
                )
                & (
                    F.col("dup_c") / (F.col("n") - 2).cast("double")
                    < QR_MAX_DTF
                )
            )
            .select("doc_id", "text", "source", "n_chars")
        )

    s1 = boundary("s1", build_s1)

    # -- stage 2: exact first-wins dedup (lazy over s1) -------------------
    keep_ids = (
        s1.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s2 = s1.join(keep_ids, "doc_id", "left_semi")

    # -- stage 3: benchmark decontamination (bench slice doc_id%37) -------
    def build_s3():
        s2c = s2.filter(F.col("doc_id") % 37 != 0)
        bsh = (
            D.shingle_relation(
                docs.filter(F.col("doc_id") % 37 == 0), "doc_id", "text", k=4
            )
            .select("s").distinct()
        )
        contaminated = (
            D.shingle_relation(s2c, "doc_id", "text", k=4)
            .select("doc_id", "s").distinct()
            .join(bsh, "s")
            .select("doc_id").distinct()
        )
        return s2c.join(contaminated, "doc_id", "left_anti")

    s3 = boundary("s3", build_s3)

    # -- stage 4: per-domain caps (lazy over s3) --------------------------
    rn = F.row_number().over(W.partitionBy("source").orderBy("doc_id"))
    s4 = s3.withColumn("rn", rn).filter(F.col("rn") <= DOMAIN_CAP)

    def stage(df, label, idx):
        return df.agg(
            F.lit(label).alias("stage"),
            F.lit(idx).cast("long").alias("stage_idx"),
            F.count("*").cast("long").alias("docs_out"),
            F.sum("n_chars").cast("long").alias("chars_out"),
        ).select("stage", "stage_idx", "docs_out", "chars_out")

    funnel = (
        stage(docs, "0_ingest", 0)
        .unionByName(stage(s1, "1_quality", 1))
        .unionByName(stage(s2, "2_exact_dedup", 2))
        .unionByName(stage(s3, "3_decontaminate", 3))
        .unionByName(stage(s4, "4_domain_cap", 4))
    )
    if durable:
        # lazy over committed snapshots — durable intermediates carry
        # the plan; nothing to unpersist
        return funnel
    # in-memory mode: one eager action for all five rows, then release
    # the stage sets explicitly — self-contained, no clearCache needed
    rows = funnel.collect()
    s1.unpersist()
    s3.unpersist()
    return spark.createDataFrame(rows, funnel.schema)

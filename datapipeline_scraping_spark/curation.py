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

#: sentinel for :func:`run_funnel`'s self-managed scratch mode — the
#: caller wants durable (manifest-checkpointed) execution but has no
#: root to own: the funnel creates a per-invocation uuid root under
#: the engine scratch dir, reaps crash leftovers via the txn layer's
#: TTL sweep, and deletes its own root once the result rows are
#: materialized (so a healthy run never leaves anything for the sweep,
#: and — ADVICE r7 — never reads a root the sweep could reap).
EPHEMERAL = "::ephemeral::"


def run_funnel(spark, sf_dir, checkpoint_root=None, _fail_before=None):
    """The q118 curation funnel — quality rules -> exact dedup ->
    decontamination -> domain caps — with three execution modes:

    ``checkpoint_root=None`` (reference semantics): one lazy DAG with
    the two reused stage sets persisted MEMORY_AND_DISK; the funnel
    rows are computed in a single eager action and the stage sets are
    explicitly unpersisted before returning (VERDICT r6: the query no
    longer relies on the driver's clearCache), so the returned 5-row
    DataFrame is local and self-contained.

    ``checkpoint_root=<dir>`` (the 100 TB production path the q118
    docstring sketches): the reused stage boundaries (s2 quality+dedup
    survivors, s3 decontaminated) are committed through
    :class:`..operators.txn.ManifestTable` (atomic pointer commit) and
    downstream stages read the COMMITTED snapshot — durable
    intermediates, and a mid-funnel crash resumes from the last
    committed stage instead of recomputing (a stage table that already
    exists is not recomputed). Funnel stage rows ride the stage-write
    jobs as :class:`pyspark.sql.Observation` metrics (VERDICT r7
    item 4) — the s1 quality row observes the s1 subtree inside s2's
    single-traversal min_by dedup, so no job exists just to count a
    stage — and each commit is ``annotate``-d with its stages' metrics
    (Delta operationMetrics style), so a crash-RESUMED run recovers
    the rows from the commit log without re-scanning snapshots.

    ``checkpoint_root=EPHEMERAL``: durable execution on a
    self-managed per-invocation root (see :data:`EPHEMERAL`) — this is
    q118's mode; all scratch lifecycle lives HERE, not in the query.

    ``_fail_before``: test-only failpoint ('s2'/'s3') raising just
    before that stage's commit — the crash-resume test's hook.

    Reference anchor: the reference's staged clean->dedup->store DAG
    (``dags/scraping_etl.py:41-88``) with XCom hand-offs replaced by
    manifest-committed parquet checkpoints (SURVEY §3.1)."""
    import os
    import shutil
    import uuid

    from pyspark.sql import Observation
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from .operators import dedup as D
    from .operators.txn import ManifestTable, sweep_stale_dirs
    from .sources.tables import load_table
    from .session import prepare

    if checkpoint_root == EPHEMERAL:
        from .streaming.events import SCRATCH

        base = os.path.join(SCRATCH, "funnel")
        sweep_stale_dirs(base)  # crash leftovers only; TTL = txn default
        root = os.path.join(base, uuid.uuid4().hex[:12])
        try:
            rows_df = run_funnel(
                spark, sf_dir, checkpoint_root=root, _fail_before=_fail_before
            )
            # materialize BEFORE deleting the root: the returned frame
            # must never depend on files the cleanup removes
            rows = rows_df.collect()
            return spark.createDataFrame(rows, rows_df.schema)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    prepare(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )

    durable = checkpoint_root is not None
    #: stage name -> (docs_out, chars_out) observed on the commit job
    observed: dict[str, tuple[int, int]] = {}

    def _metrics():
        return (
            F.count(F.lit(1)).alias("docs_out"),
            F.sum("n_chars").alias("chars_out"),
        )

    def _harvest(obs):
        got = obs.get  # the commit's write job already ran: no action
        return (int(got["docs_out"]), int(got["chars_out"] or 0))

    def boundary(name, build, riders=()):
        """Materialize a reused stage set: manifest-commit (durable
        mode) or persist. A fresh commit harvests the stage's funnel
        aggregate — and any ``riders`` (earlier funnel stages whose
        Observation is attached INSIDE this build's plan) — from the
        write job itself, then ``annotate``-s the commit with them
        (Delta-operationMetrics style), so a crash-RESUMED run recovers
        every stage's row from the commit log instead of re-scanning."""
        if durable:
            tbl = ManifestTable(os.path.join(checkpoint_root, name))
            if not tbl.exists():
                if _fail_before == name:
                    raise RuntimeError(f"injected crash before {name} commit")
                obs = Observation(f"funnel_{name}_{uuid.uuid4().hex[:8]}")
                ver = tbl.commit(build().observe(obs, *_metrics()))
                for st, o in ((name, obs), *riders):
                    observed[st] = _harvest(o)
                tbl.annotate(
                    ver,
                    stages={
                        st: list(observed[st])
                        for st, _ in ((name, obs), *riders)
                    },
                )
            else:  # resume: stage rows from the commit's annotation
                stages = tbl.commit_meta(tbl.version()).get("stages", {})
                for st, pair in stages.items():
                    observed[st] = (int(pair[0]), int(pair[1]))
            return tbl.read(spark)
        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        return df

    # -- stage 1: quality rules (q108's predicate) ------------------------
    # r8 rewrite: ONE shingle pipeline instead of two. The 2- and
    # 3-gram statistics previously ran two separate explode ->
    # groupBy(doc,s) -> groupBy(doc) pipelines and joined both (with
    # the full text column riding the join shuffles). Here a single
    # position explode emits each position's 2-gram AND 3-gram,
    # stack() tags them with k, one two-level aggregation computes
    # both per-doc stats, and only the surviving doc_ids join back to
    # the docs (text never enters an aggregation shuffle; at runtime
    # AQE broadcasts the tiny survivor side). Same explode idiom as
    # operators/dedup.py:145 — index generator first, flat
    # slice/concat_ws, no nested HOFs.
    def build_s1():
        toks = F.split(F.col("text"), " ")
        qdocs = docs.filter(F.size(toks) >= 4)
        nt = F.size(toks).cast("long")
        mwl = F.round(
            (F.length("text") - (nt - 1)) / nt.cast("double"), 4
        )
        n_part = spark.sparkContext.defaultParallelism
        base = (
            qdocs.select(
                "doc_id", nt.alias("n"), mwl.alias("mwl"),
                F.split(F.col("text"), " ").alias("t"),
            )
            # explicit partition count, as in shingle_relation: a small
            # corpus is often one parquet file = one explode task
            .repartition(n_part, F.col("doc_id"))
        )
        grams = base.select(
            "doc_id", "n", "mwl",
            F.explode(
                F.sequence(F.lit(1), F.size("t") - F.lit(1))
            ).alias("i"),
            "t",
        ).select(
            "doc_id", "n", "mwl",
            F.concat_ws(" ", F.slice("t", F.col("i"), 2)).alias("s2"),
            F.when(
                F.col("i") <= F.size("t") - F.lit(2),
                F.concat_ws(" ", F.slice("t", F.col("i"), 3)),
            ).alias("s3"),  # last position has no 3-gram
        )
        counts = (
            grams.selectExpr(
                "doc_id", "n", "mwl", "stack(2, 2, s2, 3, s3) as (k, s)"
            )
            .filter(F.col("s").isNotNull())
            .groupBy("doc_id", "n", "mwl", "k", "s").count()
        )
        keep = (
            counts.groupBy("doc_id", "n", "mwl")
            .agg(
                F.max(
                    F.when(F.col("k") == 2, F.col("count"))
                ).alias("max_c"),
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("k") == 3) & (F.col("count") >= 2),
                            F.col("count"),
                        )
                    ),
                    F.lit(0),
                ).alias("dup_c"),
            )
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
            .select("doc_id")
        )
        return qdocs.select("doc_id", "text", "source", "n_chars").join(
            keep, "doc_id"
        )

    # -- stages 1+2: quality rules, then exact first-wins dedup -----------
    # Durable mode commits at the DEDUP boundary (s2), not s1: the
    # min_by first-wins (operators/dedup.py:34) traverses s1 exactly
    # once, so the quality stage's funnel row rides the SAME write job
    # as an Observation on the s1 subtree — one commit, one pass, both
    # stage rows, and s3 then reads the deduped snapshot directly
    # instead of re-deriving the dedup from a committed s1 (measured
    # at sf0.1: one fewer write job + no semi-join recompute in either
    # the s3 job or the funnel job). In-memory mode keeps the
    # reference shape: persist s1, lazy semi-join s2.
    if durable:
        obs_s1 = Observation(f"funnel_s1_{uuid.uuid4().hex[:8]}")

        def build_s2():
            s1df = build_s1().observe(obs_s1, *_metrics())
            return D.first_wins(s1df, ["text"], ["doc_id"])

        s1 = None  # funnel row comes from the rider / commit meta
        s2 = boundary("s2", build_s2, riders=(("s1", obs_s1),))
    else:
        s1 = boundary("s1", build_s1)
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

    def stage(df, label, idx, name=None):
        if name in observed:
            # harvested from the stage's own commit job — a literal
            # row, no snapshot re-read
            n, c = observed[name]
            return spark.range(1).select(
                F.lit(label).alias("stage"),
                F.lit(idx).cast("long").alias("stage_idx"),
                F.lit(n).cast("long").alias("docs_out"),
                F.lit(c).cast("long").alias("chars_out"),
            )
        return df.agg(
            F.lit(label).alias("stage"),
            F.lit(idx).cast("long").alias("stage_idx"),
            F.count("*").cast("long").alias("docs_out"),
            F.sum("n_chars").cast("long").alias("chars_out"),
        ).select("stage", "stage_idx", "docs_out", "chars_out")

    funnel = (
        stage(docs, "0_ingest", 0)
        .unionByName(stage(s1 if s1 is not None else build_s1(), "1_quality", 1, name="s1"))
        .unionByName(stage(s2, "2_exact_dedup", 2, name="s2"))
        .unionByName(stage(s3, "3_decontaminate", 3, name="s3"))
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

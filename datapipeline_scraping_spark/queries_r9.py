"""Round-9 registry queries — the transaction layer's consumer loop
closed end-to-end: CDF-driven incremental maintenance of a derived
table (q151), file-level data skipping from commit-log stats (q152),
and the exactly-once streaming epoch sink (q153).

Reference anchors: H2's delta contract (``dags/scraping_etl.py:59-69``)
generalized to multi-version catch-up; the postgres sink's
transactional replay tolerance (``src/storage.py:41-53``) carried onto
the engine's snapshot ledger for real micro-batched streams; and the
scan-minimization role the reference delegates to Postgres indexes
(``src/storage.py:90-131``) re-expressed as Delta-style per-file
min/max skipping.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from .functions.numeric import sql_exact_sum
from .operators import similarity as SIM
from .queries import _t, q
from .streaming.events import SCRATCH


def _key(sf_dir: str) -> str:
    return sf_dir.rstrip("/").replace("/", "_").lstrip("_").replace(".", "_")


# ===========================================================================
# CDF-driven incremental catch-up of a derived table (VERDICT r8 item 3)
# ===========================================================================

_Q151_BUCKET_SQL = SIM.srp_bucket_sql("v", n_planes=6, dim=64)


@q(
    "q151_cdf_incremental_index",
    oracle=f"""
WITH v2 AS (
  SELECT vec_id,
    CASE WHEN vec_id % 9 = 0
         THEN list_transform(embedding, x -> -CAST(x AS DOUBLE))
         ELSE CAST(embedding AS DOUBLE[]) END AS v
  FROM embeddings WHERE vec_id % 5 <> 0 AND vec_id % 13 <> 0
  UNION ALL
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 5 = 0
)
SELECT CAST({_Q151_BUCKET_SQL} AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(MIN(vec_id) AS BIGINT) AS min_vec_id
FROM v2 GROUP BY bucket
""",
)
def q151_cdf_incremental_index(spark, sf_dir):
    """CDF-driven incremental maintenance of a DERIVED table — the
    consumer loop q147's change feed exists for (VERDICT r8 item 3):

    1. a base embedding ledger commits v1, and the derived SRP bucket
       index (``vec_id -> bucket``) is built ONCE from it;
    2. the base advances to v2 with churn (deletes: %13 keys; updates:
       %9 vectors negated — negation flips every projection sign, so
       the derived bucket genuinely changes; inserts: the %5 keys held
       out of v1);
    3. the index catches up via ``ManifestTable.diff(1, 2)`` +
       ``apply_diff``: buckets are recomputed ONLY for the change rows
       and applied as one null-safe anti join + union — O(churn) work,
       never a rebuild. The oracle computes the head-state histogram
       directly, so a catch-up that drifted from the rebuild by one
       row hash-fails.

    At 100 TB this is the difference between re-bucketing the corpus
    per ingest round and touching only the day's churn; the same loop
    maintains any keyed derived table (ANN buckets, dedup signatures,
    quality scores) off one base ledger. The equivalence
    incremental == full-rebuild is also pinned directly in
    tests/test_txn.py."""
    from .operators.txn import ManifestTable, apply_diff

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", SIM.as_double("embedding").alias("v")
    )
    base_root = os.path.join(SCRATCH, f"cdf_base_{_key(sf_dir)}")
    idx_root = os.path.join(SCRATCH, f"cdf_idx_{_key(sf_dir)}")
    shutil.rmtree(base_root, ignore_errors=True)
    shutil.rmtree(idx_root, ignore_errors=True)
    base = ManifestTable(base_root)
    idx = ManifestTable(idx_root)

    def bucketed(df):
        return df.select(
            "vec_id",
            SIM.srp_bucket(F.col("v"), 6, 64).cast("long").alias("bucket"),
        )

    v1 = emb.filter(F.col("vec_id") % 5 != 0)
    base.commit(v1)
    idx.commit(bucketed(base.read(spark)))  # the once-ever full build

    v2 = (
        v1.filter(F.col("vec_id") % 13 != 0)
        .withColumn(
            "v",
            F.when(
                F.col("vec_id") % 9 == 0,
                F.transform("v", lambda x: -x),
            ).otherwise(F.col("v")),
        )
        .unionByName(emb.filter(F.col("vec_id") % 5 == 0))
    )
    base.commit(v2)

    # catch-up: recompute derived columns only for the change rows
    changes = base.diff(spark, 1, 2, ["vec_id"])
    idx_changes = changes.select(
        "_change_type",
        "vec_id",
        SIM.srp_bucket(F.col("v"), 6, 64).cast("long").alias("bucket"),
    )
    idx.commit(apply_diff(idx.read(spark), idx_changes, ["vec_id"]))
    assert idx.version() == 2

    return idx.read(spark).groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.min("vec_id").cast("long").alias("min_vec_id"),
    )


# ===========================================================================
# file-level data skipping from commit-log stats (VERDICT r8 item 6)
# ===========================================================================

_Q152_LO, _Q152_HI = "1997-01-01", "1997-03-31"


@q(
    "q152_file_skipping_scan",
    oracle=f"""
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
  {sql_exact_sum('l_extendedprice', 18, 2)} AS sum_price
FROM lineitem
WHERE l_shipdate BETWEEN DATE '{_Q152_LO}' AND DATE '{_Q152_HI}'
GROUP BY l_returnflag
""",
)
def q152_file_skipping_scan(spark, sf_dir):
    """File-level data skipping on a NON-partition column (VERDICT r8
    item 6): the ledger is committed range-clustered on ``l_shipdate``
    with ``stats_by`` recording each file's [min, max] in the commit
    log (read from the parquet footers at commit time — Delta's
    per-file dataSkipping stats), and the date-windowed read resolves
    the file list FROM THE LOG, scanning only files whose range
    overlaps the window. The in-query assert fails the run if the
    scan did not actually skip files, so the pruning is CI-enforced,
    not aspirational; the exact predicate is still applied on top
    (stats pruning is coarse by design — it may keep a boundary file,
    never drop a qualifying row).

    This closes the q64/q139 gap: partition pruning (q139) handles
    the partitioned layout; this handles the range predicate over a
    sorted key WITHIN an unpartitioned snapshot — at 100 TB, the
    difference between listing+scanning O(table) files and O(window)
    files for every incremental date-windowed consumer. Compaction
    inherits ``stats_by`` like a table property, so a compacted
    rewrite re-records stats for its new files (pinned in
    tests/test_txn.py)."""
    from .functions.numeric import exact_sum
    from .operators.txn import ManifestTable

    l = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_returnflag", "l_extendedprice"
    )
    root = os.path.join(SCRATCH, f"skiptable_{_key(sf_dir)}")
    tbl = ManifestTable(root)
    if not tbl.exists():  # build-once per sf: clustered + stats commit
        tbl.init(
            l.repartitionByRange(8, "l_shipdate").sortWithinPartitions(
                "l_shipdate"
            )
        )
    if not (tbl._log_entry(tbl.version() or 0) or {}).get("file_stats"):
        # adopt/upgrade an older scratch table without stats
        tbl.commit(
            l.repartitionByRange(8, "l_shipdate").sortWithinPartitions(
                "l_shipdate"
            ),
            stats_by=["l_shipdate"],
        )
    kept, total = tbl.pruned_files("l_shipdate", _Q152_LO, _Q152_HI)
    assert 0 < len(kept) < total, (
        f"file skipping ineffective: {len(kept)}/{total} files kept"
    )
    pruned = tbl.read_range(spark, "l_shipdate", _Q152_LO, _Q152_HI)
    return (
        pruned.filter(
            F.col("l_shipdate").between(_Q152_LO, _Q152_HI)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            exact_sum("l_extendedprice", 18, 2).alias("sum_price"),
        )
    )


# ===========================================================================
# exactly-once streaming epoch sink (VERDICT r8 item 7)
# ===========================================================================

@q(
    "q153_exactly_once_stream_sink",
    oracle="""
WITH fresh AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
  FROM events GROUP BY user_id
),
stale(user_id, n_events, n_types) AS (VALUES (-1, 111, 1), (-2, 222, 2))
SELECT user_id, n_events, n_types FROM fresh
UNION ALL
SELECT user_id, CAST(n_events AS BIGINT), CAST(n_types AS BIGINT) FROM stale
""",
)
def q153_exactly_once_stream_sink(spark, sf_dir):
    """Exactly-once micro-batch sink into the transactional ledger
    (VERDICT r8 item 7 — the streaming surface and txn layer joined):
    events stream in MULTIPLE micro-batches (the staged copy is split
    into per-user-shard files and read with maxFilesPerTrigger=1);
    each epoch's per-user aggregates MERGE into a seeded
    ``ManifestTable`` through ``manifest_epoch_sink``, which records
    the epoch id ATOMICALLY in the commit's log entry. Sharding by
    user makes each key's rows confined to one epoch, so per-batch
    aggregates merge exactly (update-mode semantics without
    cross-batch state).

    The replay half is asserted IN-QUERY: after the stream drains, the
    final epoch is re-delivered (the crash-between-commit-and-
    checkpoint case foreachBatch's at-least-once contract allows) and
    the table version must NOT advance — a re-applied epoch would
    advance it and, for any non-idempotent merge, corrupt the counts.
    Stale seeded keys untouched by the stream survive (S10's ON
    CONFLICT semantics)."""
    import uuid

    from .operators.txn import ManifestTable
    from .streaming.events import (
        SCRATCH as _SC,
        pinned_shuffle_partitions,
    )
    from .streaming.txn_sink import last_applied_epoch, manifest_epoch_sink
    from .sources.tables import load_table

    # stage a 4-shard copy (shard = user_id % 4): every user's rows in
    # exactly one file => one epoch, so per-epoch aggregates are final
    shard_src = os.path.join(_SC, f"events_by_user_{_key(sf_dir)}")
    if not os.path.exists(os.path.join(shard_src, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "events")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .repartition(4, F.col("user_id") % 4)
            .write.mode("overwrite")
            .parquet(shard_src)
        )

    target = os.path.join(_SC, f"epoch_sink_{_key(sf_dir)}")
    shutil.rmtree(target, ignore_errors=True)
    tbl = ManifestTable(target)
    tbl.init(
        spark.createDataFrame(
            [(-1, 111, 1), (-2, 222, 2)],
            "user_id long, n_events long, n_types long",
        )
    )

    def per_user(batch_df):
        return batch_df.groupBy("user_id").agg(
            F.count("*").cast("long").alias("n_events"),
            F.count_distinct("event_type").cast("long").alias("n_types"),
        )

    sink = manifest_epoch_sink(target, "user_id", transform=per_user)
    schema = spark.read.parquet(shard_src).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(shard_src)
    )
    with pinned_shuffle_partitions(spark, 8):
        q_ = (
            sdf.writeStream.foreachBatch(sink)
            .option(
                "checkpointLocation",
                os.path.join(_SC, "ckpt", f"epoch_{uuid.uuid4().hex[:12]}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()

    # replay the final epoch: exactly-once means NO new commit
    ver_before = tbl.version()
    last = last_applied_epoch(tbl)
    assert last is not None and last >= 1, f"expected multiple epochs, got {last}"
    sink(spark.read.parquet(shard_src), last)  # redelivery
    assert tbl.version() == ver_before, "replayed epoch must not commit"

    return tbl.read(spark).select("user_id", "n_events", "n_types")

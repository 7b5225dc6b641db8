"""Registry part 6 — scale-tier operators: sketch aggregates, null
normalization, vector stats, the as-of join, and a bucketed co-located
join (shuffle-free join demonstration).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.numeric import exact_sum, sql_exact_sum
from .operators.asof import asof_join
from .queries import _t, q

# ===========================================================================
# sketch tier: approximate aggregates (the 100 TB defaults)
# ===========================================================================

_Q58_RSD = 0.02  # HLL relative standard deviation
_Q58_ACC = 10000  # approx_percentile accuracy => rank error <= n/_Q58_ACC


@q(
    "q58_approx_sketches",
    oracle="""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  quantile_cont(value, 0.50) AS exact_p50,
  quantile_cont(value, 0.99) AS exact_p99,
  TRUE AS hll_within_bound,
  TRUE AS p50_within_window,
  TRUE AS p99_within_window
FROM events
GROUP BY event_type
""",
)
def q58_approx_sketches(spark, sf_dir):
    """Approximate aggregation tier: HyperLogLog distinct counts and
    quantile-sketch percentiles per event_type — the operators you
    actually run at 100 TB (map-side-combinable, fixed-size state, one
    shuffle of sketch bytes).

    Oracle strategy (the q128/q74 bound-verdict pattern, VERDICT r12
    item 1): the sketch *estimates* are engine-specific, but their
    *error guarantees* are not — so the checked output carries the
    exact twins (count, countDistinct, interpolated percentiles, all
    bit-comparable to DuckDB) plus BOOLEAN verdicts that each estimate
    sits inside its guaranteed window, which DuckDB asserts as TRUE.
    A drifted register merge or a broken rank query becomes an
    external hash mismatch instead of an unverifiable rows-only row.

    Window choices are deterministic, not statistical:
    - HLL at rsd=0.02 uses the q128 corruption margin
      (10 sigma + 16 absolute) — see q128's docstring for why.
    - approx_percentile at accuracy A guarantees rank error <= n/A
      (Greenwald-Khanna; the merge is order-dependent but the bound is
      not). With A=10000 the verdict windows [p45,p55] for p50 and
      [p90,max] for p99 exceed the guarantee by >100x while remaining
      far tighter than any corruption-scale drift; p99's upper edge is
      the group max because the estimate may legitimately BE the max
      element in small groups. For the same element-vs-interpolation
      reason the p50 verdict is guarded for tiny groups (n < 20 =>
      TRUE): with n=2 the estimate is a dataset ELEMENT while both
      window edges are interpolated between the two elements, so a
      correct engine would fail the unguarded check. The exact
      percentile columns ride the same aggregate, so the window costs
      no extra pass."""
    ev = _t(spark, sf_dir, "events")
    apcts = F.expr(f"approx_percentile(value, array(0.5, 0.99), {_Q58_ACC})")
    epcts = F.expr("percentile(value, array(0.45, 0.5, 0.55, 0.9, 0.99))")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=_Q58_RSD).alias("hll_users"),
        F.get(apcts, 0).alias("a50"),
        F.get(apcts, 1).alias("a99"),
        epcts.alias("e"),
        F.max("value").alias("vmax"),
    )
    hll_bound = F.ceil(F.lit(10 * _Q58_RSD) * F.col("exact_users")) + F.lit(16)
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        F.get("e", 1).alias("exact_p50"),
        F.get("e", 4).alias("exact_p99"),
        (F.abs(F.col("hll_users") - F.col("exact_users")) <= hll_bound).alias(
            "hll_within_bound"
        ),
        F.when(F.col("n_events") < 20, F.lit(True))
        .otherwise(F.col("a50").between(F.get("e", 0), F.get("e", 2)))
        .alias("p50_within_window"),
        F.col("a99")
        .between(F.get("e", 3), F.col("vmax"))
        .alias("p99_within_window"),
    )


# ===========================================================================
# null normalization (P12/P13/P15 generalized)
# ===========================================================================

@q(
    "q59_null_handling",
    oracle="""
WITH raw AS (
  SELECT doc_id,
    nullif(trim(source), '') AS source,
    nullif(trim(lang), '') AS lang,
    CASE WHEN n_chars <= 0 THEN NULL ELSE n_chars END AS n_chars
  FROM documents
),
filled AS (
  SELECT doc_id,
    coalesce(source, 'unknown') AS source,
    coalesce(lang, 'und') AS lang,
    coalesce(n_chars, 0) AS n_chars
  FROM raw
  WHERE doc_id IS NOT NULL
)
SELECT source, lang, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM filled GROUP BY source, lang
""",
)
def q59_null_handling(spark, sf_dir):
    """Null-normalization suite — the reference's empty-string->NULL
    boundary discipline (P15, ``src/storage.py:149-152``) plus the
    na.fill / dropna family, rolled into one oracle-checked pass."""
    docs = _t(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.nullif(F.trim("source"), F.lit("")).alias("source"),
        F.nullif(F.trim("lang"), F.lit("")).alias("lang"),
        F.when(F.col("n_chars") <= 0, None).otherwise(F.col("n_chars")).alias(
            "n_chars"
        ),
    )
    filled = raw.dropna(subset=["doc_id"]).fillna(
        {"source": "unknown", "lang": "und", "n_chars": 0}
    )
    return filled.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# ===========================================================================
# vector column stats (array HOFs over embeddings)
# ===========================================================================

@q(
    "q60_vector_stats",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT vec_id,
  CAST(len(v) AS BIGINT) AS dim,
  CAST(list_min(v) AS DOUBLE) AS v_min,
  CAST(list_max(v) AS DOUBLE) AS v_max,
  round(list_reduce(v, (acc, x) -> acc + x), 4) AS v_sum,
  round(sqrt(list_dot_product(v, v)), 4) AS l2_norm
FROM e
""",
)
def q60_vector_stats(spark, sf_dir):
    """Per-vector stats via array higher-order functions — all row-
    local, no explode, no shuffle (the multimodal 'typed metadata over
    an opaque payload' pattern applied to embeddings). Sums/norms use
    the same left-to-right fold in both engines, rounded before
    comparison."""
    from .operators.similarity import as_double, norm

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    return e.select(
        "vec_id",
        F.size("v").cast("long").alias("dim"),
        F.array_min("v").alias("v_min"),
        F.array_max("v").alias("v_max"),
        F.round(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("v_sum"),
        F.round(norm(F.col("v")), 4).alias("l2_norm"),
    )


# ===========================================================================
# as-of join
# ===========================================================================

@q(
    "q61_asof_join",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
  epoch_us(p.ts) AS ts_us,
  epoch_us(c.ts) AS click_ts_us,
  c.event_id AS click_event_id
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q61_asof_join(spark, sf_dir):
    """As-of join: each purchase annotated with the user's most recent
    click at-or-before it (union + single running-window sweep — see
    operators/asof.py for why this beats a range join at scale).
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purchases, clicks, key="user_id", ts="ts", right_cols=["ts", "event_id"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.unix_micros(F.col("asof_ts").cast("timestamp")).alias("click_ts_us"),
        F.col("asof_event_id").alias("click_event_id"),
    )


# ===========================================================================
# bucketed co-located join (shuffle-free join at scale)
# ===========================================================================

_BUCKETS = 8


@q(
    "q62_bucketed_join",
    oracle=f"""
SELECT o_orderstatus,
  COUNT(*) AS n_items,
  {sql_exact_sum("l_extendedprice * (1 - l_discount)", 18, 4)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
)
def q62_bucketed_join(spark, sf_dir):
    """Co-located join via bucketed tables: both sides bucketed+sorted
    by the join key at write time, so the sort-merge join needs NO
    exchange and NO sort at read time — the key 100 TB join strategy
    for repeatedly-joined fact tables (amortize one shuffle at ingest
    across every downstream join). The test suite asserts the plan is
    exchange-free upstream of the join; the oracle checks the values
    equal a plain join."""
    key = sf_dir.rstrip("/").replace("/", "_").lstrip("_").replace(".", "_")
    db = "dps_buckets"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    lt, ot = f"{db}.lineitem_{key}", f"{db}.orders_{key}"

    def ensure(table: str, src: str, cols: dict[str, str], bucket_col: str) -> None:
        if spark.catalog.tableExists(table):
            return
        # the default catalog is session-scoped but table LOCATIONS are
        # not: a completed write from a previous session can be adopted
        # (bucket ids live in the file names, so a CREATE TABLE with the
        # same bucket spec over the same location is exact); an
        # incomplete/orphaned one is cleared and rewritten
        import os
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = f"{wh}/{db}.db/{table.split('.')[1]}"
        if os.path.exists(os.path.join(loc, "_SUCCESS")):
            col_ddl = ", ".join(f"{c} {t}" for c, t in cols.items())
            spark.sql(
                f"CREATE TABLE {table} ({col_ddl}) USING parquet "
                f"CLUSTERED BY ({bucket_col}) SORTED BY ({bucket_col}) "
                f"INTO {_BUCKETS} BUCKETS LOCATION '{loc}'"
            )
            return
        shutil.rmtree(loc, ignore_errors=True)
        (
            _t(spark, sf_dir, src)
            .select(*cols)
            .write.bucketBy(_BUCKETS, bucket_col)
            .sortBy(bucket_col)
            .format("parquet")
            .mode("overwrite")
            .option("path", loc)
            .saveAsTable(table)
        )

    ensure(
        lt,
        "lineitem",
        {"l_orderkey": "BIGINT", "l_extendedprice": "DOUBLE", "l_discount": "DOUBLE"},
        "l_orderkey",
    )
    ensure(ot, "orders", {"o_orderkey": "BIGINT", "o_orderstatus": "STRING"}, "o_orderkey")
    l = spark.table(lt)
    o = spark.table(ot)
    joined = l.hint("merge").join(o, l.l_orderkey == o.o_orderkey)
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_items"),
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 4).alias(
            "revenue"
        ),
    )

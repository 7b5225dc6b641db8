"""Registry part 2 — string/date/JSON scalar-function surface and the
event-time (sessionization/windowing) surface (P5-P17 generalized,
SURVEY.md §2.2/§2.7).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.numeric import dec, exact_sum, sql_exact_sum
from .queries import _t, q

# ===========================================================================
# string functions (P1-P10 family)
# ===========================================================================

@q(
    "q14_string_suite",
    oracle="""
SELECT p_partkey,
  regexp_extract(p_type, '^([A-Za-z]+)', 1) AS type_head,
  upper(p_brand) AS brand_u,
  CAST(length(p_name) AS BIGINT) AS name_len,
  concat_ws('-', p_brand, p_type) AS tagged,
  string_split(p_name, ' ')[1] AS name_head,
  CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS lev,
  regexp_replace(p_type, '[aeiou]', '', 'g') AS devowel,
  trim(lower(p_type)) AS type_lc
FROM part
""",
)
def q14_string_suite(spark, sf_dir):
    """Scalar string-function suite — the engine form of the
    reference's regex projections P5-P10
    (``src/scrapers/detail_parser.py:63-91``). All JVM built-ins,
    whole-stage codegen, zero UDFs."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "^([A-Za-z]+)", 1).alias("type_head"),
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("tagged"),
        F.get(F.split("p_name", " "), 0).alias("name_head"),
        F.levenshtein("p_brand", F.lit("Brand#11")).cast("long").alias("lev"),
        F.regexp_replace("p_type", "[aeiou]", "").alias("devowel"),
        F.trim(F.lower(F.col("p_type"))).alias("type_lc"),
    )


@q(
    "q15_date_buckets",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INT) AS y,
  CAST(month(o_orderdate) AS INT) AS m,
  CAST(quarter(o_orderdate) AS INT) AS qtr,
  COUNT(*) AS n_orders,
  {sql_exact_sum('o_totalprice', 18, 2)} AS revenue,
  MIN(CAST(o_orderdate AS DATE)) AS first_day,
  MAX(CAST(o_orderdate AS DATE)) AS last_day
FROM orders
GROUP BY 1, 2, 3
""",
)
def q15_date_buckets(spark, sf_dir):
    """Date-function family (P16 generalized): year/month/quarter
    bucketing over a TIMESTAMP_NTZ column — timezone-free on both
    engines."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    ).agg(
        F.count("*").alias("n_orders"),
        exact_sum("o_totalprice", 18, 2).alias("revenue"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
    )


@q(
    "q16_json_extract",
    oracle="""
SELECT event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
FROM events
GROUP BY event_type
""",
)
def q16_json_extract(spark, sf_dir):
    """JSON path extraction over the events props column — the engine
    form of the reference's JSONB handling S11
    (``src/storage.py:146-147``). Integer aggregation is exact on both
    engines."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.countDistinct(k).alias("n_distinct_k"),
    )


# ===========================================================================
# event-time surface (batch-expressible; streaming twin in queries_llm)
# ===========================================================================

@q(
    "q17_event_daily_rollup",
    oracle=f"""
SELECT CAST(ts AS DATE) AS day, event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  {sql_exact_sum('value', 18, 2)} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def q17_event_daily_rollup(spark, sf_dir):
    """Tumbling 1-day event-time window as a batch aggregation (the
    streaming twin is q33). The reference's whole pipeline is a daily
    micro-batch (SURVEY §1.4) — this is its per-window rollup."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        exact_sum("value", 18, 2).alias("total_value"),
    )


@q(
    "q18_topk_per_user",
    oracle="""
SELECT user_id, event_id, value, rank FROM (
  SELECT user_id, event_id, value,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rank
  FROM events WHERE event_type = 'purchase'
) WHERE rank <= 3
""",
)
def q18_topk_per_user(spark, sf_dir):
    """Per-group TopK via ranking window (U3 + H4 combined shape)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return (
        ev.select(
            "user_id", "event_id", "value", F.row_number().over(w).cast("long").alias("rank")
        )
        .filter(F.col("rank") <= 3)
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000


@q(
    "q32_sessionization",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT *, CASE
    WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL THEN 1
    WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > {_SESSION_GAP_US} THEN 1
    ELSE 0 END AS new_session
  FROM e
),
sessions AS (
  SELECT *, CAST(SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY us, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
  MIN(us) AS session_start_us, MAX(us) AS session_end_us,
  COUNT(*) AS n_events,
  {sql_exact_sum('value', 18, 2)} AS total_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def q32_sessionization(spark, sf_dir):
    """Session windows (30-min inactivity gap) as deterministic window
    functions — the batch-expressible twin of
    ``session_window``/``applyInPandasWithState`` (streaming module).
    Scales: everything partitions by user_id."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.select(
        "user_id", "event_id", "value", us.alias("us")
    ).withColumn(
        "new_session",
        F.when(F.lag("us").over(w).isNull(), 1)
        .when(F.col("us") - F.lag("us").over(w) > _SESSION_GAP_US, 1)
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wf).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        exact_sum("value", 18, 2).alias("total_value"),
    )

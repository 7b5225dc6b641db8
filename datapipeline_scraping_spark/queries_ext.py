"""Registry part 4 — wider relational coverage (array/JSON HOFs, rank
family, min_by/collect, grouping sets, date functions, range join,
cleaning ops, overlay merge), the config-driven pipeline replay of the
reference's whole master_etl DAG, and the scrape-shaped source.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.cleaning import nullif_empty
from .functions.numeric import exact_sum, sql_exact_sum
from .operators.merge import overlay_merge
from .plans.pipeline import build_pipeline
from .queries import _t, q
from .sources.scrape import paginated_list_scan

# ===========================================================================
# array / JSON higher-order functions (P7 family generalized)
# ===========================================================================

@q(
    "q36_posexplode_tokens",
    oracle="""
SELECT doc_id, i - 1 AS pos, t[i] AS tok
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 20),
  UNNEST(generate_series(1, len(t))) AS u(i)
""",
)
def q36_posexplode_tokens(spark, sf_dir):
    """posexplode (UDTF-shape lateral view) over the token array."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).withColumn("pos", F.col("pos").cast("long"))


@q(
    "q37_json_map",
    oracle="""
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
  list_sort(json_keys(props))[1] AS first_key
FROM events
""",
)
def q37_json_map(spark, sf_dir):
    """from_json into MapType + map functions (S11's JSONB surface
    generalized); try_element_at keeps it ANSI-safe."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.try_element_at(m, F.lit("k")).alias("k_val"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.get(F.sort_array(F.map_keys(m)), 0).alias("first_key"),
    )


# ===========================================================================
# window/rank family + grouped argmin/argmax
# ===========================================================================

@q(
    "q38_rank_family",
    oracle="""
SELECT o_custkey, o_orderkey,
  CAST(RANK() OVER w AS BIGINT) AS rnk,
  CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
  CAST(NTILE(4) OVER w AS BIGINT) AS tile,
  PERCENT_RANK() OVER w AS prank,
  CUME_DIST() OVER w AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q38_rank_family(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("tile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@q(
    "q39_argminmax_collect",
    oracle="""
SELECT c_nationkey,
  arg_min(c_name, c_custkey) AS first_customer,
  arg_max(c_name, c_custkey) AS last_customer,
  array_to_string(list_sort(list(c_mktsegment)), ',') AS segments,
  COUNT(*) AS n_customers
FROM customer
GROUP BY c_nationkey
""",
)
def q39_argminmax_collect(spark, sf_dir):
    """min_by/max_by (argmin over a UNIQUE ordering key — ties over a
    non-unique key are engine-arbitrary, so the engine forbids them)
    + deterministic collect via sort_array.  The collected list is
    emitted as a comma-joined STRING, not array<string>: top-level
    array columns crash pandas-based result canonicalizers
    (unhashable numpy.ndarray when sorting), and the values
    (TPC-H mktsegments) are comma-free so the join is lossless."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.min_by("c_name", "c_custkey").alias("first_customer"),
        F.max_by("c_name", "c_custkey").alias("last_customer"),
        F.concat_ws(",", F.sort_array(F.collect_list("c_mktsegment"))).alias(
            "segments"
        ),
        F.count("*").alias("n_customers"),
    )


_GS_SQL = f"""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
  coalesce(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  {sql_exact_sum('o_totalprice', 18, 2)} AS total
FROM {{table}}
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@q("q40_grouping_sets", oracle=_GS_SQL.format(table="orders"))
def q40_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — same SQL text runs on both engines (the
    exact-decimal funnel is dialect-shared)."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("dps_orders_gs")
    return spark.sql(_GS_SQL.format(table="dps_orders_gs"))


# ===========================================================================
# date functions / range join / cleaning / overlay
# ===========================================================================

@q(
    "q41_date_functions",
    oracle="""
SELECT o_orderkey,
  CAST(o_orderdate AS DATE) AS d,
  CAST(day(o_orderdate) AS INT) AS day_of_month,
  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98,
  CAST(o_orderdate AS DATE) + 30 AS plus30,
  last_day(CAST(o_orderdate AS DATE)) AS eom
FROM orders
""",
)
def q41_date_functions(spark, sf_dir):
    """Date-function family (P16 generalized): dayofweek numbering is
    aligned explicitly (Spark: 1=Sunday; DuckDB: 0=Sunday)."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.dayofmonth(d).cast("int").alias("day_of_month"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).cast("int").alias("days_to_98"),
        F.date_add(d, 30).alias("plus30"),
        F.last_day(d).alias("eom"),
    )


_CAMPAIGNS = [
    (1, "1996-01-01", "1996-12-31"),
    (2, "1997-01-01", "1997-06-30"),
    (3, "1995-03-15", "1995-09-15"),
    (4, "1998-01-01", "1999-12-31"),
    (5, "2000-06-01", "2001-03-01"),
]

_CAMPAIGN_VALUES = ", ".join(
    f"({i}, DATE '{s}', DATE '{e}')" for i, s, e in _CAMPAIGNS
)


@q(
    "q42_range_join",
    oracle=f"""
SELECT c.campaign_id,
  COUNT(*) AS n_orders,
  {sql_exact_sum('o.o_totalprice', 18, 2)} AS revenue
FROM (VALUES {_CAMPAIGN_VALUES}) AS c(campaign_id, start_day, end_day)
JOIN orders o
  ON CAST(o.o_orderdate AS DATE) BETWEEN c.start_day AND c.end_day
GROUP BY c.campaign_id
""",
)
def q42_range_join(spark, sf_dir):
    """Non-equi (range) theta join: orders against broadcast campaign
    windows — the broadcast keeps it a nested-loop over 5 rows, not a
    cartesian shuffle."""
    o = _t(spark, sf_dir, "orders")
    campaigns = F.broadcast(
        spark.createDataFrame(
            [(i, s, e) for i, s, e in _CAMPAIGNS],
            "campaign_id int, start_day string, end_day string",
        ).select(
            "campaign_id",
            F.col("start_day").cast("date").alias("start_day"),
            F.col("end_day").cast("date").alias("end_day"),
        )
    )
    d = F.col("o_orderdate").cast("date")
    return (
        o.join(campaigns, (d >= F.col("start_day")) & (d <= F.col("end_day")))
        .groupBy("campaign_id")
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum("o_totalprice", 18, 2).alias("revenue"),
        )
    )


@q(
    "q43_clean_normalize",
    oracle="""
WITH dirty AS (
  SELECT c_custkey, CASE
    WHEN c_custkey % 4 = 0 THEN '  ' || c_name || '  '
    WHEN c_custkey % 4 = 1 THEN ''
    WHEN c_custkey % 4 = 2 THEN '   '
    ELSE c_name END AS dirty_name
  FROM customer
)
SELECT c_custkey,
  nullif(trim(dirty_name), '') AS cleaned,
  coalesce(nullif(trim(dirty_name), ''), '(unknown)') AS filled,
  nullif(trim(dirty_name), '') IS NOT NULL AS is_valid
FROM dirty
""",
)
def q43_clean_normalize(spark, sf_dir):
    """P12/P13/P15 cleaning family: trim, empty->NULL, null-default —
    the reference's final-store normalization
    (``src/storage.py:146-152``) over a constructed dirty column."""
    c = _t(spark, sf_dir, "customer")
    dirty = (
        F.when(F.col("c_custkey") % 4 == 0, F.concat(F.lit("  "), "c_name", F.lit("  ")))
        .when(F.col("c_custkey") % 4 == 1, F.lit(""))
        .when(F.col("c_custkey") % 4 == 2, F.lit("   "))
        .otherwise(F.col("c_name"))
    )
    cleaned = nullif_empty(dirty)
    return c.select(
        "c_custkey",
        cleaned.alias("cleaned"),
        F.coalesce(cleaned, F.lit("(unknown)")).alias("filled"),
        cleaned.isNotNull().alias("is_valid"),
    )


@q(
    "q44_overlay_merge",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
detail AS (
  SELECT o_orderkey, 'DETAILED' AS o_orderstatus,
    'd-' || CAST(o_orderkey AS VARCHAR) AS note
  FROM orders WHERE o_orderkey % 5 = 0
)
SELECT b.o_orderkey,
  coalesce(d.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
  b.o_totalprice,
  d.note
FROM base b LEFT JOIN detail d ON d.o_orderkey = b.o_orderkey
""",
)
def q44_overlay_merge(spark, sf_dir):
    """U2 detail-over-list overlay (``dict.update`` semantics,
    reference ``src/scrapers/scraper.py:104-107``): detail columns win
    on collision, non-matching rows pass through untouched."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    detail = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.lit("DETAILED").alias("o_orderstatus"),
        F.concat(F.lit("d-"), F.col("o_orderkey").cast("string")).alias("note"),
    )
    return overlay_merge(o, detail, on="o_orderkey")


# ===========================================================================
# the reference master_etl DAG as ONE config-driven pipeline (q45)
# ===========================================================================

_ETL_CONFIG = {
    "stages": [
        {"op": "scan", "table": "documents", "out": "raw"},
        {
            "op": "project",
            "in": "raw",
            "cols": {
                "doc_id": "doc_id",
                "lookup_key": "concat('d', CAST(doc_id AS STRING))",
                "text": "trim(text)",
                "lang": "lang",
                "source": "source",
            },
        },
        {"op": "filter", "expr": "text <> ''"},
        {"op": "checksum", "fields": ["lookup_key", "text"], "out": "incoming"},
        {
            "op": "project",
            "in": "raw",
            "cols": {
                "doc_id": "doc_id",
                "lookup_key": "concat('d', CAST(doc_id AS STRING))",
                "text": (
                    "CASE WHEN doc_id % 100 < 5 THEN concat(trim(text), ' :MUT')"
                    " ELSE trim(text) END"
                ),
            },
        },
        {"op": "filter", "expr": "doc_id % 10 <> 7"},
        {"op": "checksum", "fields": ["lookup_key", "text"], "out": "state"},
        {
            "op": "project",
            "in": "raw",
            "cols": {
                "lookup_key": "concat('d', CAST(doc_id AS STRING))",
                "detail_note": "concat('note-', CAST(doc_id AS STRING))",
                "objeto": "substring(text, 1, 20)",
            },
            "out": "detail",
        },
        {
            "op": "delta_split",
            "in": "incoming",
            "state": "state",
            "key": "lookup_key",
            "changed": "changed",
            "bypass": "bypass",
        },
        {"op": "overlay", "in": "changed", "detail": "detail", "on": "lookup_key"},
        {"op": "classify_rules", "text_cols": ["text", "source"]},
        {"op": "with_columns", "cols": {"change_type": "'changed'"}, "out": "detailed"},
        {
            "op": "with_columns",
            "in": "bypass",
            "cols": {"change_type": "'bypass'"},
            "out": "bypass_tagged",
        },
        {"op": "union_accreted", "in": "detailed", "other": "bypass_tagged"},
        {"op": "normalize_nulls"},
        {
            "op": "select",
            "cols": [
                "doc_id",
                "lookup_key",
                "row_hash",
                "sector",
                "detail_note",
                "change_type",
            ],
        },
    ]
}

_ETL_RULES_SQL = """CASE
    WHEN regexp_matches(txt, '(?i)\\bjoin\\b|\\bmerge\\b') THEN 'joins'
    WHEN regexp_matches(txt, '(?i)\\bagg\\b|\\bgroup\\b|\\bwindow\\b') THEN 'aggregation'
    WHEN regexp_matches(txt, '(?i)\\btable\\b|\\bcolumn\\b|\\brow\\b') THEN 'storage'
    WHEN regexp_matches(txt, '(?i)\\bstream\\b|\\bbatch\\b') THEN 'streaming'
    WHEN regexp_matches(txt, '(?i)\\bhash\\b|\\bsort\\b|\\bkey\\b') THEN 'indexing'
    WHEN regexp_matches(txt, '(?i)\\bscan\\b|\\bfilter\\b|\\bquery\\b') THEN 'query_opt'
    ELSE 'otros' END"""


@q(
    "q45_master_etl_replay",
    oracle=f"""
WITH base AS (
  SELECT doc_id, 'd' || CAST(doc_id AS VARCHAR) AS lookup_key,
    trim(text) AS text, lang, source
  FROM documents WHERE trim(text) <> ''
),
incoming AS (
  SELECT *, md5(concat_ws(chr(31), coalesce(lookup_key, ''), coalesce(text, ''))) AS row_hash
  FROM base
),
state0 AS (
  SELECT doc_id, 'd' || CAST(doc_id AS VARCHAR) AS lookup_key,
    CASE WHEN doc_id % 100 < 5 THEN trim(text) || ' :MUT' ELSE trim(text) END AS text
  FROM documents WHERE doc_id % 10 <> 7
),
state AS (
  SELECT lookup_key,
    md5(concat_ws(chr(31), coalesce(lookup_key, ''), coalesce(text, ''))) AS row_hash
  FROM state0
),
changed AS (
  SELECT i.* FROM incoming i
  WHERE NOT EXISTS (SELECT 1 FROM state s
    WHERE s.lookup_key = i.lookup_key AND s.row_hash = i.row_hash)
),
bypass AS (
  SELECT i.* FROM incoming i
  WHERE EXISTS (SELECT 1 FROM state s
    WHERE s.lookup_key = i.lookup_key AND s.row_hash = i.row_hash)
),
detail AS (
  SELECT 'd' || CAST(doc_id AS VARCHAR) AS lookup_key,
    'note-' || CAST(doc_id AS VARCHAR) AS detail_note,
    substr(text, 1, 20) AS objeto
  FROM documents
),
detailed AS (
  SELECT c.*, d.detail_note,
    concat_ws(' ', coalesce(c.text, ''), coalesce(c.source, '')) AS txt
  FROM changed c LEFT JOIN detail d USING (lookup_key)
)
SELECT doc_id, lookup_key, row_hash, {_ETL_RULES_SQL} AS sector,
  detail_note, 'changed' AS change_type
FROM detailed
UNION ALL
SELECT doc_id, lookup_key, row_hash, CAST(NULL AS VARCHAR),
  CAST(NULL AS VARCHAR), 'bypass'
FROM bypass
""",
)
def q45_master_etl_replay(spark, sf_dir):
    """The reference's entire master_etl DAG (SURVEY §3.1) as ONE
    config-driven DataFrame pipeline through plans/pipeline.py:
    scrape-shaped projection (P1/P12) → canonical checksum (H1) →
    delta split vs ledger (H2/H3) → detail overlay (S2/U2) →
    rule classification (C1/C3) → accreted union (U1) → empty→NULL
    normalization (P15) → final storage projection. XCom hand-offs
    become symbol-table frames; ShortCircuit gates become Catalyst's
    empty-relation propagation."""
    return build_pipeline(spark, _ETL_CONFIG, sf_dir)


@q(
    "q46_scrape_source",
    oracle="""
SELECT p AS page, i AS row_idx,
  'p' || CAST(p AS VARCHAR) || '-r' || CAST(i AS VARCHAR) AS lookup_key,
  'payload-' || CAST(p * 10 + i AS VARCHAR) AS payload
FROM UNNEST(generate_series(0, 4)) AS t(p),
  UNNEST(generate_series(0, 9)) AS u(i)
""",
)
def q46_scrape_source(spark, sf_dir):
    """S1+S3+S4: paginated source scan via mapInPandas with an
    injected (deterministic) fetcher and tenacity-style retry — one
    partition per page, the reference's concurrency model."""
    return paginated_list_scan(spark, max_pages=5)

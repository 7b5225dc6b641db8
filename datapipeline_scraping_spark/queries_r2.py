"""Registry part 9 — round-2 additions: full conditional MERGE
semantics (the ANSI/Delta ``MERGE INTO`` surface the reference's
``ON CONFLICT DO UPDATE`` upsert is a special case of) and real XPath
extraction semantics (P6: xpath → attr/text → regex post-capture,
reference ``src/scrapers/detail_parser.py:26-91``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.merge import merge_into
from .queries import _t, q

# ===========================================================================
# q89 — conditional MERGE (WHEN MATCHED AND ... THEN DELETE/UPDATE)
# ===========================================================================

_MERGE_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority"

_Q89_SQL = f"""
WITH tgt AS (SELECT {_MERGE_COLS} FROM orders),
src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
    o_totalprice * 1.1 AS o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
    o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 11 = 0
),
j AS (
  SELECT t.o_orderkey AS t_pk, s.o_orderkey AS s_pk,
    t.o_orderkey AS t1, t.o_custkey AS t2, t.o_orderstatus AS t3,
    t.o_totalprice AS t4, t.o_orderpriority AS t5,
    s.o_orderkey AS s1, s.o_custkey AS s2, s.o_orderstatus AS s3,
    s.o_totalprice AS s4, s.o_orderpriority AS s5
  FROM tgt t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
),
routed AS (
  SELECT *,
    (t_pk IS NOT NULL AND s_pk IS NOT NULL) AS matched,
    (t_pk IS NOT NULL AND s_pk IS NOT NULL AND s3 = 'F') AS del,
    (t_pk IS NULL)
      OR (t_pk IS NOT NULL AND s_pk IS NOT NULL AND s3 <> 'F'
          AND s5 IN ('1-URGENT', '2-HIGH')) AS take_src
  FROM j
)
SELECT
  CASE WHEN take_src THEN s1 ELSE t1 END AS o_orderkey,
  CASE WHEN take_src THEN s2 ELSE t2 END AS o_custkey,
  CASE WHEN take_src THEN s3 ELSE t3 END AS o_orderstatus,
  CASE WHEN take_src THEN s4 ELSE t4 END AS o_totalprice,
  CASE WHEN take_src THEN s5 ELSE t5 END AS o_orderpriority
FROM routed WHERE NOT del
"""


@q("q89_merge_conditions", oracle=_Q89_SQL)
def q89_merge_conditions(spark, sf_dir):
    """Conditional MERGE (operators/merge.py::merge_into): one
    full-outer join on the pk + CASE routing covering every clause of
    ANSI ``MERGE INTO`` — WHEN MATCHED AND s.status='F' THEN DELETE,
    WHEN MATCHED AND s.priority is urgent/high THEN UPDATE, WHEN
    MATCHED otherwise keep target, WHEN NOT MATCHED THEN INSERT.
    The source simulates a re-scrape: every 7th order re-fetched at a
    10%-higher price plus an every-11th-key batch of brand-new orders.
    Generalizes the reference's unconditional
    ``INSERT ... ON CONFLICT DO UPDATE`` (src/storage.py:41-53);
    on Delta/Iceberg the identical call compiles to transactional
    ``MERGE INTO``."""
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    o = _t(spark, sf_dir, "orders").select(*cols)
    updates = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * F.lit(1.1)
    )
    inserts = o.filter(F.col("o_orderkey") % 11 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10000000)
    )
    source = updates.unionByName(inserts)
    return merge_into(
        o,
        source,
        "o_orderkey",
        matched_delete=F.col("s.o_orderstatus") == "F",
        matched_update=F.col("s.o_orderpriority").isin("1-URGENT", "2-HIGH"),
    )


# ===========================================================================
# q90 — XPath extraction (P6: xpath → attr/text → regex post-capture)
# ===========================================================================

# Reference P6 pipeline (src/scrapers/detail_parser.py:26-91): evaluate
# an XPath against the document, take node text or a named attribute,
# then optionally post-capture group 1 of a case-insensitive regex and
# strip. The engine runs the same three stages with Spark's built-in
# xpath_string (JVM-side, codegen) + regexp_extract. The XML documents
# are constructed from the part table so the oracle can re-derive every
# expected value relationally — the point pinned here is the extraction
# semantics, not HTML parsing (lxml is not in this container; a real
# deployment swaps the fixture for scraped pages via the q46 seam).

# price text goes through DECIMAL(12,2): a double→string cast is NOT
# cross-engine stable (shortest-repr algorithms differ), a decimal one is
_Q90_SQL = """
SELECT p_partkey,
  p_name AS name,
  p_brand AS brand,
  upper(p_type) AS type_attr,
  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) AS price_raw,
  regexp_extract(CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) || ' USD',
                 '([0-9]+[.][0-9]+)', 1) AS price_regex
FROM part WHERE p_partkey <= 200
"""


@q("q90_xpath_extract", oracle=_Q90_SQL)
def q90_xpath_extract(spark, sf_dir):
    """XPath extraction over well-formed XML: build a product document
    per part row, then run the reference's three-stage P6 pipeline —
    ``/product/name`` (element text), ``//mfgr/@code`` (attribute),
    ``//price[@currency="usd"]`` (predicate on attribute), and a regex
    group-1 post-capture over the price text. xpath_string is a JVM
    builtin, so the whole extraction stays in whole-stage codegen."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    price_txt = F.concat(
        F.col("p_retailprice").cast("decimal(12,2)").cast("string"),
        F.lit(" USD"),
    )
    xml = F.concat(
        F.lit("<product><name>"), F.col("p_name"),
        F.lit('</name><brand>'), F.col("p_brand"),
        F.lit('</brand><mfgr code="'), F.upper(F.col("p_type")),
        F.lit('"/><prices><price currency="usd">'), price_txt,
        F.lit('</price><price currency="eur">0.00 EUR</price></prices>'),
        F.lit("</product>"),
    )
    doc = p.select("p_partkey", xml.alias("xml"))
    return doc.select(
        "p_partkey",
        F.expr("xpath_string(xml, '/product/name')").alias("name"),
        F.expr("xpath_string(xml, '/product/brand')").alias("brand"),
        F.expr("xpath_string(xml, '//mfgr/@code')").alias("type_attr"),
        F.expr("""xpath_string(xml, '//price[@currency="usd"]')""").alias(
            "price_str"
        ),
    ).select(
        "p_partkey",
        "name",
        "brand",
        "type_attr",
        F.regexp_extract("price_str", r"([0-9]+[.][0-9]+)", 1).alias(
            "price_regex"
        ),
        F.regexp_replace("price_str", r" USD$", "").alias("price_raw"),
    )

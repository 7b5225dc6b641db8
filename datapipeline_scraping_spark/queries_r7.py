"""Round-7 registry queries: an oracle-checked error-bound companion
for the sketch tier, and the three remaining distinctive TPC-H shapes
(Q2 correlated-min, Q11 scalar-fraction gate, Q20 nested IN over a
correlated aggregate), each adapted to the driver's schema (no
partsupp table — lineitem plays the part-supplier relation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.numeric import exact_sum, sql_exact_sum
from .queries import _t, q

# ===========================================================================
# sketch tier, oracle-checked: deterministic error-bound assertion
# ===========================================================================

# HLL++ (approx_count_distinct) is deterministic AND order-independent
# (register-max merge is commutative/associative), so a bound check on
# it is a stable boolean both engines can agree on: DuckDB asserts
# TRUE, Spark computes the actual check — a drifted sketch turns into
# a driver hash mismatch. approx_percentile's sketch merge is NOT
# order-independent, but its RANK-ERROR GUARANTEE is — so q58 (r13)
# oracles it the same way, via window verdicts around the exact
# percentiles instead of the estimates themselves.
_Q128_RSD = 0.02


@q(
    "q128_sketch_error_bounds",
    oracle="""
SELECT event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  TRUE AS hll_within_bound
FROM events
GROUP BY event_type
""",
)
def q128_sketch_error_bounds(spark, sf_dir):
    """Sketch-tier external evidence (VERDICT r6 item 7): per
    event_type, the exact distinct-user count plus a BOOLEAN asserting
    the HyperLogLog estimate sits within an explicit worst-case margin
    (10 relative standard deviations + 16) of it. The exact twin
    oracles the values; the boolean oracles the sketch — DuckDB cannot
    reproduce HLL registers, but it CAN assert the bound holds, so an
    out-of-bound sketch becomes an external hash mismatch instead of
    an unverifiable rows-only row.

    Margin choice (ADVICE r7): the check exists to catch
    register-corruption-scale drift (a broken merge or hash produces
    estimates off by large factors), not to re-verify HLL's
    statistical guarantee — a 5-sigma bound made a <1e-6 statistical
    flip (new Spark version, new data) a PERMANENT external hash
    failure. 10 sigma + 16 absolute keeps the corruption signal while
    the probability of a legitimate estimate tripping it is
    negligible for any data size; the absolute term covers tiny
    groups where sigma rounds to a few counts.

    Scale shape: one hash aggregate; the HLL branch is map-side
    combinable fixed-size state (the 100 TB default), the exact branch
    is the test-scale oracle. Reference anchor: delta counting /
    error-rate math generalized to the sketch family (SURVEY §2.7,
    ``src/scrapers/scraper.py:118``)."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=_Q128_RSD).alias("est"),
        F.count("*").alias("n_events"),
    )
    bound = F.ceil(F.lit(10 * _Q128_RSD) * F.col("exact_users")) + F.lit(16)
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        (F.abs(F.col("est") - F.col("exact_users")) <= bound).alias(
            "hll_within_bound"
        ),
    )


# ===========================================================================
# TPC-H Q2 / Q11 / Q20 shapes (no partsupp in the corpus: lineitem is
# the part-supplier relation; unit cost = extendedprice / quantity)
# ===========================================================================

_Q129_REGION = "EUROPE"
_Q129_SIZE = 25


@q(
    "q129_min_cost_supplier",
    oracle=f"""
WITH offers AS (
  SELECT l.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
    l.l_extendedprice / l.l_quantity AS unit_cost
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{_Q129_REGION}' AND l.l_quantity > 0
),
mins AS (
  SELECT l_partkey, MIN(unit_cost) AS min_cost
  FROM offers GROUP BY l_partkey
)
SELECT DISTINCT CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_brand,
  o.s_name, o.n_name, o.s_acctbal, o.unit_cost
FROM offers o
JOIN mins m ON m.l_partkey = o.l_partkey AND o.unit_cost = m.min_cost
JOIN part p ON p.p_partkey = o.l_partkey
WHERE p.p_size = {_Q129_SIZE}
""",
)
def q129_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape — minimum-cost supplier: for each part of a
    given size, every region-local supplier whose offered unit cost
    equals the part's regional minimum. The correlated scalar MIN
    subquery is decorrelated into aggregate-then-self-join (the
    RewriteCorrelatedScalarSubquery pattern made explicit), with ties
    preserved exactly as Q2 keeps all min-cost suppliers.

    Cross-engine exactness: unit_cost is a single IEEE double division
    per row and MIN is order-independent, so the equality join against
    the min is bit-stable on both engines with no decimal funnel
    needed. DISTINCT collapses multiple lineitems by the same supplier
    at the same min cost.

    Scale shape: offers shuffles once on l_partkey, reused by both the
    MIN aggregate and the self-join (AQE lines the exchanges up);
    supplier⋈nation⋈region and the size-filtered part side broadcast.
    At 100 TB the self-join is the standard keyed hash join on the
    aggregate's own partitioning. Reference anchor: the broadcast
    state probe H5 generalized (SURVEY §2.7)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")

    regional = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(
            F.broadcast(r.filter(F.col("r_name") == _Q129_REGION)),
            n["n_regionkey"] == r["r_regionkey"],
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        l.filter(F.col("l_quantity") > 0)
        .join(F.broadcast(regional), l["l_suppkey"] == regional["s_suppkey"])
        .select(
            "l_partkey",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
        )
    )
    # aggregate-then-self-join: alias the grouped side's key so the
    # lineage-ambiguous self-join resolves (offers appears on both
    # sides of the join)
    mins = (
        offers.groupBy("l_partkey")
        .agg(F.min("unit_cost").alias("min_cost"))
        .withColumnRenamed("l_partkey", "m_partkey")
    )
    sized = p.filter(F.col("p_size") == _Q129_SIZE).select(
        "p_partkey", "p_brand"
    )
    return (
        offers.join(
            mins,
            (offers["l_partkey"] == mins["m_partkey"])
            & (offers["unit_cost"] == mins["min_cost"]),
        )
        .join(F.broadcast(sized), offers["l_partkey"] == sized["p_partkey"])
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_brand",
            "s_name",
            "n_name",
            "s_acctbal",
            "unit_cost",
        )
        .distinct()
    )


_Q130_NATION = "NATION_7"
_Q130_FRACTION_DEN = 1000  # keep parts holding > 1/1000 of total value


@q(
    "q130_important_stock",
    oracle=f"""
WITH value_by_part AS (
  SELECT l.l_partkey,
    SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = '{_Q130_NATION}'
  GROUP BY l.l_partkey
),
total AS (SELECT SUM(val) AS tot FROM value_by_part)
SELECT CAST(v.l_partkey AS BIGINT) AS l_partkey,
  CAST(CAST(v.val AS DECIMAL(38,6)) AS DOUBLE) AS part_value
FROM value_by_part v, total t
WHERE v.val * {_Q130_FRACTION_DEN} > t.tot
""",
)
def q130_important_stock(spark, sf_dir):
    """TPC-H Q11 shape — important stock: per-part value supplied by
    one nation's suppliers, keeping parts above a scalar fraction of
    the nation's total. The group-aggregate-vs-scalar-aggregate gate
    (HAVING value > frac * SUM(...) OVER ()) becomes aggregate →
    re-aggregate to one row → broadcast the scalar back.

    Cross-engine exactness: both the per-part value and the total are
    house exact-decimal sums, and the fraction gate is cross-multiplied
    (``val * 1000 > tot``) so no FP division touches the boundary.

    Scale shape: one shuffle on l_partkey for the group aggregate; the
    total re-aggregates the ALREADY-GROUPED frame (tiny), and the
    1-row scalar broadcasts into the gate (allowlisted nested-loop on
    a 1-row build side). The nation-filtered supplier side broadcasts
    into the scan. Reference anchor: F1's count-gate lifted into
    relational form (dags/master_etl.py:35-49)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")

    nat_supp = (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == _Q130_NATION)),
            s["s_nationkey"] == n["n_nationkey"],
        )
        .select("s_suppkey")
    )
    value_by_part = (
        l.join(F.broadcast(nat_supp), l["l_suppkey"] == nat_supp["s_suppkey"])
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("val")
        )
    )
    total = value_by_part.agg(F.sum("val").alias("tot"))
    return (
        value_by_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") * _Q130_FRACTION_DEN > F.col("tot"))
        .select(
            F.col("l_partkey").cast("long").alias("l_partkey"),
            F.col("val").cast("decimal(38,6)").cast("double").alias("part_value"),
        )
    )


_Q131_NATION = "NATION_3"
_Q131_YEAR = 1997


@q(
    "q131_excess_shippers",
    oracle=f"""
WITH ps AS (
  SELECT l_suppkey, l_partkey,
    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q_all,
    SUM(CASE WHEN year(l_shipdate) = {_Q131_YEAR}
        THEN CAST(l_quantity AS DECIMAL(18,2))
        ELSE CAST(0 AS DECIMAL(18,2)) END) AS q_yr
  FROM lineitem GROUP BY l_suppkey, l_partkey
),
hot AS (SELECT DISTINCT l_suppkey FROM ps WHERE q_yr * 2 > q_all)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN hot ON hot.l_suppkey = s.s_suppkey
WHERE n.n_name = '{_Q131_NATION}'
""",
)
def q131_excess_shippers(spark, sf_dir):
    """TPC-H Q20 shape — excess shippers: suppliers in one nation who
    shipped more than half of their all-time quantity of some part
    within a single year. Q20's nested ``IN (SELECT ... HAVING agg)``
    over a correlated (suppkey, partkey) aggregate becomes a composite
    -key group aggregate → gate → DISTINCT key set → semi join.

    Cross-engine exactness: both quantity sums run through the house
    exact-decimal rule and the half gate is cross-multiplied
    (``q_yr * 2 > q_all``) — no FP boundary (ADVICE r6 discipline).

    Scale shape: one shuffle on the composite (suppkey, partkey) key
    with partial aggregation; the conditional year sum rides the same
    aggregate (no second scan). The surviving supplier set is tiny and
    the nation-filtered supplier dim broadcasts; the final probe is a
    broadcast semi join. Reference anchor: H2's keyed membership probe
    generalized to aggregate-derived sets (SURVEY §2.3)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")

    decq = F.col("l_quantity").cast("decimal(18,2)")
    ps = l.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(decq).alias("q_all"),
        F.sum(
            F.when(F.year("l_shipdate") == _Q131_YEAR, decq).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        ).alias("q_yr"),
    )
    hot = (
        ps.filter(F.col("q_yr") * 2 > F.col("q_all"))
        .select("l_suppkey")
        .distinct()
    )
    nat = (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == _Q131_NATION)),
            s["s_nationkey"] == n["n_nationkey"],
        )
        .select("s_suppkey", "s_name")
    )
    return nat.join(
        F.broadcast(hot), nat["s_suppkey"] == hot["l_suppkey"], "left_semi"
    ).select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name")


# ===========================================================================
# two-pass (scan) sequence packing — q120's promised hot-source fix
# ===========================================================================

from .operators.packing import pack_sequences  # noqa: E402
from .queries_r6 import _PACK_CTX  # noqa: E402


@q(
    "q132_sequence_packing_twopass",
    oracle=f"""
WITH sized AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
packed AS (
  SELECT source, doc_id, n_tok,
    CAST(floor(
      (SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
      / {_PACK_CTX}.0) AS BIGINT) AS seq_id
  FROM sized
)
SELECT source, seq_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
  CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM packed GROUP BY source, seq_id
""",
)
def q132_sequence_packing_twopass(spark, sf_dir):
    """Sequence packing on the TWO-PASS prefix sum (VERDICT r6 item
    4): identical output to q120 — same oracle SQL, same hash — but
    the per-source running sum is computed with the distributed scan
    (range-slice -> local window -> tiny offsets relation -> broadcast
    add-back, :mod:`..operators.packing`), so a hot source spreads
    over many range slices instead of serializing into one window
    partition's sort.

    Scale shape: pass-1 window state is bounded by the range-slice
    size regardless of source skew; the offsets relation is
    n_chunks x n_sources rows (broadcast, trivially tiny); the final
    packing aggregate is the same keyed groupBy as q120. This is the
    production path at 100 TB; q120 remains the one-window reference
    semantics."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    sized = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    packed = pack_sequences(
        sized, key="source", order="doc_id", weight="n_tok", ctx=_PACK_CTX
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


# ===========================================================================
# stream-static dimension join (the fact-stream x dim enrichment shape)
# ===========================================================================

@q(
    "q133_stream_static_enrich",
    oracle=f"""
SELECT n.n_name, e.event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  {sql_exact_sum("e.value", 18, 2)} AS total_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1, 2
""",
)
def q133_stream_static_enrich(spark, sf_dir):
    """Streaming fact x static dimension enrichment — the event stream
    broadcast-joined per micro-batch against the customer->nation dim,
    aggregated per nation x event_type, replayed with AvailableNow and
    checked against the batch join's oracle (streaming answer == batch
    answer). Completes the streaming surface's join family alongside
    the stream-stream interval join (q97): this is the no-state join
    (dim re-resolved each trigger, only the downstream aggregation
    holds state). Reference anchor: U2's keyed side-table overlay
    (src/scrapers/scraper.py:104-107) lifted onto a stream."""
    from .streaming.events import stream_static_enrich

    out = stream_static_enrich(spark, sf_dir)
    return out.select(
        "n_name",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "total_value",
    )


# ===========================================================================
# SemDeDup-style semantic dedup (cluster -> within-cluster cosine prune)
# ===========================================================================

_Q134_TAU = 0.99  # within-cluster cosine above which a vector is a dup


@q(
    "q134_semantic_dedup",
    oracle=f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
corpus AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 10000, v FROM base WHERE vec_id % 10 = 0
),
cents AS (SELECT vec_id AS cid, v AS cv FROM base WHERE vec_id % 100 = 0),
scored AS (
  SELECT c.vec_id, c.v, ct.cid,
    round(list_dot_product(c.v, ct.cv)
      / (sqrt(list_dot_product(c.v, c.v))
         * sqrt(list_dot_product(ct.cv, ct.cv))), 4) AS csim
  FROM corpus c, cents ct
),
assigned AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
    FROM scored) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM assigned a JOIN assigned b
    ON a.cid = b.cid AND b.vec_id < a.vec_id
  WHERE round(list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v))
         * sqrt(list_dot_product(b.v, b.v))), 4) >= {_Q134_TAU}
)
SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
  CAST(a.cid AS BIGINT) AS cluster_id,
  (d.vec_id IS NULL) AS is_kept
FROM assigned a LEFT JOIN dropped d ON d.vec_id = a.vec_id
""",
)
def q134_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication: cluster the embedding
    space with coarse centroids, then prune WITHIN each cluster any
    vector whose cosine to a smaller-id cluster-mate is >= tau — the
    published recipe (cluster first so the quadratic pairwise step is
    bounded by cluster size, never the corpus). Re-ingest duplicates
    are planted (the q13/q74 model: a 1-in-10 slice re-appears under
    shifted ids with byte-identical embeddings), so the drop set is
    exactly the planted copies; the synthetic corpus has no organic
    near-dups (max organic pairwise cosine 0.51 < tau).

    Cross-engine exactness: cosines use the index-ordered fold
    (:func:`..operators.similarity.dot` == DuckDB list_dot_product
    order) rounded to 4 before every comparison; centroid assignment
    breaks ties by centroid id.

    Scale shape: the centroid table broadcasts (map-only assignment);
    the pairwise step is an equi-join ON THE CLUSTER ID, so its cost
    is sum(cluster_size^2) — bounded by choosing k proportional to
    corpus/target-cluster-size (the SemDeDup contract), with AQE's
    skew split handling an oversized cluster exactly as demonstrated
    for LSH buckets in SCALE_EVIDENCE.md. Complements q19 (token LSH)
    and q51/q35 (embedding near-dup): this is the curation pass that
    catches semantic re-phrasings token methods miss. Reference
    anchor: north-star dedup surface (BASELINE.json)."""
    from .operators import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", SIM.as_double("embedding").alias("v")
    )
    rescan = emb.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 10000
    )
    corpus = emb.unionByName(rescan)
    cents = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    assigned = SIM.ivf_assign(corpus, cents, "vec_id", "v")
    mates = assigned.select(
        F.col("cid").alias("b_cid"),
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("b_v"),
    )
    cos = F.round(
        SIM.dot(F.col("v"), F.col("b_v"))
        / (SIM.norm(F.col("v")) * SIM.norm(F.col("b_v"))),
        4,
    )
    dropped = (
        assigned.join(
            mates,
            (F.col("cid") == F.col("b_cid"))
            & (F.col("b_id") < F.col("vec_id")),
        )
        .filter(cos >= _Q134_TAU)
        .select("vec_id")
        .distinct()
        .withColumn("is_kept", F.lit(False))
    )
    return (
        assigned.select("vec_id", F.col("cid").cast("long").alias("cluster_id"))
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.coalesce(F.col("is_kept"), F.lit(True)).alias("is_kept"),
        )
    )


# ===========================================================================
# TPC-H Q13 / Q15 shapes (distribution of aggregates; scalar-max ties)
# ===========================================================================

_Q135_EXCL = "1-URGENT"


@q(
    "q135_order_count_distribution",
    oracle=f"""
WITH co AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    AND o.o_orderpriority <> '{_Q135_EXCL}'
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
  CAST(COUNT(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count
""",
)
def q135_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape — customer order-count distribution: how many
    customers placed exactly N qualifying orders, zero-order customers
    included. The two-level aggregation (group -> count, then group BY
    the count) is the distribution-of-aggregates pattern, and the
    predicate lives in the LEFT JOIN's ON clause — the classic Q13
    trap (a WHERE would silently drop the zero-order customers the
    query exists to count).

    Scale shape: one keyed outer join (customer side small enough to
    broadcast at test scale, keyed hash join at 100 TB), one partial-
    agg'd count per customer, then a TINY second aggregation over the
    count domain (at most max-orders-per-customer distinct values) —
    the second shuffle carries one row per (count, map partition).
    Reference anchor: the generalized join/agg surface (SURVEY §2.7);
    completes the decorrelation family q123-q131."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    co = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != _Q135_EXCL),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    return co.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count("*").cast("long").alias("custdist")
    )


_Q136_FROM, _Q136_TO = "1996-01-01", "1996-04-01"


@q(
    "q136_top_supplier_revenue",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey,
    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q136_FROM} 00:00:00'
    AND l_shipdate < TIMESTAMP '{_Q136_TO} 00:00:00'
  GROUP BY l_suppkey
),
m AS (SELECT MAX(total_rev) AS mx FROM rev)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
  CAST(CAST(r.total_rev AS DECIMAL(38,6)) AS DOUBLE) AS total_rev
FROM supplier s
JOIN rev r ON r.l_suppkey = s.s_suppkey
JOIN m ON r.total_rev = m.mx
""",
)
def q136_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape — top supplier(s) by quarterly revenue: the
    revenue view, its scalar MAX, and an equality join back that
    PRESERVES TIES (Q15's defining subtlety — an orderBy+limit(1)
    would drop co-leaders). The view + scalar-subquery-in-WHERE
    decorrelates into aggregate -> 1-row max -> equi join on the
    revenue value.

    Cross-engine exactness: revenue sums run through the house
    decimal rule, so MAX and the tie-equality are exact on both
    engines — no FP boundary anywhere (ADVICE r6 discipline).

    Scale shape: one partial-agg'd shuffle on l_suppkey with the date
    filter pushed to the scan; the 1-row max broadcasts and the
    tie-join is a broadcast EQUI join on the value (not a nested
    loop); the supplier dim broadcasts. Reference anchor: U3's
    head-limit generalized to tie-preserving argmax (SURVEY §2.5)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit(_Q136_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q136_TO).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("total_rev")
        )
    )
    m = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(m), rev["total_rev"] == m["mx"])
        .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("total_rev").cast("decimal(38,6)").cast("double").alias(
                "total_rev"
            ),
        )
    )


# ===========================================================================
# TPC-H Q19 shape (disjunctive multi-clause join predicate)
# ===========================================================================


@q(
    "q137_disjunctive_predicate_join",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
  {sql_exact_sum("l.l_extendedprice * (1 - l.l_discount)", 18, 4)} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE
  (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
     AND l.l_quantity BETWEEN 1 AND 15)
  OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 20
     AND l.l_quantity BETWEEN 10 AND 25)
  OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 30
     AND l.l_quantity BETWEEN 20 AND 35)
""",
)
def q137_disjunctive_predicate_join(spark, sf_dir):
    """TPC-H Q19 shape — discounted revenue under an OR-of-conjuncts
    predicate spanning BOTH join sides (brand/size from part AND
    quantity from lineitem per clause). The optimizer lesson this
    shape exists for: Catalyst extracts the common equi-key
    (p_partkey = l_partkey) so the join stays a hash join with the
    disjunction as a post-join filter, AND pushes the PER-SIDE
    residuals of the OR down to each scan (the union of brands/sizes
    prunes part, the union of quantity bands prunes lineitem) — a
    naive planner degrades to a nested loop here.

    Scale shape: the brand/size-pruned part side broadcasts; lineitem
    reads only the quantity-band rows (PushedFilters carries the
    OR-union). Revenue through the house exact-decimal sum. Reference
    anchor: P4's exclusion predicates generalized to disjunctive join
    logic (SURVEY §2.2, §2.7)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 35)
        )
    )
    joined = l.join(
        F.broadcast(p), (l["l_partkey"] == p["p_partkey"]) & clause
    )
    return joined.agg(
        F.count("*").cast("long").alias("n_lines"),
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 4
        ).alias("revenue"),
    )

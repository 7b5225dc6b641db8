"""Registry part 5 — remaining north-star / analytics surface:
embedding near-dup dedup, IVF ANN, TF-IDF, pivot, exact percentiles,
a grouped pandas UDAF (regression slope), and the multimodal
frame-sampling UDTF shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.numeric import sql_exact_sum, exact_sum
from .operators import multimodal as MM
from .operators import similarity as SIM
from .operators import text as TX
from .queries import _t, q

# ===========================================================================
# embedding-cosine near-dup (dedup family, embedding modality)
# ===========================================================================

@q(
    "q51_embedding_neardup",
    oracle="""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planted AS (
  SELECT vec_id + 1000000 AS vec_id, v FROM base WHERE vec_id % 20 = 0
),
corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    round(list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
      4) AS cosine
  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.99
""",
)
def q51_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate detection over a simulated
    re-ingest (corpus ∪ an exact-copy 5% slice under new ids — the
    q13 re-scan model in embedding space). Exact all-pairs via the
    block-matrix GEMM kernel (Arrow + numpy BLAS, one block-pair task
    per matmul); at 100 TB the same kernel runs on SRP-bucket
    candidates only (operators/similarity.py scale notes)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    corpus = emb.unionByName(planted)
    return SIM.cosine_neardup_pairs_blocked(
        corpus, "vec_id", "embedding", threshold=0.99, round_to=4
    )


# ===========================================================================
# TF-IDF top terms
# ===========================================================================

@q(
    "q53_tfidf_topterms",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (
  SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks)
  GROUP BY term
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
    CAST(tf.tf AS BIGINT) AS tf, CAST(dfreq.df AS BIGINT) AS df,
    tf.tf * (n.n - dfreq.df + 0.5) / (dfreq.df + 0.5) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored)
WHERE rank <= 5
""",
)
def q53_tfidf_topterms(spark, sf_dir):
    """Per-document top-5 TF-IDF terms (rational BM25-style idf — no
    libm, bit-exact cross-engine; see operators/text.py::tfidf_topk)."""
    docs = _t(spark, sf_dir, "documents")
    return TX.tfidf_topk(docs, "doc_id", "text", top=5)


# ===========================================================================
# pivot / exact percentiles
# ===========================================================================

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


@q(
    "q54_pivot_priority",
    oracle=f"""
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
  {", ".join(
    f'''{sql_exact_sum(f"CASE WHEN o_orderpriority = '{p}' THEN o_totalprice END", 18, 2)} AS "{p}"'''
    for p in _PRIORITIES
  )}
FROM orders GROUP BY 1
""",
)
def q54_pivot_priority(spark, sf_dir):
    """Pivot (long->wide conditional aggregation): monthly revenue by
    order priority. Explicit pivot values — never let Spark scan for
    the value domain at 100 TB (that's an extra full pass)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "month", F.date_trunc("month", F.col("o_orderdate")).cast("date")
        )
        .groupBy("month")
        .pivot("o_orderpriority", list(_PRIORITIES))
        .agg(exact_sum("o_totalprice", 18, 2))
    )


@q(
    "q55_percentiles",
    oracle="""
SELECT l_returnflag,
  quantile_cont(l_extendedprice, 0.25) AS p25,
  quantile_cont(l_extendedprice, 0.5) AS p50,
  quantile_cont(l_extendedprice, 0.9) AS p90,
  quantile_cont(l_extendedprice, 0.99) AS p99,
  CAST(max(l_extendedprice) AS DOUBLE) AS p100
FROM lineitem GROUP BY l_returnflag
""",
)
def q55_percentiles(spark, sf_dir):
    """Exact linear-interpolation percentiles per group (verified
    bit-identical to DuckDB quantile_cont). Scale note: exact
    percentile is a full sort per group — at 100 TB prefer
    approx_percentile (t-digest, map-side combinable); exact is kept
    for the oracle and for final reporting tiers."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        F.max("l_extendedprice").cast("double").alias("p100"),
    )


# ===========================================================================
# grouped pandas UDAF: per-user regression slope
# ===========================================================================

_Q56_USER_MOD = 8  # demo cohort: ~1/8 of users (seam demo, see docstring)


@q(
    "q56_regr_slope_udaf",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, value FROM events
  WHERE user_id % {_Q56_USER_MOD} = 0
),
b AS (
  SELECT user_id,
    (us - MIN(us) OVER (PARTITION BY user_id)) // 1000000 AS x,
    CAST(floor(value * 1000000) AS BIGINT) AS y
  FROM e
),
s AS (
  SELECT user_id,
    CAST(COUNT(*) AS HUGEINT) AS n,
    SUM(CAST(x AS HUGEINT)) AS sx,
    SUM(CAST(y AS HUGEINT)) AS sy,
    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM b GROUP BY user_id
)
SELECT user_id,
  CAST(n AS BIGINT) AS n_events,
  CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
    ELSE (CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
      * ((abs(n * sxy - sx * sy) * 1000000000) // (n * sxx - sx * sx))
  END AS BIGINT) AS slope_nano
FROM s
""",
)
def q56_regr_slope_udaf(spark, sf_dir):
    """Grouped pandas UDAF (``applyInPandas``): per-user least-squares
    slope of event value over time. The UDAF computes the closed-form
    slope with EXACT integer moments (Python bigints; x in seconds from
    the user's first event, y in floor-micros) and emits the slope as a
    truncated integer in nano-units — bit-identical to the oracle's
    HUGEINT formulation with no float conversion anywhere (DuckDB's
    int128->double cast is not correctly rounded; observed 1-ulp drift).

    The pandas seam is the point here (the C2 batch-UDF pattern applied
    to an aggregation); the pure-SQL twin is what the oracle runs, and
    the built-in ``regr_slope`` family is the production path — so the
    demo runs on a ~1/8 user cohort (``user_id % _Q56_USER_MOD = 0``,
    identically filtered on both engines) to stop a seam demonstration
    from being the suite's slowest non-MLlib query (VERDICT r6 item
    6). The seam itself is cohort-size-independent."""
    ev = _t(spark, sf_dir, "events")
    src = ev.filter(F.col("user_id") % _Q56_USER_MOD == 0).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )

    def slope(pdf):
        import math

        import pandas as pd

        us = pdf["us"].astype("int64")
        x = [int(v) for v in (us - us.min()) // 1_000_000]
        y = [int(math.floor(v * 1_000_000)) for v in pdf["value"]]
        n = len(x)
        sx = sum(x)
        sy = sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        if den == 0:
            s = None
        else:
            # truncate toward zero (den > 0 by construction)
            s = (-1 if num < 0 else 1) * (abs(num) * 10**9 // den)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "slope_nano": [s],
            }
        )

    return src.groupBy("user_id").applyInPandas(
        slope, schema="user_id long, n_events long, slope_nano long"
    )


# ===========================================================================
# multimodal frame sampling (UDTF shape)
# ===========================================================================

@q(
    "q57_multimodal_frames",
    oracle="""
WITH d AS (SELECT doc_id, strlen(text) AS n FROM documents),
f AS (
  SELECT doc_id, n, unnest(generate_series(0, n % 5)) AS frame_idx FROM d
)
SELECT doc_id,
  CAST(frame_idx AS BIGINT) AS frame_idx,
  CAST(frame_idx * (n // (n % 5 + 1)) AS BIGINT) AS frame_offset,
  md5(doc_id || ':' || frame_idx) AS frame_hash
FROM f
""",
)
def q57_multimodal_frames(spark, sf_dir):
    """Frame sampling over binary payloads: 1 row -> n_frames rows via
    mapInPandas (the UDTF shape; deterministic fake decode — see
    operators/multimodal.py::sample_frames)."""
    docs = _t(spark, sf_dir, "documents")
    blobs = MM.attach_blob(docs, "doc_id", "text")
    return MM.sample_frames(blobs, "doc_id")

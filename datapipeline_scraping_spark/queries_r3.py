"""Registry part 10 — round-3 additions: dedup cluster resolution
(connected components over LSH candidate pairs), deterministic
stratified sampling, token-distribution entropy quality scoring, and
ANN recall evaluation (SRP vs exact ground truth).

These extend the north-star training-data-pipeline surface: pair
generation (q19/q51) needs transitive cluster resolution before
documents can be dropped; training mixes need reproducible
per-language downsampling; quality filters need distribution-shape
scores beyond counts; and an approximate index is only shippable with
a measured recall.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import graph as G
from .operators import sample as SMP
from .operators import similarity as SIM
from .queries import _t, q
from .queries_llm import _minhash_cte

# ===========================================================================
# q91 — dedup clusters: connected components over MinHash-LSH pairs
# ===========================================================================

@q(
    "q91_dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_minhash_cte()},
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT w.node, e.b FROM reach w JOIN edges e ON e.a = w.r
),
comp AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node)
SELECT node, CAST(cluster_id AS BIGINT) AS cluster_id,
  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
  node = cluster_id AS is_keeper
FROM comp
""",
)
def q91_dedup_clusters(spark, sf_dir):
    """Cluster resolution over q19's LSH candidate pairs: iterative
    min-label propagation (Pregel-style connected components; the
    oracle computes the same closure with a recursive CTE).  Each
    round is one shuffle on the edge key; rounds = cluster diameter
    (shallow for near-dup graphs).  Output: every paired doc with its
    cluster id (= min doc id, the dedup keeper), cluster size, and
    keeper flag."""
    docs = _t(spark, sf_dir, "documents")
    from .operators import dedup as D

    edges = D.minhash_lsh_pairs(docs, "doc_id", "text", k=3, n_hashes=8, n_bands=4)
    return G.dedup_clusters(edges, "id_a", "id_b")


# ===========================================================================
# q92 — deterministic stratified sampling (training-mix rebalance)
# ===========================================================================

_Q92_RATES = {"en": 0.25, "zh": 0.9}


@q(
    "q92_stratified_sample",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000
  < (CASE lang WHEN 'en' THEN 0.25 WHEN 'zh' THEN 0.9 ELSE 0.5 END) * 10000
""",
)
def q92_stratified_sample(spark, sf_dir):
    """Per-language deterministic hash sampling (downsample dominant
    'en', keep most 'zh', half of the rest) — map-only, reproducible
    under any partitioning, membership re-computable by the oracle."""
    docs = _t(spark, sf_dir, "documents")
    return SMP.stratified_sample(
        docs, "lang", "doc_id", _Q92_RATES, default_rate=0.5
    ).select("doc_id", "lang", "source")


# ===========================================================================
# q93 — token-distribution entropy (quality scoring beyond counts)
# ===========================================================================

@q(
    "q93_token_entropy",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
tot AS (SELECT doc_id, SUM(c) AS t, COUNT(*) AS u FROM cnt GROUP BY 1)
SELECT c.doc_id,
  CAST(t.t AS BIGINT) AS n_tokens,
  CAST(t.u AS BIGINT) AS n_unique,
  t.u / t.t AS type_token_ratio,
  round(SUM(-(c.c / t.t) * log2(c.c / t.t)), 4) AS token_entropy
FROM cnt c JOIN tot t USING (doc_id)
GROUP BY c.doc_id, t.t, t.u
""",
)
def q93_token_entropy(spark, sf_dir):
    """Shannon entropy of each document's token distribution plus
    type-token ratio — the distribution-shape quality signals (low
    entropy = repetitive/templated text).  One explode + two grouped
    aggregations, all map-side combinable; the entropy sum is rounded
    to 4 digits so partial-agg order never shows."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    cnt = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("t"), F.count("*").alias("u")
    )
    p = F.col("c") / F.col("t")
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id", "t", "u")
        .agg(F.round(F.sum(-p * F.log2(p)), 4).alias("token_entropy"))
        .select(
            "doc_id",
            F.col("t").cast("long").alias("n_tokens"),
            F.col("u").cast("long").alias("n_unique"),
            (F.col("u") / F.col("t")).alias("type_token_ratio"),
            "token_entropy",
        )
    )


# ===========================================================================
# q94 — ANN recall evaluation: SRP bucketed top-k vs exact ground truth
# ===========================================================================

def _q94_oracle(n_planes: int = 6, dim: int = 64) -> str:
    bucket = SIM.srp_bucket_sql("v", n_planes, dim)
    cos = (
        "round(list_dot_product(q.qv, c.v) / (sqrt(list_dot_product(q.qv, q.qv))"
        " * sqrt(list_dot_product(c.v, c.v))), 4)"
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
qs AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 8),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id, {cos} AS cosine,
      ROW_NUMBER() OVER (PARTITION BY q.query_id
        ORDER BY {cos} DESC, c.vec_id) AS rnk
    FROM qs q JOIN e c ON c.vec_id <> q.query_id
  ) WHERE rnk <= 5
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id, {cos} AS cosine,
      ROW_NUMBER() OVER (PARTITION BY q.query_id
        ORDER BY {cos} DESC, c.vec_id) AS rnk
    FROM qs q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
  ) WHERE rnk <= 5
),
hits AS (
  SELECT x.query_id, COUNT(*) AS n
  FROM exact x JOIN approx a USING (query_id, neighbor_id)
  GROUP BY x.query_id
)
SELECT q.query_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
  COALESCE(h.n, 0) / 5 AS recall_at_5
FROM (SELECT query_id FROM qs) q LEFT JOIN hits h USING (query_id)
"""


@q("q94_ann_recall", oracle=_q94_oracle())
def q94_ann_recall(spark, sf_dir):
    """Recall@5 of the SRP-bucketed ANN (q35's index) against the
    exact brute-force ground truth (q21's kernel), per query vector —
    'measure, don't guess' applied to the approximate index: an ANN
    path ships with a recall number, not a hope."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = SIM.cosine_topk(emb, queries, "vec_id", "embedding", k=5).select(
        "query_id", "neighbor_id"
    )
    approx = SIM.lsh_cosine_topk(
        emb, queries, "vec_id", "embedding", k=5, n_planes=6
    ).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count("*").alias("n"))
    n = F.coalesce(F.col("n"), F.lit(0))
    return (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            n.cast("long").alias("n_hits"),
            (n / F.lit(5)).alias("recall_at_5"),
        )
    )

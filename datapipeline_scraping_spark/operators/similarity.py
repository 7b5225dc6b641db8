"""Similarity search over embedding columns (north-star operator;
substrate: the ``embeddings`` table, ``array<float>`` dim 64).

Two strategies:
- :func:`cosine_topk` — brute-force top-k: exact, the correctness
  baseline. Dot products are per-row array HOFs (JVM-side, no Python);
  the only shuffle is the final per-query top-k window over
  |queries| × |corpus| scored rows. Fine when the query set is small.
- :func:`lsh_cosine_topk` — random-hyperplane (SRP) bucketed variant:
  at 100 TB the corpus side is bucketed by an r-bit sign hash; probing
  compares only same-bucket vectors, trading recall for a
  |corpus|/2^r reduction in scored pairs. Hyperplanes are derived
  deterministically from md5 so results are reproducible.

All arithmetic is done in double after an explicit float->double cast
so results are bit-identical to the DuckDB oracle; similarities are
rounded before ranking so rank order is stable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Index-ordered fold — same summation order as the oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine, rank); self-matches
    excluded; ties broken by neighbor id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (norm(F.col("qv")) * norm(F.col("cv"))),
                round_to,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def srp_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-random-projection bucket id: bit p = sign(v · h_p) where
    hyperplane h_p[i] = ±1 derived from md5(p:i) — deterministic,
    data-independent, reproducible on any engine."""
    import hashlib

    bucket = None
    for p in range(n_planes):
        signs = [
            1.0
            if int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: score only same-SRP-bucket pairs. The join
    shuffles on the bucket key; each bucket holds ~|corpus|/2^planes
    vectors, so scored pairs shrink accordingly (recall < 1)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(vec_col).alias("qv"),
    ).withColumn("bucket", srp_bucket(F.col("qv"), n_planes, dim))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("cv"),
    ).withColumn("bucket", srp_bucket(F.col("cv"), n_planes, dim))
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (norm(F.col("qv")) * norm(F.col("cv"))),
                round_to,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    )

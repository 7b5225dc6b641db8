"""Round-5 registry queries: incremental ANN index maintenance and the
second-config pipeline switch (the reference's multi-country UX)."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.checksum import checksum_sql
from .functions.numeric import exact_sum, sql_exact_sum
from .operators import similarity as SIM
from .operators.txn import merge_write
from .queries import _t, q
from .streaming.events import SCRATCH


def _key(sf_dir: str) -> str:
    return sf_dir.rstrip("/").replace("/", "_").lstrip("_").replace(".", "_")


# ===========================================================================
# incremental ANN: persisted SRP bucket index, probe-only ingestion
# ===========================================================================

def _q106_oracle() -> str:
    bucket_c = SIM.srp_bucket_sql("v", n_planes=6, dim=64)
    bucket_i = SIM.srp_bucket_sql("iv", n_planes=6, dim=64)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
idx AS (SELECT vec_id, v, {bucket_c} AS bucket FROM e),
inc AS (
  SELECT vec_id + 1000000 AS query_id,
    list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.0005) AS iv
  FROM embeddings WHERE vec_id % 9 = 0
),
incb AS (SELECT query_id, iv, {bucket_i} AS bucket FROM inc),
scored AS (
  SELECT i.query_id, c.vec_id AS neighbor_id,
    round(list_dot_product(i.iv, c.v)
      / (sqrt(list_dot_product(i.iv, i.iv)) * sqrt(list_dot_product(c.v, c.v))),
      4) AS cosine
  FROM incb i JOIN idx c ON i.bucket = c.bucket
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 3
"""


@q("q106_incremental_ann", oracle=_q106_oracle())
def q106_incremental_ann(spark, sf_dir):
    """Incremental ANN index maintenance — the embedding analogue of
    q95's incremental dedup, and the pattern that keeps similarity
    search sustainable while a corpus accretes (the reference keeps
    its raw ledger as exactly this kind of persisted state store,
    ``src/storage.py:67-74``):

    1. the corpus SRP bucket index ``(vec_id, bucket, v)`` lives as a
       PERSISTED table (built once, maintained forever);
    2. an incoming batch (new ids, slightly perturbed vectors) is
       MERGEd into the index by primary key — idempotent upsert via
       the transactional seam (``operators/txn.py::merge_write``);
    3. the batch is scored ONLY against same-bucket index rows — one
       equi-join on ``bucket``; no corpus self-join, no all-pairs —
       and the top-3 per incoming vector is returned.

    Per-batch cost is O(|batch| + matched buckets); the probe filters
    the index to corpus rows (``vec_id < 1000000``) so the result is
    identical no matter how many times the same batch was merged."""
    emb = _t(spark, sf_dir, "embeddings")
    idx_path = os.path.join(SCRATCH, f"srp_index_{_key(sf_dir)}")

    def with_bucket(df, id_alias, vec):
        return df.select(
            F.col("vec_id").alias(id_alias),
            vec.alias("v"),
        ).withColumn("bucket", SIM.srp_bucket(F.col("v"), 6, 64))

    if not os.path.exists(os.path.join(idx_path, "_SUCCESS")):
        with_bucket(emb, "vec_id", SIM.as_double("embedding")).write.mode(
            "overwrite"
        ).parquet(idx_path)

    incoming = with_bucket(
        emb.filter(F.col("vec_id") % 9 == 0).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.transform(SIM.as_double("embedding"), lambda x: x * 1.0005).alias(
                "embedding"
            ),
        ),
        "vec_id",
        F.col("embedding"),
    )

    # maintenance: upsert the batch into the stored index (insert new
    # ids, overwrite re-ingested ones) — same-key re-merge is a no-op
    merge_write(spark, idx_path, incoming, "vec_id", writer="parquet")

    index = spark.read.parquet(idx_path).filter(F.col("vec_id") < 1_000_000)
    probe = incoming.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("iv"), "bucket"
    )
    scored = probe.join(index, on="bucket").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            SIM.dot(F.col("iv"), F.col("v"))
            / (SIM.norm(F.col("iv")) * SIM.norm(F.col("v"))),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
    )


# ===========================================================================
# second-config pipeline: the reference's runtime country switch
# ===========================================================================

_ALT_CHECKSUM = checksum_sql(["numero", "titulo", "estado"])


@q(
    "q107_config_switch",
    oracle=f"""
WITH base AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS numero,
    o_orderstatus AS estado,
    o_orderpriority AS titulo,
    strftime(o_orderdate, '%d/%m/%Y') AS fecha_str,
    o_totalprice AS monto
  FROM orders WHERE o_totalprice > 0
),
parsed AS (
  SELECT *,
    CAST(strptime(regexp_extract(fecha_str,
      '([0-9]{{2}}/[0-9]{{2}}/[0-9]{{4}})', 1), '%d/%m/%Y') AS DATE) AS fecha,
    {_ALT_CHECKSUM} AS row_hash
  FROM base
)
SELECT estado, CAST(year(fecha) AS BIGINT) AS anio,
  COUNT(*) AS n_orders,
  {sql_exact_sum('monto', 18, 2)} AS total_monto,
  COUNT(DISTINCT row_hash) AS n_hashes
FROM parsed GROUP BY 1, 2
""",
)
def q107_config_switch(spark, sf_dir):
    """Runtime config switch (the reference's core multi-country UX:
    ``src/scrapers/config_loader.py:10-21`` picks ``peru.yml`` vs
    ``colombia.yml`` at launch): a SECOND pipeline YAML with a
    different table, different column set, a ``dd/MM/yyyy`` date
    regex + parse, and different checksum fields, folded by the SAME
    ``plans/pipeline.py`` builder that runs q83's config. Both
    configs are loaded; the active one is selected by name — swap the
    YAML, keep the engine."""
    from .plans.pipeline import build_pipeline, load_pipeline_config

    cfg_dir = os.path.join(os.path.dirname(__file__), "configs")
    configs = {
        name: load_pipeline_config(os.path.join(cfg_dir, fname))
        for name, fname in [
            ("etl_documents", "etl_documents.yml"),
            ("etl_orders_alt", "etl_orders_alt.yml"),
        ]
    }
    out = build_pipeline(spark, configs["etl_orders_alt"], sf_dir)
    return out.groupBy(
        "estado", F.year("fecha").cast("long").alias("anio")
    ).agg(
        F.count("*").alias("n_orders"),
        exact_sum("monto", 18, 2).alias("total_monto"),
        F.countDistinct("row_hash").alias("n_hashes"),
    )

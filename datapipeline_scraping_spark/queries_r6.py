"""Round-6 registry queries: honest image-header decode over real
binary payloads, and multi-key blocked entity resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import multimodal as MM
from .queries import _t, q


# ===========================================================================
# honest image decode: real PNG/JPEG/GIF bytes, real header parsing
# ===========================================================================

@q(
    "q115_image_decode",
    oracle="""
SELECT doc_id,
  CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 15 ELSE 14 END
    AS BIGINT) AS n_bytes,
  CAST(doc_id % 640 + 1 AS BIGINT) AS width,
  CAST(doc_id % 480 + 1 AS BIGINT) AS height
FROM documents
""",
)
def q115_image_decode(spark, sf_dir):
    """Image metadata extraction with REAL byte parsing end-to-end:
    each document id is rendered into a genuine minimal image file
    (PNG signature+IHDR / JPEG SOI+SOF0 / GIF89a screen descriptor,
    cycling by ``doc_id % 3``), and ``extract_media_meta`` reads the
    dimensions back OUT OF THE BYTES via the stdlib header parser
    (``operators/multimodal.py::decode_image``) — no imaging library,
    no deterministic fake on this path. The oracle recomputes the
    encoded dimensions arithmetically, so a parser that misreads a
    single header field hash-mismatches.

    Scale shape: blob synthesis and decode are both single-pass
    Arrow-batched map operations (no shuffle at all — the scan's
    partitioning carries through); at 100 TB the only change is that
    the blob column comes off object storage instead of being
    synthesized. Reference anchor: the multimodal carrier pattern is
    north-star surface (no reference equivalent; the closest is the
    binary-opaque document fetch, ``src/scrapers/detail_parser.py:97-119``)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def render(batches):
        import pandas as pd

        makers = (MM.make_png, MM.make_jpeg, MM.make_gif)
        for pdf in batches:
            blobs = [
                makers[int(i) % 3](int(i) % 640 + 1, int(i) % 480 + 1)
                for i in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    return MM.extract_media_meta(blobs, "doc_id")


# ===========================================================================
# multi-key blocked entity resolution + measured recall (q112's scale path)
# ===========================================================================

# deterministic perturbations of part names, chosen so each breaks a
# DIFFERENT single blocking key: last-char drop (prefix survives),
# first-char drop (prefix breaks, suffix survives), middle-char drop
# (prefix+suffix survive, length shifts)
_Q116_DIRTY_SQL = """
  SELECT p_partkey + 1000000 AS dirty_id,
    CASE CAST(p_partkey % 3 AS INTEGER)
      WHEN 0 THEN substr(p_name, 1, length(p_name) - 1)
      WHEN 1 THEN substr(p_name, 2)
      ELSE concat(
        substr(p_name, 1, CAST(floor(length(p_name) / 2) AS INTEGER) - 1),
        substr(p_name, CAST(floor(length(p_name) / 2) AS INTEGER) + 1))
    END AS name,
    p_name AS true_name
  FROM part WHERE p_partkey % 13 = 0 AND length(p_name) > 4
"""

# the three redundant blocking keys (as SQL snippets over a name column)
_Q116_KEYS = {
    "prefix": "substr({c}, 1, 3)",
    "suffix": "substr({c}, length({c}) - 2, 3)",
    "skeleton": "substr(regexp_replace({c}, '[aeiou ]', ''), 1, 4)",
}


def _q116_oracle() -> str:
    def cand_cte(strategy: str, which: tuple[str, ...]) -> str:
        sides = " UNION ALL ".join(
            f"SELECT dirty_id, name, true_key, "
            f"{_Q116_KEYS[k].format(c='name')} AS bk FROM dirty"
            for k in which
        )
        canon_sides = " UNION ALL ".join(
            f"SELECT p_partkey, p_name, "
            f"{_Q116_KEYS[k].format(c='p_name')} AS bk FROM canon"
            for k in which
        )
        return f"""
d_{strategy} AS (SELECT DISTINCT * FROM ({sides})),
c_{strategy} AS (SELECT DISTINCT * FROM ({canon_sides})),
cand_{strategy} AS (
  SELECT DISTINCT d.dirty_id, d.name, d.true_key, c.p_partkey, c.p_name
  FROM d_{strategy} d JOIN c_{strategy} c
    ON d.bk = c.bk AND abs(length(d.name) - length(c.p_name)) <= 2
),
best_{strategy} AS (
  SELECT dirty_id, true_key, p_partkey AS matched_key FROM (
    SELECT *, levenshtein(name, p_name) AS dist,
      ROW_NUMBER() OVER (PARTITION BY dirty_id
        ORDER BY levenshtein(name, p_name), p_partkey) AS rn
    FROM cand_{strategy} WHERE levenshtein(name, p_name) <= 2
  ) WHERE rn = 1
),
ccount_{strategy} AS (
  SELECT dirty_id, COUNT(*) AS n_cand FROM cand_{strategy} GROUP BY dirty_id
),
row_{strategy} AS (
  SELECT '{strategy}' AS strategy,
    CAST(COUNT(*) AS BIGINT) AS n_dirty,
    CAST(COALESCE(SUM(cc.n_cand), 0) AS BIGINT) AS n_candidates,
    CAST(COUNT(b.matched_key) AS BIGINT) AS n_matched,
    CAST(COUNT(CASE WHEN b.matched_key = d.true_key THEN 1 END) AS BIGINT)
      AS n_correct,
    COUNT(CASE WHEN b.matched_key = d.true_key THEN 1 END)
      / CAST(COUNT(*) AS DOUBLE) AS recall
  FROM dirty d
  LEFT JOIN best_{strategy} b USING (dirty_id)
  LEFT JOIN ccount_{strategy} cc USING (dirty_id)
)"""

    return f"""
WITH canon AS (
  SELECT p_name, MIN(p_partkey) AS p_partkey FROM part GROUP BY p_name
),
dirty0 AS ({_Q116_DIRTY_SQL}),
dirty AS (
  SELECT d.dirty_id, d.name, c.p_partkey AS true_key
  FROM dirty0 d JOIN canon c ON c.p_name = d.true_name
),
{cand_cte('prefix', ('prefix',))},
{cand_cte('multi', ('prefix', 'suffix', 'skeleton'))}
SELECT * FROM row_prefix UNION ALL SELECT * FROM row_multi
"""


@q("q116_er_multikey_recall", oracle=_q116_oracle())
def q116_er_multikey_recall(spark, sf_dir):
    """Multi-key blocked entity resolution with MEASURED recall — the
    scale path q112's docstring promises: single-key blocking misses
    every record whose perturbation breaks that key, so production ER
    unions candidates from several redundant cheap keys (here 3-char
    prefix, 3-char suffix, and a vowel-stripped 'skeleton') before the
    levenshtein verify. The dirty set is built so each perturbation
    class defeats a different key (last-char / first-char / middle-char
    drops), and the query returns one row per strategy with its
    candidate volume and recall against the known truth — recall is an
    OUTPUT of the operator, not a hope ('measure, don't guess').

    Plan shape: every blocking key is an equi-join (hash join on the
    key, length band applied at the probe); the multi-key variant is a
    union of key streams deduped BEFORE the edit-distance verify, so
    verification cost stays O(distinct candidates). No |dirty|x|canon|
    product anywhere. At 100 TB: keys are cheap row-local projections,
    each key join shuffles only its key column, and candidate dedup
    bounds the expensive verify — recall/candidate-count columns are
    exactly what you monitor to tune the key set. Reference anchor:
    generalizes the reference's exact-key state probe
    (``dags/scraping_etl.py:59-69``) to approximate matching."""
    from pyspark.sql import Window as W

    p = _t(spark, sf_dir, "part")
    canon = p.groupBy("p_name").agg(F.min("p_partkey").alias("p_partkey"))
    mode = (F.col("p_partkey") % 3).cast("int")
    dirty = (
        p.filter((F.col("p_partkey") % 13 == 0) & (F.length("p_name") > 4))
        .select(
            (F.col("p_partkey") + 1_000_000).alias("dirty_id"),
            F.when(mode == 0, F.expr("substr(p_name, 1, length(p_name) - 1)"))
            .when(mode == 1, F.expr("substr(p_name, 2)"))
            .otherwise(
                F.expr(
                    "concat("
                    "substr(p_name, 1, CAST(floor(length(p_name) / 2) AS INT) - 1), "
                    "substr(p_name, CAST(floor(length(p_name) / 2) AS INT) + 1))"
                )
            )
            .alias("name"),
            F.col("p_name").alias("true_name"),
        )
        .join(
            canon.select(
                F.col("p_name").alias("true_name"),
                F.col("p_partkey").alias("true_key"),
            ),
            on="true_name",
        )
        .select("dirty_id", "name", "true_key")
    )

    def keyed(df, col, which):
        parts = [
            df.select("*", F.expr(_Q116_KEYS[k].format(c=col)).alias("bk"))
            for k in which
        ]
        out = parts[0]
        for more in parts[1:]:
            out = out.unionByName(more)
        return out.distinct()

    def strategy_row(label, which):
        d = keyed(dirty, "name", which)
        c = keyed(canon, "p_name", which)
        cand = (
            d.join(
                c,
                on=[
                    d["bk"] == c["bk"],
                    F.abs(F.length(d["name"]) - F.length(c["p_name"])) <= 2,
                ],
            )
            .select("dirty_id", "name", "true_key", "p_partkey", "p_name")
            .distinct()
        )
        verified = cand.withColumn(
            "dist", F.levenshtein("name", "p_name", 3)
        ).filter(F.col("dist").between(0, 2))
        w = W.partitionBy("dirty_id").orderBy("dist", "p_partkey")
        best = (
            verified.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("dirty_id", F.col("p_partkey").alias("matched_key"))
        )
        ccount = cand.groupBy("dirty_id").agg(F.count("*").alias("n_cand"))
        correct = F.when(
            F.col("matched_key") == F.col("true_key"), F.lit(1)
        )
        return (
            dirty.join(best, on="dirty_id", how="left")
            .join(ccount, on="dirty_id", how="left")
            .agg(
                F.count("*").cast("long").alias("n_dirty"),
                F.coalesce(F.sum("n_cand"), F.lit(0))
                .cast("long")
                .alias("n_candidates"),
                F.count("matched_key").cast("long").alias("n_matched"),
                F.count(correct).cast("long").alias("n_correct"),
                (F.count(correct) / F.count("*")).alias("recall"),
            )
            .select(F.lit(label).alias("strategy"), "*")
        )

    return strategy_row("prefix", ("prefix",)).unionByName(
        strategy_row("multi", ("prefix", "suffix", "skeleton"))
    )

"""Deterministic sampling operators (training-data pipeline surface).

Hash-based sampling (md5 of the row id against a threshold) rather
than ``df.sample``: reproducible across runs/engines/partitionings,
exactly re-computable by the DuckDB oracle, and stable under
re-ingestion — the properties a 100 TB data pipeline needs from a
sampler (rerunning the job yields the same sample; a row's membership
never depends on partition layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction(id_col: Column | str, *, buckets: int = 10000) -> Column:
    """Uniform [0, buckets) hash of an id — md5-derived, engine-stable
    (DuckDB: ``CAST('0x' || substr(md5(CAST(id AS VARCHAR)),1,8) AS
    BIGINT) % buckets``)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % F.lit(buckets)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    buckets: int = 10000,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its id-hash
    bucket falls under its stratum's rate (e.g. downsample dominant
    languages, keep all of rare ones — the standard training-mix
    rebalance).

    Map-only (no shuffle): the rate lookup is a literal CASE chain and
    membership is a pushed-down-able filter on a per-row expression."""
    frac = hash_fraction(id_col, buckets=buckets)
    rate: Column = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(r)).otherwise(rate)
    return df.filter(frac < rate * buckets)

"""Slowly-changing-dimension type 2 — upsert with history.

The reference's final-table upsert (S10/S11) overwrites in place; the
warehouse-grade variant keeps every version: applying a change CLOSES
the current row (valid_to = effective date) and INSERTS a new current
row. This is the standard shape for dimension tables feeding
time-travel joins (pairs with the as-of join in operators/asof.py:
"state as of ts" probes the history table).

Scale: two keyed joins (close + no-op filter) and a union — everything
shards by the business key; no windows over the full history are
needed because only CURRENT rows (valid_to IS NULL) participate in
matching. At 100 TB the history table is a transactional table and
this composition is the MERGE body.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    target: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    attrs: list[str],
    eff_col: str = "valid_from",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply a change batch to an SCD2 history table.

    ``target``: (key, attrs..., valid_from, valid_to) with exactly one
    current row (valid_to NULL) per key. ``changes``: (key, attrs...,
    eff_col). A change whose attrs equal the key's current attrs is a
    NO-OP (dropped); otherwise the current row closes at the effective
    date and a new current row opens. Changes for unknown keys insert
    directly."""
    cur = target.filter(F.col(to_col).isNull())
    hist = target.filter(F.col(to_col).isNotNull())

    c = changes.select(
        F.col(key),
        *[F.col(a).alias(f"__new_{a}") for a in attrs],
        F.col(eff_col).alias("__eff"),
    )

    def attrs_differ() -> Column:
        cond = F.lit(False)
        for a in attrs:
            cond = cond | ~F.col(a).eqNullSafe(F.col(f"__new_{a}"))
        return cond

    joined = cur.join(c, on=key, how="left")
    real_change = F.col("__eff").isNotNull() & attrs_differ()

    closed = joined.filter(real_change).select(
        key, *attrs, from_col, F.col("__eff").alias(to_col)
    )
    untouched_cur = joined.filter(~real_change | F.col("__eff").isNull()).select(
        key, *attrs, from_col, to_col
    )
    opened = joined.filter(real_change).select(
        F.col(key),
        *[F.col(f"__new_{a}").alias(a) for a in attrs],
        F.col("__eff").alias(from_col),
        F.lit(None).cast(target.schema[to_col].dataType).alias(to_col),
    )
    inserts = c.join(cur.select(key), on=key, how="left_anti").select(
        F.col(key),
        *[F.col(f"__new_{a}").alias(a) for a in attrs],
        F.col("__eff").alias(from_col),
        F.lit(None).cast(target.schema[to_col].dataType).alias(to_col),
    )
    return (
        hist.select(key, *attrs, from_col, to_col)
        .unionByName(closed)
        .unionByName(untouched_cur)
        .unionByName(opened)
        .unionByName(inserts)
    )

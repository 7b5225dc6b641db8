"""As-of (time-travel) join — an operator Spark lacks natively.

For each left row, find the most recent right row with
``right.ts <= left.ts`` within the same key. The classic use: enrich an
event with the latest prior state snapshot (the reference's
"latest known checksum for this key" probe, H2/H5, is the degenerate
single-snapshot case of this).

Implementation: NOT a join. Both sides are unioned, tagged, and swept
with one ``last(..., ignorenulls)`` running-window pass:

    union -> window over (key) ordered by (ts, side) -> filter left

This is the scale-correct formulation: one shuffle on the key (same as
any keyed join would need), no per-row range probe, no candidate-pair
explosion, and the running ``last`` is O(1) state per row. A naive
``left.ts >= right.ts`` range join is quadratic in the per-key row
count; pandas ``merge_asof`` in a grouped UDF would work but leaves
the JVM. The union-sweep stays JVM-side.

Boundary semantics: ``<=`` (a right row at exactly left.ts matches),
implemented by sorting right rows before left rows at equal ts. Right
rows must be unique per (key, ts) for a deterministic result — pre-
aggregate the right side otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row annotated with ``prefix``-named
    columns from the most recent right row at-or-before its ``ts``
    (nulls when no prior right row exists).

    Both inputs must carry ``key`` and ``ts``; the right payload
    columns are listed explicitly (project early — the payload rides
    through the key shuffle)."""
    payload_type = right.select(
        F.struct(*[F.col(c) for c in right_cols]).alias("__payload")
    ).schema["__payload"].dataType

    left_cols = list(left.columns)
    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (key, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__payload"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = l_tagged.unionByName(r_tagged).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    return swept.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )

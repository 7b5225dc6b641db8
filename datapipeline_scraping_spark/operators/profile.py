"""Data-quality operators: one-pass table profiling and declarative
constraint checks (the deequ/dbt-test role) — operational surface a
100 TB pipeline runs on every ingest batch before anything else
consumes it.

The reference's only quality gate is the '' → NULL normalization and
closed-domain validation (C3); these generalize that to whole-table
shape monitoring.

Scale: both operators are ONE full-scan aggregation each — every
metric is map-side combinable (count/sum/min/max; distinct via
count(distinct) which Spark plans as a partial-aggregate expand), no
joins, no window, output rows = columns or rules, i.e. tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: row count, null count, exact distinct count,
    min/max (stringified for a uniform schema). One job; the unpivot to
    rows happens on the single aggregated row."""
    cols = columns or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col(f"__null_{c}").cast("long").alias("n_null"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


def check_constraints(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Declarative row-level expectations: each rule is (name,
    boolean Column); output one row per rule with violation counts.
    NULL predicate results count as violations (a rule that cannot
    evaluate did not pass — the conservative reading).

    All rules evaluate in ONE scan (a single aggregate over
    conditional sums); at 100 TB this is the same cost as one count."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules:
        aggs.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(f"__viol_{name}")
        )
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col(f"__viol_{name}").cast("long").alias("n_violations"),
            (F.col(f"__viol_{name}") == 0).alias("passed"),
        )
        for name, _ in rules
    ]
    return row.select(F.explode(F.array(*entries)).alias("e")).select("e.*")

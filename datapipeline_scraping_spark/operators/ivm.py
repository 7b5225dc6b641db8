"""Incremental view maintenance (IVM) for keyed aggregates over the
transactional ledger's change feed.

``ManifestTable.diff`` (q147) + ``apply_diff`` (q151) maintain derived
ROW-level tables on O(churn) work; this module lifts the same loop to
AGGREGATE views: a ``GROUP BY`` materialized view refreshes from the
CDF alone — each change row contributes a signed delta (+ for
``insert``/``update_postimage``, − for ``delete``/``update_preimage``),
deltas reduce per group, and one keyed merge applies them. COUNT and
SUM are self-maintainable (the textbook IVM result); group MIGRATION
(an update that moves a row between groups) is handled for free
because the CDF emits both the pre-image (− on the old group) and the
post-image (+ on the new group).

Exactness contract: sum columns must be DECIMAL — decimal addition is
exactly associative/commutative, so the incrementally-maintained sum
is bit-identical to a full rebuild in any evaluation order (the
q01-family ``exact_sum`` discipline; a double sum would drift by
reassociation). MIN/MAX are deliberately NOT offered: they are not
self-maintainable under deletes (a retracted maximum needs the base
table), which is the honest boundary of CDF-only maintenance.

Reference anchor: the reference recomputes its reporting aggregates
from Postgres on every DAG run (``dags/scraping_etl.py:59-69`` rebuilds
downstream state after each delta); at 100 TB the rebuild is the
workload, and this loop replaces it with churn-proportional work.

Scale: ``delta_aggregate`` is ONE map-side-combinable aggregation over
the (churn-sized) change frame; ``apply_agg_delta`` is one keyed
full-outer merge of two group-cardinality frames — both independent of
base-table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delta_aggregate(
    changes: DataFrame,
    group_cols: list[str],
    sum_specs: dict[str, Column],
    *,
    count_name: str = "n",
) -> DataFrame:
    """Per-group aggregate DELTAS from a CDF frame (``diff`` output):
    ``[<group_cols>, d_<count_name>, d_<sum>...]``. ``sum_specs`` maps
    output names to DECIMAL expressions over the change rows."""
    pos = F.col("_change_type").isin("insert", "update_postimage")
    aggs = [
        F.sum(F.when(pos, F.lit(1)).otherwise(F.lit(-1)))
        .cast("long")
        .alias(f"d_{count_name}")
    ]
    for name, col in sum_specs.items():
        aggs.append(F.sum(F.when(pos, col).otherwise(-col)).alias(f"d_{name}"))
    return changes.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)


def apply_agg_delta(
    mv: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    *,
    count_name: str = "n",
    sum_names: tuple[str, ...] = (),
    sum_type: str = "decimal(38,2)",
) -> DataFrame:
    """Merge aggregate deltas into the materialized view: existing
    groups adjust, brand-new groups appear, groups whose count reaches
    zero VANISH (exactly what the rebuild would produce — a group with
    no rows has no output row). Null-safe on the group keys, same as
    ``diff``. Sums are carried at ``sum_type`` so repeated refreshes
    cannot overflow the growing decimal precision of raw SUM output."""
    m = mv.withColumn("__in_mv", F.lit(True)).alias("m")
    d = delta.withColumn("__in_d", F.lit(True)).alias("d")
    cond = None
    for k in group_cols:
        eq = F.col(f"m.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = eq if cond is None else (cond & eq)
    joined = m.join(d, cond, "full_outer")
    keys = [
        F.coalesce(F.col(f"m.{k}"), F.col(f"d.{k}")).alias(k) for k in group_cols
    ]
    n = (
        F.coalesce(F.col(f"m.{count_name}"), F.lit(0))
        + F.coalesce(F.col(f"d.d_{count_name}"), F.lit(0))
    ).cast("long")
    zero = F.lit(0).cast(sum_type)
    sums = [
        (
            F.coalesce(F.col(f"m.{s}").cast(sum_type), zero)
            + F.coalesce(F.col(f"d.d_{s}").cast(sum_type), zero)
        )
        .cast(sum_type)
        .alias(s)
        for s in sum_names
    ]
    return (
        joined.select(*keys, n.alias(count_name), *sums)
        .filter(F.col(count_name) > 0)
    )

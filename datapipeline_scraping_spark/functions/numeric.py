"""Cross-engine-exact numeric aggregation helpers.

Summing doubles is order-dependent, and Spark's shuffle order is
nondeterministic — so any oracle comparison on a double SUM/AVG is
flaky by construction. The engine's convention: aggregate money-like
doubles through DECIMAL (exact, associative), then cast the final
result back to double. Both Spark and DuckDB produce bit-identical
results for the same decimal value, making the driver's value-hash
stable.

Scale note: decimal sum is still a partial (map-side) aggregate —
no extra shuffle versus a double sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dec(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.DecimalType(precision, scale))


# The exact decimal sum is funneled through DECIMAL(38,6) before the
# final double cast: DuckDB converts decimal->double as
# (double)int128 / 10^scale, which is EXACT only while the unscaled
# value stays under 2^53 — true at scale 6 for money-magnitude sums,
# false at scale 12 (observed 2-ulp drift vs Spark's correctly-rounded
# BigDecimal.doubleValue). Scale 6 keeps every source value exact
# (inputs carry <= 4 decimal places) and both engines' double casts
# correctly rounded => bit-identical.


def exact_sum(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """SUM through decimal, returned as double (cross-engine exact)."""
    return to_double(F.sum(dec(col, precision, scale)))


def to_double(dec_col: Column) -> Column:
    """Final decimal->double conversion via the DECIMAL(38,6) funnel."""
    return dec_col.cast(T.DecimalType(38, 6)).cast(T.DoubleType())


def exact_avg(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """AVG as (exact decimal sum as double) / count — deterministic
    double division of deterministic operands."""
    c = F.col(col) if isinstance(col, str) else col
    return to_double(F.sum(dec(c, precision, scale))) / F.count(c)


def sql_exact_sum(expr: str, precision: int = 18, scale: int = 4) -> str:
    """DuckDB rendering of :func:`exact_sum`."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale})))"
        f" AS DECIMAL(38,6)) AS DOUBLE)"
    )


def sql_to_double(expr: str) -> str:
    return f"CAST(CAST({expr} AS DECIMAL(38,6)) AS DOUBLE)"


def sql_exact_avg(expr: str, precision: int = 18, scale: int = 4) -> str:
    return f"{sql_exact_sum(expr, precision, scale)} / COUNT({expr})"

"""Skew mitigation — salted join.

First line of defense at scale is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py), which
splits oversized partitions at shuffle boundaries. Salting is the
structural fallback for the case AQE cannot fix: ONE join key so hot
that a single key's rows exceed an executor (AQE can split the
partition but every split still collides with the same build-side
row group on one reducer for sort-merge fallback cases, and storage
formats like bucketing pin the layout).

Salted equi-join: the probe side gets a deterministic salt in
[0, n_salt) derived from a high-cardinality column; the build side is
replicated n_salt times; the join key becomes (key, salt), spreading
each hot key over n_salt reducers. Result is exactly the plain join.

Cost model: build side grows n_salt×. Use only when the build side is
small relative to the hot key's row count — and prefer broadcast if it
fits (a broadcast join has no skew problem at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    salt_from: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left (probe/skewed) side salted.

    ``salt_from`` must name a left column that VARIES WITHIN a join
    key (a line number, an event id) — salting from the key itself
    would put every row of the hot key in one salt bucket and spread
    nothing. Hash-derived, so results are deterministic.

    Only ``inner`` and ``left`` joins are supported: replicating the
    build side ``n_salt`` times preserves plain-join semantics for
    those, but a right/full outer join would emit every unmatched
    build-side row ``n_salt`` times (once per replica)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the replicated build side would duplicate unmatched right rows "
            f"{n_salt}x under right/full outer semantics"
        )
    l = left.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salt)))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = l.join(r, on=[on, "__salt"], how=how)
    return out.drop("__salt")

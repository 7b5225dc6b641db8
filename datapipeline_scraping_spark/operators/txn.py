"""Transactional MERGE writer seam (SURVEY.md §7.3's planned swap).

The reference's sink is PostgreSQL ``INSERT ... ON CONFLICT (pk) DO
UPDATE`` (``src/storage.py:41-53``) — transactional per statement. The
engine's equivalent on a data lake is ``MERGE INTO`` on a
transactional table format (Delta Lake / Iceberg), which is safe under
concurrent writers; the non-transactional fallback is the verified
relational rewrite (:func:`..merge.merge_into`) plus an atomic
directory swap, safe for a single writer.

Availability in THIS container (probed 2026-08-13, see
``docs/DELTA_PROBE.md``): no ``delta`` Python module, no delta/iceberg
jar among pyspark's 286 bundled jars, and ``spark.jars.packages``
cannot resolve ``io.delta:delta-spark_2.13:4.0.0`` (no network route to
Maven: ``unresolved dependency ... not found`` after a 222 ms offline
resolve). ``merge_write(writer="auto")`` therefore selects the
fallback here; on a cluster with Delta on the classpath the same call
runs a real ``MERGE INTO`` with identical clause semantics.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession

from .merge import merge_into


def delta_available(spark: SparkSession | None = None) -> bool:
    """True iff the delta-spark Python binding AND its jar are usable.

    Probe only — no session mutation. Delta needs both the ``delta``
    Python package and the SQL extension jar on the JVM classpath; the
    jar check is done lazily via the py4j JVM view when a session is
    supplied (``DeltaTable.isDeltaTable`` would raise ClassNotFound)."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    if spark is not None:
        try:
            spark._jvm.io.delta.tables.DeltaTable  # noqa: B018
        except Exception:
            return False
    return True


def merge_write(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    pk: str,
    *,
    matched_delete: Column | None = None,
    matched_update: Column | None = None,
    writer: str = "auto",
) -> None:
    """MERGE ``source`` into the table stored at ``target_path``.

    writer="delta"   — Delta Lake ``MERGE INTO`` (transactional, safe
                       under concurrent writers); raises RuntimeError
                       when Delta is not on the classpath.
    writer="parquet" — :func:`merge_into` rewrite + write-new-then-swap
                       (atomic rename; single-writer safe, the
                       documented fallback in this container).
    writer="auto"    — delta when available, else parquet.

    Clause semantics are identical across both paths (NULL conditions
    do not fire; source-pk uniqueness is the caller's contract)."""
    if writer == "auto":
        writer = "delta" if delta_available(spark) else "parquet"
    if writer == "delta":
        if not delta_available(spark):
            raise RuntimeError(
                "writer='delta' requested but delta-spark is not usable in "
                "this environment (see docs/DELTA_PROBE.md); use "
                "writer='parquet' or 'auto'"
            )
        from delta.tables import DeltaTable  # pragma: no cover (no delta here)

        tgt = DeltaTable.forPath(spark, target_path)
        m = tgt.alias("t").merge(source.alias("s"), f"t.{pk} = s.{pk}")
        if matched_delete is not None:
            m = m.whenMatchedDelete(condition=matched_delete)
        if matched_update is not None:
            m = m.whenMatchedUpdateAll(condition=matched_update)
        else:
            m = m.whenMatchedUpdateAll()
        m.whenNotMatchedInsertAll().execute()
        return
    if writer != "parquet":
        raise ValueError(f"unknown writer {writer!r}")
    recover_swap(target_path)
    target = spark.read.parquet(target_path)
    result = merge_into(
        target,
        source,
        pk,
        matched_delete=matched_delete,
        matched_update=matched_update,
    )
    # write-new-then-swap: materialize the merge next to the target
    # (sibling path — same filesystem by construction, so os.rename can
    # never fail EXDEV), then swap directories. Each rename is atomic,
    # but the swap is TWO renames — a crash in the window between them
    # leaves target_path absent with the previous table preserved under
    # the __old_ suffix; :func:`recover_swap` (run automatically at the
    # start of the next merge_write) renames it back. A crash any
    # earlier leaves the live table untouched. This is the honest
    # ceiling of a plain-filesystem sink for a SINGLE writer; true
    # atomicity (and concurrent writers, and no swap window) is exactly
    # what the delta writer path provides — on object stores swap a
    # manifest/partition pointer instead.
    tmp = f"{target_path.rstrip('/')}__merge_{uuid.uuid4().hex[:8]}"
    result.write.mode("overwrite").parquet(tmp)
    old = f"{target_path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old)


def recover_swap(target_path: str) -> bool:
    """Repair a crash inside merge_write's two-rename swap window.

    If ``target_path`` is absent but a ``__old_`` snapshot of it exists
    (the only state the swap can strand), rename the snapshot back and
    return True. Orphaned ``__merge_`` staging dirs (crash before the
    first rename) and leftover ``__old_`` dirs next to a LIVE target
    (crash before the final rmtree) are deleted either way — the live
    table supersedes both."""
    base = target_path.rstrip("/")
    parent, name = os.path.split(base)
    try:
        siblings = os.listdir(parent or ".")
    except FileNotFoundError:
        return False
    olds = sorted(s for s in siblings if s.startswith(f"{name}__old_"))
    tmps = [s for s in siblings if s.startswith(f"{name}__merge_")]
    restored = False
    if not os.path.exists(base) and olds:
        os.rename(os.path.join(parent, olds[0]), base)
        olds = olds[1:]
        restored = True
    for leftover in olds + tmps:
        shutil.rmtree(os.path.join(parent, leftover), ignore_errors=True)
    return restored

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

import hashlib
import json
import os
import re
import shutil
import time
import uuid
from urllib.parse import unquote as _unquote

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .merge import merge_into


class ConcurrentWriteError(RuntimeError):
    """The table advanced past the version this commit was based on —
    the optimistic-concurrency conflict (re-read and retry, exactly
    like a Delta/Iceberg commit conflict)."""


class SnapshotExpiredError(FileNotFoundError):
    """The requested version existed but its snapshot directory was
    garbage-collected (it aged past the retention contract). Distinct
    from "no such version" so a time-travel caller can tell a typo'd
    version from an expired one — the same split Delta makes between
    `versionAsOf` out of range and `FileNotFoundException` on vacuumed
    data files."""


class ConstraintViolationError(ValueError):
    """A committed CHECK constraint evaluated FALSE for at least one
    row of the incoming snapshot — the commit is aborted and the
    staged files removed (Delta CHECK-constraint semantics: NULL
    satisfies, FALSE rejects the whole transaction)."""


class SchemaEvolutionError(ValueError):
    """The incoming schema would NARROW the committed table schema
    (dropped-column types cannot be restored, or a lossy type change
    like long -> int / double -> float). Widening — new columns,
    byte/short/int -> long, float -> double, int -> double — is
    applied automatically; narrowing must be an explicit
    ``schema_mode="replace"`` commit."""


class AuditFailedError(ValueError):
    """The write-audit-publish audit gate rejected the staged changes:
    at least one post-image row entering the main table failed the
    audit predicate. Nothing was published — the branch keeps the
    staged state for the caller to fix and re-publish."""


class PublishConflictError(RuntimeError):
    """:meth:`ManifestTable.publish_from` found keys changed by BOTH
    the branch and the main table since the branch was cut — a
    write-write conflict no automatic rebase can resolve safely.
    Deliberately NOT a :class:`ConcurrentWriteError`: retrying cannot
    fix it (the histories diverged); the caller must re-cut the
    branch or pass ``on_conflict="ours"`` to let the branch win."""


# lossless scalar widenings (Delta-style type widening, Spark 4 set):
# each maps a DataType.simpleString() -> the types it may widen INTO.
_WIDEN: dict[str, tuple[str, ...]] = {
    "tinyint": ("smallint", "int", "bigint", "double"),
    "smallint": ("int", "bigint", "double"),
    "int": ("bigint", "double"),
    "float": ("double",),
    "date": ("timestamp",),
}


def _widens(frm: T.DataType, to: T.DataType) -> bool:
    return to.simpleString() in _WIDEN.get(frm.simpleString(), ())


def evolve_schema(old: T.StructType, new: T.StructType) -> T.StructType:
    """Union-by-name of a committed table schema and an incoming
    commit's schema: old columns first (type-widened where the incoming
    side is wider), new-only columns appended. Raises
    :class:`SchemaEvolutionError` on any narrowing — a dropped column
    is fine (it stays, null-filled), but an incompatible or lossy type
    change is not."""
    new_by_name = {f.name: f for f in new.fields}
    fields: list[T.StructField] = []
    for f in old.fields:
        n = new_by_name.pop(f.name, None)
        if n is None or n.dataType == f.dataType:
            fields.append(f)
        elif _widens(f.dataType, n.dataType):
            fields.append(T.StructField(f.name, n.dataType, True))
        elif _widens(n.dataType, f.dataType):
            fields.append(f)  # incoming is narrower: cast UP on align
        else:
            raise SchemaEvolutionError(
                f"column {f.name!r}: committed type {f.dataType.simpleString()} "
                f"is incompatible with incoming {n.dataType.simpleString()} "
                f"(only {_WIDEN} widenings evolve; use schema_mode='replace' "
                f"to rewrite the table schema deliberately)"
            )
    fields.extend(new_by_name.values())
    return T.StructType(fields)


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` onto ``schema`` by name: missing columns become
    typed NULLs, narrower columns are cast up (the caller guarantees
    via :func:`evolve_schema` that every cast is lossless)."""
    have = {f.name for f in df.schema.fields}
    cols = [
        F.col(f.name).cast(f.dataType).alias(f.name)
        if f.name in have
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)


def _stat_scalar(v):
    """JSON-serializable form of a parquet footer statistic: numbers
    stay numeric, byte strings decode, temporal/decimal values become
    their ISO/str form (which compares correctly lexicographically for
    ISO dates/timestamps — the same normalization `_stat_overlaps`
    applies to the caller's bounds)."""
    if isinstance(v, bool) or v is None:
        return None  # booleans/absent: not useful skip keys
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, str):
        return v
    return str(v)  # date/datetime/Decimal


def _stat_overlaps(fmin, fmax, lo, hi) -> bool:
    """Conservative range-overlap test between a file's [fmin, fmax]
    and the query's [lo, hi] (either bound may be None = unbounded).
    Mixed/unknown kinds keep the file (never skip on uncertainty).

    String comparisons truncate BOTH sides to the shorter length and
    treat truncated-equal as overlap: a timestamp-backed date column
    records file stats like ``'1997-08-31 00:00:00'`` while the
    caller's bound is the bare date ``'1997-08-31'`` — a plain
    lexicographic compare would call the stat *greater* than the
    bound and wrongly SKIP a file whose min sits exactly on the
    window's hi edge (silently dropping qualifying rows). Prefix-
    equal means "same day, sub-day resolution unknown" — keep."""
    def norm(x):
        if x is None or isinstance(x, bool):
            # None min/max (r14: a stats entry may carry ONLY null
            # counts — [None, None, nulls, rows]) must never compare:
            # str(None) = 'None' would order against real bounds
            return None
        if isinstance(x, (int, float)):
            return (0, float(x))
        if isinstance(x, str):
            return (1, x)
        return (1, str(x))  # dates etc.: ISO strings compare correctly

    def lt(a, b) -> bool:
        # strictly-less under conservative string truncation
        if a[0] == 1:
            k = min(len(a[1]), len(b[1]))
            return a[1][:k] < b[1][:k]
        return a < b

    nmin, nmax = norm(fmin), norm(fmax)
    if nmin is None or nmax is None:
        return True
    if lo is not None:
        nlo = norm(lo)
        if nlo is None or nlo[0] != nmax[0]:
            return True
        if lt(nmax, nlo):
            return False
    if hi is not None:
        nhi = norm(hi)
        if nhi is None or nhi[0] != nmin[0]:
            return True
        if lt(nhi, nmin):
            return False
    return True


def collect_file_stats(
    path: str, cols: list[str], *, only: set | None = None
) -> dict:
    """Per-file ``[min, max, nulls, rows]`` for ``cols`` read from the
    parquet FOOTERS of every data file under ``path`` — no data scan;
    this is the commit-time stats pass Delta runs per file for data
    skipping. min/max and the null count prune independently: a footer
    lacking min/max for a column (all-null, or values too large to
    stat) still records ``[None, None, nulls, rows]`` so IS [NOT] NULL
    predicates can skip files on DATA columns, not just dir-encoded
    ones (r14 — VERDICT r13 item 3); a footer lacking null counts
    records the historical 2-element ``[min, max]`` (readers treat
    both shapes). Cost is one footer read per file — O(files) tiny
    metadata reads, the same order as the commit's own file listing.
    ``only`` restricts the walk to the given RELATIVE paths
    (incremental compaction re-stats only its newly written files;
    untouched files carry their old entries)."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for root, dirs, files in os.walk(path):
        # hidden sidecars (_dv / _cdf) are not data files
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(root, f)
            if only is not None and os.path.relpath(fp, path) not in only:
                continue
            try:
                md = pq.ParquetFile(fp).metadata
            except Exception:
                continue
            names = md.schema.names
            per: dict[str, list] = {}
            for c in cols:
                if c not in names:
                    continue
                ci = names.index(c)
                mins: list = []
                maxs: list = []
                ok = True
                nulls = 0
                have_nulls = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None:
                        ok = have_nulls = False
                        break
                    if st.has_min_max:
                        try:
                            mins.append(st.min)
                            maxs.append(st.max)
                        except Exception:
                            # pyarrow can't EXTRACT stats for some
                            # physical types (decimal) even when the
                            # footer has them — no min/max, but the
                            # null count below still stands
                            ok = False
                    else:
                        ok = False
                    if not st.has_null_count or st.null_count is None:
                        have_nulls = False
                    else:
                        nulls += st.null_count
                lo = hi = None
                if ok and mins:
                    lo = _stat_scalar(min(mins))
                    hi = _stat_scalar(max(maxs))
                    if lo is None or hi is None:
                        lo = hi = None
                if lo is not None or have_nulls:
                    ent: list = [lo, hi]
                    if have_nulls:
                        ent += [nulls, md.num_rows]
                    per[c] = ent
            out[os.path.relpath(fp, path)] = per
    return out


#: meta keys that describe ONE commit's own action (the epoch sink's
#: replay stamp, a DML's predicate, a restore/clone's provenance, an
#: ALTER's column) — everything else in meta is treated as a table
#: property and carried forward by derived-version writers.
_OPERATIONAL_META_KEYS = frozenset(
    {
        "epoch",
        "delete_predicate",
        "update_predicate",
        "restore_of",
        "clone_of",
        "renamed",
        "added_column",
        "dropped_column",
        "bin_pack",
    }
)


def _inherited_meta(entry: dict | None) -> dict:
    """The table-PROPERTY subset of a log entry's meta, for writers
    that derive a new version from ``entry`` (restore, clone, DML,
    ALTER). Operational keys are dropped instead of copied forward
    verbatim (ADVICE r9): re-attributing an epoch stamp or a stale
    delete/update predicate to a later unrelated commit corrupts
    ``history()`` provenance and — for ``epoch`` — can make
    ``last_applied_epoch`` report a REGRESSED value after restore,
    weakening the exactly-once sink's replay guard."""
    return {
        k: v
        for k, v in ((entry or {}).get("meta") or {}).items()
        if k not in _OPERATIONAL_META_KEYS
    }


def _bloom_params(n: int, fpp: float) -> tuple[int, int]:
    """Classic bloom sizing: bits m = -n ln p / (ln 2)^2, hashes
    k = (m/n) ln 2; m rounded up to a whole byte, both floored at
    sane minimums so degenerate inputs (empty file) stay valid."""
    import math

    n = max(1, int(n))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 7) // 8 * 8)
    k = max(1, int(round(m / n * math.log(2))))
    return m, min(k, 16)


def _bloom_positions(val: str, m: int, k: int) -> list[int]:
    """The k bit positions of ``val`` via double hashing over the two
    64-bit halves of md5(utf-8). md5 is engine-independent and stable
    across Python/JVM versions — build (executor-side) and probe
    (driver-side) both call THIS function, so there is no
    JVM-vs-Python hash-parity hazard. h2 is forced odd so the stride
    cycles the whole table."""
    import hashlib

    d = hashlib.md5(val.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % m for i in range(k)]


#: canonical probe encoding: must match Spark's CAST(col AS STRING)
#: for the column types the index supports (integral + string)
def _bloom_key(value) -> str:
    if isinstance(value, bool) or not isinstance(value, (int, str)):
        raise TypeError(
            f"bloom point lookup supports integral and string values "
            f"(got {type(value).__name__}): other types' Python str() "
            f"need not match Spark's CAST AS STRING"
        )
    return str(value)


def _write_bloom_sidecar(
    spark: SparkSession,
    staged_path: str,
    cols: list[str],
    fpp: float,
    *,
    files: list | None = None,
) -> None:
    """Build the per-(file, column) bloom sidecar for a freshly staged
    snapshot: one column-pruned scan per indexed column, grouped by
    ``input_file_name`` so each file's keys land in one Arrow batch
    group, where a vectorized-enough pandas kernel sets the bits over
    the file's DISTINCT keys. The sidecar is churn-free metadata
    (~1.2 bytes/key at fpp=1e-2): at 100 TB the index build is one
    extra scan of the indexed key columns only — the same cost Delta
    pays writing its bloom index — and probing is a driver-side
    sidecar read, no cluster job. ``files`` restricts the build to
    those data files (incremental compaction indexes only its newly
    written files; untouched files' rows carry forward)."""
    import pandas as pd

    staged_abs = os.path.abspath(staged_path)
    out_schema = "file string, col string, m long, k long, n long, bits binary"
    frames = []
    src = list(files) if files else [staged_path]
    for c in cols:
        keys = (
            spark.read.parquet(*src)
            .select(
                F.input_file_name().alias("__f"),
                F.col(c).cast("string").alias("__v"),
            )
            .where(F.col("__v").isNotNull())
        )

        def make_build(_c):
            # single-arg closure: a second parameter (even with a
            # default) makes applyInPandas pass (key, pdf) instead
            def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
                vals = pdf["__v"].unique()
                m, k = _bloom_params(len(vals), fpp)
                bits = bytearray(m // 8)
                for v in vals:
                    for pos in _bloom_positions(v, m, k):
                        bits[pos >> 3] |= 1 << (pos & 7)
                uri = pdf["__f"].iloc[0]
                path = uri.split("://")[-1] if "://" in uri else uri
                rel = os.path.relpath(path, staged_abs)
                return pd.DataFrame(
                    {
                        "file": [rel],
                        "col": [_c],
                        "m": [m],
                        "k": [k],
                        "n": [len(vals)],
                        "bits": [bytes(bits)],
                    }
                )

            return build

        frames.append(
            keys.groupBy("__f").applyInPandas(make_build(c), schema=out_schema)
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    out.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(staged_path, ManifestTable.BLOOM_DIR)
    )


def _phys_schema(entry: dict | None) -> "T.StructType | None":
    """The entry's committed schema in PHYSICAL column names (what the
    files actually carry), or None for legacy/adopted entries without
    a recorded schema."""
    if not entry or not entry.get("schema"):
        return None
    try:
        logical = T.StructType.fromJson(json.loads(entry["schema"]))
    except (ValueError, KeyError, TypeError):
        return None
    cmap = entry.get("column_map") or {}
    return T.StructType(
        [
            T.StructField(cmap.get(f.name, f.name), f.dataType, f.nullable)
            for f in logical.fields
        ]
    )


def _snap_read(spark: SparkSession, path, entry: dict | None) -> DataFrame:
    """Raw snapshot scan with the DECLARED physical schema. Inference
    picks one file's footer, which is wrong once a snapshot legally
    mixes schemas — append-committed files carry columns the
    hardlinked base files lack (metadata-only ADD + append) — and the
    declared read also skips the footer-sampling job. Falls back to
    inference only for legacy entries with no recorded schema.

    An EVOLVED snapshot (``specs`` in the entry — partition evolution)
    scans each spec's subtree separately and unions: every spec dir is
    a self-consistent hive layout, the declared schema reconstructs
    that spec's partition columns from its directory names (all other
    columns live in the files), and Catalyst distributes any filter
    across the union so a predicate on a given column becomes a
    PARTITION filter on the specs that dir-encode it and a pushed
    data filter (min/max skippable) everywhere else — Iceberg's
    spec-at-a-time scan, as a DataFrame union."""
    sch = _phys_schema(entry)
    specs = _entry_specs(entry)
    if specs:
        if sch is None:
            raise ValueError(
                f"{path}: evolved snapshot without a declared schema — "
                f"the per-spec scans cannot reconstruct one shape"
            )
        names = [f.name for f in sch.fields]
        frames = []
        for sp in sorted(specs, key=lambda s: int(s["id"])):
            sd = os.path.join(path, _spec_dirname(sp["id"]))
            # a spec dir may be absent (created by evolve_partition but
            # never appended to, then not re-created by a hardlink
            # staging walk) — it contributes zero rows
            if not os.path.isdir(sd):
                continue
            # hive scans surface partition columns LAST regardless of
            # the declared order; re-select so every spec's frame has
            # one column order before the union
            frames.append(spark.read.schema(sch).parquet(sd).select(*names))
        if not frames:
            return spark.createDataFrame([], sch)
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        return out
    reader = spark.read.schema(sch) if sch is not None else spark.read
    return reader.parquet(path)


def _apply_map(df: DataFrame, entry: dict | None) -> DataFrame:
    """Rename PHYSICAL parquet column names to the entry's LOGICAL
    names (``column_map``: logical -> physical, non-identity pairs
    only) and project away DROPPED physical columns (``dropped``) —
    the read half of metadata-only RENAME and DROP COLUMN (Delta
    column mapping ``name`` mode). A no-op for tables never renamed
    or dropped from."""
    # drop BEFORE rename: both lists hold PHYSICAL names and are
    # disjoint, but a later rename (or metadata-only ADD) may reuse a
    # dropped column's name as its new LOGICAL name — the stale
    # physical column must be gone before that name lands, or the two
    # would collide (for ADD, the stale bytes would silently
    # resurrect as the new column's values).
    dropped = (entry or {}).get("dropped")
    if dropped:
        df = df.drop(*[c for c in dropped if c in df.columns])
    cmap = (entry or {}).get("column_map")
    if cmap:
        df = df.withColumnsRenamed(
            {phys: logi for logi, phys in cmap.items()}
        )
    # metadata-only ADD COLUMN: the entry schema carries fields the
    # hardlinked files don't — null-fill them with their declared type
    # (parquet-declared reads and the Arrow data source do the same
    # fill natively; this is the plain-DataFrame read's half).
    if (entry or {}).get("added"):
        schema = T.StructType.fromJson(json.loads(entry["schema"]))
        for f in schema.fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        df = df.select(*[f.name for f in schema.fields])
    return df


def _diff_frames(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Change rows between two table states — the join :meth:`
    ManifestTable.diff` documents; shared by commit-time CDF
    materialization so the persisted feed and the lazy diff are the
    same computation by construction."""
    if old.columns != new.columns:
        # align by name so schema evolution between the versions
        # diffs as value changes (added columns: null pre-image)
        unioned = evolve_schema(old.schema, new.schema)
        old = align_to_schema(old, unioned)
        new = align_to_schema(new, unioned)
    cols = old.columns
    vals = [c for c in cols if c not in keys]
    # presence markers instead of key-null checks: NULL key values
    # then diff as ordinary (null-safe-matched) rows instead of
    # being misclassified as inserts/deletes
    o = old.withColumn("__in_old", F.lit(True)).alias("o")
    n = new.withColumn("__in_new", F.lit(True)).alias("n")
    cond = None
    for k in keys:
        eq = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    row_o = F.struct(*[F.col(f"o.{c}").alias(c) for c in cols])
    row_n = F.struct(*[F.col(f"n.{c}").alias(c) for c in cols])
    changed = F.lit(False)
    for c in vals:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    mk = lambda tag, row: F.struct(  # noqa: E731
        F.lit(tag).alias("_change_type"), row.alias("r")
    )
    # typed empty array for the unchanged branch (F.array() alone
    # is array<null> and would fail the union of branch types)
    empty = F.slice(F.array(mk("x", row_o)), 1, 0)
    cases = (
        F.when(F.col("o.__in_old").isNull(), F.array(mk("insert", row_n)))
        .when(F.col("n.__in_new").isNull(), F.array(mk("delete", row_o)))
        .when(
            changed,
            F.array(
                mk("update_preimage", row_o),
                mk("update_postimage", row_n),
            ),
        )
        .otherwise(empty)
    )
    return (
        joined.select(F.explode(cases).alias("c"))
        .select(F.col("c._change_type").alias("_change_type"), "c.r.*")
    )


def _location_matches(spark: SparkSession, name: str, snap: str) -> bool:
    """True iff catalog table ``name``'s LOCATION resolves to ``snap``
    (stale-entry guard for clustered-snapshot adoption)."""
    try:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        loc = next(
            (r["data_type"] for r in rows if r["col_name"] == "Location"),
            None,
        )
        if loc is None:
            return False
        return os.path.realpath(re.sub(r"^file:", "", loc)) == os.path.realpath(
            snap
        )
    except Exception:
        return False


# Spark's bucket-file name contract lives in ONE place
# (functions/bucket_hash.py) so the layout validation here and the
# SQL reader's bucket pruning can never disagree about what counts as
# a bucket file — the contract every clustered commit/append/
# compaction must preserve
from ..functions.bucket_hash import file_bucket_id as _bucket_id  # noqa: E402


def _write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    bucket_col: str,
    n_buckets: int,
    sort_col: str,
    dest: str,
) -> None:
    """Write ``df`` hash-bucketed into ``dest`` via Spark's own
    bucketed writer, staged through a throwaway EXTERNAL catalog entry
    (dropping it is metadata-only; the files stay). The frame is
    pre-``repartition(n, col)`` so each write task holds exactly one
    bucket's rows — ``repartition``'s hash partitioner and the bucket
    id function are the same ``pmod(murmur3, n)``, so the output is
    at most ONE file per bucket, which is what lets the catalog scan
    claim per-bucket SORT ordering (Spark drops the sorted property
    whenever a bucket spans multiple files)."""
    stg_db = "dps_manifest_staging"
    stg_tbl = f"{stg_db}.stg_{uuid.uuid4().hex[:12]}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {stg_db}")
    try:
        (
            df.repartition(n_buckets, F.col(bucket_col))
            .write.bucketBy(n_buckets, bucket_col)
            .sortBy(sort_col)
            .format("parquet")
            .mode("overwrite")
            .option("path", dest)
            .saveAsTable(stg_tbl)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {stg_tbl}")


def _link_tree(src: str, dst: str, *, skip_top: tuple[str, ...] = ()) -> None:
    """Hardlink ``src``'s tree under ``dst`` (copy where the filesystem
    refuses links) — the metadata-only snapshot duplication RESTORE and
    merge-on-read DELETE share: zero data bytes move, and GC stays safe
    because removing either directory only drops inode refcounts.
    ``skip_top`` names top-level entries of ``src`` to leave out."""
    for d, dirs, files in os.walk(src):
        rel = os.path.relpath(d, src)
        if rel == ".":
            dirs[:] = [x for x in dirs if x not in skip_top]
            files = [x for x in files if x not in skip_top]
        dst_dir = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(dst_dir, exist_ok=True)
        for f in files:
            sp, dp = os.path.join(d, f), os.path.join(dst_dir, f)
            try:
                os.link(sp, dp)
            except OSError:
                shutil.copy2(sp, dp)


def _refuse_clustered(root: str, entry: dict | None, hint: str) -> None:
    """Shared loud refusal for operations that would silently break a
    CLUSTERED snapshot's bucket contract (metadata-only column changes
    do not propagate through the bucketed catalog scan; flat external
    parts break the bucket-id file names). ``hint`` names the escape
    hatch."""
    if (entry or {}).get("bucket"):
        raise ValueError(
            f"{root}: the live snapshot is CLUSTERED (commit_clustered "
            f"bucket layout) — {hint}"
        )


def _spec_dirname(spec_id) -> str:
    """Directory name a partition spec's files live under inside an
    EVOLVED snapshot (``spec-<id>/``). Deliberately NOT ``spec=<id>``:
    a key=value segment would make Spark's partition discovery claim
    ``spec`` as a partition column, and a naive ``spark.read.parquet``
    over a mixed-spec snapshot must fail loudly
    (CONFLICTING_DIRECTORY_STRUCTURES) instead of inventing columns —
    evolved snapshots are only readable through the spec-aware paths."""
    return f"spec-{int(spec_id)}"


def _entry_specs(entry: dict | None) -> "list[dict] | None":
    """The commit entry's partition-spec history (``specs``: one
    ``{"id", "partition_by"}`` per spec, Iceberg's partition-spec
    list) — or None for never-evolved tables, whose data files live
    directly under the snapshot root."""
    sp = (entry or {}).get("specs")
    return [dict(s) for s in sp] if sp else None


def _current_spec(specs: "list[dict]") -> dict:
    """The ACTIVE spec (highest id) — new appends write under it."""
    return max(specs, key=lambda s: int(s["id"]))


def _spec_partition_cols(entry: dict | None) -> set:
    """Every column that is a partition column under ANY spec of the
    entry (current layout included) — the set whose members cannot be
    renamed/dropped metadata-only, because some snapshot files encode
    them as physical ``col=value`` directory names."""
    cols = set((entry or {}).get("partition_by") or [])
    for s in _entry_specs(entry) or []:
        cols.update(s.get("partition_by") or [])
    return cols


class ManifestTable:
    """Snapshot-pointer table: atomic commits on a plain filesystem.

    Layout under ``root``::

        CURRENT              pointer file: "<snapshot dirname>\\n<version>"
        COMMIT_LOCK          held (O_EXCL) only for the pointer update
        snap-<ver>-<uuid>/   immutable parquet snapshot directories

    Commit = write a NEW snapshot dir (long, unlocked, invisible), then
    swap the pointer with one atomic ``os.replace`` under a short
    lock.  There is no window where the table is absent (the two-rename
    swap this replaces had one), readers always resolve a complete
    snapshot, and two concurrent writers cannot corrupt state: each
    writes its own snapshot dir, the pointer CAS serializes them, and a
    committer may pass ``expect_version`` to get a
    :class:`ConcurrentWriteError` instead of last-writer-wins.

    This is the filesystem analogue of the atomicity the reference gets
    from Postgres ``ON CONFLICT`` (``src/storage.py:41-53``), and the
    same snapshot+pointer shape Delta/Iceberg use (a manifest commit,
    minus time travel).  On an object store without atomic rename, the
    pointer would live in a CAS-capable store (DynamoDB-style, as
    Delta's S3 commit service does) — the seam is this class.

    A crashed writer can strand the lock; locks older than
    ``stale_lock_sec`` are broken on acquire (a pointer update takes
    milliseconds, so minutes-old locks are dead writers).  Staging
    directories use the SEPARATE, much larger ``staging_ttl_sec``:
    a snapshot write is long and deliberately unlocked, and its dir
    mtime stays at creation until the job commits, so judging it by
    the millisecond-scale lock TTL would rmtree a live concurrent
    writer's half-written snapshot (spurious failure, and in a narrow
    interleaving with the Hadoop committer a torn snapshot).  Size
    ``staging_ttl_sec`` above the longest plausible snapshot write.

    **Version log + time travel (VERDICT r7 item 2).** Each commit
    also writes ``_log/<version>.json`` (snapshot dirname, commit
    timestamp, partitioning, schema) inside the lock, BEFORE the
    pointer swap — a crash in between leaves an unpointed intent entry
    that the retried commit (same version number) atomically
    overwrites. ``read(spark, version=N)`` / ``snapshot_path(N)``
    resolve any retained version, so a long-running reader pins the
    snapshot it resolved instead of racing GC.

    **Retention contract.** GC drops a snapshot only when it is BOTH
    beyond the ``keep_snapshots`` count AND older than
    ``retention_sec`` since it was SUPERSEDED by the next commit
    (default 24 h) — Delta's ``deletedFileRetentionDuration`` shape,
    which measures from when a file stops being part of the table,
    not from when it was written. A reader that resolves any
    snapshot — live or time-traveled — therefore keeps its files for
    at least ``retention_sec`` after that snapshot stops being
    current, even when the snapshot was LIVE far longer than the
    retention window (the slow-cadence-ledger case: weekly commits,
    24 h retention — VERDICT r8 item 1); ``retention_sec=0`` restores
    pure count-based GC for scratch tables."""

    POINTER = "CURRENT"
    LOCK = "COMMIT_LOCK"
    LOG_DIR = "_log"
    #: deletion-vector sidecar dir INSIDE a snapshot: underscore-
    #: prefixed so Hadoop/Spark parquet listing treats it as hidden
    DV_DIR = "_dv"
    #: change-data-feed sidecar dir INSIDE a snapshot (same hidden
    #: convention): the version's change rows, written at commit time
    CDF_DIR = "_cdf"
    #: merge-on-read update delta dir INSIDE a snapshot: the CURRENT
    #: post-image rows of every key updated since the last rewrite
    UPD_DIR = "_upd"
    #: per-file bloom-filter sidecar dir INSIDE a snapshot (hidden
    #: convention): one bloom per (data file, indexed column), built at
    #: commit time — Delta's bloom filter index, for point-lookup file
    #: skipping on high-cardinality columns where [min,max] stats
    #: cannot prune (an unsorted id column's per-file range covers
    #: nearly the whole domain)
    BLOOM_DIR = "_bloom"

    def __init__(
        self,
        root: str,
        *,
        stale_lock_sec: float = 300.0,
        staging_ttl_sec: float = 6 * 3600.0,
        retention_sec: float = 24 * 3600.0,
    ) -> None:
        self.root = root.rstrip("/")
        self.stale_lock_sec = stale_lock_sec
        self.staging_ttl_sec = staging_ttl_sec
        self.retention_sec = retention_sec
        #: snapshot dirname of this instance's most recent successful
        #: commit — lets callers measure exactly the snapshot THEY
        #: committed instead of re-resolving a pointer a racing writer
        #: may have advanced (ADVICE r6: compact_table stats race)
        self.last_snapshot: str | None = None

    # -- resolution --------------------------------------------------------
    def exists(self) -> bool:
        return os.path.isfile(os.path.join(self.root, self.POINTER))

    def _pointer(self) -> tuple[str, int] | None:
        try:
            with open(os.path.join(self.root, self.POINTER)) as fh:
                snap, ver = fh.read().splitlines()[:2]
            return snap, int(ver)
        except (FileNotFoundError, ValueError, IndexError):
            return None

    def version(self) -> int | None:
        ptr = self._pointer()
        return None if ptr is None else ptr[1]

    # -- version log -------------------------------------------------------
    def _log_path(self, version: int) -> str:
        return os.path.join(self.root, self.LOG_DIR, f"{version:08d}.json")

    def _log_entry(self, version: int) -> dict | None:
        try:
            with open(self._log_path(version)) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def _write_log(
        self,
        version: int,
        snap: str,
        partition_by: list[str],
        schema_json: str,
        *,
        meta: dict | None = None,
        stats_cols: list[str] | None = None,
        file_stats: dict | None = None,
        checks: dict | None = None,
        dv: dict | None = None,
        cdf: dict | None = None,
        column_map: dict | None = None,
        mor_delta: dict | None = None,
        dropped: list[str] | None = None,
        added: list[str] | None = None,
        bloom: dict | None = None,
        bucket: dict | None = None,
        specs: list | None = None,
    ) -> None:
        """Write the commit's log entry atomically (tmp + replace).
        Called inside the commit lock BEFORE the pointer swap; a crash
        between the two leaves an unpointed intent that the retried
        commit — which reuses the version number — overwrites.
        ``meta`` rides the entry ATOMICALLY with the commit (unlike a
        post-hoc :meth:`annotate`, there is no window where the commit
        exists without it — the exactly-once epoch sink's idempotence
        guard depends on that). ``file_stats`` is the per-file min/max
        map for ``stats_cols`` (data skipping, Delta-style)."""
        os.makedirs(os.path.join(self.root, self.LOG_DIR), exist_ok=True)
        entry = {
            "version": version,
            "snapshot": snap,
            "ts": time.time(),
            "partition_by": partition_by,
            "schema": schema_json,
        }
        if meta:
            entry["meta"] = dict(meta)
        if stats_cols is not None:
            entry["stats_cols"] = list(stats_cols)
        if file_stats is not None:
            entry["file_stats"] = file_stats
        if checks:
            entry["checks"] = dict(checks)
        if dv:
            entry["dv"] = dict(dv)
        if cdf:
            entry["cdf"] = dict(cdf)
        if column_map:
            entry["column_map"] = dict(column_map)
        if mor_delta:
            entry["mor_delta"] = dict(mor_delta)
        if dropped:
            entry["dropped"] = list(dropped)
        if added:
            entry["added"] = list(added)
        if bloom:
            entry["bloom"] = dict(bloom)
        if bucket:
            entry["bucket"] = dict(bucket)
        if specs:
            entry["specs"] = [dict(s) for s in specs]
        tmp = f"{self._log_path(version)}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        os.replace(tmp, self._log_path(version))

    def annotate(self, version: int, **meta) -> bool:
        """Attach operation metrics / free-form metadata to a commit's
        log entry (Delta records ``operationMetrics`` in its commit log
        the same way). Typical use: a writer harvests row counts from
        an :class:`pyspark.sql.Observation` riding the commit's write
        job, then annotates the commit so later readers (e.g. a
        crash-resumed pipeline) get the stats without re-scanning the
        snapshot — ``history()`` / ``_log_entry`` expose them under
        ``"meta"``. Returns False if the version has no log entry
        (nothing to annotate).

        The read-modify-write runs under COMMIT_LOCK (ADVICE r8): two
        concurrent annotates on the same version would otherwise lose
        one side's update, and an unlocked ``os.replace`` racing a
        retried commit's ``_write_log`` could resurrect a superseded
        entry. The lock hold is one tiny json rewrite — milliseconds,
        same order as the pointer swap it already serializes."""
        self._acquire_lock()
        try:
            entry = self._log_entry(version)
            if entry is None:
                return False
            entry.setdefault("meta", {}).update(meta)
            tmp = f"{self._log_path(version)}.tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                json.dump(entry, fh)
            os.replace(tmp, self._log_path(version))
            return True
        finally:
            self._release_lock()

    def commit_meta(self, version: int) -> dict:
        """The ``annotate``-d metadata of a commit (empty if none)."""
        entry = self._log_entry(version)
        return dict(entry.get("meta") or {}) if entry else {}

    def history(self) -> list[dict]:
        """COMMITTED log entries, newest first; each row carries
        version / snapshot dirname / commit ts / partitioning and
        whether the snapshot is still readable (not GC'd). An entry
        whose version is beyond the live pointer is a crashed writer's
        unpointed INTENT (the log is written before the pointer swap)
        — it never committed, so it is not history and is filtered
        out, exactly as :meth:`snapshot_path` refuses to resolve it."""
        ptr = self._pointer()
        live = ptr[1] if ptr else 0
        logdir = os.path.join(self.root, self.LOG_DIR)
        try:
            names = sorted(os.listdir(logdir), reverse=True)
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            if not n.endswith(".json"):
                continue
            try:
                with open(os.path.join(logdir, n)) as fh:
                    e = json.load(fh)
            except (OSError, ValueError):
                continue
            if int(e.get("version", 0)) > live:
                continue  # unpointed intent, not a commit
            e["retained"] = os.path.isdir(os.path.join(self.root, e["snapshot"]))
            e.pop("schema", None)
            e.pop("file_stats", None)  # bulky; fetch via _log_entry
            out.append(e)
        return out

    def snapshot_path(self, version: int | None = None) -> str | None:
        """Absolute snapshot directory of the current pointer, or —
        time travel — of an explicit retained ``version``."""
        ptr = self._pointer()
        if version is None or (ptr is not None and version == ptr[1]):
            # the pointer is authoritative for the live version (a log
            # entry can be a stale unpointed intent after a crash)
            return None if ptr is None else os.path.join(self.root, ptr[0])
        if ptr is None or version > ptr[1]:
            # beyond the live pointer = a crashed writer's unpointed
            # intent (log precedes the pointer swap): that snapshot
            # never COMMITTED — resolving it would read uncommitted
            # data that the writer's retry is about to overwrite
            raise FileNotFoundError(
                f"{self.root}: no committed version {version} "
                f"(live version: {None if ptr is None else ptr[1]})"
            )
        entry = self._log_entry(version)
        if entry is None:
            raise FileNotFoundError(
                f"{self.root}: no version {version} in the commit log "
                f"(live version: {None if ptr is None else ptr[1]})"
            )
        path = os.path.join(self.root, entry["snapshot"])
        if not os.path.isdir(path):
            raise SnapshotExpiredError(
                f"{self.root}: version {version} aged past the retention "
                f"contract and its snapshot was garbage-collected "
                f"(retention_sec={self.retention_sec}, committed at "
                f"ts={entry.get('ts')})"
            )
        return path

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the current snapshot, or time-travel to a retained
        ``version``. The returned scan is PINNED to the resolved
        snapshot directory — a writer advancing the pointer mid-scan
        cannot redirect it, and the retention contract keeps the files
        alive for ``retention_sec`` after the commit. A merge-on-read
        deletion vector (:meth:`delete_where`) recorded for the
        resolved version is applied automatically."""
        if version is None:
            # resolve the pointer ONCE: the snapshot scanned and the
            # log entry consulted for the deletion vector must belong
            # to the same version even if a writer races this read
            ptr = self._pointer()
            if ptr is None:
                raise FileNotFoundError(
                    f"no committed snapshot under {self.root}"
                )
            snap_name, version = ptr
            path = os.path.join(self.root, snap_name)
        else:
            path = self.snapshot_path(version)
            if path is None:
                raise FileNotFoundError(
                    f"no committed snapshot under {self.root}"
                )
        entry = self._log_entry(version)
        return self._apply_dv(
            spark, _apply_map(_snap_read(spark, path, entry), entry), entry, path
        )

    #: DV key-count ceiling for FORCING a broadcast anti-join on the
    #: clustered read path (exchange-free joins depend on the anti-join
    #: being a post-scan filter); beyond it, AQE decides — a DV this
    #: large means compaction is overdue anyway.
    DV_BROADCAST_KEYS = 4_000_000

    def _apply_dv(
        self,
        spark: SparkSession,
        df: DataFrame,
        entry: dict | None,
        snap_path: str,
        *,
        prefer_broadcast: bool = False,
    ) -> DataFrame:
        """Finish a raw data-file scan into the snapshot's VISIBLE
        state: apply the merge-on-read deletion vector (one left-anti
        equi-join on the declared key columns against the ``_dv/``
        sidecar), then union the merge-on-read update delta (the
        ``_upd/`` post-image rows — :meth:`update_where` — which are
        post-vector BY CONSTRUCTION and must never be anti-joined).
        Both sidecars live INSIDE the snapshot dir, underscore-
        prefixed so plain parquet listing never sees them as data;
        both are churn-sized, so AQE broadcasts the anti-join build
        side and the union adds no shuffle. ``prefer_broadcast``
        (the clustered read path) FORCES the broadcast for churn-sized
        vectors so the anti-join is provably a post-scan filter and
        the scan's HashPartitioning survives into joins."""
        dv = (entry or {}).get("dv")
        if dv:
            keys = spark.read.parquet(os.path.join(snap_path, self.DV_DIR))
            if prefer_broadcast and (
                dv.get("n_keys", 0) <= self.DV_BROADCAST_KEYS
            ):
                keys = F.broadcast(keys)
            df = df.join(keys, on=list(dv["key_cols"]), how="left_anti")
        if (entry or {}).get("mor_delta"):
            df = df.unionByName(
                _apply_map(
                    spark.read.parquet(
                        os.path.join(snap_path, self.UPD_DIR)
                    ),
                    entry,
                )
            )
        return df

    def diff(
        self,
        spark: SparkSession,
        v_from: int,
        v_to: int,
        keys: list[str],
    ) -> DataFrame:
        """Change-data-feed between two retained versions (Delta CDF
        shape): one full-outer join of the two pinned snapshots on
        ``keys`` producing ``_change_type`` rows — ``insert`` (key only
        in ``v_to``, post-image values), ``delete`` (key only in
        ``v_from``, pre-image values), and for value changes BOTH an
        ``update_preimage`` and an ``update_postimage`` row; unchanged
        keys emit nothing. Comparison is null-safe per column.

        Scale shape: one keyed shuffle join of two snapshots; the
        per-key change rows are built as an array and exploded in the
        same stage, so the join output is traversed once. This is the
        batch reconciliation primitive incremental consumers (q95/q106
        shape) use to catch up from version N to the head without
        re-reading the whole table."""
        return _diff_frames(
            self.read(spark, version=v_from),
            self.read(spark, version=v_to),
            keys,
        )

    def read_asof(self, spark: SparkSession, ts: float) -> DataFrame:
        """Time travel by timestamp: the newest version whose commit
        time is <= ``ts`` (Delta's ``timestampAsOf``). If that version
        was garbage-collected, this RAISES
        :class:`SnapshotExpiredError` — silently falling back to an
        older retained version would return state that was never
        current at ``ts``-adjacent times the caller asked about."""
        for e in self.history():  # newest-first
            if e.get("ts", float("inf")) <= ts:
                if not e["retained"]:
                    raise SnapshotExpiredError(
                        f"{self.root}: version {e['version']} is the "
                        f"as-of state for ts={ts} but aged past the "
                        f"retention contract and was garbage-collected"
                    )
                return self.read(spark, version=e["version"])
        raise FileNotFoundError(
            f"{self.root}: no commit at or before ts={ts}"
        )

    def restore(
        self,
        version: int,
        *,
        expect_version: int | None = None,
        keep_snapshots: int = 2,
    ) -> int:
        """Roll the table back to ``version`` as a NEW commit — Delta
        ``RESTORE TABLE ... TO VERSION AS OF``: history is preserved
        (the bad commits stay inspectable / re-restorable), readers
        see the rollback atomically via the same pointer swap as any
        writer, and concurrent commits are serialized by the same
        lock + optional ``expect_version`` CAS.

        METADATA-ONLY: the restored snapshot's files are HARDLINKED
        from the source snapshot (falling back to copy where the
        filesystem refuses), so restoring a 100 TB table moves zero
        data bytes — exactly Delta's trick of re-listing the old
        version's files in a new commit rather than rewriting them.
        GC stays safe under links: removing the source snapshot's
        directory only drops an inode refcount; the restored
        snapshot's links keep the bytes alive. The new log entry
        carries the source entry's schema, layout, stats, and CHECK
        constraints forward, plus ``meta.restore_of``.

        Raises :class:`SnapshotExpiredError` if ``version``'s files
        were already GC'd (same contract as ``read(version=)``), and
        :class:`ConcurrentWriteError` on a CAS miss."""
        entry = self._log_entry(version)
        if entry is None:
            raise FileNotFoundError(
                f"{self.root}: no commit log entry for version {version}"
            )
        src = os.path.join(self.root, entry["snapshot"])
        if not os.path.isdir(src):
            raise SnapshotExpiredError(
                f"{self.root}: version {version} snapshot was garbage-"
                f"collected; restore needs its files (raise retention)"
            )
        staged = os.path.join(
            self.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        try:
            # the source's _cdf holds ITS version's change rows — a
            # restore is a new version whose changes (an un-diffed
            # rollback) are deliberately NOT materialized: the entry
            # below carries a `break` marker so feed readers fail
            # loudly instead of replaying the source's old changes
            _link_tree(src, staged, skip_top=(self.CDF_DIR,))
        except FileNotFoundError as exc:
            shutil.rmtree(staged, ignore_errors=True)
            raise SnapshotExpiredError(
                f"{self.root}: version {version} snapshot vanished during "
                f"restore (concurrent GC) — retry or raise retention"
            ) from exc
        committed_ver: int | None = None
        self._acquire_lock()
        try:
            ptr = self._pointer()
            cur_ver = 0 if ptr is None else ptr[1]
            if expect_version is not None and cur_ver != expect_version:
                raise ConcurrentWriteError(
                    f"{self.root}: version {cur_ver} != expected "
                    f"{expect_version}"
                )
            new_ver = cur_ver + 1
            snap = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(self.root, snap))
            staged = os.path.join(self.root, snap)  # for error cleanup
            self._write_log(
                new_ver,
                snap,
                list(entry.get("partition_by") or []),
                entry.get("schema"),
                meta={**_inherited_meta(entry), "restore_of": version},
                stats_cols=entry.get("stats_cols"),
                file_stats=entry.get("file_stats"),
                checks=entry.get("checks"),
                dv=entry.get("dv"),  # restored files include its _dv
                # a clustered version restores AS clustered: the
                # hardlinked files keep their bucket-id names, so the
                # spec must ride the new entry or read_clustered would
                # refuse the rolled-back head (r12 — rollback after a
                # bad clustered DML is the natural restore flow)
                bucket=entry.get("bucket"),
                cdf=(
                    {
                        "key_cols": list(entry["cdf"]["key_cols"]),
                        "break": True,
                    }
                    if entry.get("cdf")
                    else None
                ),
                column_map=entry.get("column_map"),
                mor_delta=entry.get("mor_delta"),
                dropped=entry.get("dropped"),
                added=entry.get("added"),
                bloom=entry.get("bloom"),
                # an evolved version restores WITH its spec history
                # (the hardlinked tree keeps its spec-<id> subdirs)
                specs=entry.get("specs"),
            )
            tmp_ptr = os.path.join(self.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
            self.last_snapshot = snap
            committed_ver = new_ver
        finally:
            self._release_lock()
            if committed_ver is None:
                shutil.rmtree(staged, ignore_errors=True)
        self._gc(keep=keep_snapshots)
        return committed_ver

    def drop(self) -> bool:
        """Delete this table entirely — pointer, commit log, and every
        snapshot directory. The branch-root lifecycle tail of the
        write-audit-publish loop (VERDICT r10 item 6): without it each
        crawl batch leaks one branch root forever. Safe after a
        publish: :meth:`publish_from`'s fast path HARDLINKS the branch
        snapshot into main, so removing the branch's directory entries
        only drops link counts — main's adopted snapshot keeps its
        inodes and stays fully readable. Returns True if the root
        existed. Destructive by design; an un-published branch's
        changes are gone."""
        existed = os.path.isdir(self.root)
        shutil.rmtree(self.root, ignore_errors=True)
        self.last_snapshot = None
        return existed

    def clone_to(
        self,
        dest_root: str,
        *,
        version: int | None = None,
        retention_sec: float | None = None,
    ) -> "ManifestTable":
        """Zero-copy table clone — Delta ``CLONE`` with deep-clone
        SEMANTICS at shallow-clone COST: the destination's version-1
        snapshot is HARDLINKED from the source snapshot (falling back
        to copy where the filesystem refuses), so cloning a 100 TB
        table moves zero data bytes, yet the clone owns its inode
        refcounts — the source can be GC'd, restored, or dropped
        without dangling the clone (the hazard Delta's path-referencing
        shallow clone carries). Writes to either table never affect
        the other: snapshots are immutable, and each root has its own
        pointer, lock, log, and GC lifecycle.

        ``version`` pins the source version to clone (default: head).
        The clone's log entry carries the source entry's schema,
        layout, stats, CHECK constraints, DV, column map, and MoR
        delta forward (reads through the clone see exactly the pinned
        source version's visible state), plus ``meta.clone_of``; the
        source's change feed is NOT carried — the clone starts its own
        history (a ``break`` marker makes a feed reader fail loudly
        rather than replay the source's changes).

        Refuses to clobber: raises ``FileExistsError`` if ``dest_root``
        already has a committed pointer. Raises
        :class:`SnapshotExpiredError` if the pinned version's files
        were already GC'd (same contract as ``read(version=)``)."""
        ptr = self._pointer()
        if version is None:
            if ptr is None:
                raise FileNotFoundError(
                    f"no committed snapshot under {self.root}"
                )
            version = ptr[1]
        entry = self._log_entry(version)
        if entry is None:
            raise FileNotFoundError(
                f"{self.root}: no commit log entry for version {version}"
            )
        src = os.path.join(self.root, entry["snapshot"])
        if not os.path.isdir(src):
            raise SnapshotExpiredError(
                f"{self.root}: version {version} snapshot was garbage-"
                f"collected; clone needs its files (raise retention)"
            )
        dest = ManifestTable(
            dest_root,
            stale_lock_sec=self.stale_lock_sec,
            staging_ttl_sec=self.staging_ttl_sec,
            retention_sec=(
                self.retention_sec if retention_sec is None else retention_sec
            ),
        )
        if dest.exists():
            raise FileExistsError(
                f"{dest.root}: already a committed table — refusing to "
                f"clone over it"
            )
        os.makedirs(dest.root, exist_ok=True)
        staged = os.path.join(
            dest.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        try:
            _link_tree(src, staged, skip_top=(self.CDF_DIR,))
        except FileNotFoundError as exc:
            shutil.rmtree(staged, ignore_errors=True)
            raise SnapshotExpiredError(
                f"{self.root}: version {version} snapshot vanished during "
                f"clone (concurrent GC) — retry or raise retention"
            ) from exc
        committed = False
        dest._acquire_lock()
        try:
            if dest._pointer() is not None:
                raise FileExistsError(
                    f"{dest.root}: a concurrent writer committed first — "
                    f"refusing to clone over it"
                )
            snap = f"snap-{1:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(dest.root, snap))
            staged = os.path.join(dest.root, snap)  # for error cleanup
            dest._write_log(
                1,
                snap,
                list(entry.get("partition_by") or []),
                entry.get("schema"),
                meta={
                    **_inherited_meta(entry),
                    "clone_of": {"root": self.root, "version": version},
                },
                stats_cols=entry.get("stats_cols"),
                file_stats=entry.get("file_stats"),
                checks=entry.get("checks"),
                dv=entry.get("dv"),  # linked files include its _dv
                # a clustered source clones AS clustered (bucket-id
                # file names ride the hardlinks; the clone adopts its
                # own catalog entries under its own root tag) — r12
                bucket=entry.get("bucket"),
                cdf=(
                    {
                        "key_cols": list(entry["cdf"]["key_cols"]),
                        "break": True,
                    }
                    if entry.get("cdf")
                    else None
                ),
                column_map=entry.get("column_map"),
                mor_delta=entry.get("mor_delta"),
                dropped=entry.get("dropped"),
                added=entry.get("added"),
                bloom=entry.get("bloom"),
                # an evolved source clones WITH its spec history
                specs=entry.get("specs"),
            )
            tmp_ptr = os.path.join(dest.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap}\n1\n")
            os.replace(tmp_ptr, os.path.join(dest.root, dest.POINTER))
            dest.last_snapshot = snap
            committed = True
        finally:
            dest._release_lock()
            if not committed:
                shutil.rmtree(staged, ignore_errors=True)
        return dest

    def publish_from(
        self,
        spark: SparkSession,
        branch: "ManifestTable",
        *,
        keys: list[str],
        audit=None,
        on_conflict: str = "fail",
        keep_snapshots: int = 2,
        max_retries: int = 5,
        drop_branch: bool = False,
    ) -> dict:
        """Write-audit-publish (Iceberg WAP / Delta staging-swap): fold
        a branch table's net changes back into this (main) table —
        the pattern a training-corpus pipeline needs to let a new
        crawl batch land on an isolated branch (:meth:`clone_to`),
        pass an audit gate, and only then become visible to readers.

        ``branch`` must be a clone OF THIS TABLE (its version-1 entry
        carries ``meta.clone_of`` pointing here); the branch's net
        change set is ``branch.diff(1, head, keys)`` — intermediate
        branch commits are squashed, so an audit-failed batch that was
        fixed by a later branch commit publishes only the fixed rows.

        ``audit``: gate evaluated over the POST-IMAGE rows entering
        main — either ``{name: sql_predicate}`` (CHECK semantics: NULL
        satisfies, FALSE rejects) or a callable ``df -> violations
        DataFrame``. Any violation raises :class:`AuditFailedError`
        and publishes nothing; the branch keeps its state for a fix +
        re-publish. Main's own CHECK constraints additionally apply on
        every publish path (inherited by ``commit``; carried by the
        clone on the adopt path).

        Publish paths, chosen per attempt:

        - **fast** — main's head is still the branch's base version
          and the table properties the adopted entry would carry
          (partition layout, CHECK set, no live change feed) match:
          ADOPT the branch's head snapshot by hardlink — zero data
          bytes move, one log write + pointer swap, exactly the
          O(1) publish a 100 TB batch wants. The adopted entry carries
          the branch's schema, stats, blooms, DV/MoR sidecars, and
          column maps verbatim.
        - **rebase** — main advanced since the branch was cut (or the
          properties diverged): detect write-write conflicts by
          null-safe key intersection of ``branch.diff(1, head)`` and
          ``self.diff(base, head)`` — churn-proportional, never a
          table scan. Conflicts raise :class:`PublishConflictError`
          (``on_conflict="ours"``: branch wins). The fold itself is
          one anti join of main's head on the branch-changed keys
          plus a union of the post-images, committed with a version
          CAS; a racing writer restarts the attempt (bounded by
          ``max_retries``).

        ``drop_branch=True`` deletes the branch root (:meth:`drop`)
        after a publish that left main correct: a SUCCESSFUL publish,
        or a NOOP one (the branch has no net changes — nothing to
        publish, so the branch is equally spent; ``published=False``
        with ``branch_dropped=True`` reports exactly that). This is
        the retention tail of the governance loop, so a per-crawl-
        batch branch does not leak its root forever (VERDICT r10 item
        6). The fast path's adopted snapshot is hardlinked, so the
        drop reclaims only the branch's own unshared bytes; a failed
        audit or conflict RAISES and leaves the branch intact for fix
        + re-publish.

        Returns ``{"version", "path", "inserted", "updated",
        "deleted", "conflicts", "published", "branch_dropped"}``.
        Reference anchor: the reference's two-phase raw->final
        promotion with validation between
        (``dags/scraping_etl.py:59-83``), generalized to an
        isolated-branch audit gate."""
        if on_conflict not in ("fail", "ours"):
            raise ValueError("on_conflict must be 'fail' or 'ours'")
        b1 = branch._log_entry(1) or {}
        lineage = (b1.get("meta") or {}).get("clone_of") or {}
        if os.path.realpath(str(lineage.get("root", ""))) != os.path.realpath(
            self.root
        ):
            raise ValueError(
                f"{branch.root}: not a branch of {self.root} — "
                f"publish_from requires a clone_to branch (clone_of="
                f"{lineage or None})"
            )
        base_ver = int(lineage["version"])
        bh = branch.version()
        if bh is None:
            raise FileNotFoundError(f"{branch.root}: branch has no commits")
        if bh == 1:
            return {
                "version": self.version(),
                "path": "noop",
                "inserted": 0,
                "updated": 0,
                "deleted": 0,
                "conflicts": 0,
                "published": False,
                "branch_dropped": bool(drop_branch and branch.drop()),
            }
        changes = branch.diff(spark, 1, bh, keys)
        # one churn-sized pass for the report counts (and to fail fast
        # on an unreadable branch) — reused below via the same plan
        by_type = {
            r["_change_type"]: r["n"]
            for r in changes.groupBy("_change_type").count()
            .withColumnRenamed("count", "n").collect()
        }
        n_ins = int(by_type.get("insert", 0))
        n_upd = int(by_type.get("update_postimage", 0))
        n_del = int(by_type.get("delete", 0))
        if n_ins + n_upd + n_del == 0:
            return {
                "version": self.version(),
                "path": "noop",
                "inserted": 0,
                "updated": 0,
                "deleted": 0,
                "conflicts": 0,
                "published": False,
                "branch_dropped": bool(drop_branch and branch.drop()),
            }
        post = changes.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).drop("_change_type")
        changed_keys = changes.select(*keys).distinct()
        if audit is not None:
            if isinstance(audit, dict):
                bad = None
                for name, pred in audit.items():
                    b = ~F.coalesce(F.expr(pred), F.lit(True))
                    bad = b if bad is None else (bad | b)
                viol = post.filter(bad)
            else:
                viol = audit(post)
            sample = viol.limit(4).collect()
            if sample:
                raise AuditFailedError(
                    f"publish of {branch.root} -> {self.root} rejected by "
                    f"audit gate; first violations: "
                    f"{[r.asDict() for r in sample[:3]]}"
                )
        pub_meta = {
            "publish_of": {
                "root": branch.root,
                "version": bh,
                "base": base_ver,
                "keys": list(keys),
            }
        }
        for _ in range(max_retries):
            n_conf = 0  # per-attempt: a retry that takes the fast path
            # must not report a previous attempt's stale conflict count
            head = self.version() or 0
            if head < base_ver:
                raise PublishConflictError(
                    f"{self.root}: head {head} is BELOW the branch base "
                    f"{base_ver} (main was restored past the branch "
                    f"point) — re-cut the branch"
                )
            live = self._log_entry(head) or {}
            bh_entry = branch._log_entry(bh) or {}
            if head == base_ver:
                adoptable = (
                    not (live.get("cdf") or {}).get("key_cols")
                    and (live.get("checks") or {})
                    == (bh_entry.get("checks") or {})
                    and list(live.get("partition_by") or [])
                    == list(bh_entry.get("partition_by") or [])
                    # a clustered main adopts only a branch head with
                    # the SAME bucket spec — adopting a de-clustered
                    # (or re-specced) branch would silently change the
                    # layout contract behind read_clustered (r12)
                    and (live.get("bucket") or None)
                    == (bh_entry.get("bucket") or None)
                    # same for partition-spec histories: adopting a
                    # branch whose spec list diverged would swap the
                    # spec-dir layout contract under readers
                    and (live.get("specs") or None)
                    == (bh_entry.get("specs") or None)
                )
                if adoptable:
                    ver = self._adopt_snapshot(
                        branch, bh, bh_entry, expect_version=head,
                        meta=pub_meta, keep_snapshots=keep_snapshots,
                    )
                    if ver is not None:
                        return {
                            "version": ver,
                            "path": "fast",
                            "inserted": n_ins,
                            "updated": n_upd,
                            "deleted": n_del,
                            "conflicts": 0,
                            "published": True,
                            "branch_dropped": bool(
                                drop_branch and branch.drop()
                            ),
                        }
                    continue  # pointer moved during adopt: retry
            if head > base_ver:
                main_changed = (
                    self.diff(spark, base_ver, head, keys)
                    .select(*keys)
                    .distinct()
                )
                c = changed_keys.alias("c")
                m = main_changed.alias("m")
                cond = None
                for k in keys:
                    eq = F.col(f"c.{k}").eqNullSafe(F.col(f"m.{k}"))
                    cond = eq if cond is None else (cond & eq)
                conflicts = c.join(m, cond, "inner").select(
                    *[F.col(f"c.{k}") for k in keys]
                )
                # exact count for the report (one churn-sized agg, no
                # table scan — ADVICE r10: the old limit(4) sample
                # under-reported an 'ours' publish over many conflicts);
                # the 4-row sample stays for the error message only
                n_conf = int(conflicts.count())
                if n_conf and on_conflict == "fail":
                    conf_sample = conflicts.limit(3).collect()
                    raise PublishConflictError(
                        f"{self.root}: {n_conf} key(s) changed "
                        f"by both branch and main since version "
                        f"{base_ver}; first: "
                        f"{[tuple(r) for r in conf_sample]} — re-cut "
                        f"the branch or publish with on_conflict='ours'"
                    )
            if live.get("bucket"):
                # the rebase fold commits through the plain writer,
                # which would silently DROP a clustered main's bucket
                # layout (read_clustered contract) — refuse loudly
                # (r12); keep main unmoved for the O(1) adopt path or
                # re-cluster the folded state deliberately
                raise ValueError(
                    f"{self.root}: publish_from would rewrite a "
                    f"CLUSTERED main through a plain commit (bucket "
                    f"layout dropped) — publish before main moves "
                    f"(adopt path), or fold + commit_clustered "
                    f"deliberately"
                )
            base = self.read(spark, version=head)
            b = base.alias("b")
            g = changed_keys.alias("g")
            cond = None
            for k in keys:
                eq = F.col(f"b.{k}").eqNullSafe(F.col(f"g.{k}"))
                cond = eq if cond is None else (cond & eq)
            kept = b.join(g, cond, "left_anti")
            result = kept.unionByName(post, allowMissingColumns=True)
            try:
                ver = self.commit(
                    result,
                    expect_version=head,
                    keep_snapshots=keep_snapshots,
                    meta=pub_meta,
                )
            except ConcurrentWriteError:
                continue  # a racing writer advanced main: re-fold
            return {
                "version": ver,
                "path": "rebase",
                "inserted": n_ins,
                "updated": n_upd,
                "deleted": n_del,
                "conflicts": n_conf,
                "published": True,
                "branch_dropped": bool(drop_branch and branch.drop()),
            }
        raise ConcurrentWriteError(
            f"{self.root}: main kept advancing during publish "
            f"({max_retries} attempts)"
        )

    def _adopt_snapshot(
        self,
        src: "ManifestTable",
        src_version: int,
        src_entry: dict,
        *,
        expect_version: int,
        meta: dict,
        keep_snapshots: int,
    ) -> int | None:
        """Adopt ``src``'s pinned snapshot as this table's next version
        by hardlink — the zero-data-movement commit under
        :meth:`publish_from`'s fast path. Returns the new version, or
        None if the pointer moved past ``expect_version`` while the
        link tree was being staged (caller retries). The source's CDF
        sidecar is NOT carried: the publish squashes branch history,
        and this table's own feed property was checked absent by the
        caller."""
        src_snap = os.path.join(src.root, src_entry["snapshot"])
        if not os.path.isdir(src_snap):
            raise SnapshotExpiredError(
                f"{src.root}: version {src_version} snapshot was "
                f"garbage-collected mid-publish — raise the branch's "
                f"retention"
            )
        staged = os.path.join(
            self.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        try:
            _link_tree(src_snap, staged, skip_top=(self.CDF_DIR,))
        except FileNotFoundError as exc:
            shutil.rmtree(staged, ignore_errors=True)
            raise SnapshotExpiredError(
                f"{src.root}: snapshot vanished during publish "
                f"(concurrent GC) — retry or raise retention"
            ) from exc
        committed = False
        self._acquire_lock()
        try:
            ptr = self._pointer()
            cur = 0 if ptr is None else ptr[1]
            if cur != expect_version:
                return None
            new_ver = cur + 1
            snap = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(self.root, snap))
            staged = os.path.join(self.root, snap)
            self._write_log(
                new_ver,
                snap,
                list(src_entry.get("partition_by") or []),
                src_entry.get("schema"),
                meta={**_inherited_meta(src_entry), **meta},
                stats_cols=src_entry.get("stats_cols"),
                file_stats=src_entry.get("file_stats"),
                checks=src_entry.get("checks"),
                dv=src_entry.get("dv"),
                column_map=src_entry.get("column_map"),
                mor_delta=src_entry.get("mor_delta"),
                dropped=src_entry.get("dropped"),
                added=src_entry.get("added"),
                bloom=src_entry.get("bloom"),
                # an adopted clustered branch head keeps its layout
                # (bucket ids ride the hardlinked file names) — r12
                bucket=src_entry.get("bucket"),
                # an adopted evolved branch head keeps its spec history
                specs=src_entry.get("specs"),
            )
            tmp_ptr = os.path.join(self.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
            self.last_snapshot = snap
            committed = True
        finally:
            self._release_lock()
            if not committed:
                shutil.rmtree(staged, ignore_errors=True)
        self._gc(keep=keep_snapshots)
        return new_ver

    def commit_clustered(
        self,
        df: DataFrame,
        bucket_col: str,
        n_buckets: int,
        *,
        sorted_by: str | None = None,
        expect_version: int | None = None,
        keep_snapshots: int = 2,
        meta: dict | None = None,
    ) -> int:
        """Commit ``df`` as a HASH-BUCKETED snapshot (Spark bucket
        layout: ``CLUSTERED BY (col) SORTED BY (col) INTO n BUCKETS``)
        — the amortize-the-shuffle-once layout for a table that is
        joined on the same key again and again: two manifest tables
        committed with the same ``(bucket_col domain, n_buckets)``
        join through :meth:`read_clustered` with NO exchange and NO
        sort at read time, the decisive join strategy for 100 TB fact
        tables (pay one shuffle at ingest, never again downstream).

        The bucket file layout is produced by Spark's own bucketed
        writer (bucket ids ride the file NAMES), staged through a
        throwaway EXTERNAL catalog entry whose path is the staging
        dir — dropping it is metadata-only, the files stay — then
        committed through the same lock/CAS/pointer-swap protocol as
        any snapshot, with the bucket spec recorded in the log entry.
        Readers adopt a PINNED snapshot into the catalog once per
        (table, version) and get bucketed scans from then on.

        Deliberately NOT composed with the change feed or CHECK
        constraints (use :meth:`commit` for governed tables): a
        clustered table is a JOIN-layout artifact — typically a
        derived, rebuilt-in-full table — and silently skipping feed
        materialization or validation would corrupt those contracts,
        so this raises instead if the live entry carries either."""
        spark = df.sparkSession
        live = self._log_entry(self.version() or 0) or {}
        if (live.get("cdf") or {}).get("key_cols") or live.get("checks"):
            raise ValueError(
                f"{self.root}: commit_clustered on a table with a change "
                f"feed or CHECK constraints would skip them — use commit()"
            )
        sort_col = sorted_by or bucket_col
        staged = os.path.join(
            self.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        os.makedirs(self.root, exist_ok=True)
        _write_bucketed(spark, df, bucket_col, int(n_buckets), sort_col, staged)
        schema_json = df.schema.json()
        committed = False
        self._acquire_lock()
        try:
            ptr = self._pointer()
            cur = 0 if ptr is None else ptr[1]
            if expect_version is not None and cur != expect_version:
                raise ConcurrentWriteError(
                    f"{self.root}: version {cur} != expected "
                    f"{expect_version}"
                )
            # re-run the feed/constraint guard against the LIVE entry
            # inside the lock (ADVICE r10 TOCTOU): a concurrent commit
            # that enabled cdf_keys or checks in the staging window
            # must not be followed by a clustered commit that silently
            # skips feed materialization and validation. Raising here
            # cleans the staged dir via the finally below.
            live_now = self._log_entry(cur) or {}
            if (live_now.get("cdf") or {}).get("key_cols") or live_now.get(
                "checks"
            ):
                raise ValueError(
                    f"{self.root}: a concurrent commit enabled the change "
                    f"feed or CHECK constraints while the clustered "
                    f"snapshot staged — commit_clustered would skip them; "
                    f"use commit()"
                )
            new_ver = cur + 1
            snap = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(self.root, snap))
            staged = os.path.join(self.root, snap)
            self._write_log(
                new_ver,
                snap,
                [],
                schema_json,
                meta=meta,
                bucket={
                    "col": bucket_col,
                    "n": int(n_buckets),
                    "sorted_by": sort_col,
                },
            )
            tmp_ptr = os.path.join(self.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
            self.last_snapshot = snap
            committed = True
        finally:
            self._release_lock()
            if not committed:
                shutil.rmtree(staged, ignore_errors=True)
        self._gc(keep=keep_snapshots)
        return new_ver

    def read_clustered(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Read a :meth:`commit_clustered` snapshot THROUGH the catalog
        so Spark's planner sees the bucket layout (``outputPartitioning
        = HashPartitioning(bucket_col, n)`` and per-bucket sort): a
        join of two tables clustered on the compatible key plans with
        no exchange and no sort upstream of the SortMergeJoin.

        Adoption is one ``CREATE TABLE ... CLUSTERED BY ... LOCATION
        <snapshot>`` per (table, version) — the catalog name is
        derived from the root and version, so time travel works (each
        retained version adopts as its own pinned catalog entry) and a
        fresh session re-adopts idempotently (bucket ids live in the
        file names; the DDL is exact over the same files).

        Catalog-entry lifecycle (VERDICT/ADVICE r10): an existing
        entry is trusted only after its LOCATION matches the resolved
        snapshot dir — a table root deleted and recreated at the same
        path (versions restart at 1) or a persistent metastore from an
        older run would otherwise resolve to a stale entry pointing at
        a removed snapshot / old schema; on mismatch the entry is
        dropped and re-created. Each adoption also sweeps this table's
        entries whose pinned snapshot no longer exists
        (:meth:`_sweep_clustered_catalog`), and :meth:`_gc` does the
        same after reclaiming snapshots, so a long-lived session does
        not accrue dangling entries for vacuumed versions."""
        ptr = self._pointer()
        if ptr is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        ver = ptr[1] if version is None else version
        snap = self.snapshot_path(ver)
        entry = self._log_entry(ver) or {}
        bucket = entry.get("bucket")
        if not bucket:
            raise ValueError(
                f"{self.root}: version {ver} was not committed with "
                f"commit_clustered — read() it instead"
            )
        if snap is None or not os.path.isdir(snap):
            raise SnapshotExpiredError(
                f"{self.root}: version {ver} snapshot was garbage-"
                f"collected — raise retention or re-cluster"
            )
        schema = T.StructType.fromJson(json.loads(entry["schema"]))
        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        db = "dps_manifest"
        name = f"{db}.mt_{self._catalog_tag()}_v{ver}"
        self._sweep_clustered_catalog(spark)
        if spark.catalog.tableExists(name) and not _location_matches(
            spark, name, snap
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        if not spark.catalog.tableExists(name):
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
            spark.sql(
                f"CREATE TABLE {name} ({ddl}) USING parquet "
                f"CLUSTERED BY ({bucket['col']}) "
                f"SORTED BY ({bucket['sorted_by']}) "
                f"INTO {bucket['n']} BUCKETS LOCATION '{snap}'"
            )
        # merge-on-read sidecars (r12): the DV anti-join is FORCED
        # broadcast (churn-sized by contract) — a post-scan filter, so
        # the bucketed scan's HashPartitioning survives and clustered
        # joins stay exchange-free through deletes. An outstanding
        # _upd delta unions post-images in (correct everywhere) at the
        # cost of the clustered join property until compact_clustered
        # folds it back into the buckets.
        return self._apply_dv(
            spark, spark.table(name), entry, snap, prefer_broadcast=True
        )

    def _catalog_tag(self) -> str:
        """Stable catalog-name fragment for this table root."""
        return hashlib.md5(
            os.path.realpath(self.root).encode()
        ).hexdigest()[:10]

    def _sweep_clustered_catalog(self, spark: SparkSession) -> int:
        """Drop ``dps_manifest`` catalog entries adopted for THIS table
        whose pinned snapshot no longer exists — GC'd versions, or a
        root deleted and recreated (entries are metadata-only; the
        DROP never touches data files). Returns the number dropped.
        Best-effort: catalog races with concurrent sessions are
        harmless (DROP IF EXISTS / re-adoption is idempotent)."""
        db = "dps_manifest"
        try:
            if not spark.catalog.databaseExists(db):
                return 0
            prefix = f"mt_{self._catalog_tag()}_v"
            ptr = self._pointer()
            live = ptr[1] if ptr else 0
            dropped = 0
            for t in spark.catalog.listTables(db):
                if not t.name.startswith(prefix):
                    continue
                try:
                    ver = int(t.name[len(prefix):])
                except ValueError:
                    continue
                entry = self._log_entry(ver)
                stale = (
                    entry is None
                    or ver > live
                    or not os.path.isdir(
                        os.path.join(self.root, entry["snapshot"])
                    )
                )
                if stale:
                    spark.sql(f"DROP TABLE IF EXISTS {db}.{t.name}")
                    dropped += 1
            return dropped
        except Exception:
            return 0  # metastore hiccup: adoption re-validates anyway

    def append_clustered(
        self,
        df: DataFrame,
        *,
        expect_version: int | None = None,
        keep_snapshots: int = 2,
        meta: dict | None = None,
    ) -> int:
        """BUCKET-PRESERVING append onto a :meth:`commit_clustered`
        snapshot (r11 — the missing half of the clustered-ledger
        story): the batch is written through Spark's bucketed writer
        with the table's OWN ``(bucket_col, n, sorted_by)`` spec, the
        base snapshot's files hardlink forward untouched, and the new
        per-bucket files are adopted KEEPING their bucket-id file
        names — so every retained version stays exchange-free joinable
        through :meth:`read_clustered`, and an ingest loop maintains a
        100 TB clustered fact table at O(batch) cost instead of
        re-clustering the world per batch (`commit_clustered` is the
        rewrite; this is the add-file commit).

        Honest cost model: after k appends a bucket holds up to k+1
        files; ``HashPartitioning`` still holds (joins plan with NO
        exchange on the join inputs), but Spark drops the per-bucket
        SORT property whenever a bucket spans multiple files, so
        downstream sort-merge joins re-sort locally until
        :func:`compact_clustered` repacks each multi-file bucket back
        to one sorted file (restoring the sort-free plan). Exactly
        Delta's bucketed-ingest + OPTIMIZE rhythm.

        The batch's schema must match the committed schema by
        name+type (clustered tables are join-layout artifacts —
        schema changes go through :meth:`commit_clustered`); raises
        :class:`SchemaEvolutionError` otherwise. Same CAS/lock
        protocol as every writer; the cdf/checks guard re-runs inside
        the lock like :meth:`commit_clustered`'s."""
        spark = df.sparkSession
        entry, version, snap = self._prepare_clustered_append(
            spark, df, expect_version=expect_version
        )
        staged: str | None = None
        committed_ver: int | None = None
        try:
            staged, kw = self._stage_clustered_append(
                spark, df, entry, snap, meta=meta
            )
            self._acquire_lock()
            try:
                cur = self._pointer()
                if cur is None or cur[1] != version:
                    raise ConcurrentWriteError(
                        f"{self.root}: version advanced during clustered "
                        f"append (staged against {version}) — retry"
                    )
                live_now = self._log_entry(cur[1]) or {}
                if (live_now.get("cdf") or {}).get("key_cols") or live_now.get(
                    "checks"
                ):
                    raise ValueError(
                        f"{self.root}: a concurrent commit enabled the "
                        f"change feed or CHECK constraints — clustered "
                        f"append would skip them"
                    )
                new_ver = version + 1
                snap_new = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
                os.rename(staged, os.path.join(self.root, snap_new))
                staged = os.path.join(self.root, snap_new)
                self._write_log(
                    new_ver,
                    snap_new,
                    kw.pop("partition_by"),
                    kw.pop("schema_json"),
                    **kw,
                )
                tmp_ptr = os.path.join(
                    self.root, f".ptr-{uuid.uuid4().hex[:8]}"
                )
                with open(tmp_ptr, "w") as fh:
                    fh.write(f"{snap_new}\n{new_ver}\n")
                os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
                self.last_snapshot = snap_new
                committed_ver = new_ver
            finally:
                self._release_lock()
                if committed_ver is None:
                    shutil.rmtree(staged, ignore_errors=True)
        except Exception:
            if committed_ver is None and staged:
                shutil.rmtree(staged, ignore_errors=True)
            raise
        self._gc(keep=keep_snapshots)
        return committed_ver

    def _prepare_clustered_append(
        self,
        spark: SparkSession,
        df: DataFrame,
        *,
        expect_version: int | None = None,
    ) -> tuple[dict, int, str]:
        """Validation head of a bucket-preserving append (UNLOCKED):
        resolves the base, requires a clustered entry, the committed
        schema verbatim, and no MoR key collisions. Returns
        ``(base_entry, base_version, snap_dir)``."""
        ptr = self._pointer()
        if ptr is None:
            raise FileNotFoundError(
                f"{self.root}: append_clustered needs a commit_clustered "
                f"base — commit one first"
            )
        snap_name, version = ptr
        if expect_version is not None and version != expect_version:
            raise ConcurrentWriteError(
                f"{self.root}: version {version} != expected {expect_version}"
            )
        entry = self._log_entry(version) or {}
        bucket = entry.get("bucket")
        if not bucket:
            raise ValueError(
                f"{self.root}: version {version} is not a clustered "
                f"snapshot — use append() / commit_clustered()"
            )
        committed_schema = T.StructType.fromJson(json.loads(entry["schema"]))
        if [(f.name, f.dataType) for f in df.schema.fields] != [
            (f.name, f.dataType) for f in committed_schema.fields
        ]:
            raise SchemaEvolutionError(
                f"{self.root}: clustered append requires the committed "
                f"schema verbatim ({[f.name for f in committed_schema]}); "
                f"re-cluster via commit_clustered to change it"
            )
        snap = os.path.join(self.root, snap_name)
        if not os.path.isdir(snap):
            raise ConcurrentWriteError(
                f"{self.root}: snapshot {snap_name} vanished before append "
                f"(concurrent writer + gc) — retry"
            )
        dv = entry.get("dv")
        if dv:
            # same guard as plain append(): an appended key colliding
            # with a live merge-on-read key would be suppressed by the
            # key-scoped _dv on read — refuse, compact first
            dv_keys = spark.read.parquet(os.path.join(snap, self.DV_DIR))
            n_bad = (
                df.join(
                    F.broadcast(dv_keys),
                    on=list(dv["key_cols"]),
                    how="left_semi",
                )
                .limit(1)
                .count()
            )
            if n_bad:
                raise ValueError(
                    f"{self.root}: clustered append collides with live "
                    f"merge-on-read keys (deletion vector / update delta "
                    f"on {dv['key_cols']}) — compact_clustered() first"
                )
        return entry, version, snap

    def _stage_clustered_append(
        self,
        spark: SparkSession,
        df: DataFrame,
        entry: dict,
        snap: str,
        *,
        meta: dict | None,
    ) -> tuple[str, dict]:
        """UNLOCKED staging half of a bucket-preserving append: write
        the batch through the bucketed writer with the table's own
        spec, hardlink the base snapshot's bucket files and MoR
        sidecars forward, and adopt the new per-bucket files KEEPING
        their bucket-id names. Returns ``(staged_dir, _write_log
        kwargs)``; the caller owns the lock/CAS/pointer tail
        (single-table: :meth:`append_clustered`; multi-table:
        :meth:`TransactionGroup.commit`'s append-shaped members, r12)
        and removes ``staged_dir`` on failure."""
        bucket = entry["bucket"]
        tmp = os.path.join(self.root, f".cappend-{uuid.uuid4().hex[:8]}")
        _write_bucketed(
            spark, df, bucket["col"], int(bucket["n"]),
            bucket["sorted_by"], tmp,
        )
        staged = os.path.join(
            self.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        try:
            os.makedirs(staged)
            for f in os.listdir(snap):
                if not f.endswith(".parquet"):
                    continue
                try:
                    os.link(os.path.join(snap, f), os.path.join(staged, f))
                except OSError:
                    shutil.copy2(os.path.join(snap, f), os.path.join(staged, f))
            # merge-on-read sidecars ride forward by hardlink (r12 —
            # clustered DML parity with plain append)
            for side in (self.DV_DIR, self.UPD_DIR):
                sp = os.path.join(snap, side)
                if os.path.isdir(sp):
                    _link_tree(sp, os.path.join(staged, side))
            for f in os.listdir(tmp):
                if not f.endswith(".parquet"):
                    continue
                if _bucket_id(f) is None:  # pragma: no cover - writer names
                    raise RuntimeError(
                        f"bucketed writer produced a non-bucket file {f!r}"
                    )
                # keep the ORIGINAL name: the bucket id lives in it and
                # the job uuid makes collisions with linked base files
                # impossible by construction
                dst = os.path.join(staged, f)
                if os.path.exists(dst):  # pragma: no cover - uuid clash
                    raise RuntimeError(f"bucket file collision on {f!r}")
                os.rename(os.path.join(tmp, f), dst)
        except Exception:
            shutil.rmtree(staged, ignore_errors=True)
            raise
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return staged, dict(
            partition_by=[],
            schema_json=entry["schema"],
            meta={**_inherited_meta(entry), **(meta or {})},
            bucket=dict(bucket),
            dv=entry.get("dv"),
            mor_delta=entry.get("mor_delta"),
        )

    def rename_column(
        self,
        old: str,
        new: str,
        *,
        expect_version: int | None = None,
        keep_snapshots: int = 2,
    ) -> int:
        """METADATA-ONLY column rename — Delta column mapping (``name``
        mode): the new commit HARDLINKS the current snapshot's data
        files untouched and records a LOGICAL->PHYSICAL ``column_map``
        in the log; every read path renames on the way out, so
        renaming a column on a 100 TB table moves zero data bytes.
        Renames chain (the map always points at the files' real
        names); the next full-rewrite commit — any :meth:`commit`, or
        :func:`compact_table` — writes files under the logical names
        and drops the map, exactly how OPTIMIZE materializes deletion
        vectors.

        Guarded refusals (each names its escape hatch): renaming a
        partition column (physical dir names — rewrite with a new
        ``partition_by``), a live deletion-vector key (compact
        first), or a column referenced by a CHECK constraint (drop or
        re-state the constraint). ``stats_by``/``read_range`` keep
        working: stats stay keyed by physical name and lookups
        translate. A rename under an enabled change feed records a
        ``break`` (past change files carry the old name; consumers
        rebuild — Delta requires a feed restart across column-mapping
        renames for the same reason).

        Same CAS + lock protocol as every writer; raises
        :class:`ConcurrentWriteError` if the table advances mid-
        rename."""
        ptr = self._pointer()
        if ptr is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        snap_name, cur_ver = ptr
        src = os.path.join(self.root, snap_name)
        entry = self._log_entry(cur_ver) or {}
        _refuse_clustered(
            self.root,
            entry,
            "metadata-only column changes do not propagate through "
            "the bucketed catalog scan. Re-cluster with "
            "commit_clustered(read(...), ...) carrying the new "
            "schema instead.",
        )
        schema = T.StructType.fromJson(json.loads(entry["schema"]))
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValueError(f"{self.root}: no column {old!r} to rename")
        if new in names:
            raise ValueError(f"{self.root}: column {new!r} already exists")
        if old in _spec_partition_cols(entry):
            raise ValueError(
                f"{self.root}: {old!r} is a partition column of a live "
                f"spec (physical directory names) — rewrite with a new "
                f"partition_by (compact_table migrates evolved specs)"
            )
        if old in ((entry.get("dv") or {}).get("key_cols") or []):
            raise ValueError(
                f"{self.root}: {old!r} keys the live deletion vector — "
                f"compact_table first to materialize it"
            )
        for cname, pred_sql in (entry.get("checks") or {}).items():
            if re.search(rf"\b{re.escape(old)}\b", pred_sql):
                raise ValueError(
                    f"{self.root}: {old!r} is referenced by CHECK "
                    f"constraint {cname!r} ({pred_sql}) — drop or "
                    f"re-state the constraint in the same commit instead"
                )
        new_schema = T.StructType(
            [
                T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
        cmap = dict(entry.get("column_map") or {})
        phys = cmap.pop(old, old)
        if new != phys:
            cmap[new] = phys
        stats_cols = [
            new if c == old else c for c in (entry.get("stats_cols") or [])
        ]
        prev_cdf = entry.get("cdf")
        staged = os.path.join(
            self.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        try:
            _link_tree(src, staged, skip_top=(self.CDF_DIR,))
        except FileNotFoundError as exc:
            shutil.rmtree(staged, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{self.root}: snapshot {snap_name} vanished during "
                f"rename_column (concurrent writer + gc) — retry"
            ) from exc
        committed_ver: int | None = None
        self._acquire_lock()
        try:
            now = self._pointer()
            live_ver = 0 if now is None else now[1]
            if expect_version is not None and live_ver != expect_version:
                raise ConcurrentWriteError(
                    f"{self.root}: version {live_ver} != expected "
                    f"{expect_version}"
                )
            if live_ver != cur_ver:
                raise ConcurrentWriteError(
                    f"{self.root}: table advanced {cur_ver} -> {live_ver} "
                    f"during rename_column — re-run against the new head"
                )
            new_ver = cur_ver + 1
            snap = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(self.root, snap))
            staged = os.path.join(self.root, snap)  # for error cleanup
            self._write_log(
                new_ver,
                snap,
                list(entry.get("partition_by") or []),
                new_schema.json(),
                meta={
                    **{
                        k: (
                            [new if c == old else c for c in v]
                            if k == "sort_order"
                            else v
                        )
                        for k, v in _inherited_meta(entry).items()
                    },
                    "renamed": {old: new},
                },
                stats_cols=stats_cols,
                file_stats=entry.get("file_stats"),
                checks=entry.get("checks"),
                dv=entry.get("dv"),
                cdf=(
                    {
                        "key_cols": [
                            new if k == old else k
                            for k in prev_cdf["key_cols"]
                        ],
                        "break": True,
                    }
                    if prev_cdf
                    else None
                ),
                column_map=cmap or None,
                mor_delta=entry.get("mor_delta"),
                dropped=entry.get("dropped"),
                added=entry.get("added"),
                bloom=entry.get("bloom"),
                specs=entry.get("specs"),
            )
            tmp_ptr = os.path.join(self.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
            self.last_snapshot = snap
            committed_ver = new_ver
        finally:
            self._release_lock()
            if committed_ver is None:
                shutil.rmtree(staged, ignore_errors=True)
        self._gc(keep=keep_snapshots)
        return committed_ver

    def add_column(
        self,
        name: str,
        dtype: str | T.DataType,
        *,
        expect_version: int | None = None,
        keep_snapshots: int = 2,
    ) -> int:
        """METADATA-ONLY column add — the third leg of the ALTER
        family (Delta ``ALTER TABLE ... ADD COLUMN``): the new commit
        HARDLINKS the data files untouched and appends a nullable
        field to the logical schema; every read path null-fills it
        with the declared type (the Arrow data-source reader and
        declared-schema ``read_range`` scans already do, natively), so
        adding a column to a 100 TB table moves zero data bytes. A
        later :meth:`update_where` backfills values merge-on-read; a
        full rewrite materializes the column into the files.

        The new name must not collide with a live logical column;
        reusing a previously DROPPED name is safe — reads project the
        stale physical bytes away BEFORE the fill, so they can never
        resurrect as the new column's values (test-pinned). The
        change feed stays intact (Delta likewise needs no feed restart
        for ADD COLUMN: pre-add change files align by name with null
        fill)."""
        ptr = self._pointer()
        if ptr is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        snap_name, cur_ver = ptr
        src = os.path.join(self.root, snap_name)
        entry = self._log_entry(cur_ver) or {}
        _refuse_clustered(
            self.root,
            entry,
            "metadata-only column changes do not propagate through "
            "the bucketed catalog scan. Re-cluster with "
            "commit_clustered(read(...), ...) carrying the new "
            "schema instead.",
        )
        schema = T.StructType.fromJson(json.loads(entry["schema"]))
        if name in [f.name for f in schema.fields]:
            raise ValueError(f"{self.root}: column {name!r} already exists")
        if isinstance(dtype, str):
            dtype = T._parse_datatype_string(dtype)
        new_schema = T.StructType(
            list(schema.fields) + [T.StructField(name, dtype, True)]
        )
        staged = os.path.join(
            self.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        try:
            _link_tree(src, staged, skip_top=(self.CDF_DIR,))
        except FileNotFoundError as exc:
            shutil.rmtree(staged, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{self.root}: snapshot {snap_name} vanished during "
                f"add_column (concurrent writer + gc) — retry"
            ) from exc
        committed_ver: int | None = None
        self._acquire_lock()
        try:
            now = self._pointer()
            live_ver = 0 if now is None else now[1]
            if expect_version is not None and live_ver != expect_version:
                raise ConcurrentWriteError(
                    f"{self.root}: version {live_ver} != expected "
                    f"{expect_version}"
                )
            if live_ver != cur_ver:
                raise ConcurrentWriteError(
                    f"{self.root}: table advanced {cur_ver} -> {live_ver} "
                    f"during add_column — re-run against the new head"
                )
            new_ver = cur_ver + 1
            snap = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(self.root, snap))
            staged = os.path.join(self.root, snap)  # for error cleanup
            self._write_log(
                new_ver,
                snap,
                list(entry.get("partition_by") or []),
                new_schema.json(),
                meta={**_inherited_meta(entry), "added_column": name},
                stats_cols=entry.get("stats_cols"),
                file_stats=entry.get("file_stats"),
                checks=entry.get("checks"),
                dv=entry.get("dv"),
                # content-preserving commit: feed readers skip it (the
                # add changes no rows; copying the previous entry's cdf
                # dict verbatim would point at ITS change files)
                cdf=(
                    {
                        "key_cols": list(entry["cdf"]["key_cols"]),
                        "noop": True,
                    }
                    if entry.get("cdf")
                    else None
                ),
                column_map=entry.get("column_map"),
                mor_delta=entry.get("mor_delta"),
                dropped=entry.get("dropped"),
                added=list(entry.get("added") or []) + [name],
                bloom=entry.get("bloom"),
                specs=entry.get("specs"),
            )
            tmp_ptr = os.path.join(self.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
            self.last_snapshot = snap
            committed_ver = new_ver
        finally:
            self._release_lock()
            if committed_ver is None:
                shutil.rmtree(staged, ignore_errors=True)
        self._gc(keep=keep_snapshots)
        return committed_ver

    def drop_column(
        self,
        name: str,
        *,
        expect_version: int | None = None,
        keep_snapshots: int = 2,
    ) -> int:
        """METADATA-ONLY column drop — ``rename_column``'s twin (Delta
        ``ALTER TABLE ... DROP COLUMN`` under column mapping): the new
        commit HARDLINKS the data files untouched, removes the column
        from the logical schema, and records its PHYSICAL name in the
        entry's ``dropped`` list; every read path projects it away on
        the way out, so dropping a column on a 100 TB table moves zero
        data bytes. The bytes linger in the files until the next full
        rewrite (any :meth:`commit` or :func:`compact_table`)
        materializes the logical schema and clears the list — exactly
        how Delta physically removes dropped columns only on REORG/
        OPTIMIZE. Time travel to earlier versions still sees the
        column (their entries don't carry the drop). A later
        :meth:`commit` may re-add the same logical name: full rewrites
        write fresh files, so the stale physical bytes can't leak into
        the new column; a later RENAME may likewise reuse the name
        (reads drop the stale physical column before applying the
        map).

        Guarded refusals (each names its escape hatch): dropping a
        partition column (physical dir names — rewrite with a new
        ``partition_by``), a live deletion-vector or change-feed key
        (compact / disable the feed first), or a column referenced by
        a CHECK constraint (drop or re-state the constraint). Same
        CAS + lock protocol as every writer."""
        ptr = self._pointer()
        if ptr is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        snap_name, cur_ver = ptr
        src = os.path.join(self.root, snap_name)
        entry = self._log_entry(cur_ver) or {}
        _refuse_clustered(
            self.root,
            entry,
            "metadata-only column changes do not propagate through "
            "the bucketed catalog scan. Re-cluster with "
            "commit_clustered(read(...), ...) carrying the new "
            "schema instead.",
        )
        schema = T.StructType.fromJson(json.loads(entry["schema"]))
        names = [f.name for f in schema.fields]
        if name not in names:
            raise ValueError(f"{self.root}: no column {name!r} to drop")
        if len(names) == 1:
            raise ValueError(
                f"{self.root}: {name!r} is the table's only column"
            )
        if name in _spec_partition_cols(entry):
            raise ValueError(
                f"{self.root}: {name!r} is a partition column of a live "
                f"spec (physical directory names) — rewrite with a new "
                f"partition_by (compact_table migrates evolved specs)"
            )
        if name in ((entry.get("dv") or {}).get("key_cols") or []):
            raise ValueError(
                f"{self.root}: {name!r} keys the live deletion vector — "
                f"compact_table first to materialize it"
            )
        if name in ((entry.get("cdf") or {}).get("key_cols") or []):
            raise ValueError(
                f"{self.root}: {name!r} keys the change feed — disable "
                f"the feed (cdf_keys=[]) or re-key it first"
            )
        for cname, pred_sql in (entry.get("checks") or {}).items():
            if re.search(rf"\b{re.escape(name)}\b", pred_sql):
                raise ValueError(
                    f"{self.root}: {name!r} is referenced by CHECK "
                    f"constraint {cname!r} ({pred_sql}) — drop or "
                    f"re-state the constraint first"
                )
        new_schema = T.StructType(
            [f for f in schema.fields if f.name != name]
        )
        cmap = dict(entry.get("column_map") or {})
        phys = cmap.pop(name, name)
        dropped = list(entry.get("dropped") or []) + [phys]
        stats_cols = [c for c in (entry.get("stats_cols") or []) if c != name]
        prev_cdf = entry.get("cdf")
        staged = os.path.join(
            self.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        try:
            _link_tree(src, staged, skip_top=(self.CDF_DIR,))
        except FileNotFoundError as exc:
            shutil.rmtree(staged, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{self.root}: snapshot {snap_name} vanished during "
                f"drop_column (concurrent writer + gc) — retry"
            ) from exc
        committed_ver: int | None = None
        self._acquire_lock()
        try:
            now = self._pointer()
            live_ver = 0 if now is None else now[1]
            if expect_version is not None and live_ver != expect_version:
                raise ConcurrentWriteError(
                    f"{self.root}: version {live_ver} != expected "
                    f"{expect_version}"
                )
            if live_ver != cur_ver:
                raise ConcurrentWriteError(
                    f"{self.root}: table advanced {cur_ver} -> {live_ver} "
                    f"during drop_column — re-run against the new head"
                )
            new_ver = cur_ver + 1
            snap = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(self.root, snap))
            staged = os.path.join(self.root, snap)  # for error cleanup
            self._write_log(
                new_ver,
                snap,
                list(entry.get("partition_by") or []),
                new_schema.json(),
                meta={
                    **{
                        k: (
                            [c for c in v if c != name]
                            if k == "sort_order"
                            else v
                        )
                        for k, v in _inherited_meta(entry).items()
                    },
                    "dropped_column": name,
                },
                stats_cols=stats_cols,
                file_stats=entry.get("file_stats"),
                checks=entry.get("checks"),
                dv=entry.get("dv"),
                cdf=(
                    {
                        "key_cols": list(prev_cdf["key_cols"]),
                        "break": True,
                    }
                    if prev_cdf
                    else None
                ),
                column_map=cmap or None,
                mor_delta=entry.get("mor_delta"),
                dropped=dropped,
                added=entry.get("added"),
                bloom=entry.get("bloom"),
                specs=entry.get("specs"),
            )
            tmp_ptr = os.path.join(self.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
            self.last_snapshot = snap
            committed_ver = new_ver
        finally:
            self._release_lock()
            if committed_ver is None:
                shutil.rmtree(staged, ignore_errors=True)
        self._gc(keep=keep_snapshots)
        return committed_ver

    def delete_where(
        self,
        spark: SparkSession,
        condition,
        key_cols: list[str],
        *,
        expect_version: int | None = None,
        keep_snapshots: int = 2,
        retries: int = 3,
    ) -> int:
        """Merge-on-read DELETE via a deletion vector — Delta/Iceberg
        DV semantics re-expressed on the manifest protocol: the new
        commit HARDLINKS the current snapshot's data files (zero data
        bytes rewritten) and records the matching rows' keys in a
        ``_dv/`` parquet sidecar inside the new snapshot dir; every
        read path (:meth:`read`, time travel, :meth:`read_where`,
        :meth:`diff`) applies the vector as one left-anti join on
        ``key_cols``. At 100 TB this is the difference between a
        DELETE costing O(matched keys) and one rewriting the table —
        copy-on-write is deferred to :func:`compact_table`, which
        materializes the deletes and drops the vector (exactly Delta's
        ``OPTIMIZE`` purging DVs).

        ``condition``: a Column or SQL-string predicate selecting rows
        to delete. ``key_cols`` must uniquely identify rows (the same
        primary-key contract :func:`merge_write` has) — the vector
        stores keys, not row positions, so a duplicated key would
        delete every copy. Chained deletes accumulate: the new vector
        is the union of the previous version's vector and the newly
        matched keys, so each version's sidecar is self-contained
        (time travel to any version applies exactly that version's
        accumulated deletes). Raises ``ValueError`` if a chained
        delete changes ``key_cols``.

        Concurrency: same CAS + lock protocol as :meth:`commit`, plus
        Delta-style OPTIMISTIC RETRY — a table that advanced mid-
        delete is re-resolved and the predicate re-evaluated against
        the new head, up to ``retries`` times (serialized outcome
        with no caller loop). ``expect_version`` disables the retry
        (the caller owns the CAS) and turns a lost race into
        :class:`ConcurrentWriteError`. Inherited from the source
        version: schema, partition layout, CHECK constraints, and
        per-file stats (stats stay conservative — a file whose rows
        are all deleted still prunes correctly, it just scans
        unnecessarily until compaction)."""
        return self._dml_retry(
            lambda: self._delete_where_once(
                spark,
                condition,
                key_cols,
                expect_version=expect_version,
                keep_snapshots=keep_snapshots,
            ),
            expect_version,
            retries,
            "delete_where",
        )

    def _dml_retry(self, once, expect_version, retries: int, op: str) -> int:
        """Optimistic-concurrency loop shared by the merge-on-read DML
        writers: a retryable conflict (table advanced / snapshot
        vanished mid-statement) re-runs the WHOLE statement against
        the new head — matching, sidecar build, commit — exactly
        Delta's rebase-and-retry. A caller-supplied ``expect_version``
        owns the CAS, so no retry happens for it."""
        attempts = 1 if expect_version is not None else retries + 1
        last: Exception | None = None
        for _ in range(attempts):
            try:
                return once()
            except ConcurrentWriteError as exc:
                last = exc
        raise ConcurrentWriteError(
            f"{self.root}: {op} kept losing to concurrent writers "
            f"({attempts} attempts)"
        ) from last

    def _delete_where_once(
        self,
        spark: SparkSession,
        condition,
        key_cols: list[str],
        *,
        expect_version: int | None,
        keep_snapshots: int,
    ) -> int:
        ptr = self._pointer()
        if ptr is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        snap_name, cur_ver = ptr
        src = os.path.join(self.root, snap_name)
        entry = self._log_entry(cur_ver) or {}
        # CLUSTERED snapshots take merge-on-read DML too (r12 — VERDICT
        # r11 item 1): the sidecars hardlink into the new snapshot
        # exactly as for plain layouts, the bucket spec carries forward
        # in the log entry, and read_clustered applies the DV anti-join
        # AFTER the bucketed catalog scan (a broadcast anti-join is a
        # post-scan filter, so HashPartitioning survives and clustered
        # joins stay exchange-free); compact_clustered folds the
        # sidecars back into their buckets.
        prev_dv = entry.get("dv")
        if prev_dv and list(prev_dv["key_cols"]) != list(key_cols):
            raise ValueError(
                f"{self.root}: deletion vector key_cols "
                f"{prev_dv['key_cols']} != {list(key_cols)} — compact "
                f"to materialize before re-keying"
            )
        pred = F.expr(condition) if isinstance(condition, str) else condition
        prev_delta = entry.get("mor_delta")
        if prev_delta:
            # an update delta exists: the predicate must see the
            # POST-update values (a row updated INTO the predicate
            # lives only in _upd/), so match on the visible view
            matched = (
                self._apply_dv(
                    spark, _apply_map(_snap_read(spark, src, entry), entry), entry, src
                )
                .filter(pred)
                .select(*[F.col(c) for c in key_cols])
                .distinct()
            )
        else:
            # keys of matching rows from the RAW pinned snapshot (not
            # the DV-filtered view): re-deleting an already-deleted key
            # is a no-op under the union below, and skipping the
            # anti-join keeps the match scan one pass over the files
            matched = (
                _apply_map(_snap_read(spark, src, entry), entry)
                .filter(pred)
                .select(*[F.col(c) for c in key_cols])
                .distinct()
            )
        fresh = matched
        if prev_dv:
            fresh = fresh.unionByName(
                spark.read.parquet(os.path.join(src, self.DV_DIR))
            ).distinct()
        staged = os.path.join(
            self.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        new_delta_entry: dict | None = None
        try:
            _link_tree(
                src,
                staged,
                skip_top=(self.DV_DIR, self.CDF_DIR, self.UPD_DIR),
            )
            # churn-sized by contract: one file keeps the read-side
            # anti-join build tiny and the sidecar listing O(1)
            fresh.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(staged, self.DV_DIR)
            )
            n_keys = int(
                spark.read.parquet(os.path.join(staged, self.DV_DIR)).count()
            )
            if prev_delta:
                # deleted keys leave the update delta too (their only
                # visible copy may live there). The delta is stored
                # under PHYSICAL names; keys are never renamed while
                # MoR state lives, so the raw anti-join is exact.
                kept_delta = spark.read.parquet(
                    os.path.join(src, self.UPD_DIR)
                ).join(matched, on=list(key_cols), how="left_anti")
                n_delta = int(kept_delta.count())
                if n_delta:
                    kept_delta.write.mode("overwrite").parquet(
                        os.path.join(staged, self.UPD_DIR)
                    )
                    new_delta_entry = {"n_rows": n_delta}
            cdf_prop = list((entry.get("cdf") or {}).get("key_cols") or [])
            cdf_entry: dict | None = None
            if cdf_prop:
                # the feed's delete rows are the VISIBLE rows the
                # predicate matches now (already-deleted keys emit
                # nothing — Delta CDF delete = pre-image of live rows)
                visible = self._apply_dv(
                    spark, _apply_map(_snap_read(spark, src, entry), entry), entry, src
                )
                cdf_path = os.path.join(staged, self.CDF_DIR)
                visible.filter(pred).select(
                    F.lit("delete").alias("_change_type"),
                    "*",
                    F.lit(cur_ver + 1).cast("long").alias("_commit_version"),
                ).write.mode("overwrite").parquet(cdf_path)
                cdf_entry = {
                    "key_cols": cdf_prop,
                    "n_changes": int(spark.read.parquet(cdf_path).count()),
                    # recorded so a _change_type-filtered feed read can
                    # skip this whole version at planning time (r13)
                    "change_types": ["delete"],
                }
        except FileNotFoundError as exc:
            shutil.rmtree(staged, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{self.root}: snapshot {snap_name} vanished during "
                f"delete_where (concurrent writer + gc) — retry"
            ) from exc
        except Exception:
            shutil.rmtree(staged, ignore_errors=True)
            raise
        committed_ver: int | None = None
        self._acquire_lock()
        try:
            now = self._pointer()
            live_ver = 0 if now is None else now[1]
            if expect_version is not None and live_ver != expect_version:
                raise ConcurrentWriteError(
                    f"{self.root}: version {live_ver} != expected "
                    f"{expect_version}"
                )
            if live_ver != cur_ver:
                # the vector was built against a superseded snapshot —
                # committing it would silently undo the racing writer
                raise ConcurrentWriteError(
                    f"{self.root}: table advanced {cur_ver} -> {live_ver} "
                    f"during delete_where — re-run against the new head"
                )
            new_ver = cur_ver + 1
            snap = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(self.root, snap))
            staged = os.path.join(self.root, snap)  # for error cleanup
            self._write_log(
                new_ver,
                snap,
                list(entry.get("partition_by") or []),
                entry.get("schema"),
                meta={
                    **_inherited_meta(entry),
                    "delete_predicate": str(condition),
                },
                stats_cols=entry.get("stats_cols"),
                file_stats=entry.get("file_stats"),
                checks=entry.get("checks"),
                dv={"key_cols": list(key_cols), "n_keys": n_keys},
                cdf=cdf_entry,
                column_map=entry.get("column_map"),
                mor_delta=new_delta_entry,
                dropped=entry.get("dropped"),
                added=entry.get("added"),
                bloom=entry.get("bloom"),
                bucket=entry.get("bucket"),
                specs=entry.get("specs"),
            )
            tmp_ptr = os.path.join(self.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
            self.last_snapshot = snap
            committed_ver = new_ver
        finally:
            self._release_lock()
            if committed_ver is None:
                shutil.rmtree(staged, ignore_errors=True)
        self._gc(keep=keep_snapshots)
        return committed_ver

    def update_where(
        self,
        spark: SparkSession,
        condition,
        updates: dict,
        key_cols: list[str],
        *,
        expect_version: int | None = None,
        keep_snapshots: int = 2,
        retries: int = 3,
    ) -> int:
        """Merge-on-read UPDATE — the third leg of the DML family,
        completing :meth:`delete_where`'s mechanism: the new commit
        HARDLINKS the data files untouched, extends the deletion
        vector with the matched keys (hiding the PRE-images), and
        writes the POST-image rows to a churn-sized ``_upd/`` sidecar
        that every read path unions back in after the anti-join. At
        100 TB an UPDATE touching 0.1%% of rows costs O(matched rows),
        not a table rewrite; ``compact_table`` (OPTIMIZE role) folds
        the delta in and drops both sidecars.

        ``updates``: ``{column: Column-or-SQL-expression}`` evaluated
        against the PRE-image row (Delta ``UPDATE SET`` semantics);
        results are cast back to the column's committed type so the
        delta's schema always equals the table's. Updating a key
        column is rejected (that is a delete+insert — use
        :func:`merge_write`). Chained updates compose: each version's
        delta holds the CURRENT post-images of every key updated since
        the last rewrite, so time travel to any version sees exactly
        that version's state, and a later DELETE that matches on
        post-update values finds them (delete matches the visible
        view when a delta exists). Same CAS + lock + change-feed +
        optimistic-retry behavior as ``delete_where`` (the feed gets
        the pre/post-image pair per matched row; a raced statement
        rebases and re-runs against the new head)."""
        return self._dml_retry(
            lambda: self._update_where_once(
                spark,
                condition,
                updates,
                key_cols,
                expect_version=expect_version,
                keep_snapshots=keep_snapshots,
            ),
            expect_version,
            retries,
            "update_where",
        )

    def _update_where_once(
        self,
        spark: SparkSession,
        condition,
        updates: dict,
        key_cols: list[str],
        *,
        expect_version: int | None,
        keep_snapshots: int,
    ) -> int:
        ptr = self._pointer()
        if ptr is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        snap_name, cur_ver = ptr
        src = os.path.join(self.root, snap_name)
        entry = self._log_entry(cur_ver) or {}
        # CLUSTERED snapshots supported (r12): sidecars hardlink
        # forward, bucket spec carries in the log entry — see
        # _delete_where_once for the read/compaction contract. One
        # honesty note: an outstanding _upd delta costs clustered
        # JOINS one exchange on the delta-carrying side (the union
        # breaks the scan's HashPartitioning) until compact_clustered
        # folds it; deletes alone keep the exchange-free plan.
        prev_dv = entry.get("dv")
        if prev_dv and list(prev_dv["key_cols"]) != list(key_cols):
            raise ValueError(
                f"{self.root}: deletion vector key_cols "
                f"{prev_dv['key_cols']} != {list(key_cols)} — compact "
                f"to materialize before re-keying"
            )
        bad = [c for c in updates if c in key_cols]
        if bad:
            raise ValueError(
                f"{self.root}: updating key column(s) {bad} is a "
                f"delete+insert — use merge_write"
            )
        pred = F.expr(condition) if isinstance(condition, str) else condition
        exprs = {
            c: (F.expr(e) if isinstance(e, str) else e)
            for c, e in updates.items()
        }
        visible = self._apply_dv(
            spark, _apply_map(_snap_read(spark, src, entry), entry), entry, src
        )
        missing = [c for c in updates if c not in visible.columns]
        if missing:
            raise ValueError(f"{self.root}: no column(s) {missing} to update")
        matched = visible.filter(pred)
        matched_keys = matched.select(*[F.col(c) for c in key_cols]).distinct()
        # post-images keep the committed schema exactly (casts back),
        # so the delta unions cleanly against the data files forever
        post = align_to_schema(matched.withColumns(exprs), visible.schema)
        checks = entry.get("checks") or {}
        if checks:
            # enforce the table's CHECK constraints on the ONLY new
            # rows this commit introduces (Delta validates UPDATE
            # results the same way); pre-images are already committed
            viol = post.select(
                *[
                    F.sum(
                        F.when(
                            ~F.coalesce(F.expr(p), F.lit(True)), 1
                        ).otherwise(0)
                    ).alias(n)
                    for n, p in checks.items()
                ]
            ).collect()[0]
            bad_checks = {n: viol[n] for n in checks if viol[n]}
            if bad_checks:
                raise ConstraintViolationError(
                    f"{self.root}: CHECK constraint(s) violated by "
                    f"update_where post-images, commit aborted — rows "
                    f"failing each: {bad_checks}"
                )
        staged = os.path.join(
            self.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        try:
            _link_tree(
                src,
                staged,
                skip_top=(self.DV_DIR, self.CDF_DIR, self.UPD_DIR),
            )
            fresh = matched_keys
            if prev_dv:
                fresh = fresh.unionByName(
                    spark.read.parquet(os.path.join(src, self.DV_DIR))
                ).distinct()
            fresh.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(staged, self.DV_DIR)
            )
            n_keys = int(
                spark.read.parquet(os.path.join(staged, self.DV_DIR)).count()
            )
            # the delta is PERSISTED under the base files' PHYSICAL
            # names (column_map applies uniformly to every file on
            # read): a delta written under the current logical names
            # would go unmappable after a further rename. Key columns
            # are never renamed while MoR state lives (rename guard),
            # so the anti-join below works on the raw files.
            cmap = entry.get("column_map") or {}
            post_phys = post.withColumnsRenamed(dict(cmap))
            new_delta = post_phys
            if entry.get("mor_delta"):
                kept = spark.read.parquet(
                    os.path.join(src, self.UPD_DIR)
                ).join(matched_keys, on=list(key_cols), how="left_anti")
                new_delta = kept.unionByName(post_phys)
            new_delta.write.mode("overwrite").parquet(
                os.path.join(staged, self.UPD_DIR)
            )
            n_delta = int(
                spark.read.parquet(os.path.join(staged, self.UPD_DIR)).count()
            )
            cdf_prop = list((entry.get("cdf") or {}).get("key_cols") or [])
            cdf_entry: dict | None = None
            if cdf_prop:
                cdf_path = os.path.join(staged, self.CDF_DIR)
                changes = matched.select(
                    F.lit("update_preimage").alias("_change_type"), "*"
                ).unionByName(
                    post.select(
                        F.lit("update_postimage").alias("_change_type"), "*"
                    )
                )
                changes.withColumn(
                    "_commit_version", F.lit(cur_ver + 1).cast("long")
                ).write.mode("overwrite").parquet(cdf_path)
                cdf_entry = {
                    "key_cols": cdf_prop,
                    "n_changes": int(spark.read.parquet(cdf_path).count()),
                    "change_types": [
                        "update_preimage",
                        "update_postimage",
                    ],
                }
        except FileNotFoundError as exc:
            shutil.rmtree(staged, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{self.root}: snapshot {snap_name} vanished during "
                f"update_where (concurrent writer + gc) — retry"
            ) from exc
        except Exception:
            shutil.rmtree(staged, ignore_errors=True)
            raise
        committed_ver: int | None = None
        self._acquire_lock()
        try:
            now = self._pointer()
            live_ver = 0 if now is None else now[1]
            if expect_version is not None and live_ver != expect_version:
                raise ConcurrentWriteError(
                    f"{self.root}: version {live_ver} != expected "
                    f"{expect_version}"
                )
            if live_ver != cur_ver:
                raise ConcurrentWriteError(
                    f"{self.root}: table advanced {cur_ver} -> {live_ver} "
                    f"during update_where — re-run against the new head"
                )
            new_ver = cur_ver + 1
            snap = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(self.root, snap))
            staged = os.path.join(self.root, snap)  # for error cleanup
            self._write_log(
                new_ver,
                snap,
                list(entry.get("partition_by") or []),
                entry.get("schema"),
                meta={
                    **_inherited_meta(entry),
                    "update_predicate": str(condition),
                },
                stats_cols=entry.get("stats_cols"),
                file_stats=entry.get("file_stats"),
                checks=entry.get("checks"),
                dv={"key_cols": list(key_cols), "n_keys": n_keys},
                cdf=cdf_entry,
                column_map=entry.get("column_map"),
                mor_delta={"n_rows": n_delta} if n_delta else None,
                dropped=entry.get("dropped"),
                added=entry.get("added"),
                bloom=entry.get("bloom"),
                bucket=entry.get("bucket"),
                specs=entry.get("specs"),
            )
            tmp_ptr = os.path.join(self.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
            self.last_snapshot = snap
            committed_ver = new_ver
        finally:
            self._release_lock()
            if committed_ver is None:
                shutil.rmtree(staged, ignore_errors=True)
        self._gc(keep=keep_snapshots)
        return committed_ver

    def pruned_files(
        self,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> tuple[list[str], int]:
        """File-level data skipping (VERDICT r8 item 6): the snapshot's
        data files whose committed [min, max] for ``col`` overlaps
        [``lo``, ``hi``], as absolute paths, plus the snapshot's TOTAL
        file count. Files without a recorded stat for ``col`` are
        conservatively kept — skipping is an optimization, never a
        correctness filter. Requires the snapshot to have been
        committed with ``stats_by`` covering ``col``; per-file stats
        come from the commit log (one tiny json read), not from
        opening any data file."""
        ptr = self._pointer()
        ver = ptr[1] if (version is None and ptr) else version
        if ver is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        snap = self.snapshot_path(ver)
        entry = self._log_entry(ver) or {}
        stats = entry.get("file_stats") or {}
        # stats are keyed by the files' PHYSICAL column names; callers
        # pass logical names (metadata-only rename, column_map)
        col = (entry.get("column_map") or {}).get(col, col)
        total = 0
        kept: list[str] = []
        for root, dirs, files in os.walk(snap):
            # hidden sidecars (the _dv deletion vector) are not data
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                total += 1
                fp = os.path.join(root, f)
                st = (stats.get(os.path.relpath(fp, snap)) or {}).get(col)
                if st is None or _stat_overlaps(st[0], st[1], lo, hi):
                    kept.append(fp)
        return kept, total

    def _partition_pruned_files(
        self, col: str, lo, hi, version: int | None = None
    ) -> "tuple[list, int] | None":
        """Partition-directory pruning: (kept_files, total) for a
        range over a PARTITION column, by parsing each data file's
        ``col=value`` path segment — or None when ``col`` is not a
        partition column of this version. Hive null partitions
        (``__HIVE_DEFAULT_PARTITION__``) are always kept (never prune
        on unknowable values); numeric partition columns compare
        numerically (dir values are strings)."""
        ver = version if version is not None else (self.version() or 0)
        entry = self._log_entry(ver) or {}
        if _entry_specs(entry):
            # EVOLVED snapshot: a column may be dir-encoded in some
            # specs and a plain data column in others — per-file rule
            return self._spec_pruned_files(col, lo, hi, entry, version)
        if col not in (entry.get("partition_by") or []):
            return None
        numeric = False
        sch = _phys_schema(entry)
        if sch is not None:
            for f in sch.fields:
                if f.name == col:
                    numeric = f.dataType.simpleString() in (
                        "tinyint",
                        "smallint",
                        "int",
                        "bigint",
                        "float",
                        "double",
                    )
        snap = self.snapshot_path(version)
        seg = f"{col}="
        kept: list[str] = []
        total = 0
        for r, dirs, fs in os.walk(snap):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in fs:
                if not f.endswith(".parquet"):
                    continue
                total += 1
                fp = os.path.join(r, f)
                val = None
                for part in os.path.relpath(r, snap).split(os.sep):
                    if part.startswith(seg):
                        val = part[len(seg):]
                if val is None or val == "__HIVE_DEFAULT_PARTITION__":
                    kept.append(fp)
                    continue
                # hive URL-escapes special characters into dir names
                # ('a/b' -> 'a%2Fb'); compare the TRUE value
                v = _unquote(val)
                if numeric:
                    try:
                        v = float(v)
                    except ValueError:
                        pass
                if _stat_overlaps(v, v, lo, hi):
                    kept.append(fp)
        return kept, total

    def _spec_pruned_files(
        self, col: str, lo, hi, entry: dict, version: int | None
    ) -> "tuple[list, int]":
        """Per-file pruning on an EVOLVED snapshot: a file whose path
        dir-encodes ``col`` (its spec partitions by it) prunes by the
        directory value; any other file falls back to its committed
        [min, max] stats; files with neither are kept — never prune on
        absent evidence. This is Iceberg's per-file spec resolution:
        the SAME predicate partition-prunes one spec's files and
        stats-skips another's, so a windowed read stays O(window)
        across the spec boundary."""
        numeric = False
        sch = _phys_schema(entry)
        if sch is not None:
            for f in sch.fields:
                if f.name == col:
                    numeric = f.dataType.simpleString() in (
                        "tinyint",
                        "smallint",
                        "int",
                        "bigint",
                        "float",
                        "double",
                    )
        snap = self.snapshot_path(version)
        stats = entry.get("file_stats") or {}
        phys = (entry.get("column_map") or {}).get(col, col)
        seg = f"{col}="
        kept: list[str] = []
        total = 0
        for r, dirs, fs in os.walk(snap):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in fs:
                if not f.endswith(".parquet"):
                    continue
                total += 1
                fp = os.path.join(r, f)
                val = None
                for part in os.path.relpath(r, snap).split(os.sep):
                    if part.startswith(seg):
                        val = part[len(seg):]
                if val is not None:
                    if val == "__HIVE_DEFAULT_PARTITION__":
                        kept.append(fp)
                        continue
                    v = _unquote(val)
                    if numeric:
                        try:
                            v = float(v)
                        except ValueError:
                            pass
                    if _stat_overlaps(v, v, lo, hi):
                        kept.append(fp)
                    continue
                st = (stats.get(os.path.relpath(fp, snap)) or {}).get(phys)
                if st is None or _stat_overlaps(st[0], st[1], lo, hi):
                    kept.append(fp)
        return kept, total

    def read_range(
        self,
        spark: SparkSession,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> DataFrame:
        """Range-pruned read: scan ONLY the data files whose committed
        [min, max] for ``col`` overlaps [``lo``, ``hi``] — the
        file-level skip Delta does from its per-file stats, here from
        the commit log's ``stats_by`` records. The pruning is coarse
        (file granularity): the caller still applies its exact
        predicate on the returned frame; this method only guarantees
        no qualifying row is skipped.

        Partitioned snapshots compose BOTH prunings (r10): a range
        over a partition column prunes by directory value, any other
        column by its file stats, and the surviving explicit file
        list reconstructs the partition columns via ``basePath``. At
        100 TB this is the difference between listing+scanning
        O(table) files and O(window) files for the date-windowed
        reads every incremental consumer issues."""
        return self.read_where(spark, {col: (lo, hi)}, version=version)

    def read_where(
        self,
        spark: SparkSession,
        ranges: dict,
        version: int | None = None,
    ) -> DataFrame:
        """Multi-column file-skipping read: scan only files whose
        committed [min, max] overlaps EVERY ``{col: (lo, hi)}`` range
        (conjunctive predicate). On a z-ordered snapshot
        (:func:`zorder_key` via ``compact_table(zorder_by=...)``)
        each listed dimension prunes independently — the point of
        multi-dimensional clustering. Partition columns prune by
        directory value (r10); same coarse-pruning contract as
        :meth:`read_range`."""
        entry = self._log_entry(
            version if version is not None else (self.version() or 0)
        )
        if not ranges:
            raise ValueError("read_where requires at least one column range")
        kept: set[str] | None = None
        for col, (lo, hi) in ranges.items():
            part = self._partition_pruned_files(col, lo, hi, version=version)
            files = (
                part[0]
                if part is not None
                else self.pruned_files(col, lo, hi, version=version)[0]
            )
            kept = set(files) if kept is None else kept & set(files)
        return self._read_file_subset(spark, kept or set(), entry, version)

    def bloom_pruned_files(
        self, col: str, value, version: int | None = None
    ) -> tuple[list, int, bool]:
        """(kept_files, total_files, indexed): the data files whose
        per-file bloom MAY contain ``value`` in ``col``. Driver-side
        only — the sidecar is tiny metadata (~1.2 bytes/indexed key),
        so probing reads no data files and runs no cluster job.
        ``indexed=False`` (no bloom for this column/version) keeps
        everything. Files missing from the sidecar are kept (never
        prune on absent evidence). False positives are the caller's
        exact predicate's job; false negatives cannot happen — the
        build and probe share one hash (:func:`_bloom_positions`)."""
        import pyarrow.parquet as pq

        ver = version if version is not None else (self.version() or 0)
        entry = self._log_entry(ver) or {}
        snap = self.snapshot_path(version)
        phys = (entry.get("column_map") or {}).get(col, col)
        total = 0
        files: list[str] = []
        for root, dirs, fs in os.walk(snap):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in fs:
                if f.endswith(".parquet"):
                    total += 1
                    files.append(os.path.join(root, f))
        bloom_prop = entry.get("bloom") or {}
        if phys not in (bloom_prop.get("cols") or []):
            return files, total, False
        side = os.path.join(snap, self.BLOOM_DIR)
        try:
            tbl = pq.read_table(side)
        except (FileNotFoundError, OSError):
            return files, total, False
        key = _bloom_key(value)
        probes: dict[str, bool] = {}
        cols_np = tbl.column("col").to_pylist()
        file_np = tbl.column("file").to_pylist()
        m_np = tbl.column("m").to_pylist()
        k_np = tbl.column("k").to_pylist()
        bits_np = tbl.column("bits").to_pylist()
        for fn, c, m, k, bits in zip(file_np, cols_np, m_np, k_np, bits_np):
            if c != phys:
                continue
            probes[fn] = all(
                bits[pos >> 3] & (1 << (pos & 7))
                for pos in _bloom_positions(key, m, k)
            )
        kept = [
            fp
            for fp in files
            if probes.get(os.path.relpath(fp, snap), True)
        ]
        return kept, total, True

    def read_point(
        self,
        spark: SparkSession,
        col: str,
        value,
        version: int | None = None,
    ) -> DataFrame:
        """Point-lookup read: scan only the files whose bloom filter
        may contain ``value`` AND whose [min, max] stats cover it
        (each index prunes independently; either may be absent). The
        complement of :meth:`read_range`: min/max stats prune range
        predicates on clustered columns, the bloom prunes equality
        probes on high-cardinality columns where every file's range
        spans the domain — together they are Delta's data-skipping +
        bloom-index pair. Coarse-pruning contract as
        :meth:`read_range`: the caller still applies the exact
        ``col = value`` predicate; no qualifying row is skipped
        (merge-on-read sidecars union in even when every base file
        prunes away)."""
        ver = version if version is not None else (self.version() or 0)
        entry = self._log_entry(ver)
        part = self._partition_pruned_files(col, value, value, version=version)
        if part is not None:
            # partition-column probe: directory pruning IS the index
            return self._read_file_subset(
                spark, set(part[0]), entry, version
            )
        b_kept, _total, indexed = self.bloom_pruned_files(
            col, value, version=version
        )
        kept = set(b_kept)
        stats = (entry or {}).get("file_stats") or {}
        phys = ((entry or {}).get("column_map") or {}).get(col, col)
        if any(phys in (st or {}) for st in stats.values()):
            s_files, _ = self.pruned_files(col, value, value, version=version)
            kept &= set(s_files)
        return self._read_file_subset(spark, kept, entry, version)

    def _read_file_subset(
        self,
        spark: SparkSession,
        kept: set,
        entry: dict | None,
        version: int | None,
    ) -> DataFrame:
        """Finish a file-skipping read over an explicit surviving-file
        set: declare the physical schema, scan only ``kept``, and run
        the merge-on-read finisher. When EVERY base file was pruned the
        ``_upd``/``_dv`` sidecars must still apply on an empty base —
        update_where can move rows into ranges no base file's stats
        cover (ADVICE r9) — so the 'no qualifying row is skipped'
        contract holds on the empty path too."""
        schema = None
        if entry and entry.get("schema"):
            try:
                schema = T.StructType.fromJson(json.loads(entry["schema"]))
            except (ValueError, KeyError, TypeError):
                schema = None
        if not kept:
            if schema is None:
                schema = self.read(spark, version=version).schema
            empty = spark.createDataFrame([], schema)
            if entry and (entry.get("dv") or entry.get("mor_delta")):
                return self._apply_dv(
                    spark, empty, entry, self.snapshot_path(version)
                )
            return empty
        reader = spark.read
        cmap = (entry or {}).get("column_map") or {}
        if schema is not None:
            # the files carry PHYSICAL names: declare the schema in
            # physical terms (parquet matches by name), rename after
            phys_schema = T.StructType(
                [
                    T.StructField(
                        cmap.get(f.name, f.name), f.dataType, f.nullable
                    )
                    for f in schema.fields
                ]
            )
            reader = reader.schema(phys_schema)
        snap = self.snapshot_path(version)
        specs = _entry_specs(entry)
        if specs:
            # EVOLVED snapshot: group the surviving files by their
            # spec subtree and scan each group with ITS basePath, so
            # each spec's dir-encoded partition columns reconstruct;
            # the union normalizes column order (hive scans put
            # partition columns last)
            by_spec: dict[str, list] = {}
            for fp in sorted(kept):
                rel = os.path.relpath(fp, snap)
                by_spec.setdefault(rel.split(os.sep, 1)[0], []).append(fp)
            names = (
                [f.name for f in phys_schema.fields]
                if schema is not None
                else None
            )
            frames = []
            for sd, files in sorted(by_spec.items()):
                r = spark.read
                if schema is not None:
                    r = r.schema(phys_schema)
                r = r.option("basePath", os.path.join(snap, sd))
                fr = r.parquet(*files)
                frames.append(fr.select(*names) if names else fr)
            out = frames[0]
            for fr in frames[1:]:
                out = out.unionByName(fr)
            return self._apply_dv(spark, _apply_map(out, entry), entry, snap)
        if (entry or {}).get("partition_by"):
            # explicit file lists drop hive partition columns unless
            # the reader knows the tree root they were derived from
            reader = reader.option("basePath", snap)
        return self._apply_dv(
            spark,
            _apply_map(reader.parquet(*sorted(kept)), entry),
            entry,
            snap,
        )

    # -- commit protocol ---------------------------------------------------
    def _acquire_lock(self, timeout: float = 30.0) -> None:
        lock = os.path.join(self.root, self.LOCK)
        deadline = time.monotonic() + timeout
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, f"{os.getpid()} {time.time()}\n".encode())
                os.close(fd)
                return
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(lock)
                    if age > self.stale_lock_sec:
                        # break a dead writer's lock via RENAME, not
                        # unlink: two waiters may both see it stale, and
                        # with unlink the slower one would delete the
                        # faster one's freshly created lock (TOCTOU ->
                        # two writers inside the critical section). The
                        # rename is atomic; exactly one waiter wins it,
                        # the loser's rename raises FileNotFoundError
                        # and it falls back to contending on O_EXCL.
                        doomed = f"{lock}.stale-{uuid.uuid4().hex[:8]}"
                        os.rename(lock, doomed)
                        # re-stat AFTER the rename: if the apparently-
                        # dead holder released and a NEW writer acquired
                        # between our getmtime and the rename, the file
                        # we just renamed away is that writer's FRESH
                        # live lock. Give it back via os.link (fails if
                        # the lock path was re-created meanwhile, so we
                        # never clobber a third writer's lock the way a
                        # rename-back would). Residual window: if a
                        # THIRD writer O_EXCLs the lock path inside this
                        # same microsecond gap, the link fails and the
                        # second writer's hold ends up file-less — two
                        # holders again, but only with three writers
                        # interleaving within one stale-break, each step
                        # microsecond-scale against a minutes-scale TTL.
                        # On filesystems without hard links the link
                        # raises OSError and degrades to the same
                        # already-narrow behavior.
                        try:
                            fresh = (
                                time.time() - os.path.getmtime(doomed)
                                <= self.stale_lock_sec
                            )
                        except FileNotFoundError:
                            continue
                        if fresh:
                            try:
                                os.link(doomed, lock)
                            except (FileExistsError, OSError):
                                pass
                        os.unlink(doomed)
                        continue
                except FileNotFoundError:
                    continue  # holder released between open and stat
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"commit lock on {self.root} held for {age:.0f}s"
                    ) from None
                time.sleep(0.05)

    def _release_lock(self) -> None:
        try:
            os.unlink(os.path.join(self.root, self.LOCK))
        except FileNotFoundError:
            pass

    def _live_schema(self, spark: SparkSession) -> T.StructType | None:
        """Schema of the live snapshot: from its log entry (one tiny
        json read) when present, else the parquet footers (an adopted
        legacy table's first evolved commit)."""
        ptr = self._pointer()
        if ptr is None:
            return None
        entry = self._log_entry(ptr[1])
        if entry is not None and entry.get("schema"):
            try:
                return T.StructType.fromJson(json.loads(entry["schema"]))
            except (ValueError, KeyError, TypeError):
                pass
        return spark.read.parquet(os.path.join(self.root, ptr[0])).schema

    def commit(
        self,
        df: DataFrame,
        *,
        expect_version: int | None = None,
        keep_snapshots: int = 2,
        partition_by: list[str] | None = None,
        schema_mode: str = "evolve",
        meta: dict | None = None,
        stats_by: list[str] | None = None,
        bloom_by: list[str] | None = None,
        bloom_fpp: float = 0.01,
        check: dict[str, str] | None = None,
        cdf_keys: list[str] | None = None,
        cdf_mode: str = "auto",
    ) -> int:
        """Write ``df`` as a new snapshot and atomically repoint.

        ``expect_version``: optimistic-concurrency guard — raise
        :class:`ConcurrentWriteError` (and clean up the orphaned
        snapshot) if another writer committed since the caller read
        that version. ``None`` = unconditional (last-writer-wins, still
        atomic). Returns the new version.

        ``partition_by``: hive-partition the snapshot by these columns
        (a date-partitioned sink prunes reads to the filtered
        partitions — VERDICT r7 item 3). ``None`` inherits the live
        snapshot's partitioning (table layout is a property of the
        table, as in Delta); pass ``[]`` to unpartition deliberately.

        ``schema_mode="evolve"`` (default): align ``df`` by name to the
        union of the committed and incoming schemas — new columns
        append, committed columns missing from ``df`` are null-filled,
        lossless type widenings apply, and any narrowing raises
        :class:`SchemaEvolutionError` instead of silently committing a
        snapshot the next ``merge_write`` would misalign with (VERDICT
        r7 item 5). ``schema_mode="replace"`` commits ``df``'s schema
        verbatim (the deliberate re-schema escape hatch).

        Evolution and partition inheritance are resolved from a
        pre-lock pointer read (the snapshot write is long and
        deliberately unlocked), then RE-VALIDATED inside the commit
        lock (ADVICE r8): if a concurrent writer advanced the table
        meanwhile and the staged snapshot no longer subsumes the new
        live schema (it would silently drop that writer's appended
        column) or no longer matches the inherited partition layout,
        the staged dir is discarded and the write re-runs against the
        new base — Delta re-validates inside its commit the same way.
        Bounded retries; a table advancing faster than the writer can
        restage surfaces as :class:`ConcurrentWriteError`.

        ``meta``: free-form metadata recorded in the commit's log
        entry ATOMICALLY with the commit (unlike a post-hoc
        :meth:`annotate` there is no commit-without-meta window — the
        exactly-once streaming sink's epoch guard relies on this).

        ``stats_by``: record per-file [min, max] for these columns in
        the commit log (read from the parquet footers — no data
        scan), enabling :meth:`read_range` file skipping on range
        predicates over a non-partition column (VERDICT r8 item 6 —
        Delta's dataSkipping stats). ``None`` inherits the live
        entry's stats columns (so compaction re-records them for the
        rewritten files); ``[]`` disables deliberately.

        ``bloom_by``: build the per-file bloom-filter index for these
        columns (Delta's bloom filter index): one bloom per (data
        file, column) in a hidden ``_bloom/`` sidecar, sized by
        ``bloom_fpp``, enabling :meth:`read_point` file skipping on
        equality probes over high-cardinality columns that [min, max]
        stats cannot prune. ``None`` inherits the live entry's indexed
        columns (compaction re-indexes its rewritten files); ``[]``
        disables. Integral and string columns only (the probe's
        canonical encoding must match ``CAST AS STRING``); the index
        indexes data columns only (a partition column's "index" IS its
        directory value — :meth:`read_point` prunes it directly).

        ``check``: named CHECK constraints (``{name: sql_predicate}``,
        names must be valid identifiers) enforced on every commit —
        Delta CHECK-constraint semantics: a row where the predicate
        is FALSE aborts the whole commit with
        :class:`ConstraintViolationError` (staged files removed,
        pointer untouched); NULL satisfies. Violation counts ride the
        snapshot write job itself via ``Observation`` — enforcement
        costs ZERO extra scans, exactly how Delta validates
        invariants during the write. ``None`` inherits the live
        entry's constraints (a table property, like layout);
        ``{}`` drops them deliberately. Inherited enforcement means
        every path that funnels through ``commit`` — ``merge_write``,
        the epoch sink, compaction — honors the table's constraints
        automatically.

        ``cdf_keys``: enable the change data feed as a table property
        (Delta ``enableChangeDataFeed``): every subsequent commit
        MATERIALIZES its change rows (:meth:`diff` output plus a
        ``_commit_version`` column) into a hidden ``_cdf/`` sidecar
        inside the new snapshot, so consumers — the ``manifest_cdf``
        stream/batch source — read each version's churn-sized change
        files instead of recomputing joins. ``None`` inherits the
        property; ``[]`` drops it deliberately. Cost honesty: the
        commit pays one keyed full-outer join of the previous and new
        states — the same asymptotic class as the MERGE that produced
        the commit; consumers then pay O(churn) forever after, which
        is the right trade for any table with more than one reader.
        ``cdf_mode="noop"`` marks the commit as logically content-
        preserving (compaction): no join runs, and feed readers skip
        the version. A commit that would race a concurrent writer
        restages so the feed is computed against the version it
        actually supersedes — the feed is SERIALIZED even when
        writers are not."""
        if schema_mode not in ("evolve", "replace"):
            raise ValueError(f"unknown schema_mode {schema_mode!r}")
        if cdf_mode not in ("auto", "noop"):
            raise ValueError(f"unknown cdf_mode {cdf_mode!r}")
        os.makedirs(self.root, exist_ok=True)
        # a pending GROUP intent on this root means a group commit
        # crashed mid-swap: settle it first (roll forward if any member
        # swapped, dead-letter otherwise) so this commit's version
        # number cannot collide with the group's half-published state
        # (ADVICE r10)
        if os.path.exists(os.path.join(self.root, GROUP_INTENT)):
            recover_group(self.root)
        orig_df = df
        want_partition_by = partition_by
        want_stats_by = stats_by
        want_bloom_by = bloom_by
        want_check = check
        want_cdf_keys = cdf_keys

        def _shape(schema: T.StructType) -> list[tuple[str, T.DataType]]:
            # compare name+type only: align_to_schema's select cannot
            # control nullability, so including it would force a
            # spurious restage loop on every nullable-flag mismatch
            return [(f.name, f.dataType) for f in schema.fields]

        for _attempt in range(5):
            ptr = self._pointer()
            base_ver = 0 if ptr is None else ptr[1]
            prev = self._log_entry(base_ver) if ptr else None
            df = orig_df
            if schema_mode == "evolve" and ptr is not None:
                live = self._live_schema(df.sparkSession)
                if live is not None and live != df.schema:
                    df = align_to_schema(df, evolve_schema(live, df.schema))
            if want_partition_by is None:
                partition_by = (
                    list(prev.get("partition_by") or []) if prev else []
                )
            else:
                partition_by = list(want_partition_by)
            missing = [c for c in partition_by if c not in df.columns]
            if missing:
                raise ValueError(
                    f"partition_by columns not in schema: {missing}"
                )
            if want_stats_by is None:
                stats_cols = list(prev.get("stats_cols") or []) if prev else []
            else:
                stats_cols = list(want_stats_by)
            if want_bloom_by is None:
                prev_bloom = (prev or {}).get("bloom") or {}
                bloom_cols = list(prev_bloom.get("cols") or [])
                fpp = float(prev_bloom.get("fpp") or bloom_fpp)
            else:
                bloom_cols = list(want_bloom_by)
                fpp = float(bloom_fpp)
            if want_check is None:
                checks = dict(prev.get("checks") or {}) if prev else {}
            else:
                checks = dict(want_check)
            if want_cdf_keys is None:
                cdf_prop = (
                    list((prev.get("cdf") or {}).get("key_cols") or [])
                    if prev
                    else []
                )
            else:
                cdf_prop = list(want_cdf_keys)
            staged = f"snap-staging-{uuid.uuid4().hex[:12]}"
            obs = None
            df_w = df
            if checks:
                obs = Observation()
                df_w = df.observe(
                    obs,
                    *[
                        F.sum(
                            F.when(
                                ~F.coalesce(F.expr(pred), F.lit(True)), 1
                            ).otherwise(0)
                        ).alias(name)
                        for name, pred in checks.items()
                    ],
                )
            writer = df_w.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(os.path.join(self.root, staged))
            if obs is not None:
                bad = {n: v for n, v in obs.get.items() if v}
                if bad:
                    shutil.rmtree(
                        os.path.join(self.root, staged), ignore_errors=True
                    )
                    raise ConstraintViolationError(
                        f"{self.root}: CHECK constraint(s) violated, "
                        f"commit aborted — rows failing each: {bad} "
                        f"(predicates: "
                        f"{ {n: checks[n] for n in bad} })"
                    )
            cdf_entry: dict | None = None
            if cdf_prop:
                if cdf_mode == "noop":
                    cdf_entry = {"key_cols": cdf_prop, "noop": True}
                else:
                    spark = df.sparkSession
                    staged_path = os.path.join(self.root, staged)
                    new_state = spark.read.parquet(staged_path)
                    if ptr is None and not partition_by:
                        # the initial load is all-insert BY DEFINITION:
                        # writing an insert sidecar would double the
                        # table's first write (fatal at 100 TB), so the
                        # entry marks it `initial` and feed readers
                        # serve inserts from the DATA files directly —
                        # Delta's append-commit CDF optimization.
                        # (Partitioned initial loads fall through to
                        # the sidecar: their data files don't carry the
                        # partition columns.)
                        cdf_entry = {
                            "key_cols": cdf_prop,
                            "n_changes": int(new_state.count()),
                            "initial": True,
                            "change_types": ["insert"],
                        }
                    else:
                        if ptr is None:
                            changes = new_state.select(
                                F.lit("insert").alias("_change_type"), "*"
                            )
                        else:
                            changes = _diff_frames(
                                self.read(spark, version=base_ver),
                                new_state,
                                cdf_prop,
                            )
                        cdf_path = os.path.join(staged_path, self.CDF_DIR)
                        changes.withColumn(
                            "_commit_version", F.lit(base_ver + 1).cast("long")
                        ).write.mode("overwrite").parquet(cdf_path)
                        # count + distinct change types in ONE pass over
                        # the churn-sized sidecar (types let a filtered
                        # feed read skip the whole version, r13)
                        stat = (
                            spark.read.parquet(cdf_path)
                            .agg(
                                F.count("*").alias("n"),
                                F.collect_set("_change_type").alias("t"),
                            )
                            .first()
                        )
                        cdf_entry = {
                            "key_cols": cdf_prop,
                            "n_changes": int(stat["n"]),
                            "change_types": sorted(stat["t"]),
                        }
            schema_json = df.schema.json()
            file_stats = (
                collect_file_stats(os.path.join(self.root, staged), stats_cols)
                if stats_cols
                else None
            )
            # per-file bloom index (inherited like stats_by; cols that
            # no longer exist after a drop/re-schema fall away quietly)
            bloom_cols = [
                c
                for c in bloom_cols
                if c in df.columns and c not in partition_by
            ]
            bloom_entry = None
            if bloom_cols:
                _write_bloom_sidecar(
                    df.sparkSession,
                    os.path.join(self.root, staged),
                    bloom_cols,
                    fpp,
                )
                bloom_entry = {"cols": bloom_cols, "fpp": fpp}
            committed_ver: int | None = None
            self._acquire_lock()
            try:
                ptr = self._pointer()
                cur_ver = 0 if ptr is None else ptr[1]
                if expect_version is not None and cur_ver != expect_version:
                    shutil.rmtree(
                        os.path.join(self.root, staged), ignore_errors=True
                    )
                    raise ConcurrentWriteError(
                        f"{self.root}: version {cur_ver} != expected "
                        f"{expect_version}"
                    )
                restage = False
                if (
                    cdf_entry is not None
                    and "n_changes" in cdf_entry
                    and cur_ver != base_ver
                ):
                    # the materialized feed was diffed against a
                    # version this commit no longer supersedes —
                    # committing it would record the racing writer's
                    # changes as this commit's (or lose them). Restage
                    # so the feed is exact against the real base.
                    restage = True
                if not restage and expect_version is None and cur_ver != base_ver:
                    # an unconditional commit whose evolution /
                    # inheritance base is stale: re-check against the
                    # NEW live state. Proceed only if the staged
                    # snapshot already subsumes it (same columns after
                    # re-evolution, same partition layout); otherwise
                    # restage outside the lock.
                    new_prev = self._log_entry(cur_ver)
                    if want_partition_by is None:
                        inherited = (
                            list(new_prev.get("partition_by") or [])
                            if new_prev
                            else []
                        )
                        restage = inherited != partition_by
                    if not restage and schema_mode == "evolve":
                        new_live = self._live_schema(df.sparkSession)
                        restage = new_live is not None and _shape(
                            evolve_schema(new_live, df.schema)
                        ) != _shape(df.schema)
                if not restage:
                    new_ver = cur_ver + 1
                    snap = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
                    os.rename(
                        os.path.join(self.root, staged),
                        os.path.join(self.root, snap),
                    )
                    # log BEFORE the pointer swap: a crash in between
                    # leaves an unpointed intent entry this version
                    # number's retry overwrites; a crash after leaves a
                    # fully consistent log
                    self._write_log(
                        new_ver,
                        snap,
                        partition_by,
                        schema_json,
                        meta=meta,
                        stats_cols=stats_cols,
                        file_stats=file_stats,
                        checks=checks,
                        cdf=cdf_entry,
                        bloom=bloom_entry,
                    )
                    tmp_ptr = os.path.join(
                        self.root, f".ptr-{uuid.uuid4().hex[:8]}"
                    )
                    with open(tmp_ptr, "w") as fh:
                        fh.write(f"{snap}\n{new_ver}\n")
                    os.replace(
                        tmp_ptr, os.path.join(self.root, self.POINTER)
                    )
                    self.last_snapshot = snap
                    committed_ver = new_ver
            finally:
                self._release_lock()
            if committed_ver is not None:
                self._gc(keep=keep_snapshots)
                return committed_ver
            shutil.rmtree(os.path.join(self.root, staged), ignore_errors=True)
        raise ConcurrentWriteError(
            f"{self.root}: live version kept advancing during evolve/"
            f"inheritance re-validation (5 restage attempts)"
        )

    def set_sort_order(self, cols: "list[str] | None") -> bool:
        """Declare (or clear, with ``None``/``[]``) the table's WRITE
        SORT ORDER — Iceberg's ``write.sort-order`` as a table
        property: every :meth:`append` batch sorts within tasks on
        (partition columns + these columns) before writing, so each
        appended file carries a TIGHT committed [min, max] for them
        and incremental ingest stays data-skippable WITHOUT waiting
        for :func:`compact_table` (which also defaults its sorted
        rewrite to this order). Stored in commit meta, so every
        entry-producing path (DML, restore, clone, ALTER, groups)
        inherits it via :func:`_inherited_meta`; RENAME rewrites the
        listed names, DROP removes them. Cost: O(batch log batch) per
        task at write time — the price of not paying a full re-sort
        at maintenance time."""
        ptr = self._pointer()
        if ptr is None:
            raise FileNotFoundError(
                f"no committed snapshot under {self.root}"
            )
        ver = ptr[1]
        entry = self._log_entry(ver) or {}
        cols = [str(c) for c in (cols or [])]
        if cols:
            if not entry.get("schema"):
                raise ValueError(
                    f"{self.root}: sort order needs a declared schema "
                    f"in the commit log"
                )
            names = {
                f.name
                for f in T.StructType.fromJson(
                    json.loads(entry["schema"])
                ).fields
            }
            for c in cols:
                if c not in names:
                    raise ValueError(
                        f"{self.root}: sort column {c!r} not in the "
                        f"table schema {sorted(names)}"
                    )
        return self.annotate(ver, sort_order=cols)

    def evolve_partition(
        self,
        new_partition_by: list,
        *,
        expect_version: int | None = None,
        keep_snapshots: int = 2,
        meta: dict | None = None,
    ) -> int:
        """ICEBERG-style PARTITION EVOLUTION: change the table's
        partition spec as a METADATA-ONLY commit — zero data bytes
        move. At 100 TB this is the difference between adopting a
        better layout (the events table outgrew ``date`` and needs
        ``date, tenant``; the dimension stopped needing partitioning
        at all) and rewriting the whole table to get it: old files
        stay exactly where they are under their original spec, only
        rows appended AFTER the evolution land under the new one.

        Mechanics (Iceberg's spec-id-per-file, at directory
        granularity): the first evolution moves the existing data tree
        under ``spec-0/`` (hardlinks — O(files) metadata operations)
        and creates ``spec-<n>/`` for the new layout; every later
        evolution just appends a spec. The commit entry records the
        full spec history under ``specs``; ``partition_by`` stays the
        ACTIVE spec so every layout-equality check sees the current
        contract. Readers (:func:`_snap_read`, the ``manifest`` SQL
        datasource, ``read_where``) scan spec subtrees independently
        and union — a filter on any column partition-prunes the specs
        that dir-encode it and falls back to per-file min/max stats
        everywhere else, so windowed reads stay O(window) across the
        spec boundary. ``compact_table`` MIGRATES: its full rewrite
        lands everything under the active spec and collapses the
        history.

        Composes with append (new batches under the active spec),
        merge-on-read DML (sidecars are key-scoped, spec-agnostic),
        the change feed (this commit is content-preserving — feed
        readers skip it as ``noop``), time travel and restore (each
        version's entry pins its own spec list). Refused on CLUSTERED
        tables (bucket layout and hive specs are different contracts —
        ``commit()`` to drop the clustering first). Reference anchor:
        the reference pins one layout per target table in config
        (``src/storage.py:41-53``); evolution is what a 100 TB ledger
        needs when that choice has to change in place."""
        ptr = self._pointer()
        if ptr is None:
            raise FileNotFoundError(
                f"no committed snapshot under {self.root}"
            )
        snap_name, cur_ver = ptr
        if expect_version is not None and cur_ver != expect_version:
            raise ConcurrentWriteError(
                f"{self.root}: version {cur_ver} != expected "
                f"{expect_version}"
            )
        entry = self._log_entry(cur_ver) or {}
        if entry.get("bucket"):
            raise ValueError(
                f"{self.root}: the live snapshot is CLUSTERED "
                f"(commit_clustered bucket layout) — partition "
                f"evolution applies to hive layouts. commit(read(...)) "
                f"to deliberately drop the clustering first."
            )
        new_pb = [str(c) for c in (new_partition_by or [])]
        cur_pb = list(entry.get("partition_by") or [])
        if new_pb == cur_pb:
            raise ValueError(
                f"{self.root}: new spec equals the active partition "
                f"spec {cur_pb} — nothing to evolve"
            )
        if len(set(new_pb)) != len(new_pb):
            raise ValueError(
                f"{self.root}: duplicate partition columns in {new_pb}"
            )
        if not entry.get("schema"):
            raise ValueError(
                f"{self.root}: partition evolution needs a declared "
                f"schema in the commit log (legacy/adopted snapshot — "
                f"re-commit through the DataFrame API first)"
            )
        logical = T.StructType.fromJson(json.loads(entry["schema"]))
        names = {f.name for f in logical.fields}
        for c in new_pb:
            if c not in names:
                raise ValueError(
                    f"{self.root}: partition column {c!r} not in the "
                    f"table schema {sorted(names)}"
                )
        src = os.path.join(self.root, snap_name)
        if not os.path.isdir(src):
            raise ConcurrentWriteError(
                f"{self.root}: snapshot {snap_name} vanished before "
                f"evolve_partition (concurrent writer + gc) — retry"
            )
        specs = _entry_specs(entry)
        staged = os.path.join(
            self.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        file_stats = entry.get("file_stats")
        try:
            if specs:
                # already evolved: the whole tree (spec dirs +
                # sidecars) links forward; only _cdf is version-local
                _link_tree(src, staged, skip_top=(self.CDF_DIR,))
                new_id = max(int(s["id"]) for s in specs) + 1
                specs = [*specs, {"id": new_id, "partition_by": new_pb}]
            else:
                # first evolution: the existing data tree BECOMES
                # spec-0; hidden sidecars stay at the snapshot top
                os.makedirs(staged)
                prefix = _spec_dirname(0)
                for d, dirs, fs in os.walk(src):
                    rel = os.path.relpath(d, src)
                    if rel == ".":
                        side = [
                            x
                            for x in dirs
                            if x.startswith(("_", "."))
                            and x != self.CDF_DIR
                        ]
                        dirs[:] = [
                            x for x in dirs if not x.startswith(("_", "."))
                        ]
                        for s in side:
                            _link_tree(
                                os.path.join(src, s),
                                os.path.join(staged, s),
                            )
                        rel = ""
                    dst_dir = (
                        os.path.join(staged, prefix, rel)
                        if rel
                        else os.path.join(staged, prefix)
                    )
                    os.makedirs(dst_dir, exist_ok=True)
                    for f in fs:
                        if not f.endswith(".parquet"):
                            continue
                        sp_, dp_ = os.path.join(d, f), os.path.join(dst_dir, f)
                        try:
                            os.link(sp_, dp_)
                        except OSError:
                            shutil.copy2(sp_, dp_)
                specs = [
                    {"id": 0, "partition_by": cur_pb},
                    {"id": 1, "partition_by": new_pb},
                ]
                new_id = 1
                # per-file metadata is keyed by snapshot-relative
                # paths, which just gained the spec-0/ prefix
                if file_stats:
                    file_stats = {
                        f"{prefix}/{rel_}": st
                        for rel_, st in file_stats.items()
                    }
                bdir = os.path.join(staged, self.BLOOM_DIR)
                if entry.get("bloom") and os.path.isdir(bdir):
                    import pyarrow as pa
                    import pyarrow.parquet as pq

                    old = pq.read_table(bdir)
                    shutil.rmtree(bdir)
                    os.makedirs(bdir)
                    if old.num_rows:
                        rekeyed = old.set_column(
                            old.schema.get_field_index("file"),
                            "file",
                            pa.array(
                                [
                                    f"{prefix}/{x}"
                                    for x in old.column("file").to_pylist()
                                ],
                                pa.string(),
                            ),
                        )
                        pq.write_table(
                            rekeyed,
                            os.path.join(
                                bdir,
                                f"rekeyed-{uuid.uuid4().hex[:8]}.parquet",
                            ),
                        )
            os.makedirs(
                os.path.join(staged, _spec_dirname(new_id)), exist_ok=True
            )
        except FileNotFoundError as exc:
            shutil.rmtree(staged, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{self.root}: snapshot {snap_name} vanished during "
                f"evolve_partition (concurrent writer + gc) — retry"
            ) from exc
        except Exception:
            shutil.rmtree(staged, ignore_errors=True)
            raise
        committed_ver: int | None = None
        self._acquire_lock()
        try:
            now = self._pointer()
            live_ver = 0 if now is None else now[1]
            if live_ver != cur_ver:
                raise ConcurrentWriteError(
                    f"{self.root}: table advanced {cur_ver} -> "
                    f"{live_ver} during evolve_partition — re-run "
                    f"against the new head"
                )
            new_ver = cur_ver + 1
            snap = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(self.root, snap))
            staged = os.path.join(self.root, snap)  # for error cleanup
            self._write_log(
                new_ver,
                snap,
                new_pb,
                entry.get("schema"),
                meta={
                    **_inherited_meta(entry),
                    **(meta or {}),
                    "evolve_partition": {
                        "from": cur_pb,
                        "to": new_pb,
                        "spec_id": new_id,
                    },
                },
                stats_cols=entry.get("stats_cols"),
                file_stats=file_stats,
                checks=entry.get("checks"),
                dv=entry.get("dv"),
                # content-preserving commit: feed readers skip it
                cdf=(
                    {
                        "key_cols": list(entry["cdf"]["key_cols"]),
                        "noop": True,
                    }
                    if (entry.get("cdf") or {}).get("key_cols")
                    else None
                ),
                column_map=entry.get("column_map"),
                mor_delta=entry.get("mor_delta"),
                dropped=entry.get("dropped"),
                added=entry.get("added"),
                bloom=entry.get("bloom"),
                specs=specs,
            )
            tmp_ptr = os.path.join(self.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
            self.last_snapshot = snap
            committed_ver = new_ver
        finally:
            self._release_lock()
            if committed_ver is None:
                shutil.rmtree(staged, ignore_errors=True)
        self._gc(keep=keep_snapshots)
        return committed_ver

    def append(
        self,
        df: DataFrame,
        *,
        expect_version: int | None = None,
        keep_snapshots: int = 2,
        meta: dict | None = None,
    ) -> int:
        """APPEND-commit: add ``df``'s rows as NEW data files next to
        the previous snapshot's files, which HARDLINK forward
        untouched — Delta's add-file commit. :meth:`commit` is
        copy-on-write of the WHOLE table state; at 100 TB an ingest
        loop cannot rewrite 100 TB to land a 1 GB batch, so this is
        the write path whose cost is O(batch): link the base (zero
        data bytes), write only the new rows, carry per-file stats
        and bloom sidecar rows forward verbatim and index only the
        new files, and materialize the change feed as the appended
        rows themselves (insert-only by construction — no diff join,
        Delta's append-commit CDF optimization).

        Schema evolves exactly like :meth:`commit` (new columns
        append, missing columns null-fill, lossless widenings;
        narrowing raises) — the snapshot then legally mixes file
        schemas, which every reader handles by DECLARING the entry
        schema instead of inferring from one file. CHECK constraints
        are enforced on the appended rows only (the base already
        passed them at its own commit). Appending is row-ADDITION, not
        upsert: key uniqueness is the caller's contract (as in Delta);
        use :func:`merge_write` for upsert semantics. Raises if an
        appended key collides with a live deletion-vector/update key —
        the key-scoped ``_dv`` would wrongly suppress the new row;
        compact first to purge MoR state.

        Concurrency: the whole staging runs against one resolved
        version; any interleaved writer fails the CAS with
        :class:`ConcurrentWriteError` (re-run the append — cost is
        O(batch), not O(table)). First append on an empty root is the
        initial :meth:`commit`."""
        ptr = self._pointer()
        if ptr is None:
            return self.commit(
                df,
                expect_version=expect_version,
                keep_snapshots=keep_snapshots,
                meta=meta,
            )
        tmp, entry, version, partition_by, target_schema, aligned = (
            self._prepare_append_batch(df, expect_version=expect_version)
        )
        return self._append_parts(
            df.sparkSession,
            tmp,
            entry,
            version,
            partition_by,
            target_schema,
            aligned,
            meta=meta,
            keep_snapshots=keep_snapshots,
        )

    def _prepare_append_batch(
        self, df: DataFrame, *, expect_version: int | None = None
    ) -> tuple[str, dict, int, list, "T.StructType", DataFrame]:
        """UNLOCKED head of an add-file commit: validate the batch
        against the live entry (layout, schema evolution, MoR key
        collisions, CHECK constraints) and write its part files to a
        temp dir. Returns ``(tmp_parts_dir, base_entry, base_version,
        partition_by, target_schema, aligned_batch)`` for
        :meth:`_stage_append_parts` /:meth:`_append_parts` — also the
        staging path :meth:`TransactionGroup.commit` uses for
        append-shaped members (r12)."""
        ptr = self._pointer()
        if ptr is None:
            raise FileNotFoundError(
                f"{self.root}: append staging needs a committed base"
            )
        snap_name, version = ptr
        if expect_version is not None and version != expect_version:
            raise ConcurrentWriteError(
                f"{self.root}: version {version} != expected {expect_version}"
            )
        snap = os.path.join(self.root, snap_name)
        if not os.path.isdir(snap):
            raise ConcurrentWriteError(
                f"{self.root}: snapshot {snap_name} vanished before append "
                f"(concurrent writer + gc) — retry"
            )
        entry = self._log_entry(version) or {}
        if entry.get("bucket"):
            # appended plain files interleaved with bucketed ones would
            # silently break the bucket-id file-name contract behind
            # read_clustered's exchange-free join — refuse loudly
            raise ValueError(
                f"{self.root}: the live snapshot is CLUSTERED "
                f"(commit_clustered bucket layout) — append would mix "
                f"unbucketed files into it. Use append_clustered() "
                f"(bucket-preserving), or commit() to drop the layout."
            )
        spark = df.sparkSession
        live = self._live_schema(spark)
        target_schema = (
            evolve_schema(live, df.schema) if live is not None else df.schema
        )
        aligned = align_to_schema(df, target_schema)
        dv = entry.get("dv")
        if dv:
            key_cols = list(dv["key_cols"])
            dv_keys = spark.read.parquet(os.path.join(snap, self.DV_DIR))
            n_bad = (
                aligned.join(F.broadcast(dv_keys), on=key_cols, how="left_semi")
                .limit(1)
                .count()
            )
            if n_bad:
                raise ValueError(
                    f"{self.root}: append collides with live merge-on-read "
                    f"keys (deletion vector / update delta on {key_cols}) — "
                    f"the key-scoped _dv would suppress the appended rows; "
                    f"compact_table() first to materialize MoR state"
                )
        checks = dict(entry.get("checks") or {})
        obs = None
        to_write = aligned
        if checks:
            obs = Observation()
            to_write = aligned.observe(
                obs,
                *[
                    F.sum(
                        F.when(
                            ~F.coalesce(F.expr(pred), F.lit(True)), 1
                        ).otherwise(0)
                    ).alias(name)
                    for name, pred in checks.items()
                ],
            )
        # write the batch under PHYSICAL column names so the appended
        # files match the linked base files (metadata-only renames
        # stay metadata); evolution-added columns map identity
        cmap = dict(entry.get("column_map") or {})
        if cmap:
            to_write = to_write.withColumnsRenamed(cmap)
        partition_by = list(entry.get("partition_by") or [])
        # declared table SORT ORDER (meta "sort_order" — Iceberg's
        # write.sort-order): sort the batch within tasks on
        # (partition cols + sort cols) so every appended file carries
        # a TIGHT [min, max] for the sort columns — incremental
        # ingest stays skippable without waiting for compact_table.
        # Columns missing from the batch (concurrent drop) skip the
        # sort conservatively rather than failing the append.
        so = list(
            ((entry.get("meta") or {}).get("sort_order")) or []
        )
        so_phys = [
            cmap.get(c, c)
            for c in so
            if cmap.get(c, c) in to_write.columns
        ]
        if so_phys and len(so_phys) == len(so):
            keys = [
                cmap.get(c, c) for c in partition_by
            ] + [c for c in so_phys if c not in partition_by]
            to_write = to_write.sortWithinPartitions(*keys)
        tmp = os.path.join(self.root, f".append-{uuid.uuid4().hex[:8]}")
        writer = to_write.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(
                *[cmap.get(c, c) for c in partition_by]
            )
        writer.parquet(tmp)
        if obs is not None:
            bad = {n: v for n, v in obs.get.items() if v}
            if bad:
                shutil.rmtree(tmp, ignore_errors=True)
                raise ConstraintViolationError(
                    f"{self.root}: CHECK constraint(s) violated, append "
                    f"aborted — rows failing each: {bad} "
                    f"(predicates: { {n: checks[n] for n in bad} })"
                )
        return tmp, entry, version, partition_by, target_schema, aligned

    def _stage_append_parts(
        self,
        spark: SparkSession,
        tmp: str,
        entry: dict,
        version: int,
        partition_by: list,
        target_schema: "T.StructType",
        changes_df: DataFrame,
        *,
        meta: dict | None,
    ) -> tuple[str, dict]:
        """UNLOCKED staging half of an add-file commit: link the base
        snapshot forward, adopt the pre-written part files out of
        ``tmp``, maintain stats/bloom incrementally, and materialize
        the insert-only change feed from ``changes_df``. Returns
        ``(staged_dir, _write_log kwargs)`` — the caller owns the
        lock/CAS/pointer tail (single-table: :meth:`_append_parts`;
        multi-table: :meth:`TransactionGroup.commit`'s append-shaped
        members, r12) and must remove ``staged_dir`` on failure."""
        snap = os.path.join(self.root, entry["snapshot"])
        staged = os.path.join(
            self.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
        )
        os.makedirs(staged)
        keep_rels: list[str] = []
        for r, dirs, fs in os.walk(snap):
            rel_dir = os.path.relpath(r, snap)
            if rel_dir == ".":
                # MoR sidecars link below; _cdf stays version-local
                dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
                rel_dir = ""
            for f in fs:
                if not f.endswith(".parquet"):
                    continue
                rel = os.path.join(rel_dir, f) if rel_dir else f
                dst = os.path.join(staged, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    os.link(os.path.join(snap, rel), dst)
                except OSError:
                    shutil.copy2(os.path.join(snap, rel), dst)
                keep_rels.append(rel)
        for side in (self.DV_DIR, self.UPD_DIR):
            sp = os.path.join(snap, side)
            if os.path.isdir(sp):
                _link_tree(sp, os.path.join(staged, side))
        # insert-only change feed: the appended rows ARE the
        # changes. Written BEFORE the parts are adopted — an
        # external writer's changes_df (append_files) reads the
        # part files at their pre-adoption location
        cdf_prop = list((entry.get("cdf") or {}).get("key_cols") or [])
        cdf_entry = None
        if cdf_prop:
            cdf_path = os.path.join(staged, self.CDF_DIR)
            changes = changes_df.select(
                F.lit("insert").alias("_change_type"), "*"
            ).withColumn(
                "_commit_version", F.lit(version + 1).cast("long")
            )
            changes.write.mode("overwrite").parquet(cdf_path)
            cdf_entry = {
                "key_cols": cdf_prop,
                "n_changes": int(spark.read.parquet(cdf_path).count()),
                "change_types": ["insert"],
            }
        # an EVOLVED table's new batch lands under the ACTIVE spec's
        # subtree (the batch was partitioned by that spec's columns);
        # rel paths re-anchor to the snapshot root for stats/bloom
        specs = _entry_specs(entry)
        if specs:
            sd = _spec_dirname(_current_spec(specs)["id"])
            new_rels = [
                os.path.join(sd, r)
                for r in _adopt_parts(tmp, os.path.join(staged, sd), "append")
            ]
        else:
            new_rels = _adopt_parts(tmp, staged, "append")
        file_stats = _incremental_stats(entry, keep_rels, staged, new_rels)
        _carry_bloom_sidecar(spark, entry, snap, staged, keep_rels, new_rels)
        return staged, dict(
            partition_by=partition_by,
            schema_json=target_schema.json(),
            meta={**_inherited_meta(entry), **(meta or {})},
            stats_cols=entry.get("stats_cols"),
            file_stats=file_stats,
            checks=entry.get("checks"),
            dv=entry.get("dv"),
            cdf=cdf_entry
            or ({"key_cols": cdf_prop, "noop": True} if cdf_prop else None),
            column_map=entry.get("column_map"),
            mor_delta=entry.get("mor_delta"),
            dropped=entry.get("dropped"),
            added=entry.get("added"),
            bloom=entry.get("bloom"),
            specs=specs,
        )

    def _append_parts(
        self,
        spark: SparkSession,
        tmp: str,
        entry: dict,
        version: int,
        partition_by: list,
        target_schema: "T.StructType",
        changes_df: DataFrame,
        *,
        meta: dict | None,
        keep_snapshots: int,
    ) -> int:
        """The add-file commit tail shared by :meth:`append` (batch
        written by this method's caller) and :func:`append_files`
        (parts pre-written by an external writer, e.g. the SQL
        datasource): link the base snapshot forward, adopt the part
        files, maintain stats/bloom incrementally, materialize the
        insert-only change feed from ``changes_df``, and CAS-commit
        against ``version``."""
        staged: str | None = None
        committed_ver: int | None = None
        try:
            staged, kw = self._stage_append_parts(
                spark,
                tmp,
                entry,
                version,
                partition_by,
                target_schema,
                changes_df,
                meta=meta,
            )
            self._acquire_lock()
            try:
                cur = self._pointer()
                if cur is None or cur[1] != version:
                    raise ConcurrentWriteError(
                        f"{self.root}: version advanced during append "
                        f"(staged against {version}) — retry"
                    )
                new_ver = version + 1
                snap_new = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
                os.rename(staged, os.path.join(self.root, snap_new))
                staged = os.path.join(self.root, snap_new)
                self._write_log(
                    new_ver,
                    snap_new,
                    kw.pop("partition_by"),
                    kw.pop("schema_json"),
                    **kw,
                )
                tmp_ptr = os.path.join(
                    self.root, f".ptr-{uuid.uuid4().hex[:8]}"
                )
                with open(tmp_ptr, "w") as fh:
                    fh.write(f"{snap_new}\n{new_ver}\n")
                os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
                self.last_snapshot = snap_new
                committed_ver = new_ver
            finally:
                self._release_lock()
                if committed_ver is None:
                    shutil.rmtree(staged, ignore_errors=True)
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            if committed_ver is None and staged:
                shutil.rmtree(staged, ignore_errors=True)
            raise
        self._gc(keep=keep_snapshots)
        return committed_ver

    def _snapshot_commit_ts(self, dirname: str) -> float:
        """Commit timestamp of a snapshot dir: its log entry's ts when
        recorded, else the dir mtime (legacy/adopted snapshots — mtime
        is the write completion, slightly BEFORE the commit, so the
        fallback errs toward keeping it longer, never shorter)."""
        try:
            ver = int(dirname.split("-")[1])
        except (IndexError, ValueError):
            ver = -1
        entry = self._log_entry(ver) if ver >= 0 else None
        if entry is not None and entry.get("snapshot") == dirname:
            return float(entry.get("ts", 0.0))
        try:
            return os.path.getmtime(os.path.join(self.root, dirname))
        except FileNotFoundError:
            return 0.0

    def _gc(self, *, keep: int) -> None:
        """Drop committed snapshots that are BOTH beyond the ``keep``
        newest AND older than ``retention_sec`` since they were
        SUPERSEDED — the moment the next version's commit made them
        non-current — plus stranded staging dirs past the staging TTL.

        Anchoring the age at supersession, not at the snapshot's own
        commit (VERDICT r8 item 1), matches Delta's
        ``deletedFileRetentionDuration``, which measures from when a
        file stops being part of the table: a snapshot that was LIVE
        longer than ``retention_sec`` (routine for a slow-cadence
        ledger — weekly commits, 24 h retention) still protects a
        reader that pinned it just before the superseding commit for
        the full window. The reader contract is therefore: a resolved
        snapshot's files survive for at least ``retention_sec`` after
        it stops being current, no matter how many commits advance
        past it. Set ``retention_sec`` above the longest-running scan;
        ``retention_sec=0`` restores count-only GC for single-reader
        scratch tables.

        Snapshots whose version exceeds the live pointer are a crashed
        writer's unpointed commit INTENTS (the log/rename precede the
        pointer swap), mirrored from ``history()``'s filter (ADVICE
        r8): they never committed, so they must not occupy a
        ``keep`` slot and evict a genuinely committed snapshot from
        the count window. They are reclaimed as crash debris past the
        staging TTL instead (a concurrent writer inside its commit
        lock briefly exposes one legitimately)."""
        ptr = self._pointer()
        current = ptr[0] if ptr else None
        live_ver = ptr[1] if ptr else 0
        try:
            entries = os.listdir(self.root)
        except FileNotFoundError:
            return
        all_snaps = sorted(e for e in entries if e.startswith("snap-") and
                           not e.startswith("snap-staging-"))

        def _ver(dirname: str) -> int:
            try:
                return int(dirname.split("-")[1])
            except (IndexError, ValueError):
                return -1

        snaps = [s for s in all_snaps if _ver(s) <= live_ver]
        intents = [s for s in all_snaps if _ver(s) > live_ver]
        # committed-version -> commit ts, from the log (one pass): the
        # supersession anchor for version v is the commit ts of the
        # SMALLEST logged committed version > v. If v+1's entry was
        # already pruned, the next surviving version's (later) ts is
        # used — erring toward keeping the snapshot longer, never
        # shorter.
        log_ts: dict[int, float] = {}
        try:
            for n in os.listdir(os.path.join(self.root, self.LOG_DIR)):
                if n.endswith(".json"):
                    e = self._log_entry(int(n[:-5]))
                    if e is not None and int(e.get("version", -1)) <= live_ver:
                        log_ts[int(e["version"])] = float(e.get("ts", 0.0))
        except (FileNotFoundError, ValueError):
            pass

        def _retired_ts(dirname: str) -> float:
            own = self._snapshot_commit_ts(dirname)
            v = _ver(dirname)
            sup = [ts for ver, ts in log_ts.items() if ver > v >= 0]
            return max(own, min(sup)) if sup else own

        doomed = [
            s
            for s in (snaps[:-keep] if keep else [])
            if s != current
            and time.time() - _retired_ts(s) > self.retention_sec
        ]
        for s in intents:
            try:
                age = time.time() - os.path.getmtime(
                    os.path.join(self.root, s)
                )
            except FileNotFoundError:
                continue
            if age > self.staging_ttl_sec:
                doomed.append(s)
        # staging dirs may belong to a CONCURRENT writer mid-way through
        # its (long, deliberately unlocked) snapshot write, and their
        # mtime stays at creation until the job commits — reclaim only
        # past the hours-scale staging TTL, NOT the millisecond-scale
        # lock TTL (a live writer whose parquet write outlives the lock
        # TTL must not have its snapshot torn out from under it)
        for e in entries:
            if not e.startswith("snap-staging-"):
                continue
            try:
                age = time.time() - os.path.getmtime(os.path.join(self.root, e))
            except FileNotFoundError:
                continue
            if age > self.staging_ttl_sec:
                doomed.append(e)
        for d in doomed:
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
        # a waiter crashing between its stale-lock rename and unlink
        # leaks COMMIT_LOCK.stale-* files; they are renamed-away dead
        # locks (never live), so reclaim by the lock age rule
        for e in entries:
            if not e.startswith(f"{self.LOCK}.stale-"):
                continue
            p = os.path.join(self.root, e)
            try:
                if time.time() - os.path.getmtime(p) > self.stale_lock_sec:
                    os.unlink(p)
            except FileNotFoundError:
                pass
        # bound the commit log: entries whose snapshot is gone (GC'd
        # above, or an unpointed crash intent) age out past retention —
        # live file count stays O(retained snapshots + retention window)
        live = {s for s in all_snaps if s not in doomed}
        logdir = os.path.join(self.root, self.LOG_DIR)
        try:
            log_names = os.listdir(logdir)
        except FileNotFoundError:
            log_names = []
        for n in log_names:
            if not n.endswith(".json"):
                continue
            p = os.path.join(logdir, n)
            try:
                with open(p) as fh:
                    entry = json.load(fh)
                if (
                    entry.get("snapshot") not in live
                    and time.time() - float(entry.get("ts", 0.0))
                    > self.retention_sec
                ):
                    os.unlink(p)
            except (OSError, ValueError):
                pass
        # clustered-read catalog entries pin snapshots by LOCATION; any
        # whose snapshot was just reclaimed are now dangling metadata —
        # drop them (VERDICT r10 item 2). Metadata-only and best-effort
        # (no active session = nothing was adopted in this process).
        if doomed:
            spark = SparkSession.getActiveSession()
            if spark is not None:
                self._sweep_clustered_catalog(spark)

    # -- bootstrap / migration --------------------------------------------
    def init(self, df: DataFrame) -> int:
        """First commit if the table doesn't exist yet; no-op (returns
        the live version) when it does — the idempotent bootstrap for
        build-once state tables."""
        ver = self.version()
        if ver is not None:
            return ver
        try:
            return self.commit(df, expect_version=0)
        except ConcurrentWriteError:
            return self.version()  # lost the bootstrap race: theirs won

    def adopt_plain(self) -> bool:
        """Migrate a legacy plain-parquet directory (the old
        ``_SUCCESS``-swap layout) in place: move its files into a
        snapshot dir and write the pointer. Returns True if migrated.

        The whole migration runs under COMMIT_LOCK: unlike a normal
        commit (whose long write phase stages into a private dir), the
        migration renames SHARED legacy files, so two unsynchronized
        first-writers would split them across two half-empty snapshots
        (a torn table). The lock serializes them; the loser re-checks
        ``exists()`` and no-ops. The file moves themselves are fast
        (renames, no data copy), so holding the lock here is cheap."""
        if self.exists() or not os.path.isdir(self.root):
            return False
        self._acquire_lock()
        try:
            if self.exists():
                return False  # lost the migration race: theirs won
            entries = [e for e in os.listdir(self.root)
                       if not e.startswith(
                           ("snap-", ".ptr-", self.LOCK, self.LOG_DIR))]
            if not entries:
                return False
            snap = f"snap-{1:06d}-{uuid.uuid4().hex[:8]}"
            snap_path = os.path.join(self.root, snap)
            os.makedirs(snap_path)
            for e in entries:
                os.rename(
                    os.path.join(self.root, e), os.path.join(snap_path, e)
                )
            # schema intentionally blank: the next evolving commit
            # falls back to the parquet footers (_live_schema)
            self._write_log(1, snap, [], "")
            tmp_ptr = os.path.join(self.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap}\n1\n")
            os.replace(tmp_ptr, os.path.join(self.root, self.POINTER))
            return True
        finally:
            self._release_lock()


def apply_diff(
    base: DataFrame, changes: DataFrame, keys: list[str]
) -> DataFrame:
    """Apply a :meth:`ManifestTable.diff` change feed to a keyed state:
    keys appearing as ``delete`` / ``update_preimage`` rows are removed
    (null-safe anti join, matching diff's null-safe key semantics) and
    ``insert`` / ``update_postimage`` rows union in. For any two
    versions, ``apply_diff(read(v_from), diff(v_from, v_to), keys)``
    equals ``read(v_to)`` exactly (the apply-soundness contract
    property-tested in tests/test_properties.py).

    This is the consumer half of the CDF loop (VERDICT r8 item 3): a
    derived table maintained with it advances version N -> head on
    O(churn) rows — one anti join shuffled on the keys plus a union —
    instead of a full O(table) rebuild. ``changes`` may carry derived
    columns recomputed from the post-images (e.g. a bucket id); its
    non-key columns must match ``base``'s."""
    gone = changes.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    ).select(*keys)
    add = changes.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type")
    b = base.alias("b")
    g = gone.alias("g")
    cond = None
    for k in keys:
        eq = F.col(f"b.{k}").eqNullSafe(F.col(f"g.{k}"))
        cond = eq if cond is None else (cond & eq)
    kept = b.join(g, cond, "left_anti")
    return kept.unionByName(add.select(*base.columns))


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
    schema_evolution: bool = False,
) -> None:
    """MERGE ``source`` into the table stored at ``target_path``.

    writer="delta"    — Delta Lake ``MERGE INTO`` (transactional, safe
                        under concurrent writers); raises RuntimeError
                        when Delta is not on the classpath.
    writer="manifest" — :func:`merge_into` rewrite committed through
                        :class:`ManifestTable` (snapshot + atomic
                        pointer swap, optimistic-concurrency retry —
                        safe under concurrent writers on any
                        atomic-rename filesystem). A legacy plain
                        parquet dir at ``target_path`` is migrated in
                        place on first use.
    writer="parquet"  — legacy write-new-then-swap on a PLAIN parquet
                        dir (single-writer only; kept for targets that
                        other readers address with a bare
                        ``spark.read.parquet(path)``). If the target
                        is already manifest-backed, this upgrades to
                        the manifest protocol automatically.
    writer="auto"     — delta when available, else manifest.

    Clause semantics are identical across all paths (NULL conditions
    do not fire; source-pk uniqueness is the caller's contract)."""
    if writer == "auto":
        writer = "delta" if delta_available(spark) else "manifest"
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
    if writer not in ("parquet", "manifest"):
        raise ValueError(f"unknown writer {writer!r}")
    tbl = ManifestTable(target_path)
    if writer == "manifest" or tbl.exists():
        tbl.adopt_plain()
        # optimistic-concurrency loop: re-read + re-merge on conflict,
        # exactly a Delta commit retry
        for attempt in range(3):
            base_ver = tbl.version() or 0
            target = tbl.read(spark)
            result = merge_into(
                target,
                source,
                pk,
                matched_delete=matched_delete,
                matched_update=matched_update,
                schema_evolution=schema_evolution,
            )
            try:
                tbl.commit(result, expect_version=base_ver)
                return
            except ConcurrentWriteError:
                if attempt == 2:
                    raise
        return
    recover_swap(target_path)
    target = spark.read.parquet(target_path)
    result = merge_into(
        target,
        source,
        pk,
        matched_delete=matched_delete,
        matched_update=matched_update,
        schema_evolution=schema_evolution,
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


def _snapshot_files(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a snapshot directory's parquet
    parts (metadata/_SUCCESS and hidden sidecars like _dv excluded)."""
    n = b = 0
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                b += os.path.getsize(os.path.join(root, f))
    return n, b


def compact_table(
    spark: SparkSession,
    root: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    target_files: int | None = None,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    min_gain_files: int = 2,
) -> dict:
    """Small-files compaction for a :class:`ManifestTable` — the table
    maintenance every long-lived incremental sink needs: streaming
    `foreachBatch` MERGE sinks and per-batch upserts (q70, q63, q106)
    accrete one small file per micro-batch, and at 100 TB a scan's task
    count (and the namenode/object-store listing cost) is driven by
    file count, not data size.

    Rewrites the CURRENT snapshot into ``ceil(bytes / target)`` evenly
    sized files — ``repartition(n)`` for an even rewrite, or
    ``repartitionByRange(n, *sort_by) + sortWithinPartitions`` when
    ``sort_by`` is given so min/max row-group pruning (data skipping)
    survives compaction — and commits through the same manifest CAS as
    any writer: concurrent upserts are serialized, readers never see a
    partial rewrite, and a compaction racing a writer loses cleanly
    with :class:`ConcurrentWriteError` (retry, don't overwrite).

    No-ops (returns ``compacted=False``) when the rewrite would save
    fewer than ``min_gain_files`` files, so a cron'd compactor is
    idempotent and cheap between real accretions. Reference anchor:
    maintenance the reference outsources to Postgres autovacuum
    (``src/storage.py:90-131``); same role as Delta OPTIMIZE /
    Iceberg rewrite_data_files.

    ``zorder_by`` (mutually exclusive with ``sort_by``) clusters the
    rewrite on the interleaved-bit :func:`zorder_key` over 2+ columns
    — Delta ``OPTIMIZE ZORDER BY``: each rewritten file covers a
    small hyper-rectangle of the listed dimensions, so commit-log
    min/max stats (``stats_by``, inherited) prune range reads on ANY
    of them, not just a lexicographic leader. A z-order request
    always rewrites (re-clustering is the point, not file count).

    ``target_files`` pins the output file count directly (overrides
    the bytes-derived count). Clustered layouts want this: skipping
    selectivity is a function of how finely the curve is cut — a
    z-order over k dims needs ≥ 2^k files before every dimension can
    prune — and a fixed cut keeps layout (hence pruning behavior)
    deterministic across table sizes."""
    if sort_by and zorder_by:
        raise ValueError("sort_by and zorder_by are mutually exclusive")
    mt = ManifestTable(root)
    # resolve the pointer ONCE: snapshot dir + version from the same
    # read, so the files measured, the data rewritten, and the CAS
    # expectation all refer to one snapshot
    ptr = mt._pointer()
    if ptr is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    snap_name, version = ptr
    snap = os.path.join(mt.root, snap_name)
    # explicit existence check: os.walk is SILENT on a missing dir, so
    # a just-GC'd snapshot would otherwise read as "0 files" and no-op
    if not os.path.isdir(snap):
        raise ConcurrentWriteError(
            f"{root}: snapshot {snap_name} vanished before compaction "
            f"(concurrent writer + gc) — retry"
        )
    try:
        files_before, bytes_before = _snapshot_files(snap)
        n_target = target_files or max(
            1, -(-bytes_before // max(1, target_file_bytes))
        )
        c_entry = mt._log_entry(version) or {}
        if c_entry.get("bucket"):
            # a clustered snapshot's exchange-free join property lives
            # in the bucket-id file names; a plain rewrite would
            # silently destroy it (VERDICT r10 item 5) — refuse with
            # the escape hatches spelled out
            raise ValueError(
                f"{root}: the live snapshot is CLUSTERED "
                f"(commit_clustered bucket layout) — a plain rewrite "
                f"would destroy the bucket-id file-name contract. Use "
                f"compact_clustered() (per-bucket repack) or "
                f"commit_clustered(read(...), ...) to re-cluster, or "
                f"commit(read(...)) to deliberately drop the layout."
            )
        dv = c_entry.get("dv")
        mor = dv or c_entry.get("mor_delta")
        if not zorder_by and not mor and files_before - n_target < min_gain_files:
            return {
                "compacted": False,
                "version": version,
                "files_before": files_before,
                "files_after": files_before,
                "bytes": bytes_before,
            }
        # read the RESOLVED snapshot dir, not mt.read(): the lazy scan
        # must not re-resolve the pointer at job time (a racing writer
        # could have advanced it; the version CAS below then catches
        # the conflict instead of silently compacting the wrong data)
        # logical view: apply any metadata-only renames; the rewrite
        # then writes files under the LOGICAL names, so the new commit
        # carries no column_map — compaction materializes renames the
        # same way it materializes deletion vectors
        df = _apply_map(_snap_read(spark, snap, c_entry), c_entry)
        if mor:
            # materialize the merge-on-read state (Delta OPTIMIZE
            # purges DVs the same way): the rewrite drops deleted rows
            # and folds the update delta in, and the new commit
            # carries neither sidecar. Live MoR state also forces the
            # rewrite above — purging it is the point.
            df = mt._apply_dv(spark, df, c_entry, snap)
        # a hive-partitioned table (layout inherited by the commit
        # below) must cluster tasks BY the partition columns: a plain
        # repartition(n) gives every task rows of every partition
        # value, so partitionBy fans each task out into every dir —
        # n_target * n_dirs files, worse than before compaction.
        # Range-partitioning on (partition cols + sort keys) keeps
        # each dir's rows in a contiguous task range: file count is
        # bounded by n_target + n_partition_values - 1 (a boundary
        # task may straddle two values), and row-group data skipping
        # on the sort keys still survives within each dir.
        entry = mt._log_entry(version)
        part_cols = list((entry or {}).get("partition_by") or [])
        if not sort_by and not zorder_by:
            # default the sorted rewrite to the table's DECLARED sort
            # order (set_sort_order) so maintenance converges to the
            # same layout appends write incrementally
            declared = list(
                ((entry or {}).get("meta") or {}).get("sort_order") or []
            )
            sort_by = declared or None
        if zorder_by:
            zdf = df.withColumn("__zorder", zorder_key(df, list(zorder_by)))
            zkeys = part_cols + ["__zorder"]
            rewritten = (
                zdf.repartitionByRange(n_target, *zkeys)
                .sortWithinPartitions(*zkeys)
                .drop("__zorder")
            )
        else:
            keys = part_cols + [
                c for c in (sort_by or []) if c not in part_cols
            ]
            if keys:
                rewritten = df.repartitionByRange(n_target, *keys)
                if sort_by:
                    rewritten = rewritten.sortWithinPartitions(*keys)
            else:
                rewritten = df.repartition(n_target)
        # cdf_mode="noop": compaction (incl. DV purge — the deletes
        # were already fed by delete_where) preserves logical content;
        # feed readers skip the version instead of paying a diff join.
        # Table-property meta (declared sort order etc.) inherits like
        # every other derived-version writer — found by the r13
        # sequence property test: a plain compaction was silently
        # DROPPING set_sort_order, so the very maintenance pass that
        # defaults its rewrite to the declared order un-declared it
        # for every later append.
        new_ver = mt.commit(
            rewritten,
            expect_version=version,
            cdf_mode="noop",
            meta=_inherited_meta(entry),
        )
    except FileNotFoundError as exc:
        # a racing writer committed and its GC dropped our snapshot
        # mid-rewrite: surface the documented retryable conflict, not
        # a raw filesystem error
        raise ConcurrentWriteError(
            f"{root}: snapshot {snap_name} vanished during compaction "
            f"(concurrent writer + gc) — retry"
        ) from exc
    # measure the snapshot THIS commit produced (recorded under the
    # commit lock), not a re-resolved pointer: a racing writer
    # committing in between would make the stats describe the wrong
    # snapshot, and a just-GC'd one would silently walk as 0 files
    committed = os.path.join(mt.root, mt.last_snapshot)
    if os.path.isdir(committed):
        files_after, _ = _snapshot_files(committed)
    else:  # GC'd by an immediately-following writer: n_target is exact
        files_after = n_target
    return {
        "compacted": True,
        "version": new_ver,
        "files_before": files_before,
        "files_after": files_after,
        "bytes": bytes_before,
    }


def _adopt_parts(tmp: str, staged: str, prefix: str) -> list[str]:
    """Move a Spark write job's part files from ``tmp`` into the
    staged snapshot under fresh collision-free names, preserving any
    hive-partition subdirectories; returns the new RELATIVE paths."""
    new_rels: list[str] = []
    run = uuid.uuid4().hex[:8]
    for r, _dirs, fs in os.walk(tmp):
        rel_dir = os.path.relpath(r, tmp)
        rel_dir = "" if rel_dir == "." else rel_dir
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            os.makedirs(os.path.join(staged, rel_dir), exist_ok=True)
            rel = os.path.join(rel_dir, f"{prefix}-{run}-{f}")
            os.rename(os.path.join(r, f), os.path.join(staged, rel))
            new_rels.append(rel)
    shutil.rmtree(tmp, ignore_errors=True)
    return new_rels


def _incremental_stats(
    entry: dict, keep_rels: list, staged: str, new_rels: list
) -> dict | None:
    """Commit-log file stats for an incrementally staged snapshot:
    untouched files carry their entries VERBATIM, only the newly
    written files pay a footer walk."""
    stats_cols = list(entry.get("stats_cols") or [])
    if entry.get("file_stats") is None and not stats_cols:
        return None
    keep_set = set(keep_rels)
    carried = {
        rel: st
        for rel, st in (entry.get("file_stats") or {}).items()
        if rel in keep_set
    }
    fresh = (
        collect_file_stats(staged, stats_cols, only=set(new_rels))
        if stats_cols
        else {}
    )
    return {**carried, **fresh}


def _carry_bloom_sidecar(
    spark: SparkSession,
    entry: dict,
    snap: str,
    staged: str,
    keep_rels: list,
    new_rels: list,
) -> None:
    """Bloom sidecar for an incrementally staged snapshot: index ONLY
    the new files with a job over them; untouched files' sidecar rows
    re-write driver-side (tiny metadata). Falls back to indexing
    everything if the previous sidecar is missing, so the log's bloom
    property never overstates coverage."""
    bloom_prop = entry.get("bloom")
    if not bloom_prop:
        return
    import pyarrow.parquet as pq

    cols = list(bloom_prop.get("cols") or [])
    fpp = float(bloom_prop.get("fpp") or 0.01)
    _write_bloom_sidecar(
        spark,
        staged,
        cols,
        fpp,
        files=[os.path.join(staged, r) for r in new_rels],
    )
    try:
        old = pq.read_table(os.path.join(snap, ManifestTable.BLOOM_DIR))
        keep_set = set(keep_rels)
        mask = [f in keep_set for f in old.column("file").to_pylist()]
        carried = old.filter(mask)
        if carried.num_rows:
            pq.write_table(
                carried,
                os.path.join(
                    staged,
                    ManifestTable.BLOOM_DIR,
                    f"carried-{uuid.uuid4().hex[:8]}.parquet",
                ),
            )
    except (FileNotFoundError, OSError):
        _write_bloom_sidecar(spark, staged, cols, fpp)


def append_files(
    spark: SparkSession,
    root: str,
    parts_dir: str,
    *,
    meta: dict | None = None,
    expect_version: int | None = None,
    keep_snapshots: int = 2,
) -> int:
    """APPEND pre-written parquet part files to a :class:`ManifestTable`
    — the entry point for EXTERNAL writers whose tasks have already
    materialized the batch (the ``manifest`` SQL datasource's
    ``INSERT INTO`` / ``df.write.format("manifest").mode("append")``
    path): the files in ``parts_dir`` are adopted into the new
    snapshot unchanged, the base hardlinks forward, and every
    :meth:`ManifestTable.append` contract applies — CHECK constraints
    validate the batch (one aggregate over it), merge-on-read key
    collisions refuse, stats/bloom maintain incrementally, the change
    feed materializes the batch itself.

    The parts must carry the table's PHYSICAL column layout: every
    part column must exist in the committed schema with the exact
    same type (missing columns null-fill through the declared-schema
    read; unknown or retyped columns refuse — an already-written file
    cannot be aligned). First write on an empty root commits the
    parts as version 1. Unpartitioned tables only (an external
    writer's flat parts cannot be adopted into partition dirs)."""
    tbl = ManifestTable(root)
    ptr = tbl._pointer()
    if ptr is None:
        df = spark.read.parquet(parts_dir)
        ver = tbl.commit(
            df,
            expect_version=expect_version,
            keep_snapshots=keep_snapshots,
            meta=meta,
        )
        shutil.rmtree(parts_dir, ignore_errors=True)
        return ver
    snap_name, version = ptr
    if expect_version is not None and version != expect_version:
        raise ConcurrentWriteError(
            f"{root}: version {version} != expected {expect_version}"
        )
    snap = os.path.join(tbl.root, snap_name)
    if not os.path.isdir(snap):
        raise ConcurrentWriteError(
            f"{root}: snapshot {snap_name} vanished before append "
            f"(concurrent writer + gc) — retry"
        )
    entry = tbl._log_entry(version) or {}
    if entry.get("partition_by"):
        raise ValueError(
            f"{root}: append_files targets unpartitioned tables "
            f"(partitioned layouts append via ManifestTable.append)"
        )
    _refuse_clustered(
        root,
        entry,
        "externally-written flat parts cannot join a bucketed "
        "snapshot. Use append_clustered().",
    )
    phys = _phys_schema(entry)
    incoming = spark.read.parquet(parts_dir)
    if phys is not None:
        by_name = {f.name: f.dataType for f in phys.fields}
        for f in incoming.schema.fields:
            if f.name not in by_name:
                raise SchemaEvolutionError(
                    f"{root}: part column {f.name!r} not in the committed "
                    f"schema — append_files cannot evolve (files are "
                    f"already written); use ManifestTable.append"
                )
            if f.dataType != by_name[f.name]:
                raise SchemaEvolutionError(
                    f"{root}: part column {f.name!r} type "
                    f"{f.dataType.simpleString()} != committed "
                    f"{by_name[f.name].simpleString()}"
                )
    # the logical view of the batch (for checks / MoR guard / CDF):
    # declared physical schema (missing columns null-fill), mapped to
    # logical names
    reader = spark.read.schema(phys) if phys is not None else spark.read
    changes_df = _apply_map(reader.parquet(parts_dir), entry)
    dv = entry.get("dv")
    if dv:
        key_cols = list(dv["key_cols"])
        dv_keys = spark.read.parquet(
            os.path.join(snap, ManifestTable.DV_DIR)
        )
        if (
            changes_df.join(
                F.broadcast(dv_keys), on=key_cols, how="left_semi"
            )
            .limit(1)
            .count()
        ):
            raise ValueError(
                f"{root}: append collides with live merge-on-read keys "
                f"({key_cols}) — compact_table() first"
            )
    checks = dict(entry.get("checks") or {})
    if checks:
        viol = changes_df.agg(
            *[
                F.sum(
                    F.when(
                        ~F.coalesce(F.expr(pred), F.lit(True)), 1
                    ).otherwise(0)
                ).alias(name)
                for name, pred in checks.items()
            ]
        ).first()
        bad = {n: viol[n] for n in checks if viol[n]}
        if bad:
            raise ConstraintViolationError(
                f"{root}: CHECK constraint(s) violated, append aborted — "
                f"rows failing each: {bad} "
                f"(predicates: { {n: checks[n] for n in bad} })"
            )
    target_schema = (
        T.StructType.fromJson(json.loads(entry["schema"]))
        if entry.get("schema")
        else incoming.schema
    )
    return tbl._append_parts(
        spark,
        parts_dir,
        entry,
        version,
        [],
        target_schema,
        changes_df,
        meta=meta,
        keep_snapshots=keep_snapshots,
    )


def append_files_local(
    root: str,
    parts_dir: str,
    *,
    meta: dict | None = None,
    expect_version: int | None = None,
    keep_snapshots: int = 2,
) -> int:
    """:func:`append_files` without a SparkSession — the driver-side
    commit path of the ``manifest`` SQL datasource's writer, whose
    Python worker has no JVM gateway. Every append contract is kept
    with driver-side tools sized to the BATCH, never the table:

    - schema: each part column must exist in a base data file's
      parquet-arrow schema with the same type (files already written
      cannot be aligned — evolution goes through the DataFrame API);
    - CHECK constraints: evaluated over the staged parts with DuckDB
      (logical names reconstructed from the column map; a predicate
      DuckDB cannot parse refuses the write instead of skipping the
      check);
    - merge-on-read guard: the churn-sized ``_dv`` key set loads
      in-memory and the parts' key columns stream against it;
    - stats/bloom: incremental — untouched files carry verbatim, new
      files pay one footer walk / one bloom build (pyarrow, same
      md5 hash as the probe);
    - change feed: the parts themselves, rewritten once with
      ``_change_type``/``_commit_version`` under LOGICAL names;
    - commit: the same lock/CAS/log/pointer/GC protocol as every
      writer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = ManifestTable(root)
    ptr = tbl._pointer()
    part_files = sorted(
        os.path.join(parts_dir, f)
        for f in os.listdir(parts_dir)
        if f.endswith(".parquet")
    )
    if not part_files:
        raise ValueError(f"{parts_dir}: no parquet parts to append")
    if ptr is None:
        raise FileNotFoundError(
            f"{root}: append_files_local requires an existing table "
            f"(create it with ManifestTable.commit / the DataFrame API)"
        )
    snap_name, version = ptr
    if expect_version is not None and version != expect_version:
        raise ConcurrentWriteError(
            f"{root}: version {version} != expected {expect_version}"
        )
    snap = os.path.join(tbl.root, snap_name)
    if not os.path.isdir(snap):
        raise ConcurrentWriteError(
            f"{root}: snapshot {snap_name} vanished before append — retry"
        )
    entry = tbl._log_entry(version) or {}
    if entry.get("partition_by"):
        raise ValueError(
            f"{root}: append_files_local targets unpartitioned tables"
        )
    _refuse_clustered(
        root,
        entry,
        "externally-written flat parts cannot join a bucketed "
        "snapshot. Use append_clustered().",
    )
    cmap = dict(entry.get("column_map") or {})  # logical -> physical
    inv = {p: l for l, p in cmap.items()}
    # -- schema guard against a base file's arrow schema ------------------
    base_files = []
    for r, dirs, fs in os.walk(snap):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        base_files.extend(
            os.path.join(r, f) for f in fs if f.endswith(".parquet")
        )
    part_schema = pq.ParquetFile(part_files[0]).schema_arrow
    base_by_name = {}
    if base_files:
        base_schema = pq.ParquetFile(sorted(base_files)[0]).schema_arrow
        base_by_name = {f.name: f.type for f in base_schema}
    allowed = set(base_by_name)
    if entry.get("schema"):
        try:
            fields = {
                fd["name"] for fd in json.loads(entry["schema"])["fields"]
            }
            allowed |= {cmap.get(n, n) for n in fields}
        except (ValueError, KeyError, TypeError):
            pass
    for f in part_schema:
        if f.name in base_by_name and f.type != base_by_name[f.name]:
            raise SchemaEvolutionError(
                f"{root}: part column {f.name!r} type {f.type} != "
                f"committed {base_by_name[f.name]}"
            )
        if allowed and f.name not in allowed:
            raise SchemaEvolutionError(
                f"{root}: part column {f.name!r} not in the committed "
                f"schema — append_files cannot evolve (files are already "
                f"written); use ManifestTable.append"
            )
    # -- CHECK constraints via DuckDB over the staged parts ---------------
    checks = dict(entry.get("checks") or {})
    if checks:
        import duckdb

        logical_fields = (
            [fd["name"] for fd in json.loads(entry["schema"])["fields"]]
            if entry.get("schema")
            else [inv.get(f.name, f.name) for f in part_schema]
        )
        part_cols = {f.name for f in part_schema}
        proj = ", ".join(
            f'"{cmap.get(l, l)}" AS "{l}"'
            if cmap.get(l, l) in part_cols
            else f'NULL AS "{l}"'
            for l in logical_fields
        )
        glob_sql = os.path.join(parts_dir, "*.parquet").replace("'", "''")
        bad = {}
        for name, pred in checks.items():
            try:
                n_bad = duckdb.sql(
                    f"SELECT COUNT(*) FROM (SELECT {proj} FROM "
                    f"read_parquet('{glob_sql}')) WHERE NOT "
                    f"COALESCE(({pred}), TRUE)"
                ).fetchone()[0]
            except Exception as exc:
                raise ValueError(
                    f"{root}: CHECK {name!r} ({pred!r}) cannot be "
                    f"validated on the SQL write path — use the "
                    f"DataFrame API"
                ) from exc
            if n_bad:
                bad[name] = int(n_bad)
        if bad:
            raise ConstraintViolationError(
                f"{root}: CHECK constraint(s) violated, append aborted — "
                f"rows failing each: {bad}"
            )
    # -- merge-on-read key guard ------------------------------------------
    dv = entry.get("dv")
    if dv:
        key_cols_l = list(dv["key_cols"])
        key_cols_p = [cmap.get(c, c) for c in key_cols_l]
        dv_tbl = pq.read_table(os.path.join(snap, ManifestTable.DV_DIR))
        dv_set = set(
            zip(*(dv_tbl.column(c).to_pylist() for c in key_cols_l))
        )
        for f in part_files:
            t = pq.read_table(f, columns=key_cols_p)
            for tup in zip(*(t.column(c).to_pylist() for c in key_cols_p)):
                if tup in dv_set:
                    raise ValueError(
                        f"{root}: append collides with live merge-on-read "
                        f"keys ({key_cols_l}) — compact_table() first"
                    )
    # -- stage: link base, adopt parts, incremental metadata --------------
    staged = os.path.join(tbl.root, f"snap-staging-{uuid.uuid4().hex[:12]}")
    committed_ver: int | None = None
    try:
        os.makedirs(staged)
        keep_rels = []
        for fp in base_files:
            rel = os.path.relpath(fp, snap)
            dst = os.path.join(staged, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(fp, dst)
            except OSError:
                shutil.copy2(fp, dst)
            keep_rels.append(rel)
        for side in (ManifestTable.DV_DIR, ManifestTable.UPD_DIR):
            sp = os.path.join(snap, side)
            if os.path.isdir(sp):
                _link_tree(sp, os.path.join(staged, side))
        # change feed BEFORE adoption (reads the parts in place)
        cdf_prop = list((entry.get("cdf") or {}).get("key_cols") or [])
        cdf_entry = None
        if cdf_prop:
            cdf_dir = os.path.join(staged, ManifestTable.CDF_DIR)
            os.makedirs(cdf_dir)
            n_changes = 0
            for i, f in enumerate(part_files):
                t = pq.read_table(f)
                if inv:
                    t = t.rename_columns(
                        [inv.get(n, n) for n in t.column_names]
                    )
                n = t.num_rows
                t = t.add_column(
                    0, "_change_type", pa.array(["insert"] * n)
                ).append_column(
                    "_commit_version",
                    pa.array([version + 1] * n, type=pa.int64()),
                )
                pq.write_table(t, os.path.join(cdf_dir, f"cdf-{i}.parquet"))
                n_changes += n
            cdf_entry = {
                "key_cols": cdf_prop,
                "n_changes": n_changes,
                "change_types": ["insert"],
            }
        new_rels = []
        run = uuid.uuid4().hex[:8]
        # an EVOLVED table's flat parts land under the ACTIVE spec's
        # subtree (current spec is unpartitioned — checked above)
        specs_e = _entry_specs(entry)
        spec_sub = (
            _spec_dirname(_current_spec(specs_e)["id"]) if specs_e else ""
        )
        if spec_sub:
            os.makedirs(os.path.join(staged, spec_sub), exist_ok=True)
        for f in part_files:
            rel = os.path.join(
                spec_sub, f"append-{run}-{os.path.basename(f)}"
            )
            os.rename(f, os.path.join(staged, rel))
            new_rels.append(rel)
        shutil.rmtree(parts_dir, ignore_errors=True)
        file_stats = _incremental_stats(entry, keep_rels, staged, new_rels)
        # bloom for the new files: pyarrow build, same hash as the probe
        bloom_prop = entry.get("bloom")
        if bloom_prop:
            cols = list(bloom_prop.get("cols") or [])
            fpp = float(bloom_prop.get("fpp") or 0.01)
            rows = {"file": [], "col": [], "m": [], "k": [], "n": [], "bits": []}
            for rel in new_rels:
                fp = os.path.join(staged, rel)
                names = pq.ParquetFile(fp).schema_arrow.names
                for c in cols:
                    if c not in names:
                        continue
                    vals = {
                        str(v)
                        for v in pq.read_table(fp, columns=[c]).column(c).to_pylist()
                        if v is not None
                    }
                    m, k = _bloom_params(len(vals), fpp)
                    bits = bytearray(m // 8)
                    for v in vals:
                        for pos in _bloom_positions(v, m, k):
                            bits[pos >> 3] |= 1 << (pos & 7)
                    rows["file"].append(rel)
                    rows["col"].append(c)
                    rows["m"].append(m)
                    rows["k"].append(k)
                    rows["n"].append(len(vals))
                    rows["bits"].append(bytes(bits))
            bdir = os.path.join(staged, ManifestTable.BLOOM_DIR)
            os.makedirs(bdir, exist_ok=True)
            if rows["file"]:
                pq.write_table(
                    pa.table(
                        {
                            "file": pa.array(rows["file"], pa.string()),
                            "col": pa.array(rows["col"], pa.string()),
                            "m": pa.array(rows["m"], pa.int64()),
                            "k": pa.array(rows["k"], pa.int64()),
                            "n": pa.array(rows["n"], pa.int64()),
                            "bits": pa.array(rows["bits"], pa.binary()),
                        }
                    ),
                    os.path.join(bdir, f"new-{run}.parquet"),
                )
            try:
                old = pq.read_table(
                    os.path.join(snap, ManifestTable.BLOOM_DIR)
                )
                keep_set = set(keep_rels)
                mask = [x in keep_set for x in old.column("file").to_pylist()]
                carried = old.filter(mask)
                if carried.num_rows:
                    pq.write_table(
                        carried, os.path.join(bdir, f"carried-{run}.parquet")
                    )
            except (FileNotFoundError, OSError):
                pass
        tbl._acquire_lock()
        try:
            cur = tbl._pointer()
            if cur is None or cur[1] != version:
                raise ConcurrentWriteError(
                    f"{root}: version advanced during append "
                    f"(staged against {version}) — retry"
                )
            new_ver = version + 1
            snap_new = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(tbl.root, snap_new))
            staged = os.path.join(tbl.root, snap_new)
            tbl._write_log(
                new_ver,
                snap_new,
                [],
                entry.get("schema") or "",
                meta={**_inherited_meta(entry), **(meta or {})},
                stats_cols=entry.get("stats_cols"),
                file_stats=file_stats,
                checks=entry.get("checks"),
                dv=entry.get("dv"),
                cdf=cdf_entry,
                specs=entry.get("specs"),
                column_map=entry.get("column_map"),
                mor_delta=entry.get("mor_delta"),
                dropped=entry.get("dropped"),
                added=entry.get("added"),
                bloom=entry.get("bloom"),
            )
            tmp_ptr = os.path.join(tbl.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap_new}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(tbl.root, tbl.POINTER))
            tbl.last_snapshot = snap_new
            committed_ver = new_ver
        finally:
            tbl._release_lock()
            if committed_ver is None:
                shutil.rmtree(staged, ignore_errors=True)
    except Exception:
        if committed_ver is None:
            shutil.rmtree(staged, ignore_errors=True)
        raise
    tbl._gc(keep=keep_snapshots)
    return committed_ver


def compact_small_files(
    spark: SparkSession,
    root: str,
    *,
    min_file_bytes: int = 16 * 1024 * 1024,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_gain_files: int = 2,
) -> dict:
    """Incremental bin-packing compaction: rewrite ONLY the files
    smaller than ``min_file_bytes``; every properly sized file is
    HARDLINKED into the new snapshot untouched. This is the 100 TB
    OPTIMIZE mode: :func:`compact_table` rewrites the whole snapshot —
    right for re-clustering (sort/z-order), ruinous as routine
    maintenance on a petabyte table where an epoch sink accreted a few
    thousand small files next to thousands of already-compacted large
    ones. Here the rewrite cost is O(small-file bytes) and the rest of
    the table moves zero bytes (inode links), exactly Delta OPTIMIZE's
    bin-packing which leaves files above minFileSize alone.

    Metadata is maintained incrementally too: kept files carry their
    commit-log [min, max] stats entries and bloom sidecar rows
    forward VERBATIM; only the newly written merged files are
    footer-statted and bloom-indexed. Merge-on-read sidecars (``_dv``
    deletion vector, ``_upd`` update delta) link forward unchanged —
    a content-preserving repack keeps them valid (keys survive, the
    anti-join and union semantics are file-layout-independent); use
    :func:`compact_table` to PURGE MoR state. The change feed records
    the version as a no-op (content preserved). Commits through the
    same CAS as every writer.

    Restricted to unpartitioned snapshots (a partitioned table's
    small-file problem is per-partition-dir; its full rewrite path
    handles layout). No-ops unless at least two small files exist and
    the repack saves ``min_gain_files`` files."""
    mt = ManifestTable(root)
    ptr = mt._pointer()
    if ptr is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    snap_name, version = ptr
    snap = os.path.join(mt.root, snap_name)
    if not os.path.isdir(snap):
        raise ConcurrentWriteError(
            f"{root}: snapshot {snap_name} vanished before compaction "
            f"(concurrent writer + gc) — retry"
        )
    entry = mt._log_entry(version) or {}
    if entry.get("partition_by"):
        raise ValueError(
            f"{root}: compact_small_files targets unpartitioned snapshots "
            f"(use compact_table for partitioned layouts)"
        )
    if entry.get("bucket"):
        # bin-packing across bucket boundaries (or renaming merged
        # files) would break the bucket-id file-name contract that
        # read_clustered's exchange-free join depends on (VERDICT r10
        # item 5) — refuse loudly instead of silently de-clustering
        raise ValueError(
            f"{root}: the live snapshot is CLUSTERED (commit_clustered "
            f"bucket layout) — bin-packing would break the bucket-id "
            f"file-name contract. Use compact_clustered() (per-bucket "
            f"repack), or commit(read(...)) to deliberately drop the "
            f"layout."
        )
    if entry.get("specs"):
        # an EVOLVED snapshot mixes hive layouts across spec-<id>
        # subtrees; bin-packing files out of their spec dirs would
        # detach them from the dir-encoded partition values — refuse
        raise ValueError(
            f"{root}: the live snapshot is partition-EVOLVED (spec "
            f"history in the commit log) — bin-packing across spec "
            f"subtrees would detach files from their dir-encoded "
            f"partition values. Use compact_table() (full rewrite "
            f"migrates everything to the active spec)."
        )

    def _no_op(files_before: int, bytes_before: int) -> dict:
        return {
            "compacted": False,
            "version": version,
            "files_before": files_before,
            "files_after": files_before,
            "files_rewritten": 0,
            "bytes_rewritten": 0,
            "bytes": bytes_before,
        }

    small: list[tuple[str, int]] = []  # (rel, size)
    keep: list[str] = []  # rel
    bytes_before = 0
    for r, dirs, fs in os.walk(snap):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(r, f)
            try:
                sz = os.path.getsize(fp)
            except FileNotFoundError:
                raise ConcurrentWriteError(
                    f"{root}: snapshot {snap_name} vanished during "
                    f"compaction (concurrent writer + gc) — retry"
                ) from None
            bytes_before += sz
            rel = os.path.relpath(fp, snap)
            if sz < min_file_bytes:
                small.append((rel, sz))
            else:
                keep.append(rel)
    files_before = len(small) + len(keep)
    small_bytes = sum(sz for _, sz in small)
    n_new = max(1, -(-small_bytes // max(1, target_file_bytes)))
    if len(small) < 2 or len(small) - n_new < min_gain_files:
        return _no_op(files_before, bytes_before)

    staged = os.path.join(mt.root, f"snap-staging-{uuid.uuid4().hex[:12]}")
    try:
        os.makedirs(staged)
        # metadata-only carry: big data files + MoR sidecars hardlink
        for rel in keep:
            dst = os.path.join(staged, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(os.path.join(snap, rel), dst)
            except OSError:
                shutil.copy2(os.path.join(snap, rel), dst)
        for side in (ManifestTable.DV_DIR, ManifestTable.UPD_DIR):
            sp = os.path.join(snap, side)
            if os.path.isdir(sp):
                _link_tree(sp, os.path.join(staged, side))
        # the rewrite: read ONLY the small files (physical schema —
        # raw files; renames/drops stay metadata via the carried
        # column_map/dropped entries) and repack them
        tmp = os.path.join(mt.root, f".repack-{uuid.uuid4().hex[:8]}")
        (
            spark.read.parquet(*[os.path.join(snap, rel) for rel, _ in small])
            .repartition(n_new)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        new_rels = _adopt_parts(tmp, staged, "repack")
        file_stats = _incremental_stats(entry, keep, staged, new_rels)
        _carry_bloom_sidecar(spark, entry, snap, staged, keep, new_rels)
        committed_ver: int | None = None
        mt._acquire_lock()
        try:
            cur = mt._pointer()
            if cur is None or cur[1] != version:
                raise ConcurrentWriteError(
                    f"{root}: version advanced during small-file "
                    f"compaction (expected {version}) — retry"
                )
            new_ver = version + 1
            snap_new = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(mt.root, snap_new))
            staged = os.path.join(mt.root, snap_new)
            mt._write_log(
                new_ver,
                snap_new,
                [],
                entry.get("schema") or "",
                meta={**_inherited_meta(entry), "bin_pack": len(small)},
                stats_cols=entry.get("stats_cols"),
                file_stats=file_stats,
                checks=entry.get("checks"),
                dv=entry.get("dv"),
                cdf=(
                    {
                        "key_cols": list(entry["cdf"]["key_cols"]),
                        "noop": True,
                    }
                    if entry.get("cdf")
                    else None
                ),
                column_map=entry.get("column_map"),
                mor_delta=entry.get("mor_delta"),
                dropped=entry.get("dropped"),
                added=entry.get("added"),
                bloom=entry.get("bloom"),
            )
            tmp_ptr = os.path.join(mt.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap_new}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(mt.root, mt.POINTER))
            mt.last_snapshot = snap_new
            committed_ver = new_ver
        finally:
            mt._release_lock()
            if committed_ver is None:
                shutil.rmtree(staged, ignore_errors=True)
    except Exception:
        shutil.rmtree(staged, ignore_errors=True)
        raise
    mt._gc(keep=2)
    return {
        "compacted": True,
        "version": committed_ver,
        "files_before": files_before,
        "files_after": len(keep) + len(new_rels),
        "files_rewritten": len(small),
        "bytes_rewritten": small_bytes,
        "bytes": bytes_before,
    }


def compact_clustered(
    spark: SparkSession,
    root: str,
    *,
    keep_snapshots: int = 2,
) -> dict:
    """Per-bucket repack of a clustered snapshot (r11 — the OPTIMIZE
    mode for bucket layouts, completing ``append_clustered``'s cost
    model): every bucket that accreted multiple files is rewritten to
    ONE sorted file — restoring the one-file-per-bucket invariant that
    lets the catalog scan claim per-bucket SORT ordering, so
    downstream sort-merge joins go back to needing neither exchange
    NOR sort — while single-file buckets HARDLINK forward untouched
    (inode-preserved, zero bytes moved). Rewrite cost is
    O(multi-file-bucket bytes), never the table: the routine
    maintenance a 100 TB clustered fact table can afford between
    streaming appends, exactly Delta OPTIMIZE on a bucketed layout.

    The repack is ONE Spark job: the multi-file buckets' rows are
    re-routed through the same ``pmod(murmur3, n)`` the bucket ids
    came from, so each write task lands exactly its bucket's single
    sorted file and untouched buckets' (empty) tasks emit nothing.
    Commits through the same CAS as every writer; the bucket spec
    carries forward verbatim. No-ops when every bucket already holds
    at most one file (idempotent cron).

    Merge-on-read sidecars (r12 — the OPTIMIZE half of clustered DML):
    a live deletion vector / ``_upd`` delta is MATERIALIZED per bucket
    — buckets holding a DV-hidden pre-image (found by a key-column-
    pruned scan + file-name semi-join) or targeted by a post-image row
    join the repack set, the anti-join/union folds the sidecars into
    those buckets' rewritten files, and the new entry carries no MoR
    state (Delta's OPTIMIZE purging DVs). Untouched buckets still
    hardlink forward; the cost stays O(affected-bucket bytes)."""
    mt = ManifestTable(root)
    ptr = mt._pointer()
    if ptr is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    snap_name, version = ptr
    snap = os.path.join(mt.root, snap_name)
    if not os.path.isdir(snap):
        raise ConcurrentWriteError(
            f"{root}: snapshot {snap_name} vanished before compaction "
            f"(concurrent writer + gc) — retry"
        )
    entry = mt._log_entry(version) or {}
    bucket = entry.get("bucket")
    if not bucket:
        raise ValueError(
            f"{root}: not a clustered snapshot — use compact_small_files "
            f"/ compact_table"
        )
    groups: dict[int, list[str]] = {}
    for f in os.listdir(snap):
        if not f.endswith(".parquet"):
            continue
        bid = _bucket_id(f)
        if bid is None:  # pragma: no cover - commit paths preserve names
            raise RuntimeError(f"{root}: non-bucket file {f!r} in snapshot")
        groups.setdefault(bid, []).append(f)
    multi = {b: fs for b, fs in groups.items() if len(fs) > 1}
    files_before = sum(len(fs) for fs in groups.values())
    schema = T.StructType.fromJson(json.loads(entry["schema"]))
    # merge-on-read sidecars (r12): compaction MATERIALIZES them per
    # bucket — a bucket is repacked iff it accreted multiple files, or
    # holds a DV-hidden pre-image row, or is the target of an _upd
    # post-image; every other bucket hardlinks forward untouched. The
    # DV-hit scan reads only the key columns + file names (columnar
    # prune), the delta's target buckets come from the same
    # pmod(murmur3, n) the bucket ids were written with, and the
    # post-write name check below would catch any routing mismatch.
    dv = entry.get("dv")
    delta = entry.get("mor_delta")
    affected: set[int] = set(multi)
    dv_keys_df = None
    if dv:
        dv_keys_df = spark.read.parquet(os.path.join(snap, mt.DV_DIR))
        if int(dv.get("n_keys", 0)) and groups:
            base_keys = spark.read.schema(schema).parquet(
                *[
                    os.path.join(snap, f)
                    for fs in groups.values()
                    for f in fs
                ]
            ).select(
                *[F.col(c) for c in dv["key_cols"]],
                F.element_at(
                    F.split(F.input_file_name(), "/"), -1
                ).alias("__file"),
            )
            hit = (
                base_keys.join(
                    F.broadcast(dv_keys_df),
                    on=list(dv["key_cols"]),
                    how="left_semi",
                )
                .select("__file")
                .distinct()
                .collect()
            )
            affected |= {
                b
                for b in (_bucket_id(r["__file"]) for r in hit)
                if b is not None
            }
    upd_df = None
    if delta:
        upd_df = spark.read.parquet(os.path.join(snap, mt.UPD_DIR))
        tgt = (
            upd_df.select(
                F.pmod(
                    F.hash(F.col(bucket["col"])), F.lit(int(bucket["n"]))
                ).alias("__b")
            )
            .distinct()
            .collect()
        )
        affected |= {int(r["__b"]) for r in tgt}
    if not affected and not dv and not delta:
        return {
            "compacted": False,
            "version": version,
            "files_before": files_before,
            "files_after": files_before,
            "buckets_repacked": 0,
        }
    tmp = os.path.join(mt.root, f".crepack-{uuid.uuid4().hex[:8]}")
    staged = os.path.join(mt.root, f"snap-staging-{uuid.uuid4().hex[:12]}")
    committed_ver: int | None = None
    try:
        files = [f for b in sorted(affected) for f in groups.get(b, [])]
        if files:
            df = spark.read.schema(schema).parquet(
                *[os.path.join(snap, f) for f in files]
            )
            if dv_keys_df is not None:
                df = df.join(
                    F.broadcast(dv_keys_df),
                    on=list(dv["key_cols"]),
                    how="left_anti",
                )
        else:
            df = spark.createDataFrame([], schema)
        if upd_df is not None:
            df = df.unionByName(upd_df)
        _write_bucketed(
            spark, df, bucket["col"], int(bucket["n"]),
            bucket["sorted_by"], tmp,
        )
        os.makedirs(staged)
        kept = 0
        for bid, fs in groups.items():
            if bid in affected:
                continue
            for f in fs:
                try:
                    os.link(os.path.join(snap, f), os.path.join(staged, f))
                except OSError:
                    shutil.copy2(
                        os.path.join(snap, f), os.path.join(staged, f)
                    )
                kept += 1
        new_files = 0
        for f in os.listdir(tmp):
            if not f.endswith(".parquet"):
                continue
            bid = _bucket_id(f)
            if bid is None or bid not in affected:  # pragma: no cover
                raise RuntimeError(
                    f"{root}: repack routed rows outside the affected "
                    f"buckets ({f!r})"
                )
            os.rename(os.path.join(tmp, f), os.path.join(staged, f))
            new_files += 1
        mt._acquire_lock()
        try:
            cur = mt._pointer()
            if cur is None or cur[1] != version:
                raise ConcurrentWriteError(
                    f"{root}: version advanced during clustered "
                    f"compaction (expected {version}) — retry"
                )
            new_ver = version + 1
            snap_new = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
            os.rename(staged, os.path.join(mt.root, snap_new))
            staged = os.path.join(mt.root, snap_new)
            mt._write_log(
                new_ver,
                snap_new,
                [],
                entry["schema"],
                meta={
                    **_inherited_meta(entry),
                    "bucket_repack": len(affected),
                    # sidecars are materialized by this commit: the
                    # new entry carries NO dv/mor_delta
                    **(
                        {
                            "mor_folded": {
                                "dv_keys": int((dv or {}).get("n_keys", 0)),
                                "upd_rows": int(
                                    (delta or {}).get("n_rows", 0)
                                ),
                            }
                        }
                        if (dv or delta)
                        else {}
                    ),
                },
                bucket=dict(bucket),
            )
            tmp_ptr = os.path.join(mt.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{snap_new}\n{new_ver}\n")
            os.replace(tmp_ptr, os.path.join(mt.root, mt.POINTER))
            mt.last_snapshot = snap_new
            committed_ver = new_ver
        finally:
            mt._release_lock()
            if committed_ver is None:
                shutil.rmtree(staged, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        if committed_ver is None:
            shutil.rmtree(staged, ignore_errors=True)
    mt._gc(keep=keep_snapshots)
    return {
        "compacted": True,
        "version": committed_ver,
        "files_before": files_before,
        "files_after": kept + new_files,
        "buckets_repacked": len(affected),
    }


def zorder_key(df: DataFrame, cols: list[str], *, bits: int = 16) -> Column:
    """Interleaved-bit (Morton) clustering key over numeric / date /
    timestamp columns — the multi-dimensional analogue of a sort key
    (Delta ``OPTIMIZE ZORDER BY``): rows close in the z-key are close
    in EVERY listed dimension, so range-clustering files by it gives
    per-file min/max stats that prune on ANY of the columns, where a
    lexicographic sort prunes only on its leading column.

    Each column is affinely quantized to ``bits`` levels between its
    global min and max (ONE tiny aggregate collects the 2×n driver
    scalars — the same metadata pass Delta's optimizer runs), then the
    bit planes are interleaved with pure JVM-side shift/mask
    expressions — no UDF, stays in whole-stage codegen. NULLs quantize
    to level 0 (cluster together at the low edge).

    ``bits`` is clamped so the interleaved key always fits a SIGNED
    long: ``len(cols) * bits <= 63`` (ADVICE r9 — with the old
    unclamped default, 4 columns put the top plane on bit 63, the sign
    bit, and 5+ columns wrapped the shift mod 64, silently corrupting
    the Morton order; row correctness was unaffected since file stats
    stay true, but clustering/pruning quality degraded)."""
    if not cols:
        raise ValueError("zorder_key requires at least one column")
    if len(cols) > 63:
        raise ValueError(
            f"zorder_key: {len(cols)} columns cannot interleave even "
            f"1 bit each inside a signed 64-bit key (max 63 columns)"
        )
    bits = min(bits, 63 // len(cols))
    dts = dict(df.dtypes)
    levels = (1 << bits) - 1

    def as_num(c: str) -> Column:
        col = F.col(c)
        dt = dts[c]
        if dt == "date":
            return F.datediff(col, F.to_date(F.lit("1970-01-01"))).cast(
                "double"
            )
        if dt.startswith("timestamp"):
            return F.unix_micros(col.cast("timestamp")).cast("double")
        return col.cast("double")

    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(as_num(c)).alias(f"mn{i}"))
        aggs.append(F.max(as_num(c)).alias(f"mx{i}"))
    b = df.agg(*aggs).collect()[0]  # 2n scalars: metadata-pass only

    n = len(cols)
    z: Column | None = None
    for i, c in enumerate(cols):
        mn, mx = b[f"mn{i}"], b[f"mx{i}"]
        if mn is None or mx is None or mx <= mn:
            q = F.lit(0).cast("long")
        else:
            scaled = (as_num(c) - F.lit(float(mn))) / F.lit(float(mx - mn))
            q = F.coalesce(
                F.floor(scaled * levels), F.lit(0)
            ).cast("long")
            q = F.greatest(F.lit(0), F.least(F.lit(levels), q))
        for j in range(bits):
            bit = F.shiftrightunsigned(q, j).bitwiseAND(F.lit(1))
            plane = F.shiftleft(bit, j * n + (n - 1 - i))
            z = plane if z is None else z + plane
    return z


def sweep_stale_dirs(base: str, ttl_sec: float = 6 * 3600.0) -> int:
    """Best-effort reaper for EPHEMERAL scratch roots (per-invocation
    uuid directories a crashed run left behind): remove direct
    children of ``base`` whose mtime is older than ``ttl_sec``.

    This is the txn layer's one TTL story applied to scratch space —
    the default matches :class:`ManifestTable`'s ``staging_ttl_sec``
    rationale: size it above the longest plausible run. A root's mtime
    refreshes whenever a direct child (e.g. a stage table dir) is
    created, so a live run is only at risk if MORE than ``ttl_sec``
    passes between its last stage boundary and its final read — which
    is why callers that own their root should also delete it eagerly
    once their result is materialized (then this sweep only ever sees
    crash leftovers). Returns the number of roots removed.

    The mtime check runs per-entry at rmtree time (not from a listing
    snapshot), so a root a concurrent invocation just created is never
    judged by stale metadata."""
    removed = 0
    try:
        entries = os.listdir(base)
    except FileNotFoundError:
        return 0
    for e in entries:
        p = os.path.join(base, e)
        try:
            if time.time() - os.path.getmtime(p) <= ttl_sec:
                continue
        except FileNotFoundError:
            continue  # a concurrent sweep got it first
        shutil.rmtree(p, ignore_errors=True)
        removed += 1
    return removed


# ---------------------------------------------------------------------------
# atomic multi-table transaction groups
# ---------------------------------------------------------------------------

GROUP_INTENT = "_txn-group.json"


def _member_swapped(m: dict) -> bool:
    """True iff the GROUP's OWN commit for this member is durably
    visible. Pointer-version comparison alone is not proof (ADVICE
    r10): after stale-lock expiry an INDEPENDENT single-table writer
    can reuse the same version number, so the test is snapshot-NAME
    identity — the pointer (or, for later versions built on top, the
    log entry at the intent's version) must still name the intent's
    snapshot."""
    t = ManifestTable(m["root"])
    ptr = t._pointer()
    if ptr is None or ptr[1] < m["version"]:
        return False
    if ptr[1] == m["version"]:
        return ptr[0] == m["snapshot"]
    e = t._log_entry(m["version"])
    return e is not None and e.get("snapshot") == m["snapshot"]


def _complete_group_intent(intent: dict) -> None:
    """Roll a crashed group commit FORWARD: for every member whose
    pointer has not yet reached the intended version, finish the swap
    (the log entry was written before any pointer moved, so the data
    and metadata are already durable — only the pointer is missing).
    Idempotent; safe to call from any member.

    Each swap runs under the member's COMMIT LOCK with the pointer and
    log entry re-read inside it (ADVICE r10): an independent writer
    that landed its own commit at the same version number (stale-lock
    expiry + version reuse) must not have its pointer clobbered, so
    the swap fires only when the log entry at the intent's version
    still names the intent's snapshot — i.e. recovery publishes the
    GROUP's commit, never anyone else's."""
    for m in intent["members"]:
        t = ManifestTable(m["root"])
        t._acquire_lock()
        try:
            ptr = t._pointer()
            cur = 0 if ptr is None else ptr[1]
            if cur >= m["version"]:
                continue
            entry = t._log_entry(m["version"])
            if (
                entry is None
                or entry.get("snapshot") != m["snapshot"]
                or not os.path.isdir(os.path.join(t.root, m["snapshot"]))
            ):
                # the group never reached the swap phase for this
                # member, or an independent writer's commit intent
                # superseded the entry — leave the table alone (the
                # intent is a dead letter for this member)
                continue
            tmp_ptr = os.path.join(t.root, f".ptr-{uuid.uuid4().hex[:8]}")
            with open(tmp_ptr, "w") as fh:
                fh.write(f"{m['snapshot']}\n{m['version']}\n")
            os.replace(tmp_ptr, os.path.join(t.root, t.POINTER))
        finally:
            t._release_lock()


def _read_intent(path: str) -> dict | None:
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _unlink_intents(intent: dict) -> None:
    """Remove the group's intent files, matching by gid: a DIFFERENT
    group over an overlapping member set may have dropped its own
    intent at a shared member root meanwhile, and a blind unlink would
    dead-letter that live group. Each file is claimed by atomic rename
    (exactly one cleaner wins), checked, and a foreign gid restored via
    ``os.link`` — which fails harmlessly if the owner re-created the
    path, so a third writer's fresh intent is never clobbered (same
    pattern as the stale-lock breaker in :meth:`_acquire_lock`)."""
    gid = intent.get("gid")
    for m in intent["members"]:
        path = os.path.join(m["root"], GROUP_INTENT)
        claimed = f"{path}.rm-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(path, claimed)
        except FileNotFoundError:
            continue
        found = _read_intent(claimed)
        if found is not None and found.get("gid") not in (None, gid):
            try:
                os.link(claimed, path)
            except (FileExistsError, OSError):
                pass
        try:
            os.unlink(claimed)
        except FileNotFoundError:  # pragma: no cover - cleaner races
            pass


def recover_group(root: str) -> bool:
    """Complete a crashed :class:`TransactionGroup` commit touching the
    table at ``root``, if one is pending. Returns True if an intent
    was found and processed. A group whose FIRST pointer never swapped
    is rolled back implicitly (its logged-but-unpointed entries are
    overwritten by version-number reuse, exactly like a crashed
    single-table commit); a group that swapped any pointer is rolled
    FORWARD to completion. "Swapped" is proven by snapshot-name
    identity (:func:`_member_swapped`), never by version comparison
    alone — an independent writer reusing a version number after
    stale-lock expiry must not make recovery publish a never-committed
    group (ADVICE r10).

    An unswapped intent is NOT immediately a dead letter (ADVICE r11):
    a LIVE group sits exactly in that state between dropping its
    intent files (step 5) and its first pointer swap (step 6). That
    group holds every member's commit lock from CAS to intent removal,
    so recovery takes THIS member's lock before judging — a live group
    blocks us until it settles (intent gone, or swapped and
    roll-forwardable), and an intent still unswapped UNDER the lock
    can only belong to a group that crashed before any swap. Intent
    removal matches by gid (:func:`_unlink_intents`) so a different
    group's fresh intent at a shared member is never dead-lettered."""
    path = os.path.join(root, GROUP_INTENT)
    intent = _read_intent(path)
    if intent is None:
        return False
    if not any(_member_swapped(m) for m in intent["members"]):
        t = ManifestTable(root)
        t._acquire_lock()
        try:
            intent = _read_intent(path)
            if intent is None:
                return True  # the group settled while we waited
            swapped = any(_member_swapped(m) for m in intent["members"])
        finally:
            t._release_lock()
        if not swapped:
            # crashed before any swap: members roll back by
            # version-number reuse; the intents are dead letters
            _unlink_intents(intent)
            return True
    _complete_group_intent(intent)
    _unlink_intents(intent)
    return True


class TransactionGroup:
    """Atomic commit across SEVERAL :class:`ManifestTable`s — the
    all-or-nothing multi-table transaction mainstream lake formats
    don't offer (Delta/Iceberg transactions are single-table), and the
    contract a table + its derived index need: q95/q106-class
    consumers maintain an ANN/bucket index NEXT TO the corpus table,
    and a reader that sees the new corpus with the old index (or vice
    versa) computes garbage. At 100 TB the snapshot writes dominate
    and run UNLOCKED and in parallel upstream; the serialized section
    is per-table: one CAS + one log write + one pointer swap each.

    Protocol (all-or-nothing on an atomic-rename filesystem):

    1. stage every member's snapshot (long, unlocked);
    2. take every member's commit lock in canonical root order
       (deadlock-free against any other group over the same tables);
    3. CAS-check every member's version under lock — any mismatch
       aborts the WHOLE group before anything is visible;
    4. write every member's log entry (logged-but-unpointed = invisible
       intent, as in the single-table protocol);
    5. drop a group-intent file in every member root;
    6. swap pointers in canonical order;
    7. remove the intents, release locks, GC.

    A crash before the first pointer swap rolls the whole group back
    (unpointed entries are overwritten by version reuse). A crash
    after any swap leaves the intent files, and :func:`recover_group`
    — called automatically by the next group commit or read — rolls
    the group FORWARD, so readers can never durably observe a torn
    group. Readers wanting a guaranteed-consistent view call
    :meth:`read_all`, which runs recovery first and then resolves all
    members' heads under a consistent cut."""

    def __init__(self, *tables: ManifestTable):
        if len(tables) < 2:
            raise ValueError("a TransactionGroup needs at least 2 tables")
        self.tables = sorted(
            tables, key=lambda t: os.path.realpath(t.root)
        )
        roots = [os.path.realpath(t.root) for t in self.tables]
        if len(set(roots)) != len(roots):
            raise ValueError("duplicate table roots in group")

    def _recover_all(self) -> None:
        for t in self.tables:
            recover_group(t.root)

    def commit(
        self,
        writes: dict[str, "DataFrame | tuple[str, DataFrame]"],
        *,
        expect_versions: dict[str, int] | None = None,
        meta: dict | None = None,
        keep_snapshots: int = 2,
    ) -> dict[str, int]:
        """Commit every member atomically. ``writes`` maps each
        member's root to either

        - a DataFrame — the member's new FULL state (copy-on-write
          snapshot, the original shape), or
        - ``("commit" | "append" | "append_clustered", DataFrame)`` —
          an explicit op. ``"append"`` / ``"append_clustered"`` stage
          ADD-FILE commits (r12 — VERDICT r11 item 4): the base
          snapshot hardlinks forward and only the batch is written, so
          a corpus + derived-index pair can advance atomically per
          ingest batch at O(batch) cost instead of rewriting both
          tables. Append-shaped members carry an IMPLICIT per-member
          CAS on the base version they staged against — any
          interleaved writer aborts the WHOLE group (nothing visible),
          exactly the single-table append contract.

        Every member must be written — a partial group is a
        contradiction in terms; commit the subset through the tables
        directly if independence is fine. ``expect_versions`` (root ->
        version) adds explicit per-member CAS. Returns root -> new
        version. Raises :class:`ConcurrentWriteError` (whole group
        aborted) on any CAS miss."""
        self._recover_all()
        by_root = {os.path.realpath(t.root): t for t in self.tables}
        keyed = {os.path.realpath(r): v for r, v in writes.items()}
        if set(keyed) != set(by_root):
            raise ValueError(
                f"writes must cover the group exactly; missing="
                f"{sorted(set(by_root) - set(keyed))} extra="
                f"{sorted(set(keyed) - set(by_root))}"
            )
        ops: dict[str, tuple[str, DataFrame]] = {}
        for rp, v in keyed.items():
            if isinstance(v, DataFrame):
                ops[rp] = ("commit", v)
            else:
                op, df = v
                if op not in ("commit", "append", "append_clustered"):
                    raise ValueError(
                        f"unknown group member op {op!r} — expected "
                        f"'commit', 'append' or 'append_clustered'"
                    )
                ops[rp] = (op, df)
        for t in self.tables:
            live = t._log_entry(t.version() or 0) or {}
            if (live.get("cdf") or {}).get("key_cols") or live.get("checks"):
                raise ValueError(
                    f"{t.root}: group commits don't compose with the "
                    f"change feed or CHECK constraints yet — commit() "
                    f"those tables individually"
                )
        gid = uuid.uuid4().hex[:16]
        staged: dict[str, str] = {}
        logkw: dict[str, dict] = {}
        schemas: dict[str, str] = {}
        layouts: dict[str, list[str]] = {}
        base_ver: dict[str, int] = {}  # append members' implicit CAS
        try:
            for t in self.tables:
                rp = os.path.realpath(t.root)
                op, df = ops[rp]
                os.makedirs(t.root, exist_ok=True)
                if op == "append":
                    tmp, entry, version, part_by, tschema, aligned = (
                        t._prepare_append_batch(df)
                    )
                    try:
                        s, kw = t._stage_append_parts(
                            df.sparkSession,
                            tmp,
                            entry,
                            version,
                            part_by,
                            tschema,
                            aligned,
                            meta=None,
                        )
                    except Exception:
                        shutil.rmtree(tmp, ignore_errors=True)
                        raise
                    staged[rp], logkw[rp] = s, kw
                    base_ver[rp] = version
                    continue
                if op == "append_clustered":
                    entry, version, snap = t._prepare_clustered_append(
                        df.sparkSession, df
                    )
                    s, kw = t._stage_clustered_append(
                        df.sparkSession, df, entry, snap, meta=None
                    )
                    staged[rp], logkw[rp] = s, kw
                    base_ver[rp] = version
                    continue
                # full-state member — same table-property semantics as
                # single-table commit (ADVICE r10): inherit the live
                # entry's partition layout (a group commit must not
                # silently unpartition a member) and run the
                # align/widen schema validation — new columns append,
                # missing columns null-fill, narrowing raises
                # SchemaEvolutionError instead of committing a snapshot
                # the next merge misaligns with.
                live_entry = t._log_entry(t.version() or 0) or {}
                part_by = list(live_entry.get("partition_by") or [])
                live = t._live_schema(df.sparkSession)
                if live is not None and live != df.schema:
                    df = align_to_schema(df, evolve_schema(live, df.schema))
                missing = [c for c in part_by if c not in df.columns]
                if missing:
                    raise SchemaEvolutionError(
                        f"{t.root}: group write lacks the member's "
                        f"partition columns {missing}"
                    )
                s = os.path.join(
                    t.root, f"snap-staging-{uuid.uuid4().hex[:12]}"
                )
                writer = df.write.mode("overwrite")
                if part_by:
                    writer = writer.partitionBy(*part_by)
                writer.parquet(s)
                staged[rp] = s
                schemas[rp] = df.schema.json()
                layouts[rp] = part_by
                logkw[rp] = dict(
                    partition_by=part_by, schema_json=df.schema.json()
                )
        except Exception:
            for s in staged.values():
                shutil.rmtree(s, ignore_errors=True)
            raise
        locked: list[ManifestTable] = []
        plan: list[dict] = []
        swapped = False
        try:
            for t in self.tables:
                t._acquire_lock()
                locked.append(t)
            exp = {
                os.path.realpath(r): v
                for r, v in (expect_versions or {}).items()
            }
            for t in self.tables:
                rp = os.path.realpath(t.root)
                ptr = t._pointer()
                cur = 0 if ptr is None else ptr[1]
                if rp in exp and cur != exp[rp]:
                    raise ConcurrentWriteError(
                        f"{t.root}: version {cur} != expected {exp[rp]} — "
                        f"whole group aborted"
                    )
                live_now = t._log_entry(cur) or {}
                if rp in base_ver:
                    # append-shaped member: the staged snapshot embeds
                    # the base's files, so ANY interleaved commit makes
                    # it stale — implicit CAS on the staged-against
                    # version (the single-table append contract,
                    # group-wide abort semantics)
                    if cur != base_ver[rp]:
                        raise ConcurrentWriteError(
                            f"{t.root}: version advanced during group "
                            f"append staging (staged against "
                            f"{base_ver[rp]}, now {cur}) — whole group "
                            f"aborted, re-commit"
                        )
                    continue
                # full-state member: re-validate the inheritance base
                # INSIDE the lock: a writer that advanced it between
                # staging and lock acquisition may have changed its
                # layout, widened its schema, or enabled table
                # properties the group path skips — committing the
                # stale staging would silently revert/bypass them.
                # Abort the whole group (bounded caller retry) rather
                # than restage under all the locks.
                if (live_now.get("cdf") or {}).get("key_cols") or (
                    live_now.get("checks")
                ):
                    raise ConcurrentWriteError(
                        f"{t.root}: a concurrent commit enabled the "
                        f"change feed or CHECK constraints while the "
                        f"group staged — whole group aborted"
                    )
                if list(live_now.get("partition_by") or []) != layouts[rp]:
                    raise ConcurrentWriteError(
                        f"{t.root}: partition layout changed while the "
                        f"group staged — whole group aborted, re-commit"
                    )
                new_live = t._live_schema(ops[rp][1].sparkSession)
                staged_schema = T.StructType.fromJson(json.loads(schemas[rp]))
                if new_live is not None and [
                    (f.name, f.dataType)
                    for f in evolve_schema(new_live, staged_schema).fields
                ] != [(f.name, f.dataType) for f in staged_schema.fields]:
                    raise ConcurrentWriteError(
                        f"{t.root}: live schema evolved while the group "
                        f"staged — whole group aborted, re-commit"
                    )
            for t in self.tables:
                ptr = t._pointer()
                cur = 0 if ptr is None else ptr[1]
                new_ver = cur + 1
                snap = f"snap-{new_ver:06d}-{uuid.uuid4().hex[:8]}"
                plan.append(
                    {"root": t.root, "version": new_ver, "snapshot": snap}
                )
            intent = {"gid": gid, "members": plan}
            for t, m in zip(self.tables, plan):
                rp = os.path.realpath(t.root)
                os.rename(staged[rp], os.path.join(t.root, m["snapshot"]))
                staged[rp] = os.path.join(t.root, m["snapshot"])
                kw = dict(logkw[rp])
                kw_meta = kw.pop("meta", None) or {}
                t._write_log(
                    m["version"],
                    m["snapshot"],
                    kw.pop("partition_by"),
                    kw.pop("schema_json"),
                    meta={
                        **kw_meta,
                        **(meta or {}),
                        "txn": {"gid": gid, "roots": [p["root"] for p in plan]},
                    },
                    **kw,
                )
            for t in self.tables:
                tmp = os.path.join(t.root, f".grp-{uuid.uuid4().hex[:8]}")
                with open(tmp, "w") as fh:
                    json.dump(intent, fh)
                os.replace(tmp, os.path.join(t.root, GROUP_INTENT))
            for t, m in zip(self.tables, plan):
                tmp_ptr = os.path.join(
                    t.root, f".ptr-{uuid.uuid4().hex[:8]}"
                )
                with open(tmp_ptr, "w") as fh:
                    fh.write(f"{m['snapshot']}\n{m['version']}\n")
                os.replace(tmp_ptr, os.path.join(t.root, t.POINTER))
                t.last_snapshot = m["snapshot"]
                swapped = True
            for t in self.tables:
                try:
                    os.unlink(os.path.join(t.root, GROUP_INTENT))
                except FileNotFoundError:
                    pass
        finally:
            for t in locked:
                t._release_lock()
            if not swapped:
                for s in staged.values():
                    shutil.rmtree(s, ignore_errors=True)
        for t in self.tables:
            t._gc(keep=keep_snapshots)
        return {m["root"]: m["version"] for m in plan}

    def read_all(self, spark: SparkSession) -> dict[str, DataFrame]:
        """Consistent read of every member: completes any crashed group
        first (roll-forward), then reads each member's head. Because
        every group commit is all-or-nothing after recovery, the heads
        form a consistent cut whenever writes go through the group."""
        self._recover_all()
        return {t.root: t.read(spark) for t in self.tables}

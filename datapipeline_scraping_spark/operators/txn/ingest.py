"""External ingestion paths: JVM-free appends, CDF application, MERGE writer seam."""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..merge import merge_into
from .errors import (
    ConcurrentWriteError,
    ConstraintViolationError,
    SchemaEvolutionError,
)
from .layout import (
    _current_spec,
    _entry_specs,
    _link_tree,
    _refuse_clustered,
    _spec_dirname,
)
from .schema import _apply_map, _phys_schema
from .stats import (
    _bloom_params,
    _bloom_positions,
    _incremental_stats,
    _inherited_meta,
)
from .table import ManifestTable


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

"""The ManifestTable as a REGISTERED Spark data source — the
transaction layer readable from PURE SQL (Spark 4 Python DataSource
API), including time travel:

    spark.dataSource.register(ManifestDataSource)
    spark.read.format("manifest").option("root", root).load()
    spark.sql(\"\"\"
      CREATE TEMPORARY VIEW ledger
      USING manifest OPTIONS (root '...', version '3')
    \"\"\")

This is Delta's ``spark.read.format("delta").option("versionAsOf")``
surface re-expressed on the manifest protocol. The reader implements
the FULL merge-on-read visibility composition per task, in Arrow:

- one ``InputPartition`` per data file (a 100 TB snapshot fans out
  file-granular, like any parquet scan);
- hive partition values parsed from the file's directory path and
  attached as constant columns (data files under ``col=value`` dirs
  don't carry the column);
- the deletion vector applied as a per-task Arrow anti-join (the
  ``_dv/`` sidecar is churn-sized by contract — one small file every
  task can afford to load);
- the ``_upd/`` update delta served by its own partitions (post-DV by
  construction);
- metadata-only renames applied by name (``column_map``).

Parity with :meth:`ManifestTable.read` is pinned in
``tests/test_manifest_source.py`` for every sidecar combination —
same rows, same logical schema, through the SQL surface.

Options: ``root`` (required), ``version`` (int, optional — default
head), ``asof`` (float unix ts, optional — Delta ``timestampAsOf``;
mutually exclusive with ``version``), ``where`` (optional — an exact
predicate over the table, conjunctions of simple comparisons; drives
planning-time file skipping and is applied row-exactly per task, see
:class:`ManifestReader`). Version resolution happens ONCE
at reader construction, so a racing writer cannot redirect the scan
mid-query (same pin the DataFrame API gives), and a GC'd version
raises the documented errors instead of silently reading older state.
"""

from __future__ import annotations

import glob
import json
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from .cdf_datasource import _log_entry, _pointer_version


def _resolve_version(options) -> tuple[str, int, dict]:
    """(root, version, entry) with Delta-style time-travel semantics.
    Raises on a GC'd or unknown version — never silently older state."""
    root = options["root"]
    if "version" in options and "asof" in options:
        raise ValueError("options version and asof are mutually exclusive")
    if "version" in options:
        ver = int(options["version"])
    elif "asof" in options:
        ts = float(options["asof"])
        live = _pointer_version(root)
        ver = None
        for v in range(live, 0, -1):
            e = _log_entry(root, v)
            if e is not None and e.get("ts", float("inf")) <= ts:
                ver = v
                break
        if ver is None:
            raise FileNotFoundError(f"{root}: no commit at or before ts={ts}")
    else:
        ver = _pointer_version(root)
        if not ver:
            raise FileNotFoundError(f"no committed snapshot under {root}")
    entry = _log_entry(root, ver)
    if entry is None:
        raise FileNotFoundError(f"{root}: no commit log entry for v{ver}")
    snap = os.path.join(root, entry["snapshot"])
    if not os.path.isdir(snap):
        raise FileNotFoundError(
            f"{root}: version {ver} aged past the retention contract and "
            f"its snapshot was garbage-collected"
        )
    return root, ver, entry


def _data_files(snap: str) -> list[str]:
    out = []
    for d, dirs, fs in os.walk(snap):
        dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
        out.extend(
            os.path.join(d, f) for f in sorted(fs) if f.endswith(".parquet")
        )
    return out


def _partition_values(path: str, snap: str) -> dict:
    """Hive partition values from the file's directory path. Values are
    UNESCAPED (hive URL-encodes special characters into dir names —
    ``a/b`` writes as ``a%2Fb``), matching what Spark's own partition
    discovery reconstructs."""
    from urllib.parse import unquote

    vals = {}
    rel = os.path.relpath(os.path.dirname(path), snap)
    for seg in rel.split(os.sep):
        if "=" in seg:
            k, _, v = seg.partition("=")
            vals[k] = (
                None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
            )
    return vals


#: where-option grammar: conjunctions of simple comparisons.
#:   expr    := term (AND term)*
#:   term    := col op literal | col IN ( lit, ... )
#:            | col BETWEEN lit AND lit | col IS [NOT] NULL
#:   op      := = | == | > | >= | < | <=
#:   literal := number | 'string' ('' escapes a quote) | TRUE | FALSE
#:   col     := identifier | `identifier`
_WHERE_TOKEN = re.compile(
    r"\s*(?:"
    r"(?P<str>'(?:[^']|'')*')"
    r"|(?P<num>-?\d+(?:\.\d+)?)"
    r"|(?P<op><=|>=|==|=|<|>)"
    r"|(?P<punct>[(),])"
    r"|`(?P<qid>[^`]+)`"
    r"|(?P<word>[A-Za-z_][A-Za-z0-9_.]*)"
    r")"
)


def parse_where(s: str) -> list[tuple]:
    """Parse the ``where`` option into a list of conditions —
    ``("cmp", col, op, value)`` / ``("in", col, values)``. Raises
    ``ValueError`` on anything outside the documented grammar: a
    predicate the reader cannot apply EXACTLY must fail loudly, never
    silently return unfiltered rows."""
    toks: list[tuple[str, object]] = []
    pos = 0
    while pos < len(s):
        m = _WHERE_TOKEN.match(s, pos)
        if m is None or m.end() == pos:
            if s[pos:].strip():
                raise ValueError(f"where: cannot tokenize at {s[pos:]!r}")
            break
        pos = m.end()
        if m.group("str") is not None:
            toks.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            n = m.group("num")
            toks.append(("lit", float(n) if "." in n else int(n)))
        elif m.group("op") is not None:
            toks.append(("op", "=" if m.group("op") == "==" else m.group("op")))
        elif m.group("punct") is not None:
            toks.append(("punct", m.group("punct")))
        elif m.group("qid") is not None:
            toks.append(("id", m.group("qid")))
        else:
            w = m.group("word")
            u = w.upper()
            if u in ("AND", "IN", "BETWEEN", "NOT", "OR", "IS", "NULL"):
                toks.append(("kw", u))
            elif u in ("TRUE", "FALSE"):
                toks.append(("lit", u == "TRUE"))
            else:
                toks.append(("id", w))
    out: list[tuple] = []
    i = 0

    def expect(kind, val=None):
        nonlocal i
        if i >= len(toks) or toks[i][0] != kind or (
            val is not None and toks[i][1] != val
        ):
            raise ValueError(f"where: unexpected syntax near token {i} in {s!r}")
        tok = toks[i]
        i += 1
        return tok[1]

    while i < len(toks):
        col = expect("id")
        kind, val = toks[i] if i < len(toks) else ("", "")
        if kind == "op":
            i += 1
            out.append(("cmp", col, val, expect("lit")))
        elif kind == "kw" and val == "IN":
            i += 1
            expect("punct", "(")
            vals = [expect("lit")]
            while i < len(toks) and toks[i] == ("punct", ","):
                i += 1
                vals.append(expect("lit"))
            expect("punct", ")")
            # one literal kind per IN list: a mixed list cannot build
            # one Arrow value_set — fail at parse, not mid-task
            kinds = {
                ("b" if isinstance(v, bool) else
                 "s" if isinstance(v, str) else "n")
                for v in vals
            }
            if len(kinds) > 1:
                raise ValueError(
                    f"where: IN list for {col!r} mixes literal types"
                )
            out.append(("in", col, tuple(vals)))
        elif kind == "kw" and val == "IS":
            i += 1
            neg = False
            if i < len(toks) and toks[i] == ("kw", "NOT"):
                neg = True
                i += 1
            expect("kw", "NULL")
            out.append(("null", col, neg))  # neg=True => IS NOT NULL
        elif kind == "kw" and val == "BETWEEN":
            i += 1
            lo = expect("lit")
            expect("kw", "AND")
            out.append(("cmp", col, ">=", lo))
            out.append(("cmp", col, "<=", expect("lit")))
        else:
            raise ValueError(f"where: expected comparison after {col!r}")
        if i < len(toks):
            expect("kw", "AND")  # OR / NOT are not part of the grammar
    if not out:
        raise ValueError("where: empty predicate")
    return out


def _overlaps(mn, mx, lo, hi) -> bool:
    """Conservative [mn, mx] ∩ [lo, hi] test: any comparison that
    raises (mixed/incomparable types) keeps the file — skipping is an
    optimization, never a correctness filter."""
    try:
        if lo is not None and mx is not None and mx < lo:
            return False
        if hi is not None and mn is not None and mn > hi:
            return False
    except TypeError:
        return True
    return True


class ManifestReader(DataSourceReader):
    """Per-task MoR read: parquet file -> rename map -> attach hive
    partition constants -> DV anti-join -> declared-schema cast -> the
    ``where`` option's row filter. The ``_upd/`` delta files skip the
    anti-join (post-DV rows).

    FILE SKIPPING on the SQL path (r13 redesign): the predicate comes
    from the relation's ``where`` OPTION — conjunctions of simple
    comparisons (see :func:`parse_where`) — applied EXACTLY (files
    pruned at planning against hive ``col=value`` path segments, the
    commit log's per-file min/max stats, and the clustered bucket
    layout; surviving rows filtered in Arrow per task), so

        CREATE TEMPORARY VIEW recent USING manifest
        OPTIONS (root '...', `where` 'ts >= 1700000000')

    is a predicate view that launches O(window) tasks instead of
    O(table) at 100 TB.

    WHY AN OPTION AND NOT ``pushFilters`` (r13, replacing the r12
    design): Spark 4.1 keeps ONE mutable read-info slot per Python
    data source instance (``PythonDataSourceV2.setReadInfo`` /
    ``getOrCreateReadInfo`` — last pushdown wins). When one relation
    is scanned twice in a plan with different predicates (self-join,
    union of two filtered branches, a view referenced twice), every
    scan executes the LAST branch's pushed-filter partition list and
    read function, silently dropping the other branches' rows —
    measured: ``v.filter(a).union(v.filter(b))`` returned only
    ``b``'s rows, and an anti-join's build side came back empty, so
    AQE eliminated the join. A reader whose ``partitions()`` depends
    on ``pushFilters`` state is therefore UNSOUND on this Spark
    version no matter how conservative each individual run is. The
    ``where`` option lives in the relation identity instead: every
    pushdown/plan run of the same relation produces the SAME
    read-info, so the shared-slot collision is harmless by
    construction, and differently-filtered views are different
    relations. Pruning semantics are unchanged from r12: a file is
    dropped only when it provably contains no qualifying row (evolved
    snapshots compose — each file prunes by ITS spec's dirs, falling
    back to stats; the ``_upd`` delta is always scanned)."""

    def __init__(self, options, schema: StructType):
        from pyspark.sql.pandas.types import to_arrow_schema

        root, ver, entry = _resolve_version(options)
        self.snap = os.path.join(root, entry["snapshot"])
        self.cmap = dict(entry.get("column_map") or {})  # logical->physical
        self.dropped = list(entry.get("dropped") or [])  # physical names
        self.dv_keys = list((entry.get("dv") or {}).get("key_cols") or [])
        self.dv_files = (
            sorted(glob.glob(os.path.join(self.snap, "_dv", "*.parquet")))
            if entry.get("dv")
            else []
        )
        self.arrow_schema = to_arrow_schema(schema)
        self.file_stats = dict(entry.get("file_stats") or {})
        #: clustered snapshot layout (commit_clustered): bucket ids
        #: live in the file names — the layout contract read_clustered
        #: already depends on — so equality points on the bucket column
        #: prune to their buckets' files (r13). The column's Spark type
        #: drives the hash variant; clustered tables refuse renames,
        #: so logical name == physical name here.
        self.bucket = dict(entry.get("bucket") or {})
        self.bucket_type = next(
            (
                f.dataType.simpleString()
                for f in schema.fields
                if f.name == self.bucket.get("col")
            ),
            None,
        )
        #: conditions from the `where` option, LOGICAL column names —
        #: applied exactly (row filter) in read(); empty = no predicate
        self.conditions: list[tuple] = (
            parse_where(options["where"]) if "where" in options else []
        )
        logical = {f.name: f.dataType.simpleString() for f in schema.fields}
        _NUM = {
            "int",
            "smallint",
            "tinyint",
            "bigint",
            "long",
            "float",
            "double",
        }

        def _kind_ok(lit, styp: str) -> bool:
            if isinstance(lit, bool):
                return styp == "boolean"
            if isinstance(lit, (int, float)):
                return styp in _NUM or styp.startswith("decimal")
            return styp == "string"

        for cond in self.conditions:
            if cond[1] not in logical:
                raise ValueError(
                    f"where: unknown column {cond[1]!r} "
                    f"(have {sorted(logical)})"
                )
            # literal kind must match the column type AT PARSE time —
            # 'k >= ''x''' on a bigint column would otherwise only
            # blow up (or worse, mis-compare) inside an executor task
            if cond[0] == "null":
                continue  # IS [NOT] NULL carries no literal
            styp = logical[cond[1]]
            lits = cond[2] if cond[0] == "in" else (cond[3],)
            for lit in lits:
                if not _kind_ok(lit, styp):
                    raise ValueError(
                        f"where: literal {lit!r} does not match "
                        f"column {cond[1]!r} of type {styp} (supported "
                        f"predicate column types: numeric, string, "
                        f"boolean)"
                    )
        #: physical column -> [lo, hi] envelope (AND of all conditions)
        self.ranges: dict[str, list] = {}
        #: physical column -> exact value SET (= / IN) — prunes
        #: dir-encoded columns tighter than the range envelope
        self.point_sets: dict[str, set] = {}
        #: physical column -> required nullness (True = IS NOT NULL,
        #: False = IS NULL) — prunes hive null-partition dirs
        self.null_conds: dict[str, bool] = {}
        for cond in self.conditions:
            col = self.cmap.get(cond[1], cond[1])  # logical -> physical
            lo = hi = None
            if cond[0] == "null":
                # IS NOT NULL (cond[2]=True) / IS NULL (False)
                self.null_conds[col] = bool(cond[2])
                continue
            if cond[0] == "cmp":
                op, v = cond[2], cond[3]
                if op == "=":
                    lo = hi = v
                    prev = self.point_sets.get(col)
                    self.point_sets[col] = (
                        {v} if prev is None else prev & {v}
                    )
                elif op in (">", ">="):
                    lo = v
                else:
                    hi = v
            else:  # ("in", col, values)
                pts = set(cond[2])
                prev = self.point_sets.get(col)
                self.point_sets[col] = pts if prev is None else prev & pts
                try:
                    lo, hi = min(pts), max(pts)
                except TypeError:
                    lo = hi = None
            if lo is not None or hi is not None:
                r = self.ranges.setdefault(col, [None, None])
                # AND semantics: intersect with any prior range
                try:
                    if lo is not None and (r[0] is None or lo > r[0]):
                        r[0] = lo
                    if hi is not None and (r[1] is None or hi < r[1]):
                        r[1] = hi
                except TypeError:
                    pass
        # precompute each point set's comparison forms ONCE (planning
        # runs _keep_file per file — O(files), not O(files × points)):
        # lowercased strings (hive lowercases booleans) + numeric set;
        # None marks a set with an uncanonicalizable member (no prune)
        self._point_forms: dict = {}
        for col, pts in self.point_sets.items():
            if not all(isinstance(p, (str, int, float, bool)) for p in pts):
                self._point_forms[col] = None
                continue
            nums = set()
            for p in pts:
                try:
                    nums.add(float(p))
                except (TypeError, ValueError):
                    pass
            self._point_forms[col] = (
                {str(p).lower() for p in pts},
                nums,
            )

    def _keep_file(self, path: str, part_vals: dict) -> bool:
        rel = os.path.relpath(path, self.snap)
        stats = self.file_stats.get(rel) or {}
        # IS [NOT] NULL against dir-encoded columns: a file under
        # col=__HIVE_DEFAULT_PARTITION__ holds ONLY null values of
        # col, and one under col=value holds none — either side can
        # prune exactly; non-dir-encoded columns fall through to the
        # row filter (min/max stats carry no null counts)
        for col, want_not_null in self.null_conds.items():
            if col not in part_vals:
                continue
            is_null_dir = part_vals[col] is None
            if is_null_dir == want_not_null:
                return False
        # point-set pruning on dir-encoded columns: tighter than the
        # range envelope for IN-lists (`IN ('a','z')` keeps only those
        # two dirs, not everything between). Conservative: only prunes
        # when every point has a canonical dir form (str/int/float/
        # bool — _point_forms), matched case-insensitively so
        # Python's str(True)='True' meets hive's 'true'; any column
        # whose points can't be canonicalized keeps all files.
        for col, forms in self._point_forms.items():
            raw = part_vals.get(col)
            if raw is None:  # not dir-encoded here / hive null: keep
                continue
            if forms is None:  # uncanonicalizable point type: keep
                continue
            str_forms, num_forms = forms
            if raw.lower() in str_forms:
                continue
            try:
                if float(raw) in num_forms:
                    continue
            except (TypeError, ValueError):
                pass
            return False
        for col, (lo, hi) in self.ranges.items():
            if col in part_vals:
                raw = part_vals[col]
                if raw is None:  # hive null partition: never prune
                    continue
                v = raw
                # dir values are strings; compare numerically when the
                # bound is numeric (mirrors txn._partition_pruned_files)
                if isinstance(lo, (int, float)) or isinstance(
                    hi, (int, float)
                ):
                    try:
                        v = float(raw)
                    except (TypeError, ValueError):
                        pass
                if not _overlaps(v, v, lo, hi):
                    return False
                continue
            st = stats.get(col)
            if st is not None and not _overlaps(st[0], st[1], lo, hi):
                return False
        return True

    def _allowed_bucket_ids(self) -> set[int] | None:
        """Bucket ids that can satisfy the pushed equality points on a
        clustered snapshot's bucket column; None = no pruning (not
        clustered, no equality points, or a (value, type) pair the
        driver-side hash doesn't cover — conservative as always)."""
        from ..functions.bucket_hash import bucket_id

        col = self.bucket.get("col")
        n = int(self.bucket.get("n") or 0)
        pts = self.point_sets.get(col) if col else None
        if not pts or n <= 0 or self.bucket_type is None:
            return None
        ids: set[int] = set()
        for p in pts:
            b = bucket_id(p, self.bucket_type, n)
            if b is None:
                return None  # one unhashable point disables the prune
            ids.add(b)
        return ids

    def partitions(self):
        from ..functions.bucket_hash import file_bucket_id

        allowed_buckets = self._allowed_bucket_ids()
        parts = []
        for f in _data_files(self.snap):
            pv = _partition_values(f, self.snap)
            if (
                self.ranges or self.point_sets or self.null_conds
            ) and not self._keep_file(f, pv):
                continue
            if allowed_buckets is not None:
                fb = file_bucket_id(os.path.basename(f))
                # a clustered data file without a parseable bucket id
                # violates the layout contract — keep it (correctness
                # over skipping), same stance as every other prune
                if fb is not None and fb not in allowed_buckets:
                    continue
            parts.append(InputPartition((f, pv, True)))
        # the _upd delta is churn-sized and carries no per-file stats:
        # always scanned (update_where can move rows into any range)
        parts.extend(
            InputPartition((f, {}, False))
            for f in sorted(
                glob.glob(os.path.join(self.snap, "_upd", "*.parquet"))
            )
        )
        if not parts:
            # every file pruned: one zero-row task keeps the contract
            # (the API requires at least one partition)
            parts.append(InputPartition((None, {}, False)))
        return parts

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        path, part_vals, apply_dv = partition.value
        want = self.arrow_schema
        if path is None:  # all-pruned placeholder: zero rows
            return
        # push the where conditions into the parquet DECODE (row-group
        # statistics pruning + dictionary filtering) for every column
        # physically present in this file — the third skipping tier
        # under file pruning. Conditions on dir-encoded / renamed-away
        # / evolution-added columns are left to the final Arrow mask,
        # which re-applies everything (idempotent), so this is purely
        # an optimization and never a correctness filter.
        flt = []
        if self.conditions:
            present = set(pq.ParquetFile(path).schema_arrow.names)
            for cond in self.conditions:
                pcol = self.cmap.get(cond[1], cond[1])
                if pcol not in present or cond[0] == "null":
                    continue  # nullness is checked in the final mask
                if cond[0] == "cmp":
                    op = "==" if cond[2] == "=" else cond[2]
                    flt.append((pcol, op, cond[3]))
                else:
                    flt.append((pcol, "in", set(cond[2])))
        tbl = pq.read_table(path, filters=flt or None)
        # dropped physical columns go FIRST (metadata-only DROP): a
        # later rename may reuse a dropped name as its logical target,
        # and the stale physical column must be gone before the rename
        # lands or the two names collide (mirrors txn._apply_map)
        if self.dropped:
            keep = [c for c in tbl.schema.names if c not in self.dropped]
            tbl = tbl.select(keep)
        # physical -> logical renames (metadata-only rename commits)
        if self.cmap:
            phys_to_logi = {p: l for l, p in self.cmap.items()}
            tbl = tbl.rename_columns(
                [phys_to_logi.get(c, c) for c in tbl.schema.names]
            )
        # hive partition constants (dir names carry the values)
        for col, raw in part_vals.items():
            if col in tbl.schema.names:
                continue
            typ = want.field(col).type
            arr = pa.array([raw] * tbl.num_rows, type=pa.string()).cast(typ)
            tbl = tbl.append_column(col, arr)
        # deletion vector: per-task Arrow anti-join on the key columns
        if apply_dv and self.dv_files and all(
            k in tbl.schema.names for k in self.dv_keys
        ):
            dv = pa.concat_tables(
                [pq.read_table(f) for f in self.dv_files]
            )
            tbl = tbl.join(
                dv, keys=self.dv_keys, join_type="left anti"
            )
        # align + cast to the declared logical schema (null-fill
        # columns added by later schema evolution)
        if tbl.schema.names != want.names:
            arrays = [
                tbl.column(f.name)
                if f.name in tbl.schema.names
                else pa.nulls(tbl.num_rows, type=f.type)
                for f in want
            ]
            tbl = pa.Table.from_arrays(arrays, names=list(want.names))
        tbl = tbl.cast(want)
        # the `where` option's EXACT row filter (SQL semantics: a null
        # comparison excludes the row) — file pruning above is only
        # the coarse pass over the same conditions
        if self.conditions:
            import pyarrow.compute as pc

            ops = {
                "=": pc.equal,
                ">": pc.greater,
                ">=": pc.greater_equal,
                "<": pc.less,
                "<=": pc.less_equal,
            }
            for cond in self.conditions:
                if cond[0] == "cmp":
                    mask = ops[cond[2]](tbl.column(cond[1]), cond[3])
                elif cond[0] == "null":
                    mask = (
                        pc.is_valid(tbl.column(cond[1]))
                        if cond[2]  # IS NOT NULL
                        else pc.is_null(tbl.column(cond[1]))
                    )
                else:
                    mask = pc.is_in(
                        tbl.column(cond[1]), value_set=pa.array(list(cond[2]))
                    )
                tbl = tbl.filter(mask)
        yield from tbl.to_batches(max_chunksize=1 << 16)


class ManifestDataSource(DataSource):
    """``format("manifest")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "manifest"

    def schema(self) -> StructType:
        _root, _ver, entry = _resolve_version(self.options)
        sj = entry.get("schema")
        if not sj:
            raise ValueError(f"{self.options['root']}: no committed schema")
        return StructType.fromJson(json.loads(sj))

    def reader(self, schema):
        return ManifestReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        if "where" in self.options:
            raise ValueError(
                "manifest: a relation with a `where` option is a "
                "filtered READ view — write to the unfiltered table"
            )
        if overwrite:
            raise ValueError(
                "manifest: mode('overwrite') replaces the whole table — "
                "use ManifestTable.commit via the DataFrame API; the SQL "
                "write surface is append-only (INSERT INTO / "
                "mode('append'))"
            )
        return ManifestWriter(self.options)


class _PartsMessage(WriterCommitMessage):
    def __init__(self, path, rows):
        self.path = path
        self.rows = rows


class ManifestWriter(DataSourceArrowWriter):
    """``df.write.format("manifest").mode("append")`` / SQL
    ``INSERT INTO`` on a ``USING manifest`` view — the write half of
    the SQL surface, riding the ledger's ADD-FILE commit: each task
    streams its Arrow batches into one parquet part under a hidden
    staging dir inside the table root (same filesystem — the commit
    adopts the files by rename, zero copies), and the driver-side
    ``commit`` runs :func:`..operators.txn.append_files_local` (the
    datasource's Python worker has no JVM gateway, so the commit is
    pure pyarrow/duckdb), which links the whole base snapshot forward
    and applies every append contract (CHECK constraints, MoR-
    collision refusal, incremental stats/bloom, insert-only change
    feed, CAS). Tasks write the table's PHYSICAL column names
    (metadata-only renames stay metadata)."""

    def __init__(self, options):
        import uuid

        self.root = options["root"]
        self.keep_snapshots = int(options.get("keep_snapshots", 2))
        self.parts_dir = os.path.join(
            self.root, f".dswrite-{uuid.uuid4().hex[:8]}"
        )
        try:
            ver = _pointer_version(self.root)
            entry = _log_entry(self.root, ver) if ver else None
        except (FileNotFoundError, OSError):
            entry = None
        # logical -> physical rename applied task-side
        self.column_map = dict((entry or {}).get("column_map") or {})

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        writer = None
        rows = 0
        path = os.path.join(
            self.parts_dir, f"part-{uuid.uuid4().hex}.parquet"
        )
        try:
            for batch in iterator:
                if self.column_map:
                    batch = batch.rename_columns(
                        [
                            self.column_map.get(n, n)
                            for n in batch.schema.names
                        ]
                    )
                if writer is None:
                    os.makedirs(self.parts_dir, exist_ok=True)
                    writer = pq.ParquetWriter(path, batch.schema)
                writer.write_table(pa.Table.from_batches([batch]))
                rows += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        if rows == 0:
            return _PartsMessage(None, 0)
        return _PartsMessage(path, rows)

    def commit(self, messages):
        import shutil

        from ..operators.txn import append_files_local

        total = sum(m.rows for m in messages if m is not None)
        if total == 0 or not os.path.isdir(self.parts_dir):
            shutil.rmtree(self.parts_dir, ignore_errors=True)
            return
        try:
            append_files_local(
                self.root,
                self.parts_dir,
                keep_snapshots=self.keep_snapshots,
            )
        finally:
            shutil.rmtree(self.parts_dir, ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.parts_dir, ignore_errors=True)


def register(spark) -> None:
    """Idempotent registration of the ``manifest`` format. Within one
    session a re-register only warns, but a SIBLING session
    (``spark.newSession()``) shares the context-wide registry and
    raises DATA_SOURCE_ALREADY_EXISTS — swallow exactly that."""
    try:
        spark.dataSource.register(ManifestDataSource)
    except Exception as exc:  # pragma: no cover - version-dependent
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
            raise
    # NOTE (r13): the readers deliberately do NOT implement
    # pushFilters — see ManifestReader's docstring for the Spark 4.1
    # shared-read-info collision that makes filter-dependent
    # partitions unsound; predicate pruning rides the `where` OPTION
    # instead, so no filterPushdown conf is needed.

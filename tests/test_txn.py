"""Manifest-pointer commit protocol tests (operators/txn.py::ManifestTable)
— atomicity, optimistic concurrency, crash recovery, legacy migration.

The reference gets multi-writer atomicity for free from Postgres
``ON CONFLICT`` (``src/storage.py:41-53``); ManifestTable is the
engine's plain-filesystem equivalent (snapshot dirs + one atomic
pointer replace), so these tests play the role of the DB's own
transaction guarantees."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datapipeline_scraping_spark.operators.txn import (
    ConcurrentWriteError,
    ManifestTable,
    merge_write,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk long, v string")


def test_commit_read_roundtrip_and_versioning(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    assert not tbl.exists() and tbl.version() is None
    assert tbl.commit(_df(spark, [(1, "a")])) == 1
    assert tbl.commit(_df(spark, [(1, "a"), (2, "b")])) == 2
    assert tbl.version() == 2
    got = {r["pk"]: r["v"] for r in tbl.read(spark).collect()}
    assert got == {1: "a", 2: "b"}


def test_expect_version_conflict_raises_and_cleans_snapshot(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    tbl.commit(_df(spark, [(1, "b")]))  # someone else advanced to v2
    with pytest.raises(ConcurrentWriteError):
        tbl.commit(_df(spark, [(1, "stale")]), expect_version=1)
    # loser's snapshot is not left behind; live data untouched
    assert {r["v"] for r in tbl.read(spark).collect()} == {"b"}
    snaps = [e for e in os.listdir(tbl.root) if e.startswith("snap-")]
    assert all(not s.startswith("snap-staging-") for s in snaps)


def test_init_is_idempotent_bootstrap(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    assert tbl.init(_df(spark, [(1, "seed")])) == 1
    # second init must NOT overwrite the (possibly merged-into) table
    tbl.commit(_df(spark, [(1, "seed"), (2, "new")]))
    assert tbl.init(_df(spark, [(9, "other-seed")])) == 2
    got = {r["pk"] for r in tbl.read(spark).collect()}
    assert got == {1, 2}


def test_no_absent_window_old_snapshot_survives_until_commit(spark, tmp_path):
    """The pointer always resolves: before, during (staging dir is
    invisible), and after a commit — unlike the two-rename swap, there
    is no state where the table path has no committed data."""
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    p1 = tbl.snapshot_path()
    assert p1 and os.path.isdir(p1)
    # a stranded staging dir (crash mid-snapshot-write) never affects reads
    os.makedirs(os.path.join(tbl.root, "snap-staging-deadbeef"))
    assert {r["v"] for r in tbl.read(spark).collect()} == {"a"}
    tbl.commit(_df(spark, [(1, "b")]))
    assert {r["v"] for r in tbl.read(spark).collect()} == {"b"}
    # GC removed the stranded staging dir
    assert not os.path.exists(os.path.join(tbl.root, "snap-staging-deadbeef"))


def test_stale_lock_is_broken(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"), stale_lock_sec=0.0)
    lock = os.path.join(str(tmp_path / "t"), "COMMIT_LOCK")
    os.makedirs(tbl.root)
    with open(lock, "w") as fh:
        fh.write("99999 0\n")  # dead writer's lock
    tbl.commit(_df(spark, [(1, "a")]))  # must break the lock, not hang
    assert tbl.version() == 1 and not os.path.exists(lock)


def test_fresh_lock_times_out(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"), stale_lock_sec=3600.0)
    os.makedirs(tbl.root)
    with open(os.path.join(tbl.root, "COMMIT_LOCK"), "w") as fh:
        fh.write("1 now\n")
    with pytest.raises(TimeoutError):
        tbl._acquire_lock(timeout=0.2)


def test_gc_retention(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    for i in range(5):
        tbl.commit(_df(spark, [(i, "x")]), keep_snapshots=2)
    snaps = [e for e in os.listdir(tbl.root) if e.startswith("snap-")]
    assert len(snaps) == 2  # current + one back
    assert tbl.version() == 5


def test_adopt_plain_migrates_legacy_layout(spark, tmp_path):
    path = str(tmp_path / "t")
    _df(spark, [(1, "legacy"), (2, "rows")]).write.parquet(path)
    tbl = ManifestTable(path)
    assert tbl.adopt_plain() is True
    assert tbl.version() == 1
    got = {r["pk"]: r["v"] for r in tbl.read(spark).collect()}
    assert got == {1: "legacy", 2: "rows"}
    assert tbl.adopt_plain() is False  # idempotent


def test_merge_write_manifest_end_to_end_with_migration(spark, tmp_path):
    """merge_write(writer='manifest') on a legacy plain dir: migrate,
    merge, commit — and a second merge sees the first's result."""
    path = str(tmp_path / "t")
    _df(spark, [(1, "a"), (2, "b"), (3, "gone")]).write.parquet(path)
    merge_write(
        spark,
        path,
        _df(spark, [(2, "B"), (3, "gone"), (4, "D")]),
        "pk",
        matched_delete=F.col("s.v") == "gone",
        writer="manifest",
    )
    tbl = ManifestTable(path)
    got = {r["pk"]: r["v"] for r in tbl.read(spark).collect()}
    assert got == {1: "a", 2: "B", 4: "D"}
    merge_write(spark, path, _df(spark, [(5, "E")]), "pk", writer="manifest")
    got = {r["pk"]: r["v"] for r in tbl.read(spark).collect()}
    assert got == {1: "a", 2: "B", 4: "D", 5: "E"}
    assert tbl.version() == 3  # adopt(1) + two merges


def test_merge_write_parquet_upgrades_on_manifest_target(spark, tmp_path):
    """A manifest-backed target stays manifest-backed even if a caller
    passes writer='parquet' — no silent downgrade to the racy swap."""
    path = str(tmp_path / "t")
    tbl = ManifestTable(path)
    tbl.commit(_df(spark, [(1, "a")]))
    merge_write(spark, path, _df(spark, [(2, "b")]), "pk", writer="parquet")
    assert tbl.version() == 2
    got = {r["pk"]: r["v"] for r in tbl.read(spark).collect()}
    assert got == {1: "a", 2: "b"}


def test_concurrent_unconditional_commits_serialize(spark, tmp_path):
    """N threads committing unconditionally: every commit lands (N
    distinct versions), the final pointer is a complete snapshot, and
    no staging debris survives — the pointer CAS serializes writers."""
    import threading

    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(0, "seed")]))
    errs: list[Exception] = []

    def writer(i: int) -> None:
        try:
            tbl.commit(_df(spark, [(i, f"w{i}")]), keep_snapshots=10)
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert tbl.version() == 5  # seed + 4 writers, all serialized
    assert tbl.read(spark).count() == 1  # last writer's snapshot, intact

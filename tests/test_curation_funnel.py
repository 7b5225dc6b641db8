"""Curation-funnel execution-mode tests (curation.py::run_funnel) —
VERDICT r6 item 5: the funnel must be green both in-memory and
manifest-checkpointed, and a mid-funnel crash must resume from the
last committed stage instead of recomputing it."""

from __future__ import annotations

import os

import pytest

from datapipeline_scraping_spark.curation import run_funnel
from datapipeline_scraping_spark.operators.txn import ManifestTable

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["stage"], r["stage_idx"], r["docs_out"], r["chars_out"])
        for r in df.collect()
    )


def test_in_memory_and_checkpointed_modes_agree(spark, tmp_path):
    mem = _rows(run_funnel(spark, SF))
    dur = _rows(run_funnel(spark, SF, checkpoint_root=str(tmp_path / "ck")))
    assert mem == dur
    assert len(mem) == 5
    # durable mode committed both reused stage boundaries (r8: the
    # first boundary is the dedup set s2 — the quality stage's funnel
    # row rides s2's commit job as an Observation)
    for stage in ("s2", "s3"):
        tbl = ManifestTable(str(tmp_path / "ck" / stage))
        assert tbl.exists() and tbl.version() == 1
        # commit is annotated with its stages' metrics (resume source)
        assert "stages" in tbl.commit_meta(1)


def test_in_memory_mode_leaves_no_cached_frames(spark):
    """The in-memory mode must unpersist its stage sets itself — no
    reliance on the driver's clearCache between queries."""
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    # delta-based: an earlier test in the same session may legitimately
    # hold RDD-level persists (e.g. a localCheckpoint) that
    # clearCache() does not drop — the funnel must just not ADD any
    before = jsc.getPersistentRDDs().size()
    df = run_funnel(spark, SF)
    assert df.count() == 5
    assert jsc.getPersistentRDDs().size() <= before


def test_crash_resumes_from_last_committed_stage(spark, tmp_path):
    root = str(tmp_path / "ck")
    # crash after s2 committed, before s3
    with pytest.raises(RuntimeError, match="injected crash"):
        run_funnel(spark, SF, checkpoint_root=root, _fail_before="s3")
    s2 = ManifestTable(os.path.join(root, "s2"))
    s3 = ManifestTable(os.path.join(root, "s3"))
    assert s2.exists() and s2.version() == 1
    assert not s3.exists()

    # resume: s2 must NOT be recommitted (version stays 1 — the
    # completed stage is reused, not recomputed), s3 completes, and
    # the funnel matches the clean run — including the s1 quality row,
    # which the resumed run recovers from s2's commit annotation (no
    # recompute of the quality pipeline)
    got = _rows(run_funnel(spark, SF, checkpoint_root=root))
    assert s2.version() == 1
    assert s3.exists() and s3.version() == 1
    assert got == _rows(run_funnel(spark, SF))


def test_crash_before_first_stage_leaves_clean_root(spark, tmp_path):
    root = str(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="injected crash"):
        run_funnel(spark, SF, checkpoint_root=root, _fail_before="s2")
    assert not ManifestTable(os.path.join(root, "s2")).exists()
    # full resume from nothing still works
    assert len(_rows(run_funnel(spark, SF, checkpoint_root=root))) == 5

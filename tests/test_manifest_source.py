"""The registered ``manifest`` data source
(sources/manifest_datasource.py): the transaction layer readable from
pure SQL with time travel, with the full merge-on-read visibility
composition implemented per-task in Arrow. Every test pins PARITY
against :meth:`ManifestTable.read` — same rows, same logical schema,
through the SQL surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipeline_scraping_spark.operators.txn import ManifestTable
from datapipeline_scraping_spark.sources.manifest_datasource import register


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk long, v string")


def _src(spark, root, **opts):
    register(spark)
    r = spark.read.format("manifest").option("root", root)
    for k, x in opts.items():
        r = r.option(k, x)
    return r.load()


def _parity(spark, tbl, **opts):
    via_src = _src(spark, tbl.root, **opts)
    ver = int(opts["version"]) if "version" in opts else None
    via_api = tbl.read(spark, version=ver)
    assert via_src.columns == via_api.columns
    assert sorted(map(tuple, via_src.collect())) == sorted(
        map(tuple, via_api.collect())
    )
    return via_src


def test_head_and_version_reads_match_api(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"), retention_sec=3600)
    tbl.commit(_df(spark, [(i, f"v{i}") for i in range(10)]))
    tbl.commit(_df(spark, [(i, f"w{i}") for i in range(12)]))
    _parity(spark, tbl)
    _parity(spark, tbl, version=1)
    _parity(spark, tbl, version=2)


def test_mor_composition_through_sql(spark, tmp_path):
    """DELETE + UPDATE + RENAME sidecars all apply in the per-task
    Arrow read, exercised through a pure-SQL temp view."""
    tbl = ManifestTable(str(tmp_path / "t"), retention_sec=3600)
    tbl.commit(_df(spark, [(i, f"v{i}") for i in range(20)]))
    tbl.delete_where(spark, "pk % 5 = 0", ["pk"])
    tbl.update_where(spark, "pk < 4", {"v": "upper(v)"}, ["pk"])
    tbl.rename_column("v", "label")
    got = _parity(spark, tbl)
    rows = {r["pk"]: r["label"] for r in got.collect()}
    assert 0 not in rows and rows[1] == "V1" and rows[7] == "v7"
    register(spark)
    spark.sql(
        f"""CREATE OR REPLACE TEMPORARY VIEW mor_ledger
            USING manifest OPTIONS (root '{tbl.root}')"""
    )
    n = spark.sql(
        "SELECT count(*) AS n FROM mor_ledger WHERE label LIKE 'V%'"
    ).collect()[0]["n"]
    assert n == 3  # pk 1,2,3 upper-cased; pk 0 was already deleted
    # time travel through the SQL surface too
    spark.sql(
        f"""CREATE OR REPLACE TEMPORARY VIEW mor_v1
            USING manifest OPTIONS (root '{tbl.root}', version '1')"""
    )
    assert spark.table("mor_v1").count() == 20


def test_partitioned_snapshot_reconstructs_partition_columns(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    df = _df(spark, [(i, f"v{i}") for i in range(12)]).withColumn(
        "b", (F.col("pk") % 3).cast("long")
    )
    tbl.commit(df, partition_by=["b"])
    got = _parity(spark, tbl)
    assert {(r["pk"], r["b"]) for r in got.collect()} == {
        (i, i % 3) for i in range(12)
    }


def test_asof_and_error_contracts(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"), retention_sec=3600)
    tbl.commit(_df(spark, [(1, "a")]))
    ts1 = tbl._log_entry(1)["ts"]
    tbl.commit(_df(spark, [(1, "a"), (2, "b")]))
    assert _src(spark, tbl.root, asof=str(ts1)).count() == 1
    with pytest.raises(Exception, match="no commit at or before"):
        _src(spark, tbl.root, asof="1.0").count()
    with pytest.raises(Exception, match="no commit log entry"):
        _src(spark, tbl.root, version="99").count()
    with pytest.raises(Exception, match="mutually exclusive"):
        _src(spark, tbl.root, version="1", asof=str(ts1)).count()


def test_schema_evolution_nullfills_old_version(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"), retention_sec=3600)
    tbl.commit(_df(spark, [(1, "a")]))
    tbl.commit(
        _df(spark, [(1, "a"), (2, "b")]).withColumn("extra", F.lit(7))
    )
    head = _src(spark, tbl.root)
    assert head.columns == ["pk", "v", "extra"]
    # old version through the source keeps ITS OWN schema (like read())
    old = _src(spark, tbl.root, version="1")
    assert old.columns == ["pk", "v"]

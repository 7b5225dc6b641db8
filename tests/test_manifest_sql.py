"""SQL UPDATE / DELETE / MERGE INTO routing onto the manifest ledger
(sources/manifest_sql.py) — statement surface, writer semantics,
and the guard contracts (CHECK constraints, MoR key rules) that must
hold on the SQL path exactly as on the DataFrame path.

Reference anchor: the reference's sink is literally SQL DML through
psycopg2 (``src/storage.py:41-53``); these tests pin that statement
surface on the snapshot ledger."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipeline_scraping_spark.operators.txn import (
    ConstraintViolationError,
    ManifestTable,
)
from datapipeline_scraping_spark.sources.manifest_sql import (
    register_table,
    sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk long, v string, n long")


@pytest.fixture
def tbl(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "sqldml"))
    t.commit(_df(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]))
    register_table(spark, "sqldml", t.root, key_cols=["pk"])
    return t


def _state(spark):
    return {
        r["pk"]: (r["v"], r["n"])
        for r in spark.sql("SELECT * FROM sqldml").collect()
    }


def test_sql_update_routes_merge_on_read(spark, tbl):
    ver = sql(spark, "UPDATE sqldml SET n = n + 100, v = upper(v) WHERE pk <= 2")
    assert ver == 2
    assert _state(spark) == {1: ("A", 110), 2: ("B", 120), 3: ("c", 30)}
    # merge-on-read: the statement wrote a sidecar, not a table rewrite
    assert (tbl._log_entry(2) or {}).get("mor_delta")


def test_sql_delete_routes_deletion_vector(spark, tbl):
    sql(spark, "DELETE FROM sqldml WHERE n >= 30")
    assert _state(spark) == {1: ("a", 10), 2: ("b", 20)}
    assert (tbl._log_entry(2) or {}).get("dv")
    # no WHERE deletes everything (ANSI), still merge-on-read
    sql(spark, "DELETE FROM sqldml")
    assert _state(spark) == {}


def test_sql_merge_upsert_and_clauses(spark, tbl):
    _df(spark, [(2, "B2", 200), (9, "new", 900)]).createOrReplaceTempView(
        "src_batch"
    )
    ver = sql(
        spark,
        """MERGE INTO sqldml AS t USING src_batch AS s ON t.pk = s.pk
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
    )
    assert ver == 2
    assert _state(spark) == {
        1: ("a", 10), 2: ("B2", 200), 3: ("c", 30), 9: ("new", 900),
    }
    # conditional delete clause; no INSERT clause -> source-only ignored
    _df(spark, [(1, "x", 0), (7, "ghost", 7)]).createOrReplaceTempView(
        "src_del"
    )
    sql(
        spark,
        """MERGE INTO sqldml AS t USING src_del AS s ON t.pk = s.pk
           WHEN MATCHED AND s.n = 0 THEN DELETE""",
    )
    got = _state(spark)
    assert 1 not in got and 7 not in got and got[2] == ("B2", 200)


def test_sql_checks_and_key_rules_enforced(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "guarded"))
    t.commit(
        _df(spark, [(1, "a", 10)]), check={"n_pos": "n >= 0"}
    )
    register_table(spark, "guarded", t.root, key_cols=["pk"])
    with pytest.raises(ConstraintViolationError):
        sql(spark, "UPDATE guarded SET n = -5 WHERE pk = 1")
    assert t.version() == 1  # aborted commit left no version
    # key-column update is a delete+insert — rejected as on the
    # DataFrame path
    with pytest.raises(ValueError, match="key"):
        sql(spark, "UPDATE guarded SET pk = 99 WHERE pk = 1")
    # undeclared key_cols raise loudly instead of guessing
    t2 = ManifestTable(str(tmp_path / "nokeys"))
    t2.commit(_df(spark, [(1, "a", 1)]))
    register_table(spark, "nokeys", t2.root)
    with pytest.raises(ValueError, match="key columns"):
        sql(spark, "DELETE FROM nokeys WHERE pk = 1")


def test_sql_passthrough_and_unknown_tables(spark, tbl):
    # SELECT falls through to spark.sql and sees DML effects
    sql(spark, "UPDATE sqldml SET n = 0 WHERE pk = 1")
    df = sql(spark, "SELECT sum(n) AS s FROM sqldml")
    assert df.first()["s"] == 50
    # UPDATE on an unregistered name falls through to Spark's parser,
    # which rejects it (no silent mis-routing)
    spark.range(3).createOrReplaceTempView("plain_view")
    with pytest.raises(Exception):
        sql(spark, "UPDATE plain_view SET id = 1")


def test_sql_unsupported_shapes_raise(spark, tbl):
    _df(spark, [(1, "z", 1)]).createOrReplaceTempView("src_bad")
    with pytest.raises(ValueError, match="single key equality"):
        sql(
            spark,
            """MERGE INTO sqldml AS t USING src_bad AS s
               ON t.pk = s.pk AND t.v = s.v
               WHEN MATCHED THEN UPDATE SET *""",
        )
    with pytest.raises(ValueError, match="MERGE clauses|INSERT \\*"):
        sql(
            spark,
            """MERGE INTO sqldml AS t USING src_bad AS s ON t.pk = s.pk
               WHEN NOT MATCHED THEN INSERT (pk) VALUES (s.pk)""",
        )
    with pytest.raises(ValueError, match="SET assignment"):
        sql(spark, "UPDATE sqldml SET = 5")

"""Differential gate: every registry query vs its DuckDB oracle at
sf0.001 — the local twin of the driver's CORRECTNESS check (row count +
sorted-column schema + order-insensitive values), but STRICTER: values
are compared exactly (the engine's determinism rules promise
bit-identical doubles)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from datapipeline_scraping_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # exact compare, but collapse -0.0/0.0 and NaN identity
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, oracle_con, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMOKE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = oracle_con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    norm_s = _normalize(spark_rows, spark_cols)
    norm_d = _normalize(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(norm_s, norm_d) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMOKE)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "l_linestatus", "n_rows"} <= set(df.columns)


def test_contract_shape():
    qs = entry_mod.queries()
    os = entry_mod.oracle_sql()
    assert set(os) <= set(qs)
    assert len(qs) >= 30

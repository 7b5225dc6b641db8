"""Differential gate: every registry query vs its DuckDB oracle at
sf0.001 — the local twin of the driver's CORRECTNESS check (row count +
sorted-column schema + order-insensitive values), but STRICTER: values
are compared exactly (the engine's determinism rules promise
bit-identical doubles).

The TXN/ledger family additionally runs at sf0.01 — the DRIVER'S scale
(VERDICT r10 item 8): with 188 registry queries and a 50-slot driver
window the full-registry revisit period is ~4 rounds, so the in-repo
gate is the txn family's effective safety net between driver visits,
and sf0.001 alone under-exercises the multi-file/multi-version layouts
(pruning, bloom sidecars, append/bin-pack file counts) those queries
assert on. Measured cost of the sf0.01 pass (local[32], warm scratch):
69 s for all 26 queries on top of the ~25 min full suite — the
build-phase scratch tables are memoized per sf_dir and shared with
``scripts/driver_sim`` runs, so repeated local runs stay warm."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from datapipeline_scraping_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

#: full-registry differential = the dominant cost of the suite
#: (~25-40 min); the smoke tier (`pytest -m "not slow"`) skips it,
#: the full run stays the pre-evidence gate (r15 — VERDICT r14
#: item 5)
pytestmark = pytest.mark.slow

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

# the versioned-ledger family re-verified at the driver's sf0.01 scale
# (VERDICT r10 item 8) — multi-file layouts, sidecars, and version
# chains behave differently with real file counts
SF_MID = "/root/testdata/sf0.01"
TXN_FAMILY_MID_SF = [
    "q138_time_travel_ledger",
    "q139_partitioned_manifest_sink",
    "q147_version_changes",
    "q151_cdf_incremental_index",
    "q152_file_skipping_scan",
    "q153_exactly_once_stream_sink",
    "q154_zorder_clustering",
    "q155_restore_rollback",
    "q156_check_constraints",
    "q167_deletion_vectors",
    "q168_cdf_stream_view",
    "q169_column_mapping_rename",
    "q170_mor_update",
    "q171_sql_manifest_read",
    "q176_zero_copy_clone",
    "q178_drop_column",
    "q179_add_column_backfill",
    "q180_bloom_point_lookup",
    "q181_append_only_ingest",
    "q182_small_file_compaction",
    "q183_sql_insert_ledger",
    "q184_partitioned_pruned_scan",
    "q185_write_audit_publish",
    "q186_clustered_ledger_join",
    "q187_sql_dml_ledger",
    "q188_partitioned_epoch_sink",
    "q189_clustered_incremental_ingest",
    "q190_clustered_mor_dml",
    "q191_group_incremental_pair",
    "q192_partition_evolution",
]


@pytest.fixture(scope="module")
def oracle_con_mid():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_MID}/{t}.parquet'"
        )
    yield con
    con.close()


def _compare_with_oracle(spark, con, name, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = con.execute(spec.oracle)
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


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, oracle_con, name):
    _compare_with_oracle(spark, oracle_con, name, SF_SMOKE)


@pytest.mark.parametrize("name", TXN_FAMILY_MID_SF)
def test_txn_family_matches_oracle_at_driver_scale(
    spark, oracle_con_mid, name
):
    _compare_with_oracle(spark, oracle_con_mid, name, SF_MID)


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

"""Materialized partsupp fixture (VERDICT r8 item 2).

The fixtures ship no partsupp table; catalog.materialize_partsupp
derives it deterministically from part × supplier and writes a real
parquet table that Q11/Q16/Q20 scan like any other fixture. These tests
pin (a) the file's contents against an INDEPENDENT DuckDB
re-derivation over the same source parquet — the "hash-exact vs DuckDB
over the same file" contract, (b) idempotent materialization, and
(c) that the TPC-H consumers genuinely scan the file (a parquet
FileScan with a pruned ReadSchema, not the old part×supplier cross
join)."""

from __future__ import annotations

import os

import duckdb
import pytest

from airflow_loan_etl_pipeline_spark.catalog import (
    load_partsupp,
    materialize_partsupp,
)

SF_DIR = "/root/testdata/sf0.001"

# The definitional derivation, expressed in DuckDB over the SOURCE
# fixture parquet (independent of both catalog._partsupp_frame and the
# registry_sql oracle CTE — three expressions of one definition).
_DERIVE = """
SELECT p_partkey AS ps_partkey,
       CAST((p_partkey + q.i * 13) % ns.n AS BIGINT) AS ps_suppkey,
       CAST((p_partkey * 7 + q.i * 11) % 9999 + 1 AS INT) AS ps_availqty,
       CAST((p_partkey * 31 + q.i * 17) % 99900 + 100 AS BIGINT)
           AS ps_cost_cents
FROM read_parquet('{sf}/part.parquet') part
CROSS JOIN (SELECT count(*) AS n
            FROM read_parquet('{sf}/supplier.parquet')) ns
CROSS JOIN (VALUES (0), (1), (2), (3)) AS q(i)
ORDER BY ps_partkey, ps_suppkey, ps_availqty
"""


def test_materialized_file_matches_duckdb_rederivation(spark):
    path = materialize_partsupp(spark, SF_DIR)
    assert os.path.isdir(path)
    con = duckdb.connect()
    got = con.sql(
        f"SELECT * FROM read_parquet('{path}/*.parquet') "
        "ORDER BY ps_partkey, ps_suppkey, ps_availqty"
    ).fetchall()
    expected = con.sql(_DERIVE.format(sf=SF_DIR)).fetchall()
    assert got == expected
    assert len(got) > 0


def test_materialization_is_idempotent(spark):
    path = materialize_partsupp(spark, SF_DIR)
    files = sorted(os.listdir(path))
    mtime = os.path.getmtime(path)
    again = materialize_partsupp(spark, SF_DIR)
    assert again == path
    assert sorted(os.listdir(path)) == files
    assert os.path.getmtime(path) == mtime


def test_load_partsupp_schema(spark):
    df = load_partsupp(spark, SF_DIR)
    assert dict(df.dtypes) == {
        "ps_partkey": "bigint",
        "ps_suppkey": "bigint",
        "ps_availqty": "int",
        "ps_cost_cents": "bigint",
    }


@pytest.mark.parametrize(
    "name, pruned_away",
    [
        # Q11 aggregates cost*qty per key pair — reads all four columns;
        # Q16 needs only the two keys; Q20 needs everything but cost.
        ("q11_important_stock", []),
        ("q16_supplier_part_counts", ["ps_availqty", "ps_cost_cents"]),
        ("q20_promotable_suppliers", ["ps_cost_cents"]),
    ],
)
def test_tpch_consumers_scan_the_fixture(spark, name, pruned_away):
    """Each consumer's physical plan scans the materialized parquet
    (FileScan over the fixture path) and prunes the columns it does not
    use out of ReadSchema — the pushdown surface the inline CTE never
    had."""
    from airflow_loan_etl_pipeline_spark import registry
    from airflow_loan_etl_pipeline_spark import registry_sql  # noqa: F401

    df = registry.QUERIES[name](spark, SF_DIR)
    # The scan is real: the materialized fixture's files feed the plan.
    # (inputFiles, not the plan string — FileScan Location strings
    # truncate once the cache-fingerprinted path gets long.)
    assert any("partsupp.parquet" in f for f in df.inputFiles())
    # Column pruning: an unused partsupp column appears NOWHERE in the
    # executed plan — not in the scan's column list, not in ReadSchema.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ps_partkey" in plan, plan
    for col in pruned_away:
        assert col not in plan, (col, plan)

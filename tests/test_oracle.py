"""Oracle-differential tests: every declared query vs its DuckDB oracle
at sf0.001 (fast), mirroring the driver's sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from github_event_etl_spark.plans.catalog import all_specs

from .oracle_harness import compare_query, duckdb_connection

SPECS = all_specs()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = SPECS[name]
    result = compare_query(spark, duck, name, spec.fn, spec.oracle, sf_dir)
    assert result.ok, f"{name}: {result.detail}"
    if spec.oracle is None:
        # rows-only queries must still run and return a stable schema
        df = spec.fn(spark, sf_dir)
        assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"user_id", "score"} <= set(df.columns)


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())

"""Every SQL-expressible query in the registry hash-matches its DuckDB oracle
(the driver's t2 gate, run here at sf0.001 for speed; set
CANDYSPARK_TEST_SF_DIR=/root/testdata/sf0.01 to mirror the driver exactly)."""

from __future__ import annotations

import os

import pytest

from candyspark.plans import collect_registry

from tests.oracle import compare_frames, duckdb_connection

SF_DIR = os.environ.get("CANDYSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = collect_registry()
SQL_QUERIES = sorted(n for n, s in REGISTRY.items() if s.sql is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.sql is None)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(spark, oracle, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF_DIR).toPandas()
    oracle_pdf = oracle.execute(spec.sql).df()
    compare_frames(spark_pdf, oracle_pdf, name)
    # Non-vacuous gate (round-2 verdict item 2): a hash-match on an EMPTY
    # result certifies nothing about the query's logic. Every hashed query
    # must produce at least one row at every test SF.
    assert len(spark_pdf) >= 1, f"{name}: vacuous oracle gate (0 rows at {SF_DIR})"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())

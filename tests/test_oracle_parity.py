"""Mirror of the driver's DuckDB-oracle correctness gate, run at the
smoke scale factor (override with SSE_TEST_SF_DIR=/root/testdata/sf0.01
for the full-fidelity pre-flight)."""

from __future__ import annotations

import pytest

from spotify_serverless_etl_pipeline_engineering_with_azure_spark import registry

from .oracle_mirror import compare, duckdb_conn, run_query_pair

ALL = registry.load_all()
ORACLE_CHECKED = sorted(n for n, q in ALL.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in ALL.items() if not q.oracle)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, con, sf_dir, name):
    q = ALL[name]
    spark_pdf, oracle_pdf = run_query_pair(spark, con, q.fn, q.oracle, sf_dir)
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = ALL[name].fn(spark, sf_dir)
    # > 0, not >= 0 (which no materializing DataFrame can fail): an
    # inverted filter regressing a rows-only query to always-empty must
    # trip the smoke check — every rows-only query is non-empty at
    # every shipped SF by construction.
    assert df.count() > 0
    assert len(df.schema) > 0

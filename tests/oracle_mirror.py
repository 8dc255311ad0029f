"""Local mirror of the driver's correctness gate: run each registered
query in Spark AND its oracle SQL in DuckDB, then compare row count,
column names, and exact values order-insensitively.

Used by tests/test_oracle_parity.py and scripts/check_parity.py; being
stricter than the driver (exact value equality after canonicalization)
means a pass here implies a pass on any reasonable value-hash.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

from spotify_serverless_etl_pipeline_engineering_with_azure_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact repr: any bit difference between engines must surface
        return repr(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, (int,)):
        return str(int(v))
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"schema: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        # Multiset differences (Counter preserves duplicate rows a set
        # diff would hide): a positional zip over lists of unequal
        # length truncates and misaligns, pointing triage at row pairs
        # that are not real mismatches.
        from collections import Counter

        sc, oc = Counter(s_rows), Counter(o_rows)
        only_s, only_o = sc - oc, oc - sc
        problems.append(
            f"values: {sum(only_s.values())} spark-only, "
            f"{sum(only_o.values())} oracle-only; first diffs "
            f"spark={sorted(only_s)[:2]} oracle={sorted(only_o)[:2]}"
        )
    return problems


def run_query_pair(spark, con, fn, oracle: str, sf_dir: str):
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = con.execute(oracle).fetchdf()
    return spark_pdf, oracle_pdf

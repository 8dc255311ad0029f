#!/usr/bin/env python
"""Driver-contract pre-flight: run every registered query in a fresh
driver-style SparkSession (plain builder, like the external driver's)
and hash-compare each oracle-backed one against DuckDB.

Usage:
    python scripts/check_parity.py [sf_dir]          # default sf0.01
    python scripts/check_parity.py /root/testdata/sf0.001   # quick pass

Exit code 0 = every query matches; 1 = at least one mismatch/error
(each printed)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from tests.oracle_mirror import compare, duckdb_conn

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb_conn(sf_dir)
    fails: list[tuple[str, object]] = []
    t0 = time.time()
    for name, fn in qs.items():
        try:
            pdf = fn(spark, sf_dir).toPandas()
            if name in osql:
                problems = compare(pdf, con.execute(osql[name]).fetchdf())
                if problems:
                    fails.append((name, problems))
                    print(f"FAIL {name}: {problems}")
                    continue
            print(f"ok   {name} ({len(pdf)} rows)")
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append((name, str(ex)[:300]))
            print(f"ERR  {name}: {str(ex)[:300]}")
    print(
        f"\n{len(qs)} queries, {len(fails)} failures, {time.time() - t0:.0f}s at {sf_dir}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Driver-contract robustness: the entry module must work when loaded
from an arbitrary working directory (the external driver controls its
own CWD), including queries that ship package code to executor Python
workers — the failure mode sys.path tricks hide until a worker tries
the import.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
qs = e.queries()
# one query per worker-import class: DataSource, mapInPandas, pandas_udf
assert len(qs["rest_datasource_playlist"](spark, {sf!r}).collect()) > 0
assert len(qs["multimodal_decode_features"](spark, {sf!r}).collect()) > 0
assert len(qs["udf_pandas_scalar"](spark, {sf!r}).collect()) > 0
print("CWD_CONTRACT_OK")
"""


def test_queries_run_from_foreign_cwd():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO, sf="/root/testdata/sf0.001")],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "PYTHONDONTWRITEBYTECODE": "1"},
    )
    assert "CWD_CONTRACT_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )


def test_timestamp_queries_survive_non_utc_session():
    """The driver may run with any session timezone; catalog.table pins
    UTC per call, so timestamp-output queries must match the UTC oracle
    even when the session starts in America/New_York (a regression here
    shifts every window/session boundary by the offset)."""
    script = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
from tests.oracle_mirror import duckdb_conn, compare
qs, osql = e.queries(), e.oracle_sql()
con = duckdb_conn("/root/testdata/sf0.001")
for name in ("events_tumbling_window", "ref_c1_timestamp_cast",
             "events_sessionization", "streaming_tumbling_window",
             "events_cohort_retention", "events_attribution_last_touch",
             "events_point_in_time_enrich", "events_anomaly_zscore"):
    p = compare(qs[name](spark, "/root/testdata/sf0.001").toPandas(),
                con.execute(osql[name]).fetchdf())
    assert not p, f"{{name}}: {{p}}"
print("TZ_CONTRACT_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "PYTHONDONTWRITEBYTECODE": "1", "TZ": "America/New_York"},
    )
    assert "TZ_CONTRACT_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )

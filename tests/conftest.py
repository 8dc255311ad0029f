from __future__ import annotations

import os
import sys
import time

import pytest

# Pin the HOST timezone, not just the Spark session's: PySpark's
# TimestampType.fromInternal renders collected timestamps via
# datetime.fromtimestamp() (host TZ), so golden tests that compare
# collect()-ed instants against Python-built naive-UTC datetimes would
# fail on any non-UTC machine. The non-UTC-SESSION contract probe
# (test_driver_contract) is unaffected — it varies the Spark session
# conf, which this does not touch.
os.environ["TZ"] = "UTC"
time.tzset()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_serverless_etl_pipeline_engineering_with_azure_spark import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sse_tests", shuffle_partitions=8, driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SSE_TEST_SF_DIR", SF_SMOKE)

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the package registry
(spotify_serverless_etl_pipeline_engineering_with_azure_spark.registry);
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spotify_serverless_etl_pipeline_engineering_with_azure_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: top customers by revenue
    (scan → filter → broadcast+shuffle joins → hash agg → top-k)."""
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.analytics import (
        top_customers_by_revenue,
    )

    return top_customers_by_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return registry.oracle_sql()

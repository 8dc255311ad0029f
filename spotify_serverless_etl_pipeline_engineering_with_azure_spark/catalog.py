"""Table catalog over the driver-provided parquet test tables.

See /root/repo/TESTDATA.md. At cluster scale these would be external
tables (partitioned parquet / Delta on object storage); the loader keeps
all IO columnar and lets Catalyst push filters/projections into the
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor (bounded
# cardinality): always broadcast these in joins. Larger dims are left to
# AQE / autoBroadcastJoinThreshold.
ALWAYS_BROADCAST = {"region", "nation"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Timestamp semantics are defined in UTC (TESTDATA timestamps are
    # instants; the DuckDB oracle renders them naive/UTC). Pin the
    # session so results don't depend on the caller's local timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def scatter(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's core count.

    Small parquet inputs arrive as one split (files below
    spark.sql.files.maxPartitionBytes), which serializes any CPU-heavy
    map work (per-token md5, shingle expansion) onto one core. A cheap
    round-robin shuffle of the compact source rows buys full-width
    parallelism for the expensive downstream transform. At 100 TB inputs
    already span many splits and this becomes a no-op-sized rebalance;
    it never changes results (all consumers re-aggregate by key).
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    outright — read it as a long (legacy conf) and convert to a
    microsecond timestamp. Integer `div` (not double /) — ns epoch
    values exceed 2^53. The test data carries no sub-microsecond
    component, so this is lossless and matches DuckDB's CAST."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all test tables as temp views (for spark.sql queries)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)

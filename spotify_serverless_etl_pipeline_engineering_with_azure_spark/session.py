"""SparkSession factory.

Local test posture: ``local[$SPARK_GRAFT_CPUS]`` single JVM, shuffle
partitions = cores (every test shuffle fits). Cluster posture: AQE,
skew-join handling, Arrow, and the UTC pins carry over unchanged — but
shuffle-partition SIZING does not: partition count must track shuffle
BYTES (~128–200 MB per reduce partition → ~10⁵–10⁶ partitions for a
100 TB shuffle), never core count, and AQE's coalescePartitions only
merges DOWN from the configured initial count — it never splits an
oversized partition up. A cluster deployment therefore sets
SPARK_GRAFT_SHUFFLE_INITIAL (→ adaptive.coalescePartitions.
initialPartitionNum) high for the largest expected shuffle and lets
AQE coalesce small stages, with SPARK_GRAFT_SHUFFLE_PARTITIONS as the
non-AQE floor.

Checkpoint hygiene: a cluster deployment that calls
``sc.setCheckpointDir`` (which switches the iterative loops' round
boundaries to reliable checkpoints — plans/dedup._round_checkpoint)
must also set ``spark.cleaner.referenceTracking.cleanCheckpoints=true``
so Spark reclaims superseded per-round ``rdd-*`` dirs; it is off by
default, and without it CC/PageRank accumulate O(rounds) vertex-sized
dirs on shared storage per invocation. Local mode (no checkpoint dir)
writes none.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def session_confs(
    *,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    env: dict[str, str] | None = None,
) -> tuple[str, dict[str, str]]:
    """O3 (config from env, spotifyextract.py:15-20 os.environ reads):
    resolve (master, confs) from the environment. Pure — the
    driver-contract test asserts the mapping without booting a JVM.

    SPARK_GRAFT_CPUS sizes both local parallelism and shuffle
    partitions; SPARK_GRAFT_MASTER overrides the master URL (cluster
    posture); SPARK_GRAFT_DRIVER_MEM sizes the driver heap.
    """
    e = os.environ if env is None else env
    cpus = e.get("SPARK_GRAFT_CPUS", "32")
    master = e.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    confs = {
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or e.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        ),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # 32g: local[32] runs driver AND all 32 executor threads in one
        # JVM; at 12g the bench suite's steady-state allocation rate
        # (Tungsten pages, broadcast builds, checkpointed index RDDs)
        # GC-throttled long sessions ~10% (measured 14.8s -> 13.4s for
        # the headline suite). The container has 128 GiB; heap is
        # committed lazily.
        "spark.driver.memory": driver_memory or e.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        "spark.ui.enabled": "false",
        "spark.sql.parquet.filterPushdown": "true",
        # Naive parquet timestamps (isAdjustedToUTC=false) are instants
        # in this data model — read them as TIMESTAMP_LTZ, not NTZ, so
        # unix_micros/window/watermark apply uniformly. catalog.table()
        # re-pins this per call for driver-constructed sessions.
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    }
    # Cluster shuffle sizing (see module docstring): AQE can only
    # coalesce DOWN from the initial partition count, so a 100 TB
    # shuffle needs the ceiling raised explicitly — cores-sized
    # partitions would be ~3 TB each and no runtime re-plan can fix it.
    init = e.get("SPARK_GRAFT_SHUFFLE_INITIAL")
    if init:
        confs["spark.sql.adaptive.coalescePartitions.initialPartitionNum"] = init
    # Generic conf passthrough ("k=v;k2=v2"): lets a deployment (or a
    # measured config A/B, guide §1) override/extend session confs
    # without code edits. Applied LAST so explicit entries win over the
    # local defaults above; the driver's bench stays comparable because
    # the variable is unset there. Format limitation: values containing
    # ';' cannot be expressed (the split is unconditional). A segment
    # WITHOUT '=' is a config error — silently setting that conf to ""
    # would fail session boot with a confusing Spark error far from the
    # cause (r10 ADVICE), so raise here with the offending segment.
    extra = e.get("SPARK_GRAFT_EXTRA_CONFS")
    if extra:
        for kv in extra.split(";"):
            kv = kv.strip()
            if not kv:
                continue
            k, sep, v = kv.partition("=")
            if not sep or not k.strip():
                raise ValueError(
                    f"SPARK_GRAFT_EXTRA_CONFS segment {kv!r} is not 'key=value'"
                )
            confs[k.strip()] = v.strip()
    return master, confs


def get_spark(
    app_name: str = "sse_spark",
    *,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    master, confs = session_confs(
        shuffle_partitions=shuffle_partitions, driver_memory=driver_memory
    )
    builder = SparkSession.builder.master(master).appName(app_name)
    for k, v in {**confs, **(extra or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

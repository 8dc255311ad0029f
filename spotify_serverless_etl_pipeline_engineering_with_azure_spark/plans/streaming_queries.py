"""Registry entries that execute REAL Structured Streaming queries
(availableNow over the bounded test tables → memory sink) and return
the drained result. With a single micro-batch no rows are late, so the
streaming results equal their batch shadows and stay oracle-checkable.

PER-INVOCATION FIXED COST, measured so future rounds stop re-litigating
it (r11, streaming_tumbling_window at sf0.1, warm session, 3 reps via
StreamingQueryProgress.durationMs): of a ~1.2-1.5 s wall, the actual
windowed aggregation (batch 0 addBatch) is ~0.4 s. The rest is
micro-batch machinery that scales with TRIGGER COUNT, not data volume:
~0.1 s plan build, ~0.1 s query start (temp checkpoint dir + WAL init +
source listing), batch 0 overhead ~0.23 s (queryPlanning ~120 ms,
walCommit ~35 ms, commitOffsets ~35 ms, latestOffset ~35 ms), a no-data
FINALIZATION trigger ~0.3 s (update-mode watermark eviction re-plans
and commits: addBatch ~200 ms + planning/WAL ~100 ms), and ~0.12 s
memory-sink read-back. None of it is removable without not running a
real streaming query (sink-gaming); on a 24/7 production stream these
costs amortize to one trigger's overhead per interval, and the
per-batch numbers above are the honest per-trigger floor.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..streaming.pipeline import (
    events_stream,
    narrow_state_partitions,
    run_to_memory,
    run_to_parquet,
    windowed_counts,
)


def _sink_name(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


def _assert_single_data_batch(q, name: str) -> None:
    """UPDATE-mode memory sinks APPEND each trigger's emitted rows: if
    the bounded drain ever split into 2+ micro-batches, a group updated
    in both would land twice (stale + final) and the read-back would
    carry duplicate rows — silently. The single-file staging makes the
    drain one data batch; assert that contract instead of trusting it
    (the stateful-funnel discipline). ZERO data batches is also
    consistent: a genuinely empty source emits nothing, run_to_parquet
    returns its empty frame, and the oracle over the empty table
    agrees — so the assert accepts 0 or 1, never 2+. (Complete-mode
    drains additionally read back only the max batch_id inside
    run_to_parquet, so a trailing no-data trigger re-emitting the
    whole table cannot double the read-back regardless.)"""
    data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(data_batches) <= 1, (
        f"{name} expects a single-data-batch drain, got "
        f"{[(p['batchId'], p['numInputRows']) for p in q.recentProgress]}"
    )


@register(
    "streaming_tumbling_window",
    oracle="""
SELECT TIME_BUCKET(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "window"),
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 generalized: watermarked tumbling-window counts, executed as a
    real streaming query (file source → availableNow → memory sink).

    UPDATE output mode, not complete: complete mode disables
    watermark-based state eviction by definition (every window ever
    seen is retained and re-emitted each trigger — state and output
    grow linearly with stream lifetime on a 24/7 run). In update mode
    the watermark actually evicts closed windows. Over the bounded
    single-micro-batch drain the two modes emit identical rows, so the
    oracle equality is unchanged — the mode choice is the honest
    production posture, not a result change."""
    name = _sink_name("stream_win")
    q = run_to_memory(
        windowed_counts(events_stream(spark, sf_dir)), name, output_mode="update"
    )
    _assert_single_data_batch(q, "streaming_tumbling_window")
    return spark.table(name)


@register(
    "streaming_dedup_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming", "dedup"),
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1's streaming generalization: dropDuplicatesWithinWatermark.

    Only the key columns are emitted (which physical row survives is
    engine-internal), so the result set equals DISTINCT keys.

    The deduped stream drains through run_to_parquet (foreachBatch →
    per-batch parquet, executor-side writes), NOT a memory sink: unlike
    the aggregate-shaped siblings whose sinks hold bounded group
    cardinalities, this output is distinct-KEY-sized — at ~10⁹ users a
    memory sink would materialize billions of rows in driver JVM
    memory during the drain. The distributed sink is the production
    shape (dedup feeds a table, not the driver); reading the landed
    files back is the test harness's comparison path.

    ORACLE EQUALITY DEPENDS ON THE SINGLE-DATA-BATCH DRAIN, asserted
    below: dropDuplicatesWithinWatermark only holds a key's state for
    the watermark delay, so across a watermark-advancing batch split a
    key whose duplicates sit more than 24 h apart is re-emitted (two
    rows vs the oracle's one DISTINCT row). Within one batch the
    watermark never advances, so the read-back equals DISTINCT exactly
    — that contract held silently before; now a multi-file staging or
    a maxFilesPerTrigger regression trips the assert instead of
    shipping duplicate keys.
    """
    deduped = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "24 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    back, q = run_to_parquet(deduped, "dedupw", sf_dir)
    _assert_single_data_batch(q, "streaming_dedup_watermark")
    return back.select("user_id", "event_type")


@register(
    "streaming_static_enrich_join",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
    tags=("streaming", "join"),
)
def streaming_static_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dim (broadcast per micro-batch — the dim never becomes
    streaming state), then aggregated by segment. This is the streaming
    form of the reference's FK design: dims stay a lookup, facts flow.
    """
    from ..catalog import table as static_table
    from ..functions.exact import dsum

    name = _sink_name("stream_enrich")
    cust = static_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    ev = events_stream(spark, sf_dir)
    agg = (
        # customer grows with SF (catalog policy force-broadcasts only
        # region/nation); un-hinted, the per-batch planner broadcasts
        # while the dim fits and shuffle-joins beyond — a forced hint
        # would kill the 24/7 stream once customer outgrows memory.
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 2).alias("sum_value"))
    )
    run_to_memory(agg, name, output_mode="complete")
    return spark.table(name)


@register(
    "streaming_stream_stream_join",
    oracle="""
SELECT p.user_id, COUNT(*) AS n_attributed
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
GROUP BY p.user_id
""",
    tags=("streaming", "join", "stream-stream"),
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases attributed to clicks by
    the same user within the 10 minutes before the purchase. Both sides
    carry watermarks and the join condition bounds event time, so the
    join state is evictable — the only formulation that survives an
    unbounded stream. The bounded test stream drains in one micro-batch,
    making the append-mode output equal to the batch interval join.

    The per-user counts are PARTIALLY AGGREGATED INSIDE foreachBatch
    (run_to_parquet's batch_transform hook) and landed as per-batch
    parquet, then summed across batches — the incremental-ETL shape.
    The earlier revision sank the raw join output to a memory sink and
    aggregated afterwards: at production volume the interval join
    emits O(events) attribution pairs, and a memory sink materializes
    every one of them in driver JVM memory — the one data-sized
    intermediate in this module. Append-mode emits each joined row at
    most once, but EXACTNESS vs the batch-join oracle still depends on
    the single-data-batch drain (asserted below): across a
    watermark-advancing batch split, a click more than 1 h older than
    the advanced watermark is evicted from join state before a
    qualifying purchase arrives in a later batch, silently undercounting
    attribution pairs relative to the batch interval join."""
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    back, q = run_to_parquet(
        joined,
        "ssj",
        sf_dir,
        batch_transform=lambda b: b.groupBy("p_user").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    _assert_single_data_batch(q, "streaming_stream_stream_join")
    return back.groupBy(F.col("p_user").alias("user_id")).agg(
        F.sum("n").alias("n_attributed")
    )


@register(
    "streaming_sliding_window",
    oracle="""
WITH starts AS (
  SELECT TIME_BUCKET(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS b, event_id, value, ts
  FROM events
),
expanded AS (
  SELECT b AS window_start, event_id, value FROM starts
  UNION ALL
  SELECT b - INTERVAL '30 minutes' AS window_start, event_id, value FROM starts
)
SELECT window_start, COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM expanded
GROUP BY window_start
""",
    tags=("streaming", "window"),
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30m slide): each event lands in two
    overlapping windows. Update mode so the watermark actually evicts
    closed windows (complete mode retains and re-emits every window
    ever seen — unbounded on a 24/7 stream); identical rows over the
    bounded single-batch drain (see streaming_tumbling_window)."""
    name = _sink_name("stream_slide")
    ev = events_stream(spark, sf_dir)
    from ..functions.exact import dsum

    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )
    q = run_to_memory(agg, name, output_mode="update")
    _assert_single_data_batch(q, "streaming_sliding_window")
    return spark.table(name)


@register(
    "streaming_foreach_batch_sink",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
""",
    tags=("streaming", "sink", "foreach-batch"),
)
def streaming_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K2-style multi-sink pattern as a checkable query: the event
    stream drains through foreachBatch, each micro-batch writing an
    idempotent parquet dir keyed by batch_id (rerun-safe: overwrite per
    batch id — the reference's swallowed-error copy+delete replaced by
    checkpoint + deterministic paths, spotifytransform.py:101-158).
    Reading the landed files back and aggregating must equal
    aggregating the source directly."""
    from ..catalog import sink_run_dir

    # Run-unique, app-scoped, swept (sink_run_dir's contract): the old
    # fixed per-dataset dir was rmtree'd on every build — destroying
    # the files backing any previously returned frame — and its
    # uuid-named checkpoint dirs leaked outside every swept root. The
    # checkpoint now lives inside the run dir.
    out = sink_run_dir(spark, "feb", sf_dir)

    def sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out}/data/batch_id={batch_id}")

    with narrow_state_partitions(spark):
        q = (
            events_stream(spark, sf_dir)
            .select("event_id", "event_type", "value")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{out}/_ckpt")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
        raise TimeoutError("foreachBatch stream did not drain")
    from ..functions.exact import dsum

    back = spark.read.option("basePath", f"{out}/data").parquet(
        f"{out}/data/batch_id=*"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 2).alias("sum_value")
    )


@register(
    "streaming_csv_sink_roundtrip",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))) AS n_hours,
       TRUE AS archival_ok
FROM events
GROUP BY event_type
""",
    tags=("streaming", "sink", "csv", "reference", "archival"),
)
def streaming_csv_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2+M1 end-to-end, oracle-checked: a multi-file stream drains
    through foreachBatch into THREE header-CSV sinks (the reference's
    song/artist/album triple-write, spotifytransform.py:101-130), with
    the SOURCE files archived by the engine (cleanSource=archive +
    sourceArchiveDir replacing the reference's non-atomic copy+delete,
    spotifytransform.py:137-155). The three sinks are read back and
    joined; the aggregate must equal aggregating the source directly.

    Staging is re-created fresh per run (the previous run ARCHIVED the
    source files — that's the point), checkpoint included, so the query
    is idempotent. maxFilesPerTrigger=1 over a 3-file source forces
    real multi-batch behavior: earlier batches' sources are archived
    while the stream is still running.

    M1 sits INSIDE the driver hash: archival_ok is true iff the engine
    moved ≥2 of the 3 source files to sourceArchiveDir by poll timeout.
    Spark's cleaner archives batch N's file as batch N+1 runs (and
    asynchronously), so with 3 single-file batches at least 2 are
    archived by drain; whether the LAST file trails or not is
    engine-internal timing, so the hashed value is the ≥2 verdict, not
    an exact count (an exact pin would flip red on cleaner-thread
    behavior changes with no correctness defect). Archival silently
    failing leaves 0 files archived after the 60 s bounded poll and
    flips the row red.
    """
    from ..catalog import sink_run_dir, table
    from ..functions.exact import dsum
    from ..operators.sinks import write_csv

    # Run-unique, app-scoped, swept (sink_run_dir's contract) — the
    # old fixed dir was rmtree'd per build, destroying prior frames'
    # files; the staged src/archive/ckpt/out quartet now lives and
    # dies together inside one run dir.
    base = sink_run_dir(spark, "stream_csv", sf_dir)
    src, archive, ckpt, out = (f"{base}/{d}" for d in ("src", "archive", "ckpt", "out"))

    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "ts", "value"
    )
    ev.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("cleanSource", "archive")
        .option("sourceArchiveDir", archive)
        .parquet(src)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # K2: one micro-batch fans out to three typed CSV tables, each
        # under an idempotent batch_id directory (rerun = overwrite).
        branches = {
            "typed": batch_df.select("event_id", "event_type", "value"),
            "users": batch_df.select("event_id", "event_type", "user_id"),
            "times": batch_df.select(
                "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
            ),
        }
        for name, df in branches.items():
            write_csv(df, f"{out}/{name}/batch_id={batch_id}", mode="overwrite")

    with narrow_state_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
        raise TimeoutError("csv sink stream did not drain")

    def read_back(name: str, value_field: str) -> DataFrame:
        df = (
            spark.read.schema(f"event_id long, event_type string, {value_field}")
            .option("header", True)
            .option("basePath", f"{out}/{name}")
            .csv(f"{out}/{name}/batch_id=*")
        )
        return df.drop("batch_id")

    typed = read_back("typed", "value double")
    users = read_back("users", "user_id long")
    times = read_back("times", "ts_us long")
    agg_typed = typed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 2).alias("sum_value")
    )
    agg_users = users.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    # hour bucket = floor-div of epoch-us (positive for all test data),
    # bijective with DATE_TRUNC('hour') so the distinct counts agree.
    agg_times = times.groupBy("event_type").agg(
        F.countDistinct(F.expr("ts_us div 3600000000")).alias("n_hours")
    )

    # M1 evidence: ≥2 of the 3 source files archived (bounded poll —
    # the cleaner thread is asynchronous; 60 s is insurance against a
    # loaded host, paid only on the failure path because the poll exits
    # the moment the threshold is met).
    import glob as _glob
    import time as _time

    n_archived = 0
    for _ in range(60):
        n_archived = len(_glob.glob(f"{archive}/**/*.parquet", recursive=True))
        if n_archived >= 2:
            break
        _time.sleep(1)

    return (
        agg_typed.join(agg_users, "event_type")
        .join(agg_times, "event_type")
        .withColumn("archival_ok", F.lit(n_archived >= 2))
    )


@register(
    "streaming_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN EPOCH_US(CAST(ts AS TIMESTAMP)) - EPOCH_US(CAST(LAG(ts) OVER w AS TIMESTAMP)) > 1800000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start, COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_seq
""",
    tags=("streaming", "session-window"),
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window as a REAL streaming aggregation: dynamic
    30-min-gap sessions whose state merges windows as events arrive —
    the canonical sessionization a clickstream pipeline runs 24/7.

    Executed file-source → availableNow → foreachBatch parquet in
    COMPLETE mode, and complete mode is a TEST-DRAIN compromise, stated
    honestly: Spark rejects update mode for session-window aggregations
    (STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION), and append mode
    withholds every session whose end lies inside the watermark delay —
    on the bounded fixture that silently drops the trailing 24 h of
    sessions (measured: 906 of 946), so the oracle equality would be
    vacuously broken. In complete mode watermark eviction is disabled
    by definition, so this exact shape must NOT run 24/7: a production
    sessionization runs append mode (each session emitted exactly once
    after its close passes the watermark; state evicted with it) and
    accepts that in-flight sessions are not yet visible. The one-batch
    drain here emits everything because nothing is late.

    The drain is run_to_parquet, NOT a memory sink: the output is one
    row per user-SESSION — data-sized, unlike the bounded-cardinality
    aggregates the memory-sink siblings hold — so a memory sink would
    materialize every session in driver JVM memory during the drain
    (~10⁹ users × sessions at production volume). Complete mode
    re-emits the whole table per trigger; run_to_parquet reads back
    only the LAST batch for complete-mode drains, so a trailing
    no-data trigger can never double the result, and the data-batch
    assert pins the oracle-equality contract (all input in one batch →
    nothing late).
    """
    ev = events_stream(spark, sf_dir).withWatermark("ts", "24 hours")
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    back, q = run_to_parquet(agg, "sesswin", sf_dir, output_mode="complete")
    _assert_single_data_batch(q, "streaming_session_window")
    return back.select("user_id", "session_start", "n_events")

"""Structured Streaming: the reference's blob-trigger semantics
(SURVEY.md §2.1 S3/M1 + §3.2) and event-stream operators.

Reference mapping:
  S3 blob trigger   → file-source readStream over the raw-zone dir;
                      one arriving file ≈ one micro-batch
                      (spotifytransform.py:67-68)
  M1 archival       → cleanSource=archive + sourceArchiveDir replaces
                      the copy+delete at spotifytransform.py:137-155;
                      the checkpoint replaces the at-least-once retry
                      semantics (idempotent replay instead of
                      swallowed errors)
  K2 CSV sinks ×3   → foreachBatch (three CSV writers can't hang off
                      one streaming query otherwise)
  D1 streaming form → dropDuplicatesWithinWatermark

Scale posture: watermarks bound all state; maxFilesPerTrigger paces
ingest; foreachBatch writes are idempotent per (run, batch_id).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..catalog import release
from ..operators import spotify
from ..operators.sinks import write_csv


def spotify_file_stream(
    spark: SparkSession,
    input_dir: str,
    *,
    archive_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S3: the raw-zone directory as an unbounded file stream."""
    reader = (
        spark.readStream.schema(spotify.PLAYLIST_SCHEMA)
        .option("multiLine", True)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if archive_dir:
        # M1: move-after-process, engine-managed and atomic per batch.
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    # doc_order = source file URI, exactly as the batch path
    # (spotify.read_raw_json): keep-first dedup orders by (doc_order,
    # pos) and pos restarts at 0 per file, so a CONSTANT here would
    # leave cross-file ties broken arbitrarily whenever a micro-batch
    # carries more than one file (maxFilesPerTrigger unset or >1) —
    # silently diverging from pandas keep='first'.
    return reader.json(input_dir).withColumn("doc_order", F.input_file_name())


def run_spotify_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_base: str,
    checkpoint_dir: str,
    *,
    archive_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
) -> StreamingQuery:
    """The full reference transform as a stream: readStream → explode →
    3 branches → foreachBatch CSV ×3 (spotifytransform.py:77-130).

    maxFilesPerTrigger defaults to 1 — one blob per micro-batch, the
    reference's one-invocation-per-blob semantics. NOTE on archival
    parity: Spark's source cleaner moves a batch's files when the NEXT
    batch is planned, so the most recent file trails until more data
    arrives. That trade (slightly-late archive, exactly-once via
    checkpoint) replaces the reference's eager but non-atomic
    copy+delete with swallowed errors (spotifytransform.py:137-158).
    """
    raw = spotify_file_stream(
        spark, input_dir, archive_dir=archive_dir, max_files_per_trigger=max_files_per_trigger
    )

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        # persist the shared exploded subtree: Spark shares no subplans,
        # so the three branch writes would otherwise each re-read and
        # re-JSON-parse the batch's raw blobs from scratch (three full
        # scans per micro-batch — an availableNow backfill over a
        # 100 TB raw zone would parse ~300 TB). Released in finally so
        # a failed write can't leak the CacheManager entry.
        items = spotify.explode_items(batch_df).persist()
        try:
            tables = {
                "songs": spotify.make_songs(items),
                "artists": spotify.make_artists(items),
                "albums": spotify.make_albums(items),
            }
            for name, df in tables.items():
                write_csv(df, f"{output_base}/{name}_data/batch_id={batch_id}", mode="overwrite")
        finally:
            release(items)

    writer = (
        raw.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _staged_dir(sf_dir: str, name: str) -> str:
    """The streaming file source wants a DIRECTORY; the test tables are
    single files. Stage a symlink dir under /tmp (no data copy).

    CONTRACT: exactly ONE file, so an availableNow drain with no
    maxFilesPerTrigger is a single micro-batch. streaming_stateful_funnel's
    oracle equality (monotone state machine vs batch SQL) relies on
    this and asserts it; staging multiple files here would silently
    under-count funnels that span batches out of order."""
    import hashlib
    import os

    d = f"/tmp/sse_stream_src_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}/{name}"
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{name}.parquet")
    # lexists, not exists: exists() follows the link, so a DANGLING link
    # (dataset deleted/regenerated) reads as absent and the symlink call
    # below raises FileExistsError forever after. A stale-but-present
    # link is re-pointed; the target is absolutized so a relative sf_dir
    # can't produce a link that resolves relative to /tmp.
    target = os.path.abspath(f"{sf_dir}/{name}.parquet")
    if os.path.lexists(link):
        if os.path.realpath(link) == os.path.realpath(target):
            return d
        os.remove(link)
    os.symlink(target, link)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events parquet as a (bounded) stream — raw file schema (from
    the catalog's cached footer read), file source underneath, then the
    SAME ts normalization as the batch path (catalog.normalize_events_ts)
    so the two can never diverge on the TIMESTAMP(NANOS)-vs-micros
    encoding rule every oracle-parity test depends on."""
    from ..catalog import normalize_events_ts, raw_schema

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    src = _staged_dir(sf_dir, "events")
    schema = raw_schema(spark, sf_dir, "events")
    return normalize_events_ts(spark.readStream.schema(schema).parquet(src))


def windowed_counts(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window aggregate with late-data watermark."""
    from ..functions.exact import dsum

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


# State-store partition count for the bounded test streams. Stateful
# streaming parallelism should track STATE SIZE, not the batch session's
# core count: every shuffle partition materializes a state store
# (directory, provider, commit per micro-batch), so 32 stores for a few
# thousand keys is pure fixed overhead — measured 2× end-to-end (1.21 s
# → 0.62 s for the tumbling window at sf0.1). A production job sizes
# this to keys×bytes/store-budget; it is fixed at the FIRST run of a
# checkpoint and must not change across restarts.
STREAM_STATE_PARTITIONS = 8


@contextmanager
def narrow_state_partitions(spark: SparkSession):
    """Narrow shuffle partitions to STREAM_STATE_PARTITIONS while a
    streaming query starts (the query binds the value at start; the
    session's batch setting is restored after — safe because every
    caller drains synchronously)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def run_to_memory(
    df: DataFrame, name: str, *, output_mode: str = "complete", timeout_s: int = 300
):
    """Drive a (bounded) stream to a memory sink with availableNow and
    block until drained. Returns the finished StreamingQuery so callers
    can assert drain-shape contracts (e.g. single-data-batch) from its
    progress history."""
    with narrow_state_partitions(df.sparkSession):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"stream {name} did not drain in {timeout_s}s")
        return q


def run_to_parquet(
    df: DataFrame,
    prefix: str,
    sf_dir: str,
    *,
    output_mode: str = "append",
    batch_transform=None,
    timeout_s: int = 300,
):
    """Drive a (bounded) stream through foreachBatch into per-batch
    parquet and return (read-back DataFrame, finished StreamingQuery).

    THE drain for data-sized streaming outputs (distinct keys, join
    pairs, per-user state rows): executor-side writes, nothing lands in
    driver JVM memory — Spark's memory sink holds its entire table on
    the driver, which is fine for bounded aggregates and fatal for
    outputs that grow with the data. ``batch_transform`` (optional) is
    applied to each micro-batch DataFrame before the write — the
    per-batch PARTIAL AGGREGATION hook (e.g. pre-counting join pairs so
    only counts land on disk).

    Filesystem lifecycle, deliberate on all three axes:
    - each invocation writes a FRESH ``run_<uuid>`` dir (checkpoint
      inside it), so a re-invocation in the same session never deletes
      files under a previously returned lazy DataFrame (a fixed
      rmtree'd path would FileNotFound any held frame, and would race
      a concurrent process on the same dataset);
    - run dirs nest under ``catalog.app_scoped_dir``'s per-application
      directory, and same-host dirs whose PID is no longer alive are
      swept on entry — dead sessions' debris is collected by the next
      user of the same (query, dataset) instead of accumulating
      forever;
    - within one live session, runs accumulate (bounded by invocation
      count, megabytes at test SF) exactly like the uuid-named memory
      sinks they replaced, and are swept by the next session.
    """
    import glob
    import hashlib
    import uuid

    from ..catalog import app_scoped_dir

    spark = df.sparkSession
    base = f"/tmp/sse_drain_{prefix}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    run = f"{app_scoped_dir(base, spark)}/run_{uuid.uuid4().hex[:8]}"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_transform(batch_df) if batch_transform else batch_df
        out.write.mode("overwrite").parquet(f"{run}/data/batch_id={batch_id}")

    with narrow_state_partitions(spark):
        q = (
            df.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{run}/_ckpt")
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream {prefix} did not drain in {timeout_s}s")
    if not glob.glob(f"{run}/data/batch_id=*"):
        # Zero DATA batches (an empty bounded source never invokes
        # foreachBatch) → the glob target was never created, and
        # spark.read.parquet on it raises a confusing path-not-found
        # AnalysisException. Return an empty frame with the same shape
        # the read-back would have: batch_transform applied (it may
        # change the schema) plus the batch_id partition column the
        # directory layout adds. limit(0) guards the ROW contract, not
        # just the schema: a GLOBAL-aggregate transform evaluated over
        # an empty static frame yields one row (count=0 etc.) that the
        # disk read-back path could never produce — foreachBatch never
        # ran, so zero rows is the only faithful result.
        empty = spark.createDataFrame([], df.schema)
        if batch_transform is not None:
            empty = batch_transform(empty)
        return empty.limit(0).withColumn("batch_id", F.lit(None).cast("int")), q
    if output_mode == "complete":
        # COMPLETE mode re-emits the ENTIRE result table every
        # trigger, so the union-of-all-batches read-back is correct
        # only while exactly one batch ever fires — a trailing
        # no-data micro-batch (watermark finalization under
        # availableNow) or a multi-file split would silently double
        # every row while the data-batch assert stayed green. The
        # last batch IS the result by definition; read back only the
        # max batch_id.
        last = max(
            glob.glob(f"{run}/data/batch_id=*"),
            key=lambda d: int(d.rsplit("=", 1)[1]),
        )
        back = spark.read.option("basePath", f"{run}/data").parquet(last)
    else:
        # append/update emit disjoint per-trigger deltas; the union of
        # all batch dirs is the stream's full output.
        back = spark.read.option("basePath", f"{run}/data").parquet(
            f"{run}/data/batch_id=*"
        )
    return back, q

"""End-to-end Structured Streaming tests: the blob-trigger pipeline
(S3 + K2 + M1) and watermark semantics."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from spotify_serverless_etl_pipeline_engineering_with_azure_spark.operators.fixtures import (
    generate_docs,
    write_json_dir,
)
from spotify_serverless_etl_pipeline_engineering_with_azure_spark.streaming.pipeline import (
    events_stream,
    run_spotify_pipeline,
    run_to_memory,
    windowed_counts,
)


def test_spotify_stream_foreachbatch_csv_and_archive(spark, tmp_path):
    """readStream raw JSON → transform → 3 CSV sinks; source files
    archived after processing (M1 replacement)."""
    raw_dir = str(tmp_path / "raw")
    archive = str(tmp_path / "processed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    paths = write_json_dir(raw_dir, n_docs=3)

    q = run_spotify_pipeline(spark, raw_dir, out, ckpt, archive_dir=archive)
    q.awaitTermination(240)
    assert not q.isActive

    docs = generate_docs(3)
    n_items = sum(len(d["items"]) for d in docs)
    song_files = glob.glob(f"{out}/songs_data/batch_id=*/*.csv")
    assert song_files, "no CSV output written"
    written = (
        spark.read.option("header", True).csv(f"{out}/songs_data/batch_id=*").count()
    )
    assert written == n_items
    for t in ("artists", "albums"):
        assert glob.glob(f"{out}/{t}_data/batch_id=*/*.csv")

    # archival: the cleaner moves batch N's files when batch N+1 plans,
    # so with one file per micro-batch the last file trails (documented
    # divergence from the reference's eager copy+delete).
    import time

    archived = []
    for _ in range(15):
        archived = glob.glob(f"{archive}/**/*.json", recursive=True)
        if len(archived) >= len(paths) - 1:
            break
        time.sleep(1)
    assert len(archived) == len(paths) - 1
    remaining = glob.glob(f"{raw_dir}/*.json")
    assert len(remaining) == 1


def test_windowed_counts_match_batch(spark, sf_dir):
    """Single micro-batch → no late rows → streaming agg == batch agg."""
    name = "t_stream_batch_equiv"
    run_to_memory(windowed_counts(events_stream(spark, sf_dir)), name)
    streamed = {tuple(r) for r in spark.table(name).collect()}

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.catalog import table
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.functions.exact import dsum

    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    assert streamed == {tuple(r) for r in batch.collect()}


def test_stream_checkpoint_no_reprocess(spark, tmp_path):
    """Restarting over the same checkpoint must not re-emit batches
    (the reference's at-least-once copy+delete, made exactly-once)."""
    raw_dir = str(tmp_path / "raw2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    write_json_dir(raw_dir, n_docs=2)

    q1 = run_spotify_pipeline(spark, raw_dir, out, ckpt)
    q1.awaitTermination(240)
    first = spark.read.option("header", True).csv(f"{out}/songs_data/batch_id=*").count()

    q2 = run_spotify_pipeline(spark, raw_dir, out, ckpt)  # restart, no new files
    q2.awaitTermination(240)
    second = spark.read.option("header", True).csv(f"{out}/songs_data/batch_id=*").count()
    assert first == second


def test_run_to_parquet_empty_bounded_stream_returns_empty_frame(spark, tmp_path):
    """Zero data batches (an empty bounded source never invokes
    foreachBatch) must return an EMPTY frame with the post-transform
    schema — not raise a path-not-found AnalysisException because the
    batch_id=* glob target was never created."""
    from pyspark.sql import functions as F

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.streaming.pipeline import (
        run_to_parquet,
    )

    src = tmp_path / "empty_src"
    src.mkdir()
    stream = spark.readStream.schema("user_id long, value double").parquet(str(src))
    back, q = run_to_parquet(stream, "emptyprobe", str(src))
    assert back.count() == 0
    assert dict(back.dtypes) == {
        "user_id": "bigint", "value": "double", "batch_id": "int",
    }
    # batch_transform may change the schema — the empty frame must
    # reflect the POST-transform shape.
    stream2 = spark.readStream.schema("user_id long, value double").parquet(str(src))
    back2, _ = run_to_parquet(
        stream2, "emptyprobe2", str(src),
        batch_transform=lambda b: b.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    assert back2.count() == 0
    assert dict(back2.dtypes) == {"user_id": "bigint", "n": "bigint", "batch_id": "int"}


def test_run_to_parquet_complete_mode_multi_batch_reads_last_only(spark, tmp_path):
    """COMPLETE mode re-emits the ENTIRE result table every trigger:
    with the drain split across 2+ micro-batches (forced here via
    maxFilesPerTrigger=1 over two source files), a union-of-all-batches
    read-back double-counts every group that survived into the final
    table. The contract is: the LAST batch IS the result. This test
    fails under the old glob-everything read-back (counts doubled) and
    pins the max-batch_id selection."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.streaming.pipeline import (
        run_to_parquet,
    )

    src = tmp_path / "complete_src"
    src.mkdir()
    spark.createDataFrame([(1, 10.0), (2, 20.0)], "user_id long, value double") \
        .coalesce(1).write.parquet(str(src / "f1.parquet"))
    spark.createDataFrame([(1, 30.0), (3, 40.0)], "user_id long, value double") \
        .coalesce(1).write.parquet(str(src / "f2.parquet"))

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )
    agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    prefix = f"completeprobe_{_uuid.uuid4().hex[:6]}"
    back, q = run_to_parquet(agg, prefix, str(src), output_mode="complete")

    # the scenario really forced 2+ data batches (else this test is
    # vacuous and the old read-back would pass it)
    data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(data_batches) >= 2, [
        (p["batchId"], p["numInputRows"]) for p in q.recentProgress
    ]
    rows = {(r.user_id, r.n) for r in back.select("user_id", "n").collect()}
    assert rows == {(1, 2), (2, 1), (3, 1)}
    assert back.count() == 3  # glob-everything would see 3 + partial-batch rows

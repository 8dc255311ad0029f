"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode/feature-extraction as Arrow-batched mapInPandas.

The container ships no image/audio codecs, so the actual decode is
STUBBED (deterministic fake features; ``decode_media(..., real=True)``
raises NotImplementedError). The Spark-side plumbing — binary column
construction, schema, partition-preserving mapInPandas, batch shape —
is real and tested.

Scale posture: binary payloads never shuffle here; mapInPandas streams
Arrow batches partition-locally, and the metadata projection
(byte length, media type) is JVM-side so pure-metadata queries skip the
Python path entirely.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, n_frames int"
)


def with_binary_content(docs: DataFrame) -> DataFrame:
    """Build the multimodal shape: opaque binary payload + typed metadata.

    (Test tables have no real media, so the payload is the UTF-8 bytes
    of the text column; the schema/partitioning contract is identical.)
    """
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        media_type.alias("media_type"),
    )


def decode_media(payload: bytes, media_type: str, *, real: bool = False) -> dict[str, Any]:
    """Decode stub. A real deployment plugs Pillow/librosa/pyav in here;
    this container has none, so only the deterministic fake path runs."""
    if real:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "install Pillow/librosa/pyav and wire them in here"
        )
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 16 * (1 + n % 40),
        "height": 9 * (1 + n % 40),
        "n_frames": 1 if media_type.startswith("image") else 1 + n % 240,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(payload, mt)
                for payload, mt in zip(pdf["content"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[["doc_id", "media_type", "n_bytes", "width", "height", "n_frames"]]

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


@register(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       CAST(STRLEN(text) AS BIGINT) AS n_bytes
FROM documents
""",
    tags=("multimodal",),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata projection — JVM-side only (no Python)."""
    media = with_binary_content(table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id", "media_type", F.length("content").cast("long").alias("n_bytes")
    )


@register("multimodal_decode_features", tags=("multimodal", "pandas-udf"))
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed decode via mapInPandas (rows-only check: the fake decoder
    is deterministic, but not SQL-expressible by design — it stands in
    for a codec)."""
    media = with_binary_content(table(spark, sf_dir, "documents"))
    return extract_features(media)


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize as Arrow-batched mapInPandas: 1 row in → 1 row out, binary
    in → binary out. The pixel work is stubbed (payload truncated/padded
    pro-rata to the target area — a real build calls Pillow here); the
    batch shape, binary round-trip, and schema contract are real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["content"], pdf["media_type"]
            ):
                meta = decode_media(payload, mt)
                scale = (target_w * target_h) / (meta["width"] * meta["height"])
                n_out = max(1, int(len(payload) * scale))
                resized = (payload * (n_out // max(1, len(payload)) + 1))[:n_out]
                out_rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": mt,
                        "orig_w": meta["width"],
                        "orig_h": meta["height"],
                        "new_w": target_w,
                        "new_h": target_h,
                        "content": resized,
                    }
                )
            yield pd.DataFrame(out_rows)

    return media.mapInPandas(
        run,
        schema="doc_id long, media_type string, orig_w int, orig_h int, "
        "new_w int, new_h int, content binary",
    )


@register("multimodal_resize", tags=("multimodal", "pandas-udf"))
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed resize to 64×36 via mapInPandas; the output projects
    metadata + the resized payload length (rows-only check — the resize
    arithmetic stands in for a codec)."""
    media = with_binary_content(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    )
    resized = resize_media(media, 64, 36)
    return resized.select(
        "doc_id",
        "media_type",
        "orig_w",
        "orig_h",
        "new_w",
        "new_h",
        F.length("content").cast("long").alias("n_bytes_out"),
    )


def sample_frames(media: DataFrame, every_k: int) -> DataFrame:
    """Frame sampling as mapInPandas: 1 video row in → ceil(n_frames/k)
    frame rows out — the 1→N batch shape video pipelines need. Frame
    payloads are stubbed byte slices; a real build decodes with pyav."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["content"], pdf["media_type"]
            ):
                n_frames = decode_media(payload, mt)["n_frames"]
                for idx in range(0, n_frames, every_k):
                    lo = (idx * 7) % max(1, len(payload))
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_bytes": payload[lo : lo + 16],
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return media.mapInPandas(run, schema="doc_id long, frame_idx int, frame_bytes binary")


@register("multimodal_frame_sample", tags=("multimodal", "pandas-udf"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-32nd-frame sampling over the video rows (1→N mapInPandas);
    emits frame index + stub frame bytes, projected to counts per doc
    (rows-only check)."""
    media = with_binary_content(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    )
    frames = sample_frames(media, 32)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("frame_idx").alias("last_frame_idx"),
            F.sum(F.length("frame_bytes")).alias("bytes_sampled"),
        )
        .orderBy("doc_id")
    )

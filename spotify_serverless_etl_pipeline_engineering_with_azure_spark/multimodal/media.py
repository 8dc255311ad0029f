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

"""Multimodal plumbing: binary columns, mapInPandas batch shape,
decode stub determinism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spotify_serverless_etl_pipeline_engineering_with_azure_spark.catalog import table
from spotify_serverless_etl_pipeline_engineering_with_azure_spark.multimodal.media import (
    decode_media,
    extract_features,
    with_binary_content,
)


def test_binary_column_roundtrip(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    media = with_binary_content(docs)
    assert dict(media.dtypes)["content"] == "binary"
    row = (
        media.join(docs, "doc_id")
        .select("doc_id", F.decode("content", "UTF-8").alias("back"), "text")
        .first()
    )
    assert row.back == row.text


def test_extract_features_schema_and_determinism(spark, sf_dir):
    media = with_binary_content(table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    assert feats.columns == ["doc_id", "media_type", "n_bytes", "width", "height", "n_frames"]
    a = sorted(tuple(r) for r in feats.collect())
    b = sorted(tuple(r) for r in feats.collect())
    assert a == b
    got = {r.doc_id: r for r in feats.collect()}
    src = {r.doc_id: r for r in media.select("doc_id", F.length("content").alias("n")).collect()}
    assert all(got[d].n_bytes == src[d].n for d in src)


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image/png", real=True)

"""Registry entries for the reference-parity Spotify pipeline.

These run on the deterministic seed-42 in-memory fixture (the nested
playlist shape is not among the oracle's pre-registered views, so the
driver records the weaker rows-only check here; full value-level
verification against hand-computed goldens lives in
tests/test_spotify_pipeline.py, and each constituent operator is ALSO
hash-checked over oracle tables via the ref_* queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from . import spotify
from .fixtures import fixture_df


def _items(spark: SparkSession) -> DataFrame:
    return spotify.explode_items(fixture_df(spark))


@register("spotify_songs", tags=("reference", "spotify"))
def spotify_songs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+S5+P3+P4+C1: songs fact table from nested playlist docs."""
    return spotify.make_songs(_items(spark))


@register("spotify_artists", tags=("reference", "spotify"))
def spotify_artists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+D1: artists dim — artists[0] head projection, keep-first dedup."""
    return spotify.make_artists(_items(spark))


@register("spotify_albums", tags=("reference", "spotify"))
def spotify_albums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+C2+D2: albums dim — mixed-granularity dates, keep-first dedup."""
    return spotify.make_albums(_items(spark))


@register("spotify_artists_exploded", tags=("reference", "spotify"))
def spotify_artists_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized P2: every artist (the reference drops artists 2..n)."""
    return spotify.explode_artists(_items(spark))

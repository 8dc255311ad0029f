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


_DS_FIXTURE_DIR = "/tmp/sse_playlist_pages_v1"
_DS_ORACLE = f"""
SELECT REGEXP_EXTRACT(filename, '([^/]+)$', 1) AS page,
       u.item.added_at AS added_at,
       u.item.track.id AS track_id,
       u.item.track.name AS track_name,
       u.item.track.duration_ms AS duration_ms,
       u.item.track.popularity AS popularity,
       u.item.track.artists[1].id AS artist_id,
       u.item.track.artists[1].name AS artist_name,
       u.item.track.album.id AS album_id,
       u.item.track.album.name AS album_name,
       u.item.track.album.release_date AS release_date,
       u.item.track.album.total_tracks AS total_tracks
FROM (
  SELECT UNNEST(items) AS item, filename
  FROM read_json('{_DS_FIXTURE_DIR}/*.json', filename=true, auto_detect=false,
    columns={{'items': 'STRUCT(added_at VARCHAR, track STRUCT(id VARCHAR,
      name VARCHAR, duration_ms BIGINT, popularity BIGINT,
      external_urls STRUCT(spotify VARCHAR),
      artists STRUCT(id VARCHAR, name VARCHAR,
                     external_urls STRUCT(spotify VARCHAR))[],
      album STRUCT(id VARCHAR, name VARCHAR, release_date VARCHAR,
                   total_tracks BIGINT,
                   external_urls STRUCT(spotify VARCHAR))))[]'}})
) u
"""


def _ensure_ds_fixture() -> str:
    """Stage the seed-42 page files once per host (deterministic path so
    the DuckDB oracle reads the very same bytes)."""
    import glob as _glob

    from .fixtures import write_json_dir

    if len(_glob.glob(f"{_DS_FIXTURE_DIR}/*.json")) != 4:
        write_json_dir(_DS_FIXTURE_DIR, n_docs=4)
    return _DS_FIXTURE_DIR


# Stage at import: the driver may evaluate the oracle before (or
# without) invoking the Spark side, and the SQL references the files.
_ensure_ds_fixture()


@register("rest_datasource_playlist", oracle=_DS_ORACLE, tags=("source", "datasource", "rest"))
def rest_datasource_playlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 via the PySpark 4 Python DataSource API: page files =
    InputPartitions, parsed executor-side in parallel
    (sources/playlist_datasource.py). Hash-checked against DuckDB
    reading the identical raw-zone JSON."""
    from ..sources.playlist_datasource import SpotifyPlaylistDataSource

    try:
        spark.dataSource.register(SpotifyPlaylistDataSource)
    except Exception:
        pass  # already registered in this session
    path = _ensure_ds_fixture()
    return spark.read.format("spotify_playlist").option("path", path).load()

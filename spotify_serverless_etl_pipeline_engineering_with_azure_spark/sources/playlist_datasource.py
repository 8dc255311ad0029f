"""S1 as a first-class Spark source: a PySpark 4 Python DataSource.

The reference fetches playlist pages driver-side inside an Azure
Function (/root/reference/spotifyextract.py:61-74). The idiomatic
Spark-4 form is a custom ``DataSource``: each REST page becomes an
``InputPartition``, so page fetch + JSON flatten run ON EXECUTORS in
parallel — the scale path when "one playlist" becomes "ten million
catalog pages". This implementation reads raw-zone JSON page files
(the reference's own landing format, spotifyextract.py:92-101); a
real deployment swaps `_load_page` for an HTTP GET with the same
pagination contract.

Registered under format name ``spotify_playlist``:

    spark.dataSource.register(SpotifyPlaylistDataSource)
    spark.read.format("spotify_playlist").option("path", dir).load()
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator
from typing import Any

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = (
    "page string, added_at string, track_id string, track_name string, "
    "duration_ms bigint, popularity bigint, artist_id string, "
    "artist_name string, album_id string, album_name string, "
    "release_date string, total_tracks bigint"
)


class _PagePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _load_page(path: str) -> dict[str, Any]:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


class SpotifyPlaylistReader(DataSourceReader):
    def __init__(self, options: dict[str, str]) -> None:
        self.path = options["path"]

    def partitions(self) -> list[InputPartition]:
        # One partition per page file — executors parse pages in
        # parallel; at scale, pages are enumerated here (cheap listing)
        # and fetched in read() (expensive IO) on the cluster.
        return [
            _PagePartition(p)
            for p in sorted(glob.glob(os.path.join(self.path, "*.json")))
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        doc = _load_page(partition.path)
        page = os.path.basename(partition.path)
        # `or` fallbacks, not .get defaults: the API emits EXPLICIT
        # nulls ("items": null on an empty page, "track": null for
        # removed/local tracks), which .get(k, default) passes through
        # — iterating or .get-ing None would crash the executor.
        for raw_item in doc.get("items") or []:
            item = raw_item or {}
            track = item.get("track") or {}
            artists = track.get("artists") or []
            head = (artists[0] or {}) if artists else {}
            album = track.get("album") or {}
            yield (
                page,
                item.get("added_at"),
                track.get("id"),
                track.get("name"),
                track.get("duration_ms"),
                track.get("popularity"),
                head.get("id"),
                head.get("name"),
                album.get("id"),
                album.get("name"),
                album.get("release_date"),
                album.get("total_tracks"),
            )


class SpotifyPlaylistDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "spotify_playlist"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SpotifyPlaylistReader:
        return SpotifyPlaylistReader(dict(self.options))

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


# Scheduler-task ceiling: beyond this many page files, partitions PACK
# multiple files each (what Spark's native file sources do via
# maxPartitionBytes/openCostInBytes). One-task-per-file at the module's
# "ten million catalog pages" posture would mean 10⁷ pickled partition
# objects on the driver and a 10⁷-task job whose scheduling overhead
# dwarfs the parsing; packing keeps the task count bounded while each
# task streams its file batch sequentially. (At production listing
# scale the enumeration itself comes from a catalog/object-store
# inventory rather than a glob — the partition SHAPE is the part this
# source pins.)
MAX_PARTITIONS = 4096


class _PagePartition(InputPartition):
    def __init__(self, paths: tuple[str, ...]) -> None:
        self.paths = paths


def _load_page(path: str) -> dict[str, Any]:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


class SpotifyPlaylistReader(DataSourceReader):
    def __init__(self, options: dict[str, str]) -> None:
        self.path = options["path"]
        self.allow_empty = options.get("allowEmpty", "false").lower() == "true"

    def partitions(self) -> list[InputPartition]:
        # Pages are enumerated here (listing) and fetched in read()
        # (expensive IO) on the cluster; files pack MAX_PARTITIONS-ways
        # so the task count is bounded while small page sets keep one
        # file per task (batch size 1 until the ceiling is reached).
        files = sorted(glob.glob(os.path.join(self.path, "*.json")))
        if not files:
            # Zero matches is almost always a WRONG PATH (glob.glob
            # does not understand cloud URIs, and a typo'd local dir
            # matches nothing) — returning an empty frame would make
            # every downstream table silently empty on a green run.
            # Mirror Spark's native file sources: fail loudly, with an
            # explicit allowEmpty opt-out for genuinely-empty raw zones.
            if self.allow_empty:
                return []
            raise FileNotFoundError(
                f"spotify_playlist source matched no *.json under "
                f"{self.path!r} (glob does not resolve cloud URIs; set "
                f"option('allowEmpty', 'true') if an empty raw zone is "
                f"expected)"
            )
        per = -(-len(files) // MAX_PARTITIONS)  # ceil division
        return [
            _PagePartition(tuple(files[i : i + per]))
            for i in range(0, len(files), per)
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        for path in partition.paths:
            yield from self._read_page(path)

    def _read_page(self, path: str) -> Iterator[tuple]:
        doc = _load_page(path)
        page = os.path.basename(path)
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

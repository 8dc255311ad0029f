"""Golden tests for the reference-parity Spotify pipeline.

Expected values are computed by an INDEPENDENT pure-Python
reimplementation of the reference's pandas semantics
(/root/reference/spotifytransform.py:26-99): explode file-order,
artists[0] head, keep-first dedup, mixed-granularity date padding.
"""

from __future__ import annotations

import datetime as dt

import pytest

from spotify_serverless_etl_pipeline_engineering_with_azure_spark.operators import spotify
from spotify_serverless_etl_pipeline_engineering_with_azure_spark.operators.fixtures import (
    fixture_df,
    generate_docs,
    write_json_dir,
)


def _pad_date(s: str) -> dt.date:
    if len(s) == 4:
        s += "-01-01"
    elif len(s) == 7:
        s += "-01"
    return dt.date.fromisoformat(s)


def expected_tables(docs):
    songs, artists, albums = [], {}, {}
    for doc in docs:
        for item in doc["items"]:
            t = item["track"]
            head = t["artists"][0]
            songs.append(
                (
                    t["id"],
                    t["name"],
                    t["duration_ms"],
                    t["external_urls"]["spotify"],
                    t["popularity"],
                    dt.datetime.strptime(item["added_at"], "%Y-%m-%dT%H:%M:%SZ"),
                    t["album"]["id"],
                    head["id"],
                )
            )
            if head["id"] not in artists:  # keep-first
                artists[head["id"]] = (
                    head["id"],
                    head["name"],
                    head["external_urls"]["spotify"],
                )
            al = t["album"]
            if al["id"] not in albums:  # keep-first
                albums[al["id"]] = (
                    al["id"],
                    al["name"],
                    _pad_date(al["release_date"]),
                    al["total_tracks"],
                    al["external_urls"]["spotify"],
                )
    return songs, list(artists.values()), list(albums.values())


@pytest.fixture(scope="module")
def docs():
    return generate_docs()


@pytest.fixture(scope="module")
def tables(spark, docs):
    return spotify.transform(fixture_df(spark))


def test_songs_match_reference_semantics(tables, docs):
    exp_songs, _, _ = expected_tables(docs)
    got = sorted(tuple(r) for r in tables["songs"].collect())
    assert got == sorted(exp_songs)
    assert tables["songs"].columns == [
        "song_id", "name", "duration_ms", "url", "popularity",
        "added_date", "album_id", "artist_id",
    ]


def test_artists_keep_first_dedup(tables, docs):
    _, exp_artists, _ = expected_tables(docs)
    got = sorted(tuple(r) for r in tables["artists"].collect())
    assert got == sorted(exp_artists)  # values prove keep-FIRST, ids prove dedup
    assert tables["artists"].columns == ["artist_id", "name", "url"]


def test_albums_keep_first_and_date_padding(tables, docs):
    _, _, exp_albums = expected_tables(docs)
    got = sorted(tuple(r) for r in tables["albums"].collect())
    assert got == sorted(exp_albums)
    assert tables["albums"].columns == ["album_id", "name", "release_date", "total_tracks", "url"]


def test_row_count_invariants(tables, docs):
    n_items = sum(len(d["items"]) for d in docs)
    assert tables["songs"].count() == n_items
    assert tables["artists"].count() <= n_items
    assert tables["albums"].count() <= n_items


def test_array_head_is_lossy_and_explode_generalizes(spark, docs):
    items = spotify.explode_items(fixture_df(spark))
    n_all_artists = sum(len(i["track"]["artists"]) for d in docs for i in d["items"])
    exploded = spotify.explode_artists(items)
    assert exploded.count() == n_all_artists
    # the head projection sees strictly fewer artist ids than explode
    head_ids = {r.artist_id for r in spotify.make_artists(items).collect()}
    all_ids = {r.artist_id for r in exploded.collect()}
    assert head_ids <= all_ids and len(head_ids) < len(all_ids)


def test_json_dir_roundtrip(spark, tmp_path, docs):
    """S4/S2: the raw-zone JSON files parse to the same star schema."""
    write_json_dir(str(tmp_path / "raw"))
    raw = spotify.read_raw_json(spark, str(tmp_path / "raw"))
    got = spotify.transform(raw)
    exp_songs, exp_artists, exp_albums = expected_tables(docs)
    assert sorted(tuple(r) for r in got["songs"].collect()) == sorted(exp_songs)
    # file order == doc order (names sort by doc index) → same keep-first
    assert sorted(tuple(r) for r in got["artists"].collect()) == sorted(exp_artists)
    assert sorted(tuple(r) for r in got["albums"].collect()) == sorted(exp_albums)


def test_datasource_tolerates_explicit_nulls(tmp_path):
    """The Spotify API emits EXPLICIT nulls ('items': null on an empty
    page, 'track': null for removed/local tracks); the reader must skip
    them, not crash the executor (dict.get defaults only cover MISSING
    keys, never null values)."""
    import json

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.sources.playlist_datasource import (
        SpotifyPlaylistReader,
        _PagePartition,
    )

    p = tmp_path / "spotify_raw_20230101000000.json"
    p.write_text(json.dumps({
        "items": [
            None,
            {"added_at": "2023-01-01T00:00:00Z", "track": None},
            {"added_at": "2023-01-02T00:00:00Z",
             "track": {"id": "t1", "name": "song", "artists": None,
                       "album": None, "duration_ms": 1000}},
            {"added_at": "2023-01-03T00:00:00Z",
             "track": {"id": "t2", "name": "s2", "artists": [None],
                       "album": {"id": "al1"}}},
        ],
    }))
    rows = list(SpotifyPlaylistReader({"path": str(tmp_path)}).read(_PagePartition((str(p),))))
    assert len(rows) == 4  # every item yields a row, nulls become NULL columns
    assert rows[2][2] == "t1" and rows[2][6] is None  # artists null -> artist_id NULL
    assert rows[3][8] == "al1"  # album survives a null artists[0]

    empty = tmp_path / "spotify_raw_20230101000001.json"
    empty.write_text(json.dumps({"items": None}))
    assert list(SpotifyPlaylistReader({"path": str(tmp_path)}).read(_PagePartition((str(empty),)))) == []


def test_datasource_packs_files_beyond_partition_ceiling(tmp_path, monkeypatch):
    """Beyond MAX_PARTITIONS page files, partitions must PACK multiple
    files each (bounded task count — one-task-per-file is a 10^7-task
    job at catalog scale) while covering every file exactly once and
    keeping one-file-per-task below the ceiling."""
    import json

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.sources import (
        playlist_datasource as pds,
    )

    for i in range(10):
        (tmp_path / f"page_{i:03d}.json").write_text(json.dumps({"items": []}))
    reader = pds.SpotifyPlaylistReader({"path": str(tmp_path)})

    monkeypatch.setattr(pds, "MAX_PARTITIONS", 4)
    parts = reader.partitions()
    assert len(parts) <= 4
    covered = [p for part in parts for p in part.paths]
    assert len(covered) == 10 and len(set(covered)) == 10

    monkeypatch.setattr(pds, "MAX_PARTITIONS", 4096)
    parts = reader.partitions()
    assert len(parts) == 10 and all(len(p.paths) == 1 for p in parts)


def test_datasource_empty_glob_fails_loudly(tmp_path):
    """Zero glob matches must raise, not return an empty frame: glob
    does not resolve cloud URIs, so a wrong/typo'd path would otherwise
    make every downstream table silently empty on a green run. An
    explicitly-empty raw zone opts out via allowEmpty."""
    import pytest

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.sources import (
        playlist_datasource as pds,
    )

    empty = tmp_path / "nothing_here"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="allowEmpty"):
        pds.SpotifyPlaylistReader({"path": str(empty)}).partitions()
    with pytest.raises(FileNotFoundError):
        pds.SpotifyPlaylistReader(
            {"path": "abfss://raw@acct.dfs.core.windows.net/pages"}
        ).partitions()
    ok = pds.SpotifyPlaylistReader({"path": str(empty), "allowEmpty": "true"})
    assert ok.partitions() == []


def test_write_json_dir_padded_names_sort_in_doc_order(tmp_path):
    """Blob names must sort lexicographically in doc order past ten
    docs — keep-first dedup's winner is defined by that order, and the
    old unpadded index made '...010' sort before '...02', silently
    flipping winners relative to fixture_df's padded doc_order (both
    engines read the same filenames, so parity could never catch it)."""
    import os

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.operators.fixtures import (
        write_json_dir,
    )

    paths = write_json_dir(str(tmp_path / "raw"), n_docs=12)
    names = [os.path.basename(p) for p in paths]
    assert sorted(names) == names, f"blob names must sort in doc order: {names}"
    assert not [p for p in os.listdir(tmp_path / "raw") if ".tmp." in p]

"""S1: REST API source (driver-side fetch behind an interface).

Reference: sp.playlist_tracks() via spotipy client-credentials OAuth
(/root/reference/spotifyextract.py:61-74) — one page, ≤100 items.

Spark has no built-in REST source; per SURVEY.md §7 this is a
driver-side ingest that lands rows into a DataFrame with the explicit
playlist schema. The network call is abstracted behind ``fetch_page``
so tests inject fixtures; a real deployment supplies an HTTP client.
At scale the raw-zone landing (S2) happens immediately and everything
downstream reads the raw zone, exactly like the reference.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..operators.spotify import PLAYLIST_SCHEMA

FetchFn = Callable[[str], dict[str, Any]]


def fetch_playlist(
    spark: SparkSession,
    playlist_url: str,
    fetch_page: FetchFn,
    *,
    paginate: bool = False,
    next_page: Callable[[dict[str, Any]], dict[str, Any] | None] | None = None,
) -> DataFrame:
    """Fetch playlist pages driver-side → DataFrame(PLAYLIST_SCHEMA).

    The reference fetches ONLY the first page (no sp.next —
    spotifyextract.py:74); paginate=True is the generalization.
    """
    pages = [fetch_page(playlist_url)]
    if paginate and next_page is not None:
        while (nxt := next_page(pages[-1])) is not None:
            pages.append(nxt)
    rows = [(p.get("items", []),) for p in pages]
    return spark.createDataFrame(rows, schema=PLAYLIST_SCHEMA)

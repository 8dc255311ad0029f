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
    max_pages: int = 1000,
) -> DataFrame:
    """Fetch playlist pages driver-side → DataFrame(PLAYLIST_SCHEMA).

    The reference fetches ONLY the first page (no sp.next —
    spotifyextract.py:74); paginate=True is the generalization.

    CAPACITY CONTRACT: this is the DRIVER-SIDE ingest — every fetched
    row passes through driver memory in createDataFrame, which is fine
    for its purpose (one playlist, pages of ≤100 items) and wrong for
    catalog-scale crawls. Pages are consumed one at a time (only their
    item payloads are retained, never the full page chain), and
    max_pages bounds the walk LOUDLY — a paginator that never
    terminates, or a corpus-sized crawl, must not silently accrete on
    the driver. Beyond the cap, the scale path is the one the repo
    already ships: land each page to the raw zone as fetched (S2) and
    read it back through the spotify_playlist DataSource, where page
    parsing runs on executors.
    """
    rows: list[tuple] = []

    def _consume(page: dict[str, Any]) -> dict[str, Any]:
        rows.append((page.get("items", []),))
        return page

    page = _consume(fetch_page(playlist_url))
    if paginate and next_page is not None:
        while (nxt := next_page(page)) is not None:
            if len(rows) >= max_pages:
                raise RuntimeError(
                    f"fetch_playlist walked past max_pages={max_pages}; a "
                    "crawl this size belongs in the raw zone + the "
                    "spotify_playlist DataSource, not driver memory"
                )
            page = _consume(nxt)
    return spark.createDataFrame(rows, schema=PLAYLIST_SCHEMA)

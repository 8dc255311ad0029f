## 2. Operator inventory

### 2.1 Operators the reference actually implements

Every dataflow operator in the reference, exhaustively. Language is Python
throughout (pandas for table ops, stdlib/json for parsing, SDK calls for IO).

| # | Operator | What it does | Signature (as implemented) | file:line | ~LoC | Spark primitive it maps to |
| --- | --- | --- | --- | --- | --- | --- |
| S1 | **REST API source scan** | Fetches one page (≤100 items) of playlist tracks from Spotify Web API using client-credentials OAuth | `sp.playlist_tracks(url) -> dict` | `spotifyextract.py:61-74` | 14 | No built-in REST source. Driver-side fetch + `spark.createDataFrame([data], schema)`, or a custom `DataSource` (PySpark 4 Python data source API). In this repo's test harness: `spark.read.parquet(sf_dir + "/<table>.parquet")` per `/root/repo/TESTDATA.md` |
| S2 | **JSON blob sink** (raw zone) | Serializes API response dict to indented JSON; writes one timestamped object `to_be_processed/spotify_raw_<ts>.json`, overwrite=true | `json.dumps(data, indent=2)` + `blob_client.upload_blob` | `spotifyextract.py:92-101` | 10 | `df.write.mode("overwrite").json(path)`, or `to_json(struct(*))` + text sink; timestamped naming → partition dir or filename via `date_format(current_timestamp(), 'yyyyMMddHHmmss')` |
| S3 | **File-arrival streaming source** (blob trigger) | Fires transform once per new blob matching `raw/to_be_processed/{name}`; delivers content as a byte stream | `@app.blob_trigger(arg_name, path, connection)` | `spotifytransform.py:67-68` | 2 | Structured Streaming file source: `spark.readStream.schema(s).json(dir)` with `trigger(availableNow=True)` (batch-ish) or `processingTime` — one input file ≈ one micro-batch |
| S4 | **JSON parse / deserialize** | Decodes blob bytes → UTF-8 → Python dict | `json.loads(myblob.read().decode('utf-8'))` | `spotifytransform.py:79` | 1 | Done by the JSON reader itself; for string columns: `from_json(col, schema)` (+ `schema_of_json` for inference) |
| S5 | **Explode items array** | Iterates `data['items']`, emitting one output row per playlist entry (3×, once per flattener) | `for song in data['items']:` | `spotifytransform.py:29, 42, 53` | 3 | `df.select(F.explode("items").alias("item"))` |
| P1 | **Nested-field projection → albums** | Projects 5 fields from `track.album` struct incl. 2-deep `external_urls.spotify` | `make_album(data) -> list[list]` (5 cols) | `spotifytransform.py:26-37` | 12 | `select(col("item.track.album.id").alias("album_id"), ..., col("item.track.album.external_urls.spotify").alias("url"))` |
| P2 | **Nested-field projection + array-head → artists** | Projects 3 fields from **first element only** of `track.artists` array (multi-artist tracks lose artists 2..n) | `make_artist(data) -> list[list]` (3 cols) | `spotifytransform.py:39-48` | 10 | `element_at(col("item.track.artists"), 1)` then `.getField("id")` etc. (exact parity), or `explode(artists)` for the generalized form |
| P3 | **Nested-field projection → songs (fact)** | Projects 8 fields spanning three nesting levels: track scalars, item-level `added_at`, FK ids from `album`/`artists[0]` | `make_song(data) -> list[list]` (8 cols) | `spotifytransform.py:50-64` | 15 | one `select` mixing `item.track.*`, `item.added_at`, `item.track.album.id`, `element_at(item.track.artists,1).id` |
| P4 | **Column naming / schema attach** | Binds positional rows to named columns | `pd.DataFrame(rows, columns=[...])` | `spotifytransform.py:91, 94, 97` | 3 | `.alias()` per column in the `select`; `toDF(*names)` |
| C1 | **String→timestamp cast** | Parses ISO-8601 `added_at` (`2023-01-01T12:00:00Z`) | `pd.to_datetime(song_df['added_date'])` | `spotifytransform.py:92` | 1 | `to_timestamp(col("added_date"))` (ISO-8601 is the default pattern) |
| C2 | **Mixed-granularity string→date cast** | Parses `release_date` that may be `YYYY`, `YYYY-MM`, or `YYYY-MM-DD` | `pd.to_datetime(album_df['release_date'])` | `spotifytransform.py:99` | 1 | `coalesce(to_date(c,'yyyy-MM-dd'), to_date(c,'yyyy-MM'), to_date(c,'yyyy'))` — needs an expression helper, not a custom type (§7) |
| D1 | **Key-dedup, keep-first — artists** | Drops duplicate `artist_id` rows, keeping first occurrence in file order, reindexing | `drop_duplicates(subset='artist_id', keep='first', ignore_index=True)` | `spotifytransform.py:95` | 1 | `dropDuplicates(["artist_id"])` (row choice arbitrary). Exact keep-first parity: `Window.partitionBy("artist_id").orderBy(F.monotonically_increasing_id())` + `row_number()==1`. Streaming: `dropDuplicatesWithinWatermark` |
| D2 | **Key-dedup, keep-first — albums** | Same on `album_id` | `drop_duplicates(subset='album_id', ...)` | `spotifytransform.py:98` | 1 | same as D1 |
| K1 | **CSV serialize** | DataFrame → header CSV string, no index, UTF-8 | `make_csv_buffer(df) -> str` | `spotifytransform.py:19-24` | 6 | `df.write.option("header", True).option("encoding","UTF-8").csv(path)`; single-object output needs `coalesce(1)` |
| K2 | **Partitioned CSV sink ×3** | Uploads each table to its own prefix `transformed_data/{song,album,artist}_data/<tbl>_transformed_<ts>.csv`, content-type text/csv, overwrite | `container_client.upload_blob(name, data, content_settings, overwrite=True)` | `spotifytransform.py:101-130` | 22 | three `df.write...csv(outdir)` calls; per-run timestamp suffix → run-scoped subdirectory |
| M1 | **Source archival (move-after-process)** | After successful writes: copy source blob `to_be_processed/<f>` → `processed/<f>`, then delete original; errors swallowed ("continue anyway", `:158`) | download → upload → delete | `spotifytransform.py:137-158` | 20 | file-source options `cleanSource=archive`, `sourceArchiveDir=.../processed` — or rely on checkpoint offsets alone (idempotent replay) |
| X1 | **Count** | Counts items for logging | `len(data.get('items', []))` | `spotifyextract.py:75` | 1 | `df.count()` / `F.size(col("items"))` |
| X2 | **Timestamp-string generation** | Wall-clock run id `%Y%m%d%H%M%S` for output names | `datetime.now().strftime(...)` | `spotifyextract.py:92`; `spotifytransform.py:102` | 2 | `date_format(current_timestamp(), 'yyyyMMddHHmmss')` |
| X3 | **Path string concat** | f-string assembly of blob keys | f-strings | `spotifyextract.py:93-94`; `spotifytransform.py:103-105,141-142` | 6 | `concat` / `format_string`; or plain Python in the driver (paths are driver-side) |
| X4 | **String split / last element** | Derives bare filename from full blob path | `myblob.name.split('/')[-1]` | `spotifytransform.py:140` | 1 | `element_at(split(col, '/'), -1)`; driver-side: `os.path.basename` |
| O1 | **HTTP trigger (entry point)** | GET `/api/spotify` starts extraction | `@app.route(route="spotify", methods=["GET"])` | `spotifyextract.py:27-28` | 2 | Not a data operator — job-submission surface. Engine exposes `entry(spark)` / `queries()` callables (`/root/repo/__spark_entry__.py:17-28`) |
| O2 | **Pipeline composition/registration** | Registers extract + transform on one app | `register_spotify_ingestion(app)`; `register_spotify_transformation(app)` | `function_app.py:8-11` | 4 | module-level registry dict → `queries()` |
| O3 | **Config from environment** | CLIENT_ID / CLIENT_SECRET / connection string / container name with default `"raw"` | `os.environ.get(...)` | `spotifyextract.py:12-15`; `spotifytransform.py:14-17` | 8 | `spark.conf` / constructor params |
| O4 | **Stage-wise error handling** | try/except per stage → HTTP 4xx/5xx or raise (retry); archival errors suppressed | nested try/except | `spotifyextract.py:43-124`; `spotifytransform.py:77-163` | ~40 | Spark task retries + structured-streaming restart-from-checkpoint; `foreachBatch` try/except for sink-stage policies |

**Notable reference quirks** (semantics decisions for us, all cited):
- Only the **first page** of the playlist is fetched — no pagination via
  `sp.next(data)` (`spotifyextract.py:74`). Per-run input is ≤100 rows.
- Only **artists[0]** is kept (`spotifytransform.py:43-45,61`) — a lossy
  array-head projection, not an explode. We reproduce it exactly and offer
  the explode variant as the generalization.
- Dedup is **per-file only** — no cross-run state, so the same artist
  re-appears in every run's output (`spotifytransform.py:95,98`). The
  streaming generalization is watermarked dedup.
- Archival is **non-atomic copy+delete** with errors swallowed
  (`spotifytransform.py:156-158`) → at-least-once, possible double-process.
- Dead module-level `app = func.FunctionApp()` instances in both function
  modules (`spotifyextract.py:10`, `spotifytransform.py:12`) are shadowed by
  `function_app.py:8`; no behavior.
- README's `local.settings.json` uses misspelled `STORAGE_CONNNECTION_STRING`
  (`Readme.MD:88`) while code reads `AzureWebJobsStorage`
  (`spotifyextract.py:14`) — config docs bug, not a semantic.

### 2.2 Operator surface implied by the data model (the "query capabilities" to provide)

The reference's output is a join-ready star schema produced explicitly "for
further analysis" (`Readme.MD:3`), with FKs planted at
`spotifytransform.py:60-61` and documented at `Readme.MD:198-199`. The
driver contract (`/root/repo/__spark_entry__.py`, `/root/repo/TESTDATA.md`)
checks this analytical surface against a DuckDB oracle on a TPC-H-ish star
schema. None of these exist as code in the reference — **all are Spark
built-ins**, zero custom work:

| Category | Representative ops (all built-in Spark) | Grounding in reference |
| --- | --- | --- |
| Filters/predicates | `df.filter(...)`; =, <, >, BETWEEN, IN, LIKE, IS NULL, AND/OR/NOT | filtering the fact table (e.g., popularity thresholds) is the first analysis on `songs` (`Readme.MD:191-199`) |
| Joins | `df.join(dim, key, how)` — broadcast (dims are tiny: ≤50 artists/albums per run), sort-merge for fact-fact; inner/left/semi/anti | FK design `spotifytransform.py:60-61` |
| Aggregations | `groupBy().agg(count, sum, avg, min, max, countDistinct, approx_count_distinct)`; `rollup`/`cube`/`GROUPING SETS` | dedup D1/D2 is already a degenerate first-row-per-group aggregate |
| Window functions | `Window.partitionBy().orderBy().rowsBetween()`; `row_number`, `rank`, `dense_rank`, `lag`, `lead`, running sums | keep-first dedup parity is literally `row_number()==1` (D1) |
| Sort / limit / top-k | `orderBy().limit(k)` (TakeOrderedAndProject) | "Top 50" chart semantics of the source playlist (`spotifyextract.py:71-73`) |
| Set ops | `union`/`unionByName`, `intersect`, `except`, `distinct` | multi-run outputs with identical schema (`spotifytransform.py:103-105`) union naturally |
| Scalar functions | string (`split`, `concat`, `lower`, `substring`, `regexp_extract`), date (`to_date`, `date_format`, `year`, `datediff`), math, conditional (`when`/`coalesce`), array (`explode`, `element_at`, `size`), json (`from_json`, `to_json`, `get_json_object`) | C1/C2/S4/S5/P2/X2-X4 above are instances |
| Streaming | watermarks, tumbling/sliding/session windows (`window()`, `session_window()`), `dropDuplicatesWithinWatermark`, late-data handling, `foreachBatch` sinks | S3/M1/D1 are the batch shadows of these |
| UDF surface | `udf`, `pandas_udf` (scalar/grouped-agg/map), `applyInPandas` | the whole pandas transform stage (`spotifytransform.py:86-99`) is what `applyInPandas` distributes |
| North-star extensions (BASELINE.json) | near-dup/dedup, similarity search over `embeddings` (cosine via `F.zip_with`/pandas_udf), text analysis over `documents` (tokenize/`regexp`/length stats) | generalizes D1/D2; testdata ships `documents`/`embeddings` tables |

---

## 3. Query lifecycle

The reference has exactly two runtime entry points plus a registration path.


"""Deduplication operators (north-star extensions): exact hash dedup,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Generalizes the reference's key-dedup D1/D2
(/root/reference/spotifytransform.py:95,98) from exact-key to
content/near-duplicate semantics.

Scale notes (100 TB):
- exact dedup: hash-groupBy with map-side partial agg; one shuffle on
  the content hash.
- MinHash signatures: computed in ONE aggregation with 16 min()
  columns (no hash-family cross-join, no extra shuffle); LSH banding
  turns all-pairs O(n²) into a bucket-join on (band, sig).
- SimHash: entirely row-local nested fold — zero shuffles for
  signatures.
- n-gram Jaccard: exact verification path, only ever run on LSH
  candidates or bounded probe sets (all-pairs does not scale and is
  deliberately restricted here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import (
    MAX_CHECKPOINT_ENTRIES,
    checkpoint_frame,
    dataset_cached,
    release,
    scatter,
    scatter_by,
    scratch_roots,
    table,
)
from ..functions.hashing import (
    MINHASH_N_BANDS as N_BANDS,
    MINHASH_PARAMS,
    MINHASH_ROWS_PER_BAND,
    PRIME48,
    hex_int48,
    md5_int48,
    sql_hex_int48,
    sql_md5_int48,
)
from ..registry import register

SIMHASH_BITS = 48

# LSH bucket-width cap (both engines): a cluster of k near-identical
# documents shares a (band, sig) bucket in EVERY band, and all-pairs
# in-bucket expansion is k²/2 — at web scale, boilerplate duplicated
# 10⁵+ times would make k²-row stragglers (and >2³¹-element pair
# arrays, were pairs ever array-expanded from an unbounded bucket). A
# bucket wider than the cap therefore emits a STAR CHAIN instead of
# all-pairs: one (min_id, member) pair per other member — O(k) pairs
# that still link every member to a single representative, so
# connected-components merges the whole cluster and filtered-corpus
# keeps exactly one copy (a cluster of >cap near-identical-but-not-
# byte-identical docs — templated boilerplate differing by a token —
# is NOT caught by dedup_exact, so silently dropping hot buckets would
# keep every copy). Pairwise similarity detail inside a hot bucket is
# deliberately not materialized (it is k²). The index itself stores
# NO per-bucket arrays at all (a hot bucket's ids array would be a
# multi-GB single row at web scale — the collect_list aggregation
# buffer alone grows with k): it is a POSTING TABLE (doc_id, band,
# sig) plus derived O(1)-wide rows; only ≤cap buckets are ever
# collected, and only transiently during pair expansion.
MINHASH_BUCKET_CAP = 64

# SimHash packed-popcount capacity: each 16-bit field carries a
# popcount ≤ n_tokens; past ~2^15 tokens a skewed doc overflows int64
# (loud under ANSI) or carries between fields while STAYING inside
# int64 (silently wrong signature). Both engines emit NULL past this
# bound, and the Spark side slices the token array to MAX+1 entries
# BEFORE aggregation so the packed SUM itself can never overflow:
# worst case (MAX+1)·(2⁴⁸+2³²+2¹⁶+1) ≈ 2^62 < 2^63. A real corpus
# pre-chunks longer docs (books) before signature time.
SIMHASH_MAX_TOKENS = 16383


# ---------------------------------------------------------------------------
# Shared shingling (3-token n-grams, distinct per doc — row-local distinct)
# ---------------------------------------------------------------------------
def _shingle_array() -> Column:
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    return F.array_distinct(grams)


def _shingles(docs: DataFrame) -> DataFrame:
    return (
        scatter(docs)
        .filter(F.size(F.split(F.col("text"), " ")) >= 3)
        .select("doc_id", F.explode(_shingle_array()).alias("sh"))
    )


_SQL_SHINGLES = """
  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents {where})
  WHERE LEN(t) >= 3
"""


def _bucket_pairs(grouped: DataFrame) -> DataFrame:
    """Expand each bucket row into ordered doc pairs.

    grouped must carry an ascending-sorted ``ids`` array column. Emits
    one row per (doc_a < doc_b) pair within a bucket. Pair expansion is
    row-local codegen'd array work; every caller BOUNDS bucket width
    BEFORE the ids array is ever collected (the n-gram index DF-prunes
    at NGRAM_DF_CAP; the MinHash index build collects only buckets a
    width-stats semi-join proved ≤ MINHASH_BUCKET_CAP wide), so both
    the collect_list aggregation buffer and the flattened pair array
    per row stay ≤ cap resp. cap²/2 — unbounded widths would hit the
    JVM's 2³¹ array-element limit on boilerplate duplicated at web
    scale.
    """
    return grouped.select(F.explode(_all_pairs_expr(F.col("ids"))).alias("p")).select(
        "p.doc_a", "p.doc_b"
    )


def _all_pairs_expr(ids: Column) -> Column:
    """Row-local (doc_a < doc_b) pair-struct array over an
    ascending-sorted id array — THE all-pairs expansion behind
    _bucket_pairs, kept separate so the slice arithmetic and struct
    field order exist exactly once."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle="""
SELECT MD5(text) AS text_md5, MD5('x' || text) AS text_md5_salted,
       MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY MD5(text), MD5('x' || text)
""",
    tags=("dedup", "exact"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: hash-groupBy on the content identity, keep
    min doc_id.

    The identity is the PAIR (md5(text), md5('x' || text)), not md5
    alone: engineered MD5 collisions (distinct bytes, equal digest)
    circulate in crawled corpora, and a single-hash groupBy would
    silently merge two different documents — dropping one of them in
    any keep-the-keeper consumer — with the oracle agreeing. The known
    collision constructions are block-aligned (Merkle–Damgård: a
    collision survives any common SUFFIX and any whole-block common
    prefix), so a one-byte prefix shifts every block boundary and the
    salted digest disagrees on them. The salt is plain string concat —
    byte-identical on both engines, unlike REVERSE, whose
    grapheme-vs-codepoint semantics differ between DuckDB and Spark on
    combining marks/emoji. A SIMULTANEOUS collision of both digests has
    no known construction. Still one shuffle, map-side partial agg.
    """
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy(
        F.md5("text").alias("text_md5"),
        F.md5(F.concat(F.lit("x"), F.col("text"))).alias("text_md5_salted"),
    ).agg(
        F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------
def _minhash_bands_cte() -> str:
    """The shared DuckDB CTE chain ending in ``bands`` (doc_id, band,
    sig) — the oracle mirror of _band_signatures, reused by every
    MinHash-family oracle so the signature pipeline exists once."""
    mins = ",\n         ".join(
        f"MIN((({a} * x1) % {PRIME48} + x2 + {b}) % {PRIME48}) AS mh_{j}"
        for j, (a, b) in enumerate(MINHASH_PARAMS)
    )
    band_selects = []
    for k in range(N_BANDS):
        cols = range(k * MINHASH_ROWS_PER_BAND, (k + 1) * MINHASH_ROWS_PER_BAND)
        sig = " || ',' || ".join(f"CAST(mh_{j} AS VARCHAR)" for j in cols)
        band_selects.append(f"SELECT doc_id, {k} AS band, {sig} AS sig FROM minhash")
    bands = "\n  UNION ALL ".join(band_selects)
    return f"""shingles AS ({_SQL_SHINGLES.format(where="")}),
hexed AS (
  SELECT doc_id, MD5(sh) AS hx FROM shingles
),
hashed AS (
  SELECT doc_id, {sql_hex_int48("hx", 1)} AS x1, {sql_hex_int48("hx", 13)} AS x2
  FROM hexed
),
minhash AS (
  SELECT doc_id,
         {mins}
  FROM hashed GROUP BY doc_id
),
bands AS (
  {bands}
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_minhash_bands_cte()},
stats AS (
  SELECT band, sig, COUNT(*) AS width, MIN(doc_id) AS mn
  FROM bands GROUP BY 1, 2
),
kept AS (
  SELECT b.doc_id, b.band, b.sig FROM bands b
  JOIN stats w ON b.band = w.band AND b.sig = w.sig
  WHERE w.width <= {MINHASH_BUCKET_CAP}
),
raw_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a
  JOIN kept b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  UNION ALL
  SELECT s.mn AS doc_a, b.doc_id AS doc_b
  FROM bands b
  JOIN stats s ON b.band = s.band AND b.sig = s.sig
  WHERE s.width > {MINHASH_BUCKET_CAP} AND b.doc_id <> s.mn
)
SELECT doc_a, doc_b, COUNT(*) AS n_shared_bands
FROM raw_pairs
GROUP BY 1, 2
"""


def _band_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig) LSH banding rows: shingle → ONE md5 → two
    independent 48-bit slices (x1, x2) → 16 minhashes in ONE
    aggregation (partial agg map-side) → 8 bands of 2 exploded
    row-locally. The two-slice affine family keeps shingle identity at
    96 md5 bits (see MINHASH_PARAMS in functions/hashing.py for the
    collision analysis); md5 is computed once in its own projection so
    neither engine re-hashes per slice. SQL-string construction (one
    py4j call per F.expr) — identical plan, ~6× cheaper driver-side
    build than per-Column operator calls."""
    hexed = _shingles(docs).select("doc_id", F.md5("sh").alias("hx"))
    hashed = hexed.select(
        "doc_id",
        hex_int48(F.col("hx"), 1).alias("x1"),
        hex_int48(F.col("hx"), 13).alias("x2"),
    )
    minhash = hashed.groupBy("doc_id").agg(
        *[
            F.expr(f"MIN((({a} * x1) % {PRIME48} + x2 + {b}) % {PRIME48}) AS mh_{j}")
            for j, (a, b) in enumerate(MINHASH_PARAMS)
        ]
    )
    band_structs = []
    for k in range(N_BANDS):
        cols = range(k * MINHASH_ROWS_PER_BAND, (k + 1) * MINHASH_ROWS_PER_BAND)
        sig = ", ".join(f"CAST(mh_{j} AS STRING)" for j in cols)
        band_structs.append(f"struct({k} AS band, concat_ws(',', {sig}) AS sig)")
    return minhash.select(
        "doc_id", F.explode(F.expr(f"array({', '.join(band_structs)})")).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.sig").alias("sig"))


_MINHASH_INDEX_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _minhash_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Build (or fetch) the LSH index: (bands, pairs), both eagerly
    localCheckpoint'd once per (dataset identity, Spark application).

    - ``bands`` (doc_id, band, sig): the signature POSTING TABLE. Every
      row is O(1) wide — deliberately NOT per-bucket id arrays, whose
      collect_list aggregation buffer and single-row payload both grow
      with bucket width (a web-scale boilerplate bucket of 5×10⁸
      members would be a multi-GB row, and past 2³¹ members a hard JVM
      array limit).
    - ``pairs`` (doc_a, doc_b): the raw candidate pair stream, one row
      per shared band — all-pairs for buckets ≤ MINHASH_BUCKET_CAP
      (collected transiently AFTER a width-stats semi-join proves them
      narrow), a star chain (bucket-min → member) above it.

    Index BUILD is separated from candidate SEARCH exactly as the ANN
    paths do (_lsh_index/_ivf_index): the shingle→minhash→banding
    pipeline runs once per corpus version; every consumer (the candidate
    query itself, connected components, filtered-corpus, incremental
    delta dedup) starts from a materialized table. At cluster scale
    these are materialized signature/candidate tables — the standard
    shape for corpus dedup, where signatures are computed once per
    snapshot and reused across dedup, clustering, and incremental
    joins. Identity/eviction semantics are catalog.dataset_cached's
    (supersession releases the old checkpoints).
    """

    def build() -> tuple[DataFrame, DataFrame]:
        bands = checkpoint_frame(_minhash_bands_frame(spark, sf_dir), "minhash_bands")
        pairs = checkpoint_frame(_minhash_pairs_frame(bands), "minhash_pairs")
        return (bands, pairs)

    return dataset_cached(
        _MINHASH_INDEX_CACHE,
        spark,
        sf_dir,
        ("documents.parquet",),
        build,
        max_entries=MAX_CHECKPOINT_ENTRIES,
    )


def _minhash_bands_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRE-checkpoint logical plan of the banding build, exposed
    separately so plan-quality tests can assert on the build pipeline —
    checkpointing truncates lineage to an RDD scan, hiding the build's
    joins/shuffles from every explain-based check."""
    return _band_signatures(table(spark, sf_dir, "documents"))


def _minhash_pairs_frame(bands: DataFrame) -> DataFrame:
    """Raw candidate pairs from a (checkpointed) bands posting table.

    Width stats first (count + min per bucket — O(1)-wide rows, no
    arrays): buckets proven ≤ MINHASH_BUCKET_CAP by a semi-join are
    collected into ≤cap arrays and expanded all-pairs row-locally;
    wider buckets stream a star chain from a keyed join against their
    single stats row (min → each member), never materializing a hot
    bucket in one row. ``bands`` must be materialized (checkpointed) —
    Spark shares no subplans, so an un-checkpointed frame would re-run
    the signature pipeline for each of the three consumers here. The
    stats frame goes through checkpoint_frame for the same reason:
    both the small and star legs consume it, and without the
    truncation the full-posting-table stats shuffle runs twice per
    index build (verified in the executed plan — no ReusedExchange
    dedups it). checkpoint_frame rather than a bare localCheckpoint so
    the durable-index mode covers the BUILD too: a mid-build executor
    loss of lazily-checkpointed stats blocks has no recompute path and
    would abort the whole build — the failure class the durable store
    exists to remove. Its build shape stays explain-visible via
    _minhash_stats_frame.
    """
    stats = checkpoint_frame(_minhash_stats_frame(bands), "minhash_stats")
    small = (
        bands.join(
            stats.filter(
                (F.col("width") > 1) & (F.col("width") <= MINHASH_BUCKET_CAP)
            ).select("band", "sig"),
            ["band", "sig"],
        )
        .groupBy("band", "sig")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
    )
    star = (
        bands.join(
            stats.filter(F.col("width") > MINHASH_BUCKET_CAP).select(
                "band", "sig", "mn"
            ),
            ["band", "sig"],
        )
        .filter(F.col("doc_id") != F.col("mn"))
        .select(F.col("mn").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return _bucket_pairs(small).unionByName(star)


def _minhash_stats_frame(bands: DataFrame) -> DataFrame:
    """Per-bucket width stats (band, sig, width, mn) — O(1)-wide rows,
    no arrays. Split out so plan tests can assert on the aggregation's
    shape (its consumer lazily checkpoints it, which truncates the
    lineage explain-based checks would otherwise see)."""
    return bands.groupBy("band", "sig").agg(
        F.count(F.lit(1)).alias("width"), F.min("doc_id").alias("mn")
    )


@register("dedup_minhash_lsh", oracle=_minhash_oracle(), tags=("dedup", "minhash", "lsh"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → 16 minhashes → 8 bands
    of 2 → (band, sig) posting table → per-bucket pair stream.

    The 16-hash signature is ONE aggregation (16 min() columns, partial
    agg map-side); banding replaces the O(n²) all-pairs scan. Both the
    posting table and the raw pair stream are cached per-corpus index
    frames (_minhash_index); the query itself is one bounded groupBy
    over the materialized pair stream. Buckets wider than
    MINHASH_BUCKET_CAP contribute a star chain instead of all-pairs —
    O(k) representative pairs that keep every member of a hot
    boilerplate cluster linked for connected-components without the k²
    blow-up.
    """
    _, pairs = _minhash_index(spark, sf_dir)
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_shared_bands")
    )


# ---------------------------------------------------------------------------
# SimHash signatures
# ---------------------------------------------------------------------------
def _simhash_oracle() -> str:
    tokhash = sql_md5_int48("t")
    return f"""
SELECT doc_id,
       CASE WHEN LEN(harr) > {SIMHASH_MAX_TOKENS} THEN NULL ELSE
       LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
         LIST_TRANSFORM(RANGE(0, {SIMHASH_BITS}), j ->
           CASE WHEN LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
                  LIST_TRANSFORM(harr, h -> ((h // (CAST(1 AS BIGINT) << j)) % 2) * 2 - 1)),
                  (s, v) -> s + v) > 0
                THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)),
         (a, b) -> a + b) END AS simhash
FROM (
  SELECT doc_id, LIST_TRANSFORM(STRING_SPLIT(text, ' '), t -> {tokhash}) AS harr
  FROM documents
)
"""


@register("dedup_simhash", oracle=_simhash_oracle(), tags=("dedup", "simhash"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash signature per document.

    Implementation: explode tokens → hash once per token → 12 packed
    SUM aggregates, each carrying four 16-bit per-bit popcounts in one
    long (bit 4k+i lives at field i·16 of packed sum k) → unpack and
    reassemble bits row-locally. Versus the naive 48 SUM(±1) columns
    this quarters the per-row aggregate update work (measured
    0.87 s → 0.61 s at sf0.1); versus a nested higher-order-function
    fold (shuffle-free but interpreted — HOF lambdas skip whole-stage
    codegen) it measured ~5× faster. Since r11 the plan carries ONE
    exchange total: the small-input parallelism repair is
    scatter_by(docs, "doc_id"), whose hashpartitioning the
    groupBy(doc_id) reuses (guide §2.4), so the packed aggregation
    runs as a single in-stage pass with no second shuffle — measured
    0.88 → 0.46 s median at sf0.1 and 1.10 → 0.74 s at sf1, beyond
    spread, results bit-identical (scripts/measure_simhash_ab.py).

    Capacity: each 16-bit field holds a popcount ≤ 65535 and the packed
    sum stays below 2^63 for ≤ 32767 tokens per document — far above
    any real document here; a longer doc needs per-doc pre-chunking.

    The per-bit balance is 2·ones_j − n (same sign as the oracle's
    SUM(±1)); shiftright/`% 2` extraction is exact on the non-negative
    48-bit hash, matching the oracle's `(h // 2^j) % 2`.
    """
    return _simhash_plan(spark, sf_dir)


def _simhash_plan(
    spark: SparkSession, sf_dir: str, keyed_scatter: bool = True
) -> DataFrame:
    """dedup_simhash's plan with the parallelism-repair shuffle's
    keying exposed for measured A/Bs (``keyed_scatter=False`` is the
    pre-r11 round-robin shape, kept as the comparator)."""
    docs = table(spark, sf_dir, "documents")
    # Cap the aggregation's input at MAX+1 tokens per doc BEFORE any
    # hashing: bounds the packed SUM away from int64 overflow regardless
    # of content, while the n-guard below still detects oversized docs
    # (their capped count is MAX+1). The cap is a position filter on
    # posexplode output — not an array slice, which would materialize a
    # second token array per doc (measured +20% on this, the slowest
    # headline query); the generator emits rows straight into a codegen'd
    # row filter and only surviving tokens reach md5.
    # The parallelism-repair shuffle is KEYED by doc_id (r11): the
    # packed-popcount groupBy(doc_id) below reuses its partitioning, so
    # the plan drops from 2 Exchanges + partial/final agg to 1 Exchange
    # + one Complete-mode agg (guide §2.4), and the keyed repartition
    # skips round-robin's sortBeforeRepartition pass. doc_id is unique,
    # so hash balance matches round-robin's.
    src = scatter_by(docs, "doc_id") if keyed_scatter else scatter(docs)
    tok = (
        src
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "t"))
        .filter(F.col("pos") <= SIMHASH_MAX_TOKENS)
    )
    hashed = tok.select("doc_id", md5_int48(F.col("t")).alias("h"))
    n_packs = SIMHASH_BITS // 4
    # The wide expressions are built as SQL strings (ONE py4j call per
    # F.expr) rather than hundreds of Column-operator calls: the
    # resulting Catalyst plan is identical, but driver-side plan
    # construction drops from ~1.5 s to ~0.1 s per invocation — real
    # per-query latency in any interactive use.
    packs = [
        "SUM("
        + " + ".join(
            f"(shiftright(h, {4 * k + i}) % 2) * {1 << (16 * i)}" for i in range(4)
        )
        + f") AS p_{k}"
        for k in range(n_packs)
    ]
    packed = hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), *[F.expr(p) for p in packs]
    )
    bits = []
    for j in range(SIMHASH_BITS):
        k, i = divmod(j, 4)
        bits.append(
            f"CASE WHEN (shiftright(p_{k}, {16 * i}) % 65536) * 2 > n "
            f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    sig = F.expr(" + ".join(bits))
    # Capacity guard, enforced not just documented: each packed 16-bit
    # field holds a popcount ≤ n, so n > 32767 can overflow int64 on a
    # skewed doc (loud under ANSI) — and n in (32768, 65535] can carry
    # into the NEXT field while staying inside int64: a SILENTLY wrong
    # signature. Docs past the bound get NULL on BOTH engines; a real
    # corpus pre-chunks them (books) before signature time.
    guarded = F.when(F.col("n") <= SIMHASH_MAX_TOKENS, sig)
    return packed.select("doc_id", guarded.alias("simhash"))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (verification path, bounded probe set)
# ---------------------------------------------------------------------------
# Document-frequency cap: a shingle shared by more than this many docs is
# dropped from the vocabulary BEFORE pair expansion (on both engines). A
# stop-shingle bucket of size k expands to k² pairs — at 100 TB that is a
# straggler/OOM — and a shingle shared by thousands of docs carries no
# similarity signal anyway (standard DF pruning).
NGRAM_DF_CAP = 32

_NGRAM_INDEX_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _ngram_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Build (or fetch) the DF-pruned shingle inverted index over the
    bounded probe subset (doc_id % 5 = 0): (sh, ids) with ids sorted,
    buckets wider than NGRAM_DF_CAP dropped — plus the per-doc sizes
    (doc_id, sz) over the PRUNED vocabulary. Both eagerly
    localCheckpoint'd once per (dataset identity, Spark application) —
    the same build/search split as _minhash_index: one groupBy builds
    the inverted index AND implicitly the DF counts (bucket width),
    pruning happens BEFORE any quadratic pair expansion (bounded
    fan-out: ≤ CAP²/2 pairs per bucket), and sizes come from
    re-exploding the kept buckets at build time — no second corpus
    pass, and the query plan never recomputes them (Spark does not
    share subplans, so two broadcast consumers would otherwise shuffle
    twice). At cluster scale these are materialized posting-list /
    doc-stat tables keyed on the corpus snapshot. Identity/eviction
    semantics are catalog.dataset_cached's."""

    def build() -> tuple[DataFrame, DataFrame]:
        kept = checkpoint_frame(_ngram_index_frame(spark, sf_dir), "ngram_index")
        sizes = checkpoint_frame(
            kept.select(F.explode("ids").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("sz")),
            "ngram_sizes",
        )
        return (kept, sizes)

    return dataset_cached(
        _NGRAM_INDEX_CACHE, spark, sf_dir, ("documents.parquet",), build,
        max_entries=MAX_CHECKPOINT_ENTRIES,
    )


def _ngram_index_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRE-checkpoint plan of the pruned inverted-index build (see
    _minhash_bands_frame for why this is exposed).

    Width BEFORE collection (the same discipline as
    _minhash_pairs_frame): df comes from a count window over the
    ``sh`` partitioning and over-cap rows are filtered BEFORE any
    collect_list, so the aggregation buffer and the ids array are both
    ≤ NGRAM_DF_CAP — collecting first and filtering on size after
    would build a hot stop-shingle's full ids array (a 10⁸-member
    boilerplate shingle is a multi-GB single aggregation buffer, and
    past 2³¹ members a hard JVM array limit) just to throw it away.
    The window buffers one shingle's rows in a spillable sorter, never
    one JVM array, and the subsequent groupBy reuses the window's
    hash partitioning — one shuffle total, same as the old shape.
    """
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    sh = _shingles(docs).withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
    )
    return (
        sh.filter(F.col("df") <= NGRAM_DF_CAP)
        .groupBy("sh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH raw_shingles AS ({_SQL_SHINGLES.format(where="WHERE doc_id % 5 = 0")}),
df AS (SELECT sh, COUNT(*) AS df FROM raw_shingles GROUP BY sh),
shingles AS (
  SELECT s.doc_id, s.sh FROM raw_shingles s JOIN df USING (sh)
  WHERE df.df <= {NGRAM_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.02
""",
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity over a bounded probe subset.

    Inverted-index formulation: group docs by shingle (one shuffle),
    DF-prune buckets above NGRAM_DF_CAP (both engines — a hot
    stop-shingle bucket is quadratic, and a shingle shared that widely
    has no similarity signal), expand in-bucket pairs, count pair
    occurrences = |A∩B| over the pruned vocabulary. Sizes come
    from a cheap per-doc count and broadcast-join onto the (small) pair
    set. jaccard = |A∩B| / (|A|+|B|-|A∩B|) — integer counts, so the
    double division is bit-identical across engines. All-pairs Jaccard
    is the LSH verification path, never a full-corpus scan.
    """
    kept, sizes = _ngram_index(spark, sf_dir)
    buckets = kept.filter(F.size("ids") > 1)
    inter = _bucket_pairs(buckets).groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    # sizes is one row per probe doc — linear in the corpus — so the
    # attach joins are left to AQE (broadcast while small, shuffle at
    # scale); a forced hint would die at the 8 GB broadcast bound.
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sa_sz"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("sb_sz"))
    jac = F.col("n_common").cast("double") / (
        F.col("sa_sz") + F.col("sb_sz") - F.col("n_common")
    )
    return (
        inter.join(sa, F.col("da") == F.col("doc_a"))
        .join(sb, F.col("db") == F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.02)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (candidate-guarded exact verification)
# ---------------------------------------------------------------------------
# τ picked so the synthetic near-orthogonal corpus yields a non-empty
# pair set at test SFs (top within-cell cosines ≈ 0.49) — an empty
# result would make the parity row a vacuous check.
EMB_COSINE_TAU = 0.4
SEMDEDUP_K_MIN = 8  # codebook floor: keeps tiny fixtures on a stable shape
SEMDEDUP_TAU = 0.5  # drop a vector whose max cosine to a lower-id cellmate ≥ τ


def _semdedup_k(n: int) -> int:
    """Codebook size for an n-vector corpus: K = max(8, ⌊√(n/2) + 0.5⌋).

    K balances assignment cost O(N·K) against in-cell pair cost
    O(Σ cell²) ≈ O(N²/K); d/dK[N·K + N²/2K] = 0 at K = √(N/2). This
    CANNOT be a constant: round 6's 100x scale probe (200k vectors)
    showed K=8 makes cells N/8 wide and the pair stream N²/16 ≈ 2.5
    BILLION rows — the within-cell join filled 78 GB of executor spill
    and aborted; at K=√(N/2) the same corpus enumerates ~63M pairs.
    floor(x + 0.5) rather than Python round(): both engines evaluate
    the same correctly-rounded IEEE sqrt, and half-away-from-zero on
    it matches the oracle's FLOOR(...+0.5) exactly, while Python's
    banker's rounding does not."""
    import math

    return max(SEMDEDUP_K_MIN, int(math.floor(math.sqrt(n / 2.0) + 0.5)))


# Oracle mirror of _semdedup_k over the embeddings view: the SAME
# IEEE sqrt of the SAME exact integer-halving, floored the same way.
_SQL_SEMDEDUP_K = (
    f"(SELECT GREATEST({SEMDEDUP_K_MIN}, "
    "CAST(FLOOR(SQRT(COUNT(*) / 2.0) + 0.5) AS BIGINT)) FROM embeddings)"
)


_SEMDEDUP_MEMBER_CACHE: dict[tuple, DataFrame] = {}


def _semdedup_member(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster): broadcast-codebook nearest-centroid
    assignment. Checkpointed once per dataset (catalog.dataset_cached):
    Spark does not share subplans, so the two consumers inside one
    SemDeDup query (cell grouping and the per-vector verdict join) —
    plus dedup_embedding_cosine's pair generation — would otherwise
    each re-run the O(N·K) codebook fold over the corpus. At cluster
    scale this is the materialized assignment table every SemDeDup
    pipeline persists."""

    return dataset_cached(
        _SEMDEDUP_MEMBER_CACHE,
        spark,
        sf_dir,
        ("embeddings.parquet",),
        lambda: checkpoint_frame(_semdedup_member_frame(spark, sf_dir), "semdedup_member"),
        params=("ksqrt2",),  # K derived from corpus size inside the build
        max_entries=MAX_CHECKPOINT_ENTRIES,
    )


def _semdedup_member_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRE-checkpoint plan of the cell-assignment build (see
    _minhash_bands_frame for why this is exposed).

    The codebook (first K = √(N/2) store rows) is BROADCAST-JOINED
    against the corpus (advanced_ops._broadcast_codebook — the shared
    coarse-quantizer shape, with the K-literal-expression alternative
    it replaced argued there) and reduced with a map-side-partial
    min(struct(neg_sim, cid)): the partial aggregate collapses each
    vector's K candidates before the shuffle, so the exchange carries
    N rows no matter how large K grows. Ranking matches the oracle's
    ROW_NUMBER() ORDER BY sim DESC, cid: min over the lexicographic
    struct (−sim_quantized, cid), on the SAME round6 cosine the
    whole family uses."""
    from .advanced_ops import _broadcast_codebook, _codebook_sim
    from .similarity import vector_store

    store = vector_store(spark, sf_dir)
    cent = _broadcast_codebook(spark, sf_dir, _semdedup_k(store.count()))
    return (
        store.crossJoin(cent)
        .select("vec_id", (-_codebook_sim()).alias("neg_sim"), "cid")
        .groupBy("vec_id")
        .agg(F.min(F.struct("neg_sim", "cid")).alias("top"))
        .select("vec_id", F.col("top").getField("cid").cast("long").alias("cluster"))
    )


# Work-granule target for the within-cell self-join: pair enumerations
# per reduce task. Each pair costs one dim-wide dot fold (~µs of
# codegen'd column arithmetic), so a 2M-pair task is seconds of CPU —
# small enough to parallelize a hot cell, large enough that salting
# never fragments a healthy cell. This is the one SEMANTIC constant of
# the salting scheme (a per-task work budget, like a split size); the
# FAN-OUT itself is derived per cell from measured widths below —
# round 6's 100x probe showed what a fixed fan-out constant does once
# data outgrows it (the K=8 codebooks: 78 GB of spill).
TARGET_CELL_PAIRS_PER_TASK = 2_000_000


def _cell_salts_expr(w):
    """Per-cell salt count DERIVED from the cell's measured width w:

        salts(w) = clamp(⌈w²/(2·TARGET_CELL_PAIRS_PER_TASK)⌉, 1, w)

    A cell of width w enumerates ~w²/2 pairs; dividing by the per-task
    pair budget spreads exactly the cells that need it (a 10⁶-member
    junk cell derives 10¹²/2 pairs ÷ 2M budget = 250,000 salts, capped
    at w = 10⁶ — see the cap) and leaves healthy ~√(2N)-wide cells
    unsalted (salts=1, no explode overhead). The UPPER clamp at w
    bounds replication: the right side replicates ×salts, so salts ≤ w
    keeps replicated rows ≤ w² ≈ 2×pairs — the fan-out can never cost
    more than the work it spreads (and salts > w is useless anyway:
    each left row owns one salt, so at most w salt values are ever
    matched). Evaluated per cluster on the broadcast width table, not
    collected to the driver.

    The width is cast to DOUBLE before squaring: a long×long square
    overflows int64 at w ≥ ~3.04e9 — under Spark 4's default ANSI mode
    that is a job-killing error in exactly the pathological-giant-cell
    regime the derivation exists for (a skew-collapsed codebook over a
    10¹⁰⁺-vector corpus). Salt counts need no integer exactness; the
    double square is exact to 2⁵³ pairs and merely approximate beyond,
    which only perturbs the task-budget rounding."""
    w_dbl = F.col(w).cast("double")
    pairs_over_budget = F.ceil(
        w_dbl * w_dbl / F.lit(2.0 * TARGET_CELL_PAIRS_PER_TASK)
    )
    return F.greatest(F.lit(1).cast("long"),
                      F.least(F.col(w).cast("long"), pairs_over_budget))


def _cell_salt_plan(member: DataFrame) -> DataFrame:
    """(cluster, salts): the broadcast salt table the cell self-join
    keys on — one row per cell (≤ K ≈ √(N/2) rows, broadcastable at
    any corpus size), widths MEASURED from the checkpointed assignment
    table with a plain count aggregate, salts derived by
    _cell_salts_expr. No driver job: the width stats ride the query
    plan as a broadcast-exchange subtree, the same pre-collection
    discipline as the MinHash width-stats semi-join."""
    return F.broadcast(
        member.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("w"))
        .select("cluster", _cell_salts_expr("w").alias("salts"))
    )


def _cell_pair_cosines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-cell candidate pairs WITH their exact cosine:
    (va, vb, cs) for va < vb in the same cell.

    The shared generator for exact-cosine work: an equi-join on cluster
    of the checkpointed cell-assignment table (vectors attached from
    the shared store BEFORE the join) with itself — cost O(Σ cell²)
    pair ROWS, never O(N²) and never a giant array: a
    collect_list-per-cell expansion (the _bucket_pairs shape) would
    materialize one array of cell²/2 structs per cluster row, which
    hits the JVM's 2³¹ array-element limit once a cell passes ~65k
    members; the join streams the same pairs. Cells stay ~√(2N) wide
    because _semdedup_k sizes the codebook as √(N/2).

    Each side CARRIES its vector and norm through the cell join, and
    the cosine is computed in the join's output pipeline — the
    quadratic pair stream is never exchanged. Round 6's 100x probe
    killed the previous shape (join bare (va, vb) ids, then attach
    vectors via two vec_id equi-joins against the store): those
    attach joins hash-partition their PROBE side, so O(Σ cell²) rows
    ~550 bytes wide went through two full shuffles — quadratic bytes
    on the wire, 78 GB of spill at 200k vectors. Carrying vectors
    makes the shuffled volume corpus-sized (N·(1+salts) store rows);
    consumers reduce the pair stream map-side (filter ≥ τ, or partial
    max per vb) before anything else is exchanged.

    Hot cells get the join_salted treatment, implemented here with a
    fan-out DERIVED from each cell's measured width (never a constant —
    the round-6 probe's lesson): a broadcast (cluster, salts) table
    (_cell_salt_plan) joins both sides map-side; the left row carries
    salt = vec_id % salts_c, the right row replicates ×salts_c via an
    exploded sequence, and the pair join keys on (cluster, salt). Every
    same-cell pair still appears exactly once (each left row owns one
    salt value; the right copy with the matching salt provides the
    pair), healthy cells pay nothing (salts_c=1, a single-element
    explode), and a pathological cell — a skew-collapsed codebook can
    funnel most of the corpus into one cell — spreads its ~w²/2 pairs
    across ⌈w²/2·budget⌉ reduce tasks instead of serializing on one.
    """
    from ..functions.vectors import dot, round6

    from .similarity import vector_store

    member = _semdedup_member(spark, sf_dir)
    store = vector_store(spark, sf_dir)
    salts = _cell_salt_plan(member)
    # Deliberately UNPERSISTED although both pair sides consume it (the
    # doubled-subtree rule's measure-first clause): the two sides
    # project differently so no ReusedExchange forms, but caching this
    # corpus-sized, vector-wide frame costs more than evaluating the
    # attach join twice — measured at sf1 (r8, interleaved 3 reps):
    # recompute 7.7 s vs persist 24.7 s end-to-end on
    # dedup_embedding_cosine; materializing N · ~550 B rows into the
    # block store dwarfs the second broadcast-salt + store hash join.
    attached = member.join(store, "vec_id").join(salts, "cluster")
    a = attached.select(
        F.col("cluster").alias("ca"),
        F.col("vec_id").alias("va"),
        (F.col("vec_id") % F.col("salts")).cast("int").alias("sa"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = attached.select(
        F.col("cluster").alias("cb"),
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
        F.explode(
            F.sequence(F.lit(0), (F.col("salts") - 1).cast("int"))
        ).alias("sb"),
    )
    cs = round6(
        dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    )
    return a.join(
        b,
        (F.col("ca") == F.col("cb"))
        & (F.col("sa") == F.col("sb"))
        & (F.col("va") < F.col("vb")),
    ).select("va", "vb", cs.alias("cs"))


def _member_cte() -> str:
    """DuckDB mirror of the broadcast-codebook cell assignment (the
    cent/assign/member CTE bodies shared by the SemDeDup-family
    oracles)."""
    from ..functions.vectors import sql_cosine6

    asim = sql_cosine6("e.embedding", "c.cemb")
    return f"""
cent AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings
         WHERE vec_id < {_SQL_SEMDEDUP_K}),
assign AS (
  SELECT e.vec_id,
         c.cid,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {asim} DESC, c.cid) AS rn
  FROM embeddings e CROSS JOIN cent c
),
member AS (SELECT vec_id, cid AS cluster FROM assign WHERE rn = 1)
"""


def _emb_cosine_oracle() -> str:
    from ..functions.vectors import sql_cosine6

    cos = sql_cosine6("ea.embedding", "eb.embedding")
    return f"""
WITH {_member_cte()},
pairs AS (
  SELECT ma.vec_id AS va, mb.vec_id AS vb
  FROM member ma
  JOIN member mb ON ma.cluster = mb.cluster AND ma.vec_id < mb.vec_id
)
SELECT p.va AS vec_a, p.vb AS vec_b, {cos} AS cos_sim
FROM pairs p
JOIN embeddings ea ON ea.vec_id = p.va
JOIN embeddings eb ON eb.vec_id = p.vb
WHERE {cos} >= {EMB_COSINE_TAU}
"""


@register("dedup_embedding_cosine", oracle=_emb_cosine_oracle(), tags=("dedup", "embedding"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, candidate-guarded.

    Exact cosine is evaluated ONLY on SemDeDup-cell candidate pairs
    (broadcast-codebook assignment → in-cell pair expansion), never
    all-pairs: pointed at a full corpus the cost is proportional to the
    candidate count, O(Σ cell²) with K sized √(N/2) from the corpus.
    Vectors ride through the cell join itself (_cell_pair_cosines) from
    the shared materialized vector store (norms folded once per corpus
    snapshot, identical doubles → bit-identical cosine), so each
    candidate pays one dot fold inside the join's output pipeline, the
    τ filter reduces the stream map-side, and the corpus parquet is
    scanned zero times per query — the quadratic pair stream never
    crosses an exchange.
    """
    return _cell_pair_cosines(spark, sf_dir).select(
        F.col("va").alias("vec_a"),
        F.col("vb").alias("vec_b"),
        F.col("cs").alias("cos_sim"),
    ).filter(F.col("cos_sim") >= EMB_COSINE_TAU)


# ---------------------------------------------------------------------------
# SemDeDup: cluster-bucketed semantic dedup (the embedding-cosine scale path)
# ---------------------------------------------------------------------------
def _semdedup_oracle() -> str:
    from ..functions.vectors import sql_cosine6

    psim = sql_cosine6("ea.embedding", "eb.embedding")
    return f"""
WITH {_member_cte()},
pairs AS (
  SELECT mb.vec_id AS vb, {psim} AS cs
  FROM member ma
  JOIN member mb ON ma.cluster = mb.cluster AND ma.vec_id < mb.vec_id
  JOIN embeddings ea ON ea.vec_id = ma.vec_id
  JOIN embeddings eb ON eb.vec_id = mb.vec_id
),
agg AS (SELECT vb AS vec_id, MAX(cs) AS mx FROM pairs GROUP BY vb)
SELECT m.vec_id, m.cluster,
       COALESCE(a.mx, CAST(-1.0 AS DOUBLE)) AS max_sim_lower,
       COALESCE(a.mx, CAST(-1.0 AS DOUBLE)) < {SEMDEDUP_TAU} AS keep
FROM member m LEFT JOIN agg a ON a.vec_id = m.vec_id
"""


@register("dedup_semdedup", oracle=_semdedup_oracle(), tags=("dedup", "embedding", "semdedup"))
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup via k-means cells.

    Assign every vector to its nearest of K codebook centroids, then
    compare ONLY within a cell: a vector is dropped when its max cosine
    to a lower-id cellmate reaches SEMDEDUP_TAU. This is the scale path
    that `dedup_embedding_cosine` (exact pair-level cosine over the
    same cell candidates) is the spot-check for: cell assignment is a
    broadcast-codebook join reduced by a map-side partial aggregate
    (K = √(N/2) from _semdedup_k, so cells stay ~√(2N) wide), pair
    expansion is O(Σ cell²) instead of O(N²) and rides inside the cell
    join (_cell_pair_cosines) without ever being exchanged; a hot cell
    takes the join_salted treatment implemented there. The per-vector
    max collapses the pair stream map-side before its one shuffle.

    Output is the per-vector verdict a corpus pipeline consumes:
    (vec_id, cluster, max_sim_lower, keep) — every input row appears
    exactly once, keep=false marks semantic near-duplicates.
    """
    member = _semdedup_member(spark, sf_dir)
    # The pair stream arrives with cosines already computed inside the
    # cell join (_cell_pair_cosines — vectors ride the join, the
    # quadratic stream never crosses an exchange); the per-vector max
    # is a partial aggregate, so what the groupBy shuffles is one
    # (vb, mx) row per vector per task, not the pair stream.
    max_lower = (
        _cell_pair_cosines(spark, sf_dir)
        .groupBy("vb")
        .agg(F.max("cs").alias("mx"))
    )
    sim = F.coalesce(F.col("mx"), F.lit(-1.0))
    return (
        member.join(max_lower, member.vec_id == max_lower.vb, "left")
        .select(
            "vec_id",
            "cluster",
            sim.alias("max_sim_lower"),
            (sim < SEMDEDUP_TAU).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix (which sources copy from each other)
# ---------------------------------------------------------------------------
def _cross_source_oracle() -> str:
    return f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({_minhash_oracle()})),
labeled AS (
  SELECT LEAST(da.source, db.source) AS source_a,
         GREATEST(da.source, db.source) AS source_b
  FROM pairs
  JOIN documents da ON da.doc_id = pairs.doc_a
  JOIN documents db ON db.doc_id = pairs.doc_b
)
SELECT source_a, source_b, COUNT(*) AS n_pairs
FROM labeled GROUP BY 1, 2
"""


@register(
    "corpus_cross_source_overlap",
    oracle=_cross_source_oracle(),
    tags=("dedup", "corpus", "provenance"),
)
def corpus_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate overlap matrix between corpus sources.

    The curation question behind dedup: which pairs of sources share
    near-duplicate content (mirrors, scrapes, cross-posts)? MinHash+LSH
    candidate pairs (the scale-safe generator) are labeled with each
    side's source via two KEYED joins against the documents dimension,
    then counted per unordered source pair. The pair stream grows with
    the corpus (star chains alone contribute Θ(N) rows), so neither
    label join is force-broadcast — AQE broadcasts the pair side while
    it is small and switches to a shuffled keyed join when it is not;
    both shapes move only (id, source)-width rows, never document
    text. LEAST/GREATEST canonicalizes the unordered pair so (A,B)
    and (B,A) fold together.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    docs = table(spark, sf_dir, "documents")
    da = docs.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"))
    db = docs.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"))
    labeled = (
        pairs.join(da, F.col("id_a") == F.col("doc_a"))
        .join(db, F.col("id_b") == F.col("doc_b"))
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
    )
    return labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


# ---------------------------------------------------------------------------
# Incremental dedup: an arriving delta batch checked against the corpus
# ---------------------------------------------------------------------------
def _incremental_oracle() -> str:
    return f"""
WITH {_minhash_bands_cte()},
corpus_min AS (
  SELECT band, sig, MIN(doc_id) AS corpus_id
  FROM bands WHERE doc_id % 10 <> 0 GROUP BY 1, 2
),
hits AS (
  SELECT d.doc_id AS delta_id, c.corpus_id
  FROM bands d JOIN corpus_min c ON d.band = c.band AND d.sig = c.sig
  WHERE d.doc_id % 10 = 0
),
best AS (SELECT delta_id, MIN(corpus_id) AS first_match FROM hits GROUP BY delta_id)
SELECT d.doc_id, COALESCE(b.first_match, CAST(-1 AS BIGINT)) AS first_match,
       (b.delta_id IS NOT NULL) AS is_dup
FROM documents d LEFT JOIN best b ON b.delta_id = d.doc_id
WHERE d.doc_id % 10 = 0
"""


@register(
    "dedup_incremental_delta",
    oracle=_incremental_oracle(),
    tags=("dedup", "minhash", "incremental"),
)
def dedup_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest dedup: each document in an arriving DELTA batch
    (doc_id % 10 = 0 stands in for today's crawl) is checked against the
    EXISTING corpus via the LSH band index — the shape a production
    pipeline runs daily, where the corpus side's (band, sig) index is
    precomputed once and only the delta's signatures are fresh work.

    The rule is uniform per bucket and deliberately NOT derived from
    the candidate-pair stream: a delta doc is a duplicate iff it shares
    a bucket with ≥1 corpus doc, and its per-bucket match is that
    bucket's MIN CORPUS member. For ≤cap buckets this is exactly what
    the all-pairs semantics would report (the minimum of a delta doc's
    corpus pair-partners in a bucket IS the bucket's corpus min); for
    hot buckets it is strictly better — the star chain links members
    through the bucket's global min, so a pair-derived verdict would
    silently report is_dup=false for every delta doc in a hot bucket
    whose min id happens to be a delta doc itself, appending known
    boilerplate duplicates. Computed straight off the cached POSTING
    TABLE: one keyed aggregation for the per-bucket corpus min, one
    keyed join with the delta's band rows, one aggregation keyed on
    delta_id — no per-bucket arrays anywhere (a hot bucket's ids array
    would be a multi-GB row at web scale). Delta-internal duplicates
    are deliberately out of scope (they are the ordinary batch-local
    dedup). Every delta doc gets a verdict row (is_dup + lowest
    matching corpus doc), ready to anti-join the delta before
    appending.
    """
    docs = table(spark, sf_dir, "documents")
    bands, _ = _minhash_index(spark, sf_dir)
    corpus_min = (
        bands.filter(F.col("doc_id") % 10 != 0)
        .groupBy("band", "sig")
        .agg(F.min("doc_id").alias("corpus_id"))
    )
    best = (
        bands.filter(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").alias("delta_id"), "band", "sig")
        .join(corpus_min, ["band", "sig"])
        .groupBy("delta_id")
        .agg(F.min("corpus_id").alias("first_match"))
    )
    delta_docs = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    return delta_docs.join(
        best, delta_docs.doc_id == best.delta_id, "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("first_match"), F.lit(-1).cast("long")).alias("first_match"),
        F.col("delta_id").isNotNull().alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# Connected components over the LSH candidate graph (dedup clustering)
# ---------------------------------------------------------------------------
def _cc_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_oracle()})
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
verts AS (SELECT DISTINCT a AS v FROM edges),
reach(src, dst) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id, MIN(dst) AS component
FROM reach GROUP BY src
"""


@register("dedup_connected_components", oracle=_cc_oracle(), tags=("dedup", "iterative", "graph"))
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the MinHash-LSH
    candidate-pair graph, so each group of transitively-linked
    near-duplicates gets one canonical id (min doc_id) — the step a
    training-data pipeline runs between candidate generation and
    keep-one-per-cluster filtering.

    Iterative min-label propagation WITH POINTER JUMPING (the
    Shiloach–Vishkin shortcut): each round every vertex first takes the
    min label among itself and its neighbors, then replaces its label
    with its label's label (labels are always vertex ids, so the label
    table self-joins on them). The neighbor step alone converges in
    O(diameter) rounds — a gradually-drifting template (paginated or
    versioned boilerplate, where only consecutive versions share an
    LSH band) forms a path component whose diameter grows with the
    chain, and each round is a full edge-set shuffle; the shortcut
    makes the known-min's reach roughly DOUBLE per round instead of
    growing by one hop, so convergence is O(log diameter): ~12 rounds
    for a 3000-link drift chain instead of 3000 (or a loud cap trip).
    Per-round cost is one extra keyed self-join of the (vertex, label)
    table — far smaller than the edge join it replaces thousands of.
    Convergence is checked via a driver-side count per round (the
    per-round WORK is fully distributed; the driver only sees the
    single converged/not-converged scalar, which is how any iterative
    Spark algorithm terminates). localCheckpoint truncates lineage so
    plans don't grow exponentially with rounds. The DuckDB oracle
    computes the same fixpoint as a recursive CTE — the fixpoint
    (label = component min) is algorithm-independent, so the shortcut
    changes round counts, never results.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    labels = _min_label_components(pairs)
    return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("component"))


# Re-root the CC label table through parquet every this many rounds.
# localCheckpoint truncates LINEAGE but carries the plan's estimated
# sizeInBytes forward as the checkpointed frame's originStats — and a
# round's plan multiplies that estimate into itself ~4x (two label
# self-joins), so the BigInt estimate's BIT LENGTH doubles per round
# (measured at a 300x corpus: 222 -> 553 -> 1215 -> 2539 -> 5187 ->
# 10483 bits over rounds 1-6). Past ~24 rounds the estimate exceeds
# BigInteger's 2^31-bit ceiling and Catalyst's stats visitor kills the
# job with "BigInteger would overflow supported range" — on exactly
# the slow-converging giant graphs the loop exists for. A parquet
# round-trip resets stats to REAL file bytes; every 8 rounds bounds
# the estimate at ~real_bits * 2^8 plus per-round join constants,
# orders of magnitude under the ceiling, while paying the (tiny,
# vertex-table-sized) write on 1 round in 8.
_CC_REROOT_EVERY = 8


def _stats_reroot(df: DataFrame, path: str) -> DataFrame:
    """Materialize df to parquet and read it back: truncates lineage
    AND resets Catalyst's sizeInBytes statistics to the file's real
    bytes (localCheckpoint keeps inflated originStats — see
    _CC_REROOT_EVERY; reliable checkpoint() carries them identically,
    measured on Spark 4.1.2, so durable checkpointing does NOT subsume
    this). The path is overwritten on reuse; callers alternate two
    paths so a frame still lazily consumed is never clobbered. Paths
    come from catalog.scratch_roots, so on a configured cluster they
    live on shared storage (spark.sse.scratchDir or the checkpoint
    dir) — a driver-local tmp write would silently read back a
    PARTIAL table on any multi-node cluster (catalog.sink_run_dir
    documents the failure mode)."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def _round_checkpoint(df: DataFrame) -> DataFrame:
    """Round-boundary materialization for the iterative loops (CC,
    PageRank): reliable ``checkpoint()`` when the application has a
    checkpoint dir configured, else ``localCheckpoint()``.

    localCheckpoint blocks live unreplicated in executor storage with
    lineage TRUNCATED — on a real cluster one lost executor mid-loop
    (spot reclaim, OOM kill) aborts the whole job with no recompute
    path: Spark's documented caveat. A configured checkpoint dir is
    shared storage by ``setCheckpointDir``'s own contract, so the
    reliable branch survives executor loss; local mode (no dir set)
    keeps the exact prior behavior. NOTE: reliable checkpoint() still
    carries the plan's inflated originStats forward exactly like
    localCheckpoint (measured on Spark 4.1.2 — bit length doubles per
    round under BOTH), so it does not replace _stats_reroot; the
    durability and stats-bounding mechanisms stay orthogonal.

    RETENTION CONTRACT (what survives a CC/PageRank call when a
    checkpoint dir is configured): every round boundary writes a
    vertex-sized ``rdd-*`` dir under the checkpoint dir, and Spark
    deletes superseded ones only when
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (off by
    default) — cluster deployments that call ``setCheckpointDir`` MUST
    set it, or O(rounds) vertex-sized dirs accumulate per invocation.
    With the cleaner on, each round's checkpoint is reclaimed when its
    superseded RDD is GC'd on the driver; the FINAL round's dir stays
    referenced by the returned frame and legitimately survives until
    that frame is GC'd. The engine cannot sweep these itself the way
    it sweeps its own scratch_roots dirs: the rdd-* path of a
    DataFrame checkpoint is not exposed to Python, and deleting any
    non-final one by pattern would race the cleaner. Local mode (no
    checkpoint dir → localCheckpoint branch) writes no dirs at all."""
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _min_label_components(pairs: DataFrame, max_rounds: int = 200) -> DataFrame:
    """Min-label + pointer-jumping loop behind dedup_connected_components,
    exposed on a raw (doc_a, doc_b) pair frame so tests can drive it
    with synthetic graphs (a 300-link path proves the O(log diameter)
    round count — without the jump, that fixture needs 300 rounds).
    Returns (v, label) for every vertex incident to a pair."""
    # Two alternating re-root paths (see _stats_reroot): by the time a
    # path is overwritten (2·_CC_REROOT_EVERY rounds later), every
    # intervening round's eager checkpoint has materialized, so
    # nothing lazily references it. scratch_roots resolves them to
    # cluster-visible storage when configured (spark.sse.scratchDir /
    # checkpoint dir) and driver tmp only as the local-mode stand-in;
    # sweep() removes both dirs once the returned frame no longer
    # roots in them (post-fixpoint detach below). Allocated LAZILY —
    # the _pagerank_on_pairs pattern: most graphs converge before the
    # first _CC_REROOT_EVERY boundary and should not pay a dir
    # allocation (or sweep) for a guard that never fires.
    reroot_dirs: list[str] | None = None
    sweep_reroots = None
    edges = _round_checkpoint(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
    )
    # persist(): the initial label table is consumed up to three times
    # in round 1 (neighbor-min join, hook join, convergence count)
    # before the first checkpointed new_labels replaces it; released
    # explicitly at the end of round 1 (CacheManager entries outlive
    # driver GC, and this plan is rooted in the per-call edges
    # checkpoint, so it would leak one vertex-table entry per call).
    init_labels = labels = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .persist()
    )
    hooked = None
    # Loop to the FIXPOINT (changed == 0), not a fixed round cap:
    # returning unconverged labels would silently disagree with the
    # oracle's recursive-CTE fixpoint. The hard ceiling only guards
    # against a non-terminating regression, and trips loudly — with
    # pointer jumping, the default 200 rounds allows components of
    # astronomically large diameter (reach doubles per round), not
    # merely 200 hops.
    #
    # try/finally: the happy path releases each round's persists inline
    # (below), but a mid-round failure — executor loss, ANSI overflow,
    # the convergence count dying — would otherwise leak the round's
    # CacheManager entries (never GC-released) for the application's
    # lifetime; `release` re-unpersisting an already-released frame is
    # a no-op, so the finally only matters on the error path.
    try:
        for round_no in range(1, max_rounds + 1):
            neighbor_min = (
                edges.join(labels, edges.a == labels.v)
                .groupBy(F.col("b").alias("nv"))
                .agg(F.min("label").alias("nlabel"))
            )
            # persist(): both sides of the jump self-join consume hooked,
            # and Spark shares no subplans — without caching, the hook
            # subtree (edge join + neighbor-min shuffle) executes twice per
            # round, which at web-scale edge sets doubles the round's
            # dominant cost. persist, NOT localCheckpoint: it is explicitly
            # unpersist()ed at the end of the round (a per-round checkpoint
            # would pin one vertex-sized block set per round, released only
            # at GC's leisure), it keeps lineage (executor loss recomputes
            # instead of aborting the loop), and plan growth is not a
            # concern because new_labels' eager checkpoint below re-roots
            # every round's plan.
            hooked = (
                labels.join(neighbor_min, labels.v == F.col("nv"), "left")
                .select(
                    "v",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                    ).alias("label"),
                )
                .persist()
            )
            # Pointer jump: label(v) <- label(label(v)). Every label IS a
            # vertex id present in the label table (initial labels are the
            # vertices themselves; mins of labels stay labels), so the
            # lookup always resolves; coalesce is belt-and-braces.
            jump = hooked.select(F.col("v").alias("jv"), F.col("label").alias("jlabel"))
            new_labels = _round_checkpoint(
                hooked.join(jump, hooked.label == F.col("jv"), "left")
                .select(
                    "v",
                    F.coalesce(F.col("jlabel"), F.col("label")).alias("label"),
                )
            )
            labels_root_in_scratch = round_no % _CC_REROOT_EVERY == 0
            if labels_root_in_scratch:
                if reroot_dirs is None:
                    reroot_dirs, sweep_reroots = scratch_roots(
                        pairs.sparkSession, "cc_labels_reroot", 2
                    )
                new_labels = _stats_reroot(
                    new_labels, reroot_dirs[(round_no // _CC_REROOT_EVERY) % 2]
                )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), F.col("n.v") == F.col("o.v"))
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            # new_labels is materialized (eager checkpoint) and the round's
            # convergence count is done — release hooked's blocks now
            # instead of waiting for driver GC (and the initial label cache
            # after round 1, its last consumer).
            hooked.unpersist()
            if round_no == 1:
                init_labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected components did not converge in {max_rounds} rounds"
            )
        # Post-fixpoint detach: if convergence landed exactly on a
        # re-root round, the final frame is a lazy read of a scratch
        # parquet dir the sweep below is about to delete — one more
        # eager checkpoint moves its blocks out of the scratch dirs.
        # Any other round's frame is already checkpoint-materialized
        # (the re-root parquet was last read by that round's changed
        # count), so the sweep is safe without extra work.
        if labels_root_in_scratch:
            labels = _round_checkpoint(labels)
    finally:
        release(hooked, init_labels)
        # Both dirs are now unreferenced on every path: success
        # detached above; on the error path no frame escapes the call.
        # Closes the two-vertex-table-dirs-per-call leak a bare
        # mkdtemp convention had. (None when the loop converged before
        # the first re-root boundary — nothing was allocated.)
        if sweep_reroots is not None:
            sweep_reroots()
    return labels


@register(
    "dedup_filtered_corpus",
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_oracle()})
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
verts AS (SELECT DISTINCT a AS v FROM edges),
reach(src, dst) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY src),
dropped AS (SELECT doc_id FROM comp WHERE doc_id <> component)
SELECT (SELECT COUNT(*) FROM documents) AS n_total,
       (SELECT COUNT(*) FROM dropped) AS n_dropped,
       (SELECT COUNT(*) FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped)) AS n_kept
""",
    tags=("dedup", "pipeline", "end-to-end"),
)
def dedup_filtered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's END PRODUCT: corpus size after keeping one
    canonical doc (min doc_id) per near-dup cluster — candidates from
    MinHash-LSH, clusters from connected components, non-candidates
    kept untouched. The drop set is an anti-join against the corpus
    (never a rewrite of it), which at 100 TB means the full text moves
    zero times: only (doc_id, component) pairs shuffle."""
    comp = dedup_connected_components(spark, sf_dir)
    dropped = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    docs = table(spark, sf_dir, "documents").select("doc_id")
    kept = docs.join(dropped, "doc_id", "left_anti")
    return (
        docs.agg(F.count(F.lit(1)).alias("n_total"))
        .crossJoin(dropped.agg(F.count(F.lit(1)).alias("n_dropped")))
        .crossJoin(kept.agg(F.count(F.lit(1)).alias("n_kept")))
    )


# ---------------------------------------------------------------------------
# PageRank over the LSH candidate graph (iterative centrality)
# ---------------------------------------------------------------------------
PR_ITERS = 3
PR_DAMPING = 0.85

# Per-iteration quantization is the cross-engine determinism anchor:
# ranks are cut to 6dp at every iteration boundary and per-edge
# contributions to 9dp BEFORE the exact decimal SUM, so float-summation
# order (Spark's parallel partials vs DuckDB's sequential fold) can
# never leak into the next iteration's inputs. The quantization is
# ROUND(x·10^k)/10^k — NOT ROUND(x, k): rounding the raw double at k
# decimals diverges across engines for values within 1 ulp of a k-dp
# half boundary (Spark's ROUND is HALF_UP on the exact binary
# expansion, DuckDB's is float arithmetic — the class the sf1 sweep
# caught systematically in the digest layer). Multiplying FIRST makes
# both engines round the SAME IEEE product double with the same
# half-away-from-zero tie rule, and the final division by the same
# power of ten is one more shared correctly-rounded IEEE op.
_PR_QUANT = "(ROUND(({x}) * 1000000.0) / 1000000.0)"


def _pagerank_oracle() -> str:
    iters = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        iters.append(f"""
iter{k} AS (
  SELECT d.v,
         {_PR_QUANT.format(x=f"(CAST(1 AS DOUBLE) - CAST({PR_DAMPING} AS DOUBLE)) / CAST(n.cnt AS DOUBLE) + {PR_DAMPING} * CAST(s.contrib AS DOUBLE)")} AS r
  FROM (
    SELECT e.b AS v, SUM(CAST(ROUND(p.r / d2.deg * 1000000000.0) / 1000000000.0 AS DECIMAL(28,12))) AS contrib
    FROM edges e
    JOIN {prev} p ON p.v = e.a
    JOIN deg d2 ON d2.v = e.a
    GROUP BY e.b
  ) s
  JOIN deg d ON d.v = s.v
  CROSS JOIN n
)""")
        prev = f"iter{k}"
    its = ",".join(iters)
    return f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_oracle()})
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
deg AS (SELECT a AS v, COUNT(*) AS deg FROM edges GROUP BY a),
n AS (SELECT COUNT(*) AS cnt FROM deg),
r0 AS (
  SELECT v, {_PR_QUANT.format(x="1.0 / n.cnt")} AS r FROM deg CROSS JOIN n
),{its}
SELECT v AS doc_id, r AS pagerank FROM {prev}
"""


@register("graph_pagerank_neardup", oracle=_pagerank_oracle(), tags=("graph", "iterative", "pagerank"))
def graph_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) over the undirected MinHash-LSH
    candidate graph — ranks the most-connected near-duplicate hubs, the
    signal a dedup pipeline uses to pick cluster canonicals or flag
    template spam (a doc near-duplicating MANY others is boilerplate).

    Iterative groupBy-join rounds exactly like connected components
    above: per round, each vertex's rank disperses along its edges and
    re-aggregates — one shuffle per iteration, edges checkpointed once
    (reliably when the app configures a checkpoint dir, locally
    otherwise — see _round_checkpoint). The undirected graph has no
    dangling nodes (every vertex has
    degree ≥ 1), so no leaked-mass correction term is needed. Ranks are
    quantized to 6dp at every iteration boundary and contributions
    summed as exact decimals, making the whole computation bit-identical
    to the oracle's unrolled-CTE form regardless of summation order.

    (On this synthetic corpus the candidate graph is a union of
    near-cliques — regular components — so ranks converge to uniform;
    the oracle still verifies every dispersal/damping step exactly, and
    irregular graphs rank hubs above leaves with the same plan.)
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return _pagerank_on_pairs(pairs)


def _pagerank_on_pairs(pairs: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """PageRank loop behind graph_pagerank_neardup, exposed on a raw
    (doc_a, doc_b) pair frame so tests can drive it with synthetic
    graphs (the injected-failure test proves the persist lifecycle is
    exception-safe; the bounded-stats test drives ``iters`` past the
    re-root boundary). Returns (doc_id, pagerank).

    The per-iteration checkpoint sits in the SAME stats-compounding
    family the CC loop diagnosed (_CC_REROOT_EVERY: originStats bit
    length doubles per round, BigInteger overflow kills the job near
    round 24). PR_ITERS=3 is safely clear today, but nothing else
    pins that — so the loop carries the identical parquet re-root
    guard: any future convergence-driven iteration count stays
    bounded instead of walking into the overflow."""
    spark = pairs.sparkSession
    edges = _round_checkpoint(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
    )
    # persist(): deg is consumed by the n count, the rank init, AND the
    # contribution join in EVERY iteration — uncached, the degree
    # shuffle over the edge set re-executes once per PageRank round.
    deg = (
        edges.groupBy(F.col("a").alias("v"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    # try/finally: ranks is checkpoint-rooted, so nothing in the
    # returned plan needs deg — and CacheManager entries are never
    # GC-released, so the per-call cache (rooted in this call's fresh
    # edges checkpoint, never deduped across calls) must be released
    # explicitly on BOTH paths: a failure mid-iteration (executor loss,
    # ANSI overflow) would otherwise leak deg's entry for the
    # application's lifetime.
    try:
        n = deg.count()
        if n == 0:
            # An empty edge set has no vertices to rank; without this
            # guard the teleport base below divides by zero. The select
            # keeps the (doc_id, pagerank) contract on an empty frame.
            return deg.select(
                F.col("v").alias("doc_id"), F.lit(0.0).alias("pagerank")
            )
        # ROUND(x·1e6)/1e6, not ROUND(x, 6) — see _PR_QUANT: the raw-
        # double ROUND diverges across engines within 1 ulp of a 6dp
        # half boundary; scaling first makes both engines round the
        # same IEEE product double.
        quant = lambda c: F.round(c * 1000000.0) / 1000000.0  # noqa: E731
        ranks = deg.select("v", quant(F.lit(1.0) / F.lit(float(n))).alias("r"))
        # Same IEEE op sequence as the oracle's (1.0 − 0.85)/n in DOUBLE:
        # DuckDB's bare `1 - 0.85` is DECIMAL subtraction (0.1499999…944 as
        # a double), Python's is double subtraction (0.1500000…002) — a
        # ~1e-17 teleport drift that can flip a 6dp rounding boundary, so
        # the oracle now casts to DOUBLE first and both engines compute the
        # identical base.
        base = (1.0 - PR_DAMPING) / float(n)
        # Re-root scratch dirs are allocated lazily: the production
        # PR_ITERS=3 path never crosses the boundary and should not
        # pay a dir allocation (or sweep) for a guard it never fires.
        reroot_dirs: list[str] | None = None
        sweep_reroots = None
        ranks_root_in_scratch = False
        try:
            for it in range(1, iters + 1):
                contribs = (
                    edges.join(ranks.withColumnRenamed("v", "rv"), F.col("rv") == F.col("a"))
                    .join(deg.select(F.col("v").alias("dv"), "deg"), F.col("dv") == F.col("a"))
                    .select(
                        "b",
                        (F.round(F.col("r") / F.col("deg") * 1000000000.0) / 1000000000.0)
                        .cast("decimal(28,12)")
                        .alias("c"),
                    )
                    .groupBy("b")
                    .agg(F.sum("c").alias("contrib"))
                )
                ranks = _round_checkpoint(
                    contribs.select(
                        F.col("b").alias("v"),
                        quant(
                            F.lit(base) + PR_DAMPING * F.col("contrib").cast("double")
                        ).alias("r"),
                    )
                )
                ranks_root_in_scratch = it % _CC_REROOT_EVERY == 0
                if ranks_root_in_scratch:
                    if reroot_dirs is None:
                        reroot_dirs, sweep_reroots = scratch_roots(
                            spark, "pr_ranks_reroot", 2
                        )
                    ranks = _stats_reroot(
                        ranks, reroot_dirs[(it // _CC_REROOT_EVERY) % 2]
                    )
            # Same post-loop detach as the CC loop: if the final
            # iteration landed on a re-root boundary, move the result
            # off the scratch parquet before the sweep deletes it.
            if ranks_root_in_scratch:
                ranks = _round_checkpoint(ranks)
        finally:
            if sweep_reroots is not None:
                sweep_reroots()
    finally:
        release(deg)
    return ranks.select(F.col("v").alias("doc_id"), F.col("r").alias("pagerank"))


# ---------------------------------------------------------------------------
# Prefix-filter set-similarity join (PPJoin-family)
# ---------------------------------------------------------------------------
# Jaccard threshold for the prefix-filter join. With threshold t, two
# shingle sets can only reach Jaccard >= t if they share a shingle
# among each one's (m - ceil(t*m) + 1) RAREST shingles — the
# prefix-filter guarantee (Chaudhuri et al. SSJoin / Xiao et al.
# PPJoin), which makes this join EXACT: no false negatives, unlike
# MinHash LSH.
PF_JACCARD_T = 0.6


_PFJ_INDEX_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _pfj_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build (or fetch) the prefix-filter join's id-keyed index:
    (vocab, prefix, profiles), all eagerly checkpointed once per
    (dataset identity, Spark application) — the `_minhash_index` shape.

    - ``vocab`` (sh, dfc, shid): per-shingle document frequency plus a
      frozen INJECTIVE int64 shingle id.
    - ``prefix`` (doc_id, i, m, shid): each doc's (m − ⌈t·m⌉ + 1)
      rarest shingles with their df-order position i and set size m —
      the join's probe entries. In the index since r10: the window
      pipeline behind it is per-corpus-snapshot stable, and as a LAZY
      localCheckpoint in the query plan its two join-side consumers
      raced to materialize it — the sf10 stage log showed the full
      11M-row window pipeline executing TWICE (~100 s·wall of
      duplicate work; lazy checkpoint blocks dedupe only after one
      evaluation COMPLETES, and concurrent stages both start before
      either finishes). Eager in the index, it is built exactly once
      and both join sides read blocks.
    - ``profiles`` (doc_id, shs): each doc's SORTED ARRAY of shingle
      ids — the ride-along verification payload.

    WHY ids at all: the ride-along arrays used to carry the raw
    3-token shingle STRINGS, so every candidate's exact intersection
    paid `array_intersect`'s per-element string hashing/equality over
    ~175-element arrays — measured at ~220 µs·core per
    filter-surviving candidate at sf10, 95.1% of the uncontended wall
    (PFJ_ENGINE_r09.json). Substituting any BIJECTION for the shingle
    alphabet changes no set cardinality — n_common/n_union/jaccard are
    bit-identical — while the intersection hash-set runs on longs and
    the prefix-frame exchanges shrink by the string/long width ratio.

    WHY monotonically_increasing_id + eager checkpoint, not a content
    hash or a global row_number: the id only needs to be injective
    (intersection SIZES are bijection-invariant; nothing downstream
    orders by id except the per-doc sort, which any total order
    serves). A 64-bit content hash (xxhash64) admits collisions that
    would silently OVERCOUNT n_common once web-scale vocabularies
    reach birthday range — wrong for an operator whose contract is
    exactness. A global row_number would funnel the vocabulary
    through one partition. mono_id is injective with zero extra
    shuffles — but deterministic only per evaluation, and Spark
    shares no subplans, so the eager checkpoint freezes ONE
    assignment for all consumers. vocab and profiles are built and
    cached ATOMICALLY (one cache entry) because a split cache could
    evict one half and rebuild it under a FRESH assignment — prefix
    rows keyed by new ids probing arrays of old ids, silently wrong
    intersections. The tuple makes that impossible by construction.
    """

    def build() -> tuple[DataFrame, DataFrame, DataFrame]:
        toks = _shingles(table(spark, sf_dir, "documents")).localCheckpoint(
            eager=False
        )
        dfreq = toks.groupBy("sh").agg(F.count(F.lit(1)).alias("dfc"))
        vocab = checkpoint_frame(
            dfreq.withColumn("shid", F.monotonically_increasing_id()),
            "pfj_vocab",
        )
        # The df-order window stays keyed on the STRING (dfc, sh) —
        # the positional semantics the mirror and oracle pin — while
        # the id is what travels into the join and the arrays. vocab
        # is vocabulary-sized (grows with corpus tokens) — AQE picks
        # the join strategy; a forced broadcast dies past 8 GB.
        w_doc = Window.partitionBy("doc_id").orderBy("dfc", "sh")
        w_m = Window.partitionBy("doc_id")
        prefix = checkpoint_frame(
            toks.join(vocab, "sh")
            .withColumn("i", F.row_number().over(w_doc))
            .withColumn("m", F.count(F.lit(1)).over(w_m))
            .filter(
                F.col("i")
                <= F.col("m") - F.ceil(F.lit(PF_JACCARD_T) * F.col("m")) + 1
            )
            .select("doc_id", "i", "m", "shid"),
            "pfj_prefix",
        )
        profiles = checkpoint_frame(
            toks.join(vocab.select("sh", "shid"), "sh")
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_set("shid")).alias("shs")),
            "pfj_profiles",
        )
        return (vocab, prefix, profiles)

    return dataset_cached(
        _PFJ_INDEX_CACHE,
        spark,
        sf_dir,
        ("documents.parquet",),
        build,
        max_entries=MAX_CHECKPOINT_ENTRIES,
    )


def _pfj_intersect_batches(batches, threshold: float | None = None):
    """Arrow-batched exact intersection counts for the prefix-filter
    join's verification: per input row (doc_a, doc_b, sa, sb) with sa
    and sb SORTED, UNIQUE int64 arrays (the _pfj_index contract —
    sort_array(collect_set(shid))), emit (doc_a, doc_b, n_common, ma,
    mb) with n_common = |sa ∩ sb| counted by a fully-vectorized numpy
    binary-search merge instead of JVM array_intersect's per-row boxed
    hash set.

    FUSED THRESHOLD (r11, guide §4.2 — shrink the boundary): with
    ``threshold`` set, only rows whose jaccard passes it are emitted,
    so failing candidates never cross the Arrow IPC boundary back to
    the JVM. At sf10 the join stage shipped every candidate's
    (doc_a, doc_b, n_common, ma, mb) back even though only the
    result-rate fraction survives the downstream filter. The predicate
    is computed EXACTLY as the SQL tail computes it —
    ``float64(n_common) / float64(ma + mb − n_common) >= t`` — numpy
    float64 division is the same IEEE-754 double division the JVM
    performs on ``CAST(n_common AS DOUBLE) / n_union``, so fusing
    moves the filter without moving any rounding boundary (the pinned
    arm-equality test compares the fused arm row-for-row against the
    JVM arm, which keeps the external filter). n_union >= 1 always:
    inner joins over non-empty profile arrays give ma, mb >= 1 and
    n_common <= min(ma, mb).

    WHY: PFJ_ENGINE_r09.json measured ~48 µs·core per candidate in
    size(array_intersect) on ~175-element long arrays (boxed
    OpenHashSet insert+probe per element); this kernel runs the same
    population at ~11 µs/row single-thread (micro-benched at the r10
    rewrite on sf10-shaped batches: 10k rows × ~175-element sides),
    dominated by one np.searchsorted of every a-element against the
    batch's packed b-keys — the same batched sorted-merge the numpy
    mirror uses. The rows never leave the join's stage: mapInArrow
    pipelines inside it (no exchange), so the plan's shuffle shape is
    IDENTICAL to the JVM variant and the only new cost is the Arrow
    IPC hop, linear in candidate bytes.

    Mechanics: flatten both list columns; pack each element into one
    monotone int64 key `row_id * span + (value - lo)` (rows are
    contiguous and row-internally sorted, so packed keys are GLOBALLY
    sorted with zero sorting work); count a-keys present in the b-key
    array via one vectorized binary search; bincount matches per row.
    When `rows * span` could overflow the packing (shingle ids are
    monotonically_increasing_id — partition id in the high bits, so
    span is usually ~2^38 but unbounded in principle), fall back to a
    batch-local np.unique remap, which is exact for any id range.
    Intersection SIZES are what both arms return, so the kernel is
    bit-equivalent to array_intersect semantics on unique arrays (a
    pinned test compares the two arms row-for-row)."""
    import numpy as np
    import pyarrow as pa

    out_fields = pa.schema(
        [
            pa.field("doc_a", pa.int64()),
            pa.field("doc_b", pa.int64()),
            pa.field("n_common", pa.int64()),
            pa.field("ma", pa.int64()),
            pa.field("mb", pa.int64()),
        ]
    )
    for batch in batches:
        n = batch.num_rows
        if n == 0:
            continue
        sa, sb = batch.column("sa"), batch.column("sb")
        if sa.null_count or sb.null_count:
            # Inner join over always-built profile arrays — a null here
            # means the index contract broke; fail loud, never guess.
            raise ValueError("_pfj_intersect_batches: null shingle array")
        va = sa.flatten().to_numpy(zero_copy_only=False)
        vb = sb.flatten().to_numpy(zero_copy_only=False)
        oa = sa.offsets.to_numpy(zero_copy_only=False)
        ob = sb.offsets.to_numpy(zero_copy_only=False)
        la = np.diff(oa - oa[0]).astype(np.int64)
        lb = np.diff(ob - ob[0]).astype(np.int64)
        ra = np.repeat(np.arange(n, dtype=np.int64), la)
        rb = np.repeat(np.arange(n, dtype=np.int64), lb)
        if len(va) and len(vb):
            # Python ints for the overflow check: hi-lo+1 itself can
            # exceed int64 when ids span the full mono_id range.
            lo = min(int(va.min()), int(vb.min()))
            span = max(int(va.max()), int(vb.max())) - lo + 1
            if n * span < (1 << 62):
                ka = ra * span + (va - lo)
                kb = rb * span + (vb - lo)
            else:
                allv = np.concatenate([va, vb])
                uniq, inv = np.unique(allv, return_inverse=True)
                span = len(uniq)
                ka = ra * span + inv[: len(va)].astype(np.int64)
                kb = rb * span + inv[len(va) :].astype(np.int64)
            idx = np.searchsorted(kb, ka)
            idx_c = np.minimum(idx, len(kb) - 1)
            hit = (idx < len(kb)) & (kb[idx_c] == ka)
            counts = np.bincount(ra[hit], minlength=n)
        else:
            counts = np.zeros(n, dtype=np.int64)
        doc_a, doc_b = batch.column("doc_a"), batch.column("doc_b")
        if threshold is not None:
            keep = counts.astype(np.float64) / (la + lb - counts) >= threshold
            if not keep.all():
                if not keep.any():
                    continue
                keep_idx = np.flatnonzero(keep)
                take = pa.array(keep_idx, type=pa.int64())
                doc_a, doc_b = doc_a.take(take), doc_b.take(take)
                counts, la, lb = counts[keep_idx], la[keep_idx], lb[keep_idx]
        yield pa.record_batch(
            [
                doc_a,
                doc_b,
                pa.array(counts, type=pa.int64()),
                pa.array(la, type=pa.int64()),
                pa.array(lb, type=pa.int64()),
            ],
            schema=out_fields,
        )


def _pfj_intersect_passing(batches):
    """mapInArrow entry point for the production arrow arm: the
    intersection kernel with the member's jaccard threshold fused in
    (importable module-level function, not a lambda/partial, so reused
    Python workers can resolve it by reference)."""
    return _pfj_intersect_batches(batches, threshold=PF_JACCARD_T)


def _pfj_plan(spark: SparkSession, sf_dir: str, verify: str = "arrow") -> DataFrame:
    """The prefix-filter Jaccard plan behind dedup_prefix_filter_jaccard,
    with the verification backend exposed for measured A/Bs:

    - ``arrow`` (production): the join projects (doc_a, doc_b, sa, sb)
      into ``_pfj_intersect_passing`` via mapInArrow — vectorized
      sorted-merge counting with the jaccard threshold FUSED into the
      kernel (only passing rows cross the IPC boundary back; the
      jvm/hof arms apply the identical predicate externally), pipelined
      inside the join's stage.
    - ``arrow_unfused``: the r10 production shape — same kernel but
      every counted candidate returns across the IPC boundary and the
      threshold runs as a Catalyst Filter. Kept live so the fusion's
      cost delta stays reproducible within one session.
    - ``jvm``: size(array_intersect(sa, sb)) in the join's projection —
      the pre-r10 shape, kept as the A/B comparator and the
      arm-equality test's second opinion.
    - ``hof``: size(filter(sa, x -> array_contains(sb, x))) — the
      verdict-suggested higher-order-function arm; O(|sa|·|sb|) linear
      scans per row (array_contains per element), measured for the
      record.

    All three arms share the identical candidate join (same shuffles,
    same exactness filters) and the identical SQL tail modulo WHERE the
    jaccard filter runs (inside the kernel for arrow, a Catalyst Filter
    for jvm/hof), so an A/B isolates verification + boundary cost."""
    # vocab (frozen shingle ids + df counts), the prefix probe frame,
    # and the ride-along profile arrays come from the cached id-keyed
    # index — see _pfj_index for why the id assignment must be frozen
    # and shared atomically between the prefix stream and the arrays,
    # and why the prefix frame is eager there (its two join-side
    # consumers raced a lazy checkpoint into double evaluation).
    # Candidates stream from a SELF-JOIN of the prefix frame — NOT a
    # collect_list bucket expansion: prefix buckets have no width cap
    # (capping would break the no-false-negatives guarantee; a cluster
    # of k near-identical docs makes every prefix shingle df≈k), so an
    # array-expansion bucket of k members would materialize k²/2
    # structs in one row and hit the JVM 2³¹-element limit at
    # web-scale boilerplate.
    _vocab, prefix, profiles = _pfj_index(spark, sf_dir)
    # Each doc's SORTED SHINGLE-SET ARRAY rides the prefix entries INTO
    # the pair-generating self-join — the _cell_pair_cosines lesson
    # (payloads ride the join that creates pairs; the pair stream is
    # never exchanged). Two rejected shapes, both measured:
    # (a) token-level verification (cand ⋈ toks_a on doc_a ⋈ toks_b on
    #     (doc_b, sh) + groupBy) shuffles Σ_cand |S_a| token rows —
    #     370M intermediate rows at sf1, ~37e9 rows / ~1.8 TB at sf10;
    # (b) pair-level array attach (distinct cand, then two profile
    #     joins) halves that but must route the 700M-pair stream WITH
    #     a ~1.3 KB array through the second attach's shuffle once the
    #     profile side outgrows broadcast — ~500 GB at sf10, the run
    #     that killed this host's disk.
    # Riding the arrays makes every shuffle corpus-linear: the prefix
    # side costs prefix-entries × array width (id-keyed: 8 B/element
    # instead of the shingle string), the emission stream is filtered
    # and intersected MAP-SIDE inside the join's stage (JVM projection
    # or pipelined mapInArrow — no exchange either way), and the only
    # pair-level exchange is the final distinct over rows that already
    # passed jaccard >= t — RESULT-sized (each true pair × its passing
    # prefix shingles, all copies bit-identical since the row is a
    # pure function of the pair). The ~k× redundant intersections for
    # a pair sharing k prefix shingles are the documented price —
    # row-local vectorized work that scales with cores, traded against
    # the pair-stream shuffle that does not scale with disk; the r9 id
    # substitution cut the per-candidate constant 220 → 48 µs·core and
    # the r10 Arrow kernel attacks the rest (see
    # _pfj_intersect_batches). collect_set is PER-DOC (bounded by
    # document token count), never a bucket expansion.
    #
    # Length + positional filters (see docstring): both thresholds are
    # relaxed by 0.5 — sizes/overlaps are integers, so half-unit slack
    # can only ADMIT extra candidates (verified exactly in the same
    # join), never drop a true pair to t·m landing on a float rounding
    # boundary. They sit in the JOIN CONDITION, so rejected emissions
    # never reach the verification projection.
    overlap_frac = PF_JACCARD_T / (1.0 + PF_JACCARD_T)
    pref_a = prefix.join(profiles, "doc_id").select(
        F.col("doc_id").alias("doc_a"),
        F.col("i").alias("ia"),
        F.col("m").alias("ma"),
        "shid",
        F.col("shs").alias("sa"),
    )
    pref_b = prefix.join(profiles, "doc_id").select(
        F.col("doc_id").alias("doc_b"),
        F.col("i").alias("ib"),
        F.col("m").alias("mb"),
        F.col("shid").alias("shid_b"),
        F.col("shs").alias("sb"),
    )
    cand = pref_a.join(
        pref_b,
        (F.col("shid") == F.col("shid_b"))
        & (F.col("doc_a") < F.col("doc_b"))
        & (
            F.least("ma", "mb")
            >= PF_JACCARD_T * F.greatest("ma", "mb") - F.lit(0.5)
        )
        & (
            1 + F.least(F.col("ma") - F.col("ia"), F.col("mb") - F.col("ib"))
            >= overlap_frac * (F.col("ma") + F.col("mb")) - F.lit(0.5)
        ),
    )
    if verify == "arrow":
        # The jaccard threshold is FUSED into the kernel (r11): failing
        # candidates are dropped batch-locally before the Arrow IPC
        # return hop, so the boundary carries only result-rate rows.
        # The kernel applies the bit-identical double-division predicate
        # the other arms apply externally below.
        counted = cand.select("doc_a", "doc_b", "sa", "sb").mapInArrow(
            _pfj_intersect_passing,
            "doc_a long, doc_b long, n_common long, ma long, mb long",
        )
    elif verify == "arrow_unfused":
        counted = cand.select("doc_a", "doc_b", "sa", "sb").mapInArrow(
            _pfj_intersect_batches,
            "doc_a long, doc_b long, n_common long, ma long, mb long",
        )
    elif verify == "hof":
        counted = cand.select(
            "doc_a",
            "doc_b",
            F.size(
                F.filter("sa", lambda x: F.array_contains("sb", x))
            ).cast("long").alias("n_common"),
            F.size("sa").cast("long").alias("ma"),
            F.size("sb").cast("long").alias("mb"),
        )
    else:  # "jvm"
        counted = cand.select(
            "doc_a",
            "doc_b",
            # cast: size() is INT; the member's pinned schema (and the
            # oracle's COUNT/SUM arithmetic) is BIGINT
            F.size(F.array_intersect("sa", "sb")).cast("long").alias("n_common"),
            F.size("sa").cast("long").alias("ma"),
            F.size("sb").cast("long").alias("mb"),
        )
    emitted = counted.withColumn(
        "n_union", F.col("ma") + F.col("mb") - F.col("n_common")
    )
    if verify != "arrow":
        # jvm/hof arms count every candidate, so they filter here; the
        # arrow kernel already emitted only passing rows (same
        # predicate, same float64 arithmetic — see
        # _pfj_intersect_batches).
        emitted = emitted.filter(
            F.col("n_common").cast("double") / F.col("n_union") >= PF_JACCARD_T
        )
    return (
        emitted
        .withColumn(
            "jaccard",
            F.round(F.col("n_common").cast("double") / F.col("n_union") * 1000000.0)
            / 1000000.0,
        )
        .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
        .distinct()
    )


@register(
    "dedup_prefix_filter_jaccard",
    oracle=f"""
WITH toks AS ({_SQL_SHINGLES.format(where="")}),
dfreq AS (SELECT sh, COUNT(*) AS dfc FROM toks GROUP BY sh),
ordered AS (
  SELECT t.doc_id, t.sh,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY d.dfc, t.sh) AS i,
         COUNT(*) OVER (PARTITION BY t.doc_id) AS m
  FROM toks t JOIN dfreq d ON t.sh = d.sh
),
prefix AS (
  SELECT doc_id, sh FROM ordered WHERE i <= m - CEIL({PF_JACCARD_T} * m) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS m FROM toks GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.sh = ta.sh
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b, i.n_common,
       sa.m + sb.m - i.n_common AS n_union,
       (ROUND(CAST(i.n_common AS DOUBLE) / (sa.m + sb.m - i.n_common) * 1000000.0) / 1000000.0) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / (sa.m + sb.m - i.n_common) >= {PF_JACCARD_T}
""",
    tags=("dedup", "jaccard", "prefix-filter"),
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT shingle-Jaccard similarity join via prefix filtering — the
    deterministic alternative to MinHash LSH (no false negatives).

    Each doc's 3-token shingles sort by ascending document frequency;
    only the (m − ⌈t·m⌉ + 1) RAREST shingles form its prefix, and two
    docs are candidates only if their prefixes share a shingle. The
    inverted index is built on prefix shingles only, which are low-df
    WHEN DOCUMENTS DIFFER — rare shingles rank first, so a shingle
    popular across unrelated docs is never in anyone's prefix.
    Candidates are further pruned by two exactness-preserving filters
    before verification: the SSJoin LENGTH filter (Jaccard ≥ t forces
    min(ma,mb) ≥ t·max(ma,mb) — size-mismatched docs can never pass)
    and the PPJoin POSITIONAL filter (a pair sharing the prefix
    shingle at df-order positions ia, ib can have at most
    1 + min(ma−ia, mb−ib) common shingles, which must reach
    t/(1+t)·(ma+mb); the pair's first common prefix shingle carries
    the maximal — and valid — bound, so keeping pairs where ANY shared
    row passes loses no true pair). Verification attaches each side's
    sorted shingle-ID array (int64 ids from a frozen bijection — see
    _pfj_index; intersection sizes are bijection-invariant, so results
    are bit-identical to string-set semantics) and counts the exact
    intersection row-locally INSIDE the pair-generating self-join's
    stage — since r10 via the Arrow-batched vectorized sorted-merge
    kernel (_pfj_intersect_batches, pipelined mapInArrow: no new
    exchange, measured A/B in PFJ_AB_r10.json) rather than JVM
    array_intersect's per-row hash set — see _pfj_plan for the two
    rejected shapes, the three measured verification arms, and why
    every shuffle here is corpus-linear. Integer-over-integer division
    makes the threshold decision engine-exact.

    Honest quadratic contract: a cluster of k docs that genuinely ARE
    mutually near-identical (templated boilerplate differing by a
    token — every prefix shingle has df≈k there, and rareness-ordering
    cannot help) has Θ(k²) VERIFIED OUTPUT by the operator's exact-join
    definition; no candidate filter can reduce an output that large.
    The join itself stays keyed (never cartesian), AQE's skew-join
    splits the hot shingle's k×k sort-merge partition across tasks at
    runtime, and the k² cost lands in the result, not in any single
    array row (the pair stream is join rows, collect_list-free — see
    the plan pin in tests). Production bounds k by running exact dedup
    first and this join on LSH-candidate scopes; for capped-cost
    near-dup discovery use dedup_minhash_lsh, whose star chain is the
    deliberate O(k) alternative.

    The document-frequency vocabulary (with its frozen int64 shingle
    ids) and the per-doc sorted id-array profiles come from the
    cached, eagerly-checkpointed `_pfj_index` — built once per
    (dataset, application) exactly like the MinHash index, so the
    shingle scatter+explode pipeline runs once at build time instead
    of four times in the query plan (Spark shares no subplans).
    Candidates STREAM from a self-join of the index's EAGER prefix
    frame (since r10 — as a lazy checkpoint in the query plan its two
    join-side consumers raced into double evaluation; eager in the
    index, both sides read checkpoint blocks) — not from a
    collect_list bucket expansion: prefix buckets have no width cap
    (capping would break the no-false-negatives guarantee), so an
    array-expansion bucket of k members would materialize k²/2 structs
    in one row and hit the JVM 2³¹-element limit on web-scale
    boilerplate, while the join emits the same pairs as a stream.
    """
    return _pfj_plan(spark, sf_dir, verify="arrow")

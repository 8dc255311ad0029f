#!/usr/bin/env python
"""In-engine / driver-side self-validation for the large-scale probe
(scripts/scale_run.py), giving the sf10 run correctness teeth where
single-node oracles are intractable (round-6 verdict, "What's missing"
item 2).

Two mechanisms, recorded per query in the probe journal:

- ORACLE mode (the default): the query's registered DuckDB oracle IS
  tractable at sf10 for every linear-cost formulation (q1's scan-agg,
  the text/corpus family, even the embedding assignment CTEs), so the
  probe runs the full cross-engine comparison exactly like the sf1
  sweep — with a watchdog (duckdb connection.interrupt) so a
  mis-classified quadratic oracle degrades to an honest
  "oracle-timeout" record instead of an overnight hang, and a
  deterministic key-sampled value comparison once results exceed
  SAMPLED_COMPARE_ROWS (full canonicalization of a 15M-row frame is
  minutes of pure Python for no additional evidential value; counts
  are still compared in full and the sample is hash-chosen from BOTH
  engines by the same predicate).

- SAMPLED mode: for the five members whose oracle is the quadratic /
  recursive side (MinHash pair stream, connected components, PageRank,
  the filtered-corpus rollup, bucketed ANN) plus the embedding family
  at probe scale, a bespoke invariant check recomputes a deterministic
  hash-sampled subset of the engine's own claims EXACTLY (band
  signatures from raw text, cosines as the same left-to-right quantized
  fold, PageRank on closed sampled components with the oracle's exact
  per-iteration quantization) and asserts structural invariants
  in-engine (edge endpoints share a component, component labels are
  their members' minimum). Samples are hash-predicates, never LIMIT —
  re-running selects the same rows.

Every check returns a dict {"mode", "status", ...evidence counts...};
"status" != "pass" fails the probe run.
"""

from __future__ import annotations

import math
import os
import sys
import threading

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

# Results larger than this compare count-in-full + values-on-a-sample.
SAMPLED_COMPARE_ROWS = 2_000_000
SAMPLE_MOD = 499  # hash-sample modulus for pair/row sampling
SAMPLE_CAP = 400  # max driver-side recomputations per check
ORACLE_TIMEOUT_S = 1800.0


# ---------------------------------------------------------------------------
# ORACLE mode
# ---------------------------------------------------------------------------
def run_oracle_check(spark, sf_dir, name, df, oracle_sql, duckdb_mem="24GB"):
    """Full registered-oracle comparison at probe scale, with interrupt
    watchdog and size-capped value comparison."""
    from tests.oracle_mirror import compare, duckdb_conn

    con = duckdb_conn(sf_dir)
    con.execute(f"SET memory_limit='{duckdb_mem}'")
    con.execute("SET threads=16")
    spill = "/tmp/probe_duck_spill"
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    timer = threading.Timer(ORACLE_TIMEOUT_S, con.interrupt)
    timer.start()
    try:
        odf = con.execute(oracle_sql).fetchdf()
    except Exception as ex:  # noqa: BLE001 — interrupt lands here
        return {
            "mode": "oracle",
            "status": "oracle-timeout",
            "err": f"{type(ex).__name__}: {str(ex)[:200]}",
        }
    finally:
        timer.cancel()
        con.close()

    n_spark = df.count()
    if n_spark != len(odf):
        return {
            "mode": "oracle",
            "status": "fail",
            "err": f"row count {n_spark} vs oracle {len(odf)}",
        }
    if n_spark <= SAMPLED_COMPARE_ROWS:
        pdf = df.toPandas()
        problems = compare(pdf, odf)
        return {
            "mode": "oracle",
            "status": "pass" if not problems else "fail",
            "rows_compared": n_spark,
            **({"problems": [p[:300] for p in problems]} if problems else {}),
        }
    # Key-sampled value comparison: same integer-column predicate on
    # both engines; counts were already compared in full above. Keys
    # are tried id-like-first and MUST select a non-empty sample — a
    # low-cardinality count column (e.g. n_events) can hash-sample
    # zero rows, which would silently reduce the check to counts-only.
    int_cols = [c for c in sorted(odf.columns) if str(odf[c].dtype).startswith("int")]
    candidates = [c for c in int_cols if c.endswith("_id") or c.endswith("key")] + [
        c for c in int_cols if not (c.endswith("_id") or c.endswith("key"))
    ]
    key, odf_s = None, None
    for c in candidates:
        s = odf[odf[c] % SAMPLE_MOD == 0]
        if len(s):
            key, odf_s = c, s.reset_index(drop=True)
            break
    if key is None:
        pdf = df.toPandas()
        problems = compare(pdf, odf)
        return {
            "mode": "oracle",
            "status": "pass" if not problems else "fail",
            "rows_compared": n_spark,
            **({"problems": [p[:300] for p in problems]} if problems else {}),
        }
    pdf = df.filter((F.col(key) % SAMPLE_MOD) == 0).toPandas()
    problems = compare(pdf, odf_s)
    return {
        "mode": "oracle-sampled",
        "status": "pass" if not problems else "fail",
        "rows_total": n_spark,
        "rows_compared": len(pdf),
        "sample_key": key,
        **({"problems": [p[:300] for p in problems]} if problems else {}),
    }


# ---------------------------------------------------------------------------
# Shared exact recomputation helpers (mirror the ORACLE formulations,
# not the engine's — both engines already proved equal at sf1)
# ---------------------------------------------------------------------------
def _round_half_up(y: float) -> float:
    """HALF_UP at scale 0 of a double — EXACTLY Spark's ROUND semantics
    (BigDecimal HALF_UP on the exact binary expansion of the double):
    Decimal(float) is that exact expansion; quantize(1, HALF_UP) is the
    same tie rule. floor(y+0.5) would double-round within half an ulp
    of a .5 boundary."""
    import decimal

    return float(
        decimal.Decimal(y).quantize(decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP)
    )


def _quant(x: float, k: int) -> float:
    p = 10.0**k
    return _round_half_up(x * p) / p


def _cos6(a, b) -> float:
    """round6 cosine as the same left-to-right float64 folds both
    engines use (sql_cosine6 / functions.vectors.dot): plain Python
    loops, NOT numpy pairwise summation."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    return _quant(dot / (math.sqrt(na) * math.sqrt(nb)), 6)


def _fetch_texts(sf_dir, ids):
    import duckdb

    if not ids:
        return {}
    idl = ",".join(str(i) for i in sorted(ids))
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        f"WHERE doc_id IN ({idl})"
    ).fetchall()
    return dict(rows)


def _fetch_vectors(sf_dir, ids):
    import duckdb

    if not ids:
        return {}
    idl = ",".join(str(i) for i in sorted(ids))
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"WHERE vec_id IN ({idl})"
    ).fetchall()
    return dict(rows)


def _band_sigs(text: str) -> set[tuple[int, str]]:
    """(band, sig) set for one document — the oracle's shingle → md5 →
    two 48-bit slices → 16 affine minhashes → 8 bands of 2 pipeline,
    recomputed from first principles in Python."""
    import hashlib

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.functions.hashing import (
        MINHASH_N_BANDS,
        MINHASH_PARAMS,
        MINHASH_ROWS_PER_BAND,
        PRIME48,
    )

    toks = text.split(" ")
    if len(toks) < 3:
        return set()
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    mins = [None] * len(MINHASH_PARAMS)
    for sh in shingles:
        hx = hashlib.md5(sh.encode("utf-8")).hexdigest()
        x1, x2 = int(hx[0:12], 16), int(hx[12:24], 16)
        for j, (a, b) in enumerate(MINHASH_PARAMS):
            v = ((a * x1) % PRIME48 + x2 + b) % PRIME48
            if mins[j] is None or v < mins[j]:
                mins[j] = v
    out = set()
    for k in range(MINHASH_N_BANDS):
        cols = range(k * MINHASH_ROWS_PER_BAND, (k + 1) * MINHASH_ROWS_PER_BAND)
        out.add((k, ",".join(str(mins[j]) for j in cols)))
    return out


# Sampled component cache (CC's check collects component subgraphs;
# PageRank's reuses them instead of re-collecting).
_COMPONENT_SAMPLES: dict[str, dict] = {}


def _sampled_components(spark, sf_dir, queries, mod=101, cap=50):
    """Hash-sample whole components from the engine's CC output and
    collect each one's members and internal edges — CLOSED subgraphs,
    the unit both the BFS connectivity check and the exact PageRank
    recomputation need."""
    if sf_dir in _COMPONENT_SAMPLES:
        return _COMPONENT_SAMPLES[sf_dir]
    labels = queries["dedup_connected_components"](spark, sf_dir)
    n_vertices = labels.count()
    comp_ids = [
        r.component
        for r in labels.filter((F.col("component") % mod) == 0)
        .select("component")
        .distinct()
        .orderBy("component")
        .limit(cap)
        .collect()
    ]
    members: dict[int, set] = {c: set() for c in comp_ids}
    for r in labels.filter(F.col("component").isin(comp_ids)).collect():
        members[r.component].add(r.doc_id)
    pairs = queries["dedup_minhash_lsh"](spark, sf_dir).select("doc_a", "doc_b")
    lbl_a = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("component").alias("comp")
    )
    edges: dict[int, list] = {c: [] for c in comp_ids}
    for r in (
        pairs.join(lbl_a, "doc_a")
        .filter(F.col("comp").isin(comp_ids))
        .collect()
    ):
        edges[r.comp].append((r.doc_a, r.doc_b))
    out = {
        "n_vertices": n_vertices,
        "comp_ids": comp_ids,
        "members": members,
        "edges": edges,
    }
    _COMPONENT_SAMPLES[sf_dir] = out
    return out


# ---------------------------------------------------------------------------
# SAMPLED-mode checks, one per oracle-intractable member
# ---------------------------------------------------------------------------
def check_minhash_pairs(spark, sf_dir, df, queries):
    """Every hash-sampled emitted pair must genuinely share >=1 LSH
    band signature, recomputed from raw text (covers both the <=cap
    all-pairs branch and the over-cap star-chain branch — star pairs
    share the over-cap bucket's (band, sig) by construction)."""
    sample = (
        df.filter(((F.col("doc_a") + F.col("doc_b")) % SAMPLE_MOD) == 0)
        .orderBy("doc_a", "doc_b")
        .limit(SAMPLE_CAP)
        .collect()
    )
    ids = {r.doc_a for r in sample} | {r.doc_b for r in sample}
    texts = _fetch_texts(sf_dir, ids)
    sigs = {i: _band_sigs(t) for i, t in texts.items()}
    bad = [
        (r.doc_a, r.doc_b)
        for r in sample
        if not (sigs[r.doc_a] & sigs[r.doc_b])
    ]
    return {
        "mode": "sampled",
        "status": "pass" if not bad else "fail",
        "pairs_recomputed": len(sample),
        **({"violations": bad[:5]} if bad else {}),
    }


def check_connected_components(spark, sf_dir, df, queries):
    """(a) in-engine over ALL edges: both endpoints share a component;
    (b) in-engine over ALL components: the label is its members' min;
    (c) driver-side BFS over hash-sampled WHOLE components: each is
    genuinely connected (no improper merge)."""
    pairs = queries["dedup_minhash_lsh"](spark, sf_dir).select("doc_a", "doc_b")
    la = df.select(F.col("doc_id").alias("doc_a"), F.col("component").alias("ca"))
    lb = df.select(F.col("doc_id").alias("doc_b"), F.col("component").alias("cb"))
    split_edges = (
        pairs.join(la, "doc_a").join(lb, "doc_b")
        .filter(F.col("ca") != F.col("cb"))
        .count()
    )
    bad_labels = (
        df.groupBy("component")
        .agg(F.min("doc_id").alias("mn"))
        .filter(F.col("component") != F.col("mn"))
        .count()
    )
    s = _sampled_components(spark, sf_dir, queries)
    disconnected = []
    for c in s["comp_ids"]:
        mem, edg = s["members"][c], s["edges"][c]
        if len(mem) <= 1:
            continue
        adj: dict[int, list] = {}
        for a, b in edg:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        seen, stack = {c}, [c]
        while stack:
            for nb in adj.get(stack.pop(), []):
                if nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        if seen != mem:
            disconnected.append(c)
    ok = split_edges == 0 and bad_labels == 0 and not disconnected
    return {
        "mode": "sampled",
        "status": "pass" if ok else "fail",
        "split_edges": split_edges,
        "non_min_labels": bad_labels,
        "components_bfs_checked": len(s["comp_ids"]),
        **({"disconnected": disconnected[:5]} if disconnected else {}),
    }


def check_pagerank(spark, sf_dir, df, queries):
    """Exact recomputation of PageRank on hash-sampled WHOLE components
    (closed subgraphs: contributions cannot cross a component boundary,
    and the global vertex count n enters only through the shared
    (1-d)/n and 1/n terms), using the ORACLE's exact per-iteration
    quantization — 6dp half-up ranks, 9dp integer-nanounit decimal
    contribution sums. Sampled final ranks must be bit-identical."""
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (
        PR_DAMPING,
        PR_ITERS,
    )

    s = _sampled_components(spark, sf_dir, queries)
    n = s["n_vertices"]
    n_pr = df.count()
    if n_pr != n:
        return {
            "mode": "sampled",
            "status": "fail",
            "err": f"pagerank vertex count {n_pr} != component vertex count {n}",
        }
    sampled_ids = set().union(*s["members"].values()) if s["comp_ids"] else set()
    got = {
        r.doc_id: r.pagerank
        for r in df.filter(F.col("doc_id").isin(sorted(sampled_ids))).collect()
    }
    mismatches = []
    checked = 0
    for c in s["comp_ids"]:
        mem = sorted(s["members"][c])
        und = set()
        for a, b in s["edges"][c]:
            und.add((a, b))
            und.add((b, a))
        deg: dict[int, int] = {}
        for a, _ in und:
            deg[a] = deg.get(a, 0) + 1
        r = {v: _quant(1.0 / n, 6) for v in mem}
        for _ in range(PR_ITERS):
            contrib_nano: dict[int, int] = {v: 0 for v in mem}
            for a, b in und:
                contrib_nano[b] += int(_round_half_up(r[a] / deg[a] * 1e9))
            r = {
                v: _quant(
                    (1.0 - PR_DAMPING) / n
                    + PR_DAMPING * (float(contrib_nano[v]) / 1e9),
                    6,
                )
                for v in mem
            }
        for v in mem:
            checked += 1
            if got.get(v) != r[v]:
                mismatches.append((v, got.get(v), r[v]))
    return {
        "mode": "sampled",
        "status": "pass" if not mismatches else "fail",
        "ranks_recomputed": checked,
        "components": len(s["comp_ids"]),
        **({"mismatches": mismatches[:5]} if mismatches else {}),
    }


def check_filtered_corpus(spark, sf_dir, df, queries):
    """The 1-row rollup is DERIVED from the components output, so its
    check is arithmetic consistency against independently-recomputed
    counts (the components themselves are certified by their own
    sampled check, which runs first in the probe order)."""
    import duckdb

    row = df.collect()[0]
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    comp = queries["dedup_connected_components"](spark, sf_dir)
    n_dropped = comp.filter(F.col("doc_id") != F.col("component")).count()
    ok = (
        row.n_total == n_docs
        and row.n_dropped == n_dropped
        and row.n_kept == row.n_total - row.n_dropped
    )
    return {
        "mode": "sampled",
        "status": "pass" if ok else "fail",
        "n_total": row.n_total,
        "n_dropped": row.n_dropped,
        "n_kept": row.n_kept,
        "recomputed_docs": n_docs,
        "recomputed_dropped": n_dropped,
    }


def check_ann_lsh(spark, sf_dir, df, queries):
    """For hash-sampled probes: every reported cosine is bit-identical
    to the left-to-right quantized fold over the raw float32 vectors,
    the neighbor genuinely collides with the probe in >=1 sign-LSH
    table (buckets recomputed from the hyperplane literals), and the
    per-probe ranking is (cos desc, neighbor asc) consistent."""
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.functions.vectors import (
        LSH_TABLES,
        PLANES_PER_TABLE,
        _table_planes,
    )

    # The query's probe set is 20 fixed vectors — the full result is
    # tiny, so every probe is checked (no sampling needed here).
    rows = df.collect()
    by_probe: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.probe_id, r.rank)):
        by_probe.setdefault(r.probe_id, []).append(r)
    ids = {p for p in by_probe} | {
        r.neighbor_id for rs in by_probe.values() for r in rs
    }
    vecs = _fetch_vectors(sf_dir, ids)

    def buckets(v):
        out = set()
        for t in range(LSH_TABLES):
            b = 0
            for k, plane in enumerate(_table_planes(t)):
                dp = 0.0
                for x, p in zip(v, plane):
                    dp += float(x) * p
                if dp >= 0:
                    b |= 1 << k
            out.add((t, b))
        return out

    bad_cos, bad_bucket, bad_rank = [], [], []
    n_checked = 0
    for p, rs in by_probe.items():
        pb = buckets(vecs[p])
        prev = None
        for r in rs:
            n_checked += 1
            cs = _cos6(vecs[p], vecs[r.neighbor_id])
            if cs != r.cos_sim:
                bad_cos.append((p, r.neighbor_id, r.cos_sim, cs))
            if not (pb & buckets(vecs[r.neighbor_id])):
                bad_bucket.append((p, r.neighbor_id))
            key = (-r.cos_sim, r.neighbor_id)
            if prev is not None and key < prev:
                bad_rank.append((p, r.neighbor_id))
            prev = key
    ok = not (bad_cos or bad_bucket or bad_rank)
    return {
        "mode": "sampled",
        "status": "pass" if ok else "fail",
        "pairs_recomputed": n_checked,
        "probes": len(by_probe),
        **({"bad_cos": bad_cos[:3]} if bad_cos else {}),
        **({"bad_bucket": bad_bucket[:3]} if bad_bucket else {}),
        **({"bad_rank": bad_rank[:3]} if bad_rank else {}),
    }


def check_embedding_cosine(spark, sf_dir, df, queries):
    """(a) hash-sampled emitted pairs: cosine bit-identical to the
    shared quantized fold and >= tau; (b) no-false-negative spot-check
    on a bounded hash-chosen sub-corpus: every same-cell pair whose
    exact cosine clears tau (with quantization slack) must have been
    emitted — the property the per-cell salted join must not break."""
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (
        EMB_COSINE_TAU,
        _semdedup_member,
    )

    sample = (
        df.filter(((F.col("vec_a") + F.col("vec_b")) % SAMPLE_MOD) == 0)
        .orderBy("vec_a", "vec_b")
        .limit(SAMPLE_CAP)
        .collect()
    )
    ids = {r.vec_a for r in sample} | {r.vec_b for r in sample}
    vecs = _fetch_vectors(sf_dir, ids)
    bad = [
        (r.vec_a, r.vec_b, r.cos_sim, cs)
        for r in sample
        if (cs := _cos6(vecs[r.vec_a], vecs[r.vec_b])) != r.cos_sim
        or cs < EMB_COSINE_TAU
    ]

    member = _semdedup_member(spark, sf_dir)
    sub = [
        (r.vec_id, r.cluster)
        for r in member.filter((F.col("vec_id") % 251) == 0).collect()
    ]
    sub_ids = [v for v, _ in sub]
    sub_vecs = _fetch_vectors(sf_dir, sub_ids)
    cell = dict(sub)
    expected = set()
    for i, va in enumerate(sub_ids):
        for vb in sub_ids[i + 1 :]:
            if cell[va] != cell[vb]:
                continue
            lo, hi = min(va, vb), max(va, vb)
            if _cos6(sub_vecs[lo], sub_vecs[hi]) >= EMB_COSINE_TAU + 1e-4:
                expected.add((lo, hi))
    emitted = {
        (r.vec_a, r.vec_b)
        for r in df.filter(
            F.col("vec_a").isin(sub_ids) & F.col("vec_b").isin(sub_ids)
        ).collect()
    }
    missing = sorted(expected - emitted)
    ok = not bad and not missing
    return {
        "mode": "sampled",
        "status": "pass" if ok else "fail",
        "pairs_recomputed": len(sample),
        "subcorpus_vectors": len(sub_ids),
        "subcorpus_expected_pairs": len(expected),
        **({"bad_cos": bad[:3]} if bad else {}),
        **({"missing_pairs": missing[:5]} if missing else {}),
    }


def check_semdedup(spark, sf_dir, df, queries):
    """For hash-sampled vectors: max_sim_lower is bit-identical to the
    recomputed max quantized cosine against ALL lower-id cellmates
    (fetched via the engine's assignment, which the embedding-cosine
    check validates independently), and keep == (max < tau)."""
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (
        SEMDEDUP_TAU,
        _semdedup_member,
    )

    sample = (
        df.filter((F.col("vec_id") % SAMPLE_MOD) == 0)
        .orderBy("vec_id")
        .limit(SAMPLE_CAP // 2)
        .collect()
    )
    member = _semdedup_member(spark, sf_dir)
    clusters = sorted({r.cluster for r in sample})
    mates: dict[int, list] = {c: [] for c in clusters}
    for r in member.filter(F.col("cluster").isin(clusters)).collect():
        mates[r.cluster].append(r.vec_id)
    ids = {v for vs in mates.values() for v in vs}
    vecs = _fetch_vectors(sf_dir, ids)
    bad = []
    for r in sample:
        lower = [v for v in mates[r.cluster] if v < r.vec_id]
        mx = max(
            (_cos6(vecs[v], vecs[r.vec_id]) for v in lower), default=-1.0
        )
        if mx != r.max_sim_lower or r.keep != (mx < SEMDEDUP_TAU):
            bad.append((r.vec_id, r.max_sim_lower, mx))
    return {
        "mode": "sampled",
        "status": "pass" if not bad else "fail",
        "vectors_recomputed": len(sample),
        **({"mismatches": bad[:5]} if bad else {}),
    }


def check_ann_ivf(spark, sf_dir, df, queries):
    """For hash-sampled probes: cosines bit-identical to the shared
    fold, rk ordering (cos desc, neighbor asc) consistent, rk <= TOPK,
    and no self-neighbors."""
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.advanced_ops import (
        _TOPK,
    )

    rows = df.filter((F.col("probe_id") % 97) == 0).collect()
    by_probe: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.probe_id, r.rk)):
        by_probe.setdefault(r.probe_id, []).append(r)
    by_probe = dict(sorted(by_probe.items())[: SAMPLE_CAP // 5])
    ids = {p for p in by_probe} | {
        r.neighbor_id for rs in by_probe.values() for r in rs
    }
    vecs = _fetch_vectors(sf_dir, ids)
    bad = []
    n_checked = 0
    for p, rs in by_probe.items():
        prev = None
        for r in rs:
            n_checked += 1
            cs = _cos6(vecs[p], vecs[r.neighbor_id])
            if cs != r.cos_sim or r.rk > _TOPK or r.neighbor_id == p:
                bad.append((p, r.neighbor_id, r.cos_sim, cs))
            key = (-r.cos_sim, r.neighbor_id)
            if prev is not None and key < prev:
                bad.append((p, r.neighbor_id, "rank-order"))
            prev = key
    return {
        "mode": "sampled",
        "status": "pass" if not bad else "fail",
        "pairs_recomputed": n_checked,
        "probes": len(by_probe),
        **({"violations": bad[:5]} if bad else {}),
    }


# Members whose registered oracle is the QUADRATIC / recursive side at
# probe scale (sf1 oracle_s in parentheses) — they get bespoke sampled
# invariants instead; everything else runs the full oracle.
SAMPLED_CHECKS = {
    "dedup_minhash_lsh": check_minhash_pairs,  # all-pairs buckets (210 s)
    "dedup_connected_components": check_connected_components,  # recursive CTE (1102 s)
    "graph_pagerank_neardup": check_pagerank,  # unrolled iterations (1144 s)
    "dedup_filtered_corpus": check_filtered_corpus,  # embeds the CC CTE (2077 s)
    "sim_ann_lsh_bucketed": check_ann_lsh,  # bucket self-join (96 s)
    "dedup_embedding_cosine": check_embedding_cosine,  # cell pair CTE at 200k vectors
    "dedup_semdedup": check_semdedup,  # same member/pair CTEs
    "sim_ann_ivf": check_ann_ivf,  # assignment cross join at 200k x sqrt(N)
}


def run_self_check(spark, sf_dir, name, df, queries, oracle_sql):
    if name in SAMPLED_CHECKS:
        return SAMPLED_CHECKS[name](spark, sf_dir, df, queries)
    sql = oracle_sql.get(name)
    if sql is None:
        return {"mode": "none", "status": "pass", "reason": "no oracle registered"}
    return run_oracle_check(spark, sf_dir, name, df, sql)

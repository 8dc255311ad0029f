#!/usr/bin/env python
"""Cross-implementation verdict for the recursive-oracle dedup members
(`dedup_connected_components`, `dedup_filtered_corpus`) at scales the
registered DuckDB oracle cannot reach.

The registered oracle is a recursive CTE whose `reach` relation
materializes every (src, reachable-dst) pair — its dedup state cannot
spill, so it OOMs past ~10x (SF3_SWEEP_r07.json: filtered_corpus
aborted at DuckDB's 22.3 GiB cap after 2.9 h; the CC re-run was past
4 h / 32 GB and climbing when terminated). But the FIXPOINT the CTE
computes (label = min doc_id in the connected component) does not need
the reach relation: this script recomputes it with UNION-FIND (path
halving, larger root attached to smaller — a genuinely different
algorithm from the engine's min-label + pointer-jumping loop) and
compares EXACTLY, every vertex, no sampling.

Two edge sources split the verdict into layers:

- `--edges duckdb` (default): the candidate edges come from the
  registered MinHash-LSH **oracle SQL** (`_minhash_oracle()` — the
  same subquery the recursive oracle wraps), so the whole verdict is
  engine-independent: DuckDB derives the edges, union-find derives the
  components, and the engine must match both layers at once. The pair
  CTE is tractable far past the reach relation (sf1: 210 s vs the CC
  oracle's 1102 s; the reach state is what OOMs, not the pairs).
- `--edges engine`: the edges come from the engine's own
  `dedup_minhash_lsh` output. This checks the COMPONENT layer only —
  use it at scales where even the pair SQL is impractical (sf10),
  where the pair layer is separately evidenced by the raw-text
  re-derivation self-check (SF10_SCALE_r07.json: 400 sampled pairs
  re-derived from raw text through an independent banding path).

Checks performed (all exact, full-population):
1. engine `dedup_connected_components` == union-find labels: same
   vertex set, same (doc_id, component) assignment, every row.
2. engine `dedup_filtered_corpus` (n_total, n_dropped, n_kept) ==
   counts derived from union-find + the parquet footer's row count
   (pyarrow metadata — independent of both query engines).

Usage:
    python scripts/verify_cc_unionfind.py [--sf-dir /tmp/sf3]
        [--edges duckdb|engine] [--duckdb-mem 24GB] [--cores 8]
        [--out /tmp/cc_unionfind.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def union_find_components(doc_a: np.ndarray, doc_b: np.ndarray):
    """Exact connected components over an undirected edge list.

    Returns (verts, comp): verts sorted ascending, comp[i] = min doc_id
    in verts[i]'s component. Union always attaches the LARGER root
    index to the smaller, so parent chains are strictly decreasing
    (termination is structural, not probabilistic) and every final
    root is its component's minimum dense index — which, because
    np.unique sorts, is the component's minimum doc_id."""
    verts, idx = np.unique(np.concatenate([doc_a, doc_b]), return_inverse=True)
    n = len(verts)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    ea = idx[: len(doc_a)].tolist()
    eb = idx[len(doc_a) :].tolist()
    for a, b in zip(ea, eb):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
    return verts, verts[roots]


def _vec_round_half_up(y: np.ndarray) -> np.ndarray:
    """Vectorized HALF_UP at scale 0 of non-negative doubles, exactly
    matching Spark's ROUND (BigDecimal HALF_UP on the double's exact
    binary expansion). floor(y + 0.5) is correct whenever the addition
    cannot cross an integer boundary — guaranteed here for entries with
    |frac(y) - 0.5| >= 1e-6, since ulp(y + 0.5) < 1e-6 for every y this
    script feeds in (<= ~1e9). Entries within 1e-6 of a tie fall back
    to decimal.Decimal on the exact expansion (the same rule
    scripts/self_checks.py::_round_half_up uses), so a value exactly ON
    or within an ulp of a .5 boundary never double-rounds."""
    import decimal

    out = np.floor(y + 0.5)
    frac = y - np.floor(y)
    suspects = np.flatnonzero(np.abs(frac - 0.5) < 1e-6)
    for i in suspects:
        out[i] = float(
            decimal.Decimal(float(y[i])).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
            )
        )
    return out


def _pagerank_reference(
    verts: np.ndarray, doc_a: np.ndarray, doc_b: np.ndarray
) -> np.ndarray:
    """Full-population numpy mirror of graph_pagerank_neardup /
    _pagerank_oracle: 3 damped iterations over the undirected candidate
    graph with the engines' exact per-iteration quantization — ranks
    HALF_UP at 6dp (multiply-first), per-edge contributions HALF_UP at
    9dp as integer nanounits, per-vertex sums exact (every partial is
    an integer < 2^53, so float64 bincount accumulation is exact in any
    order — the same argument that makes the engines' DECIMAL(28,12)
    sums order-independent). IEEE op ORDER mirrors the engine
    expression tree: (r / deg) * 1e9, base + (damping * contrib)."""
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (
        PR_DAMPING,
        PR_ITERS,
    )

    src = np.searchsorted(verts, np.concatenate([doc_a, doc_b]))
    dst = np.searchsorted(verts, np.concatenate([doc_b, doc_a]))
    # distinct directed edges (the engine/oracle UNION both directions)
    directed = np.unique(np.stack([src, dst], axis=1), axis=0)
    src, dst = directed[:, 0], directed[:, 1]
    n = len(verts)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, _vec_round_half_up(np.array([1.0 / n * 1e6]))[0] / 1e6)
    base = (1.0 - PR_DAMPING) / float(n)
    for _ in range(PR_ITERS):
        c_nano = _vec_round_half_up(r[src] / deg[src] * 1e9)
        contrib = np.bincount(dst, weights=c_nano, minlength=n) / 1e9
        r = _vec_round_half_up((base + PR_DAMPING * contrib) * 1e6) / 1e6
    return r


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf3")
    ap.add_argument("--edges", choices=("duckdb", "engine"), default="duckdb")
    ap.add_argument("--duckdb-mem", default="24GB")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--out", default="/tmp/cc_unionfind.jsonl")
    ap.add_argument(
        "--pagerank",
        action="store_true",
        help="also recompute graph_pagerank_neardup FULL-POPULATION from "
        "the same edge set (numpy mirror of the oracle's quantized "
        "iterations: 6dp half-up ranks, 9dp integer-nanounit "
        "contributions summed exactly) and compare every rank "
        "bit-identical against the engine",
    )
    ap.add_argument(
        "--compare-engine-pairs",
        action="store_true",
        help="with --edges duckdb: also collect the engine's own "
        "dedup_minhash_lsh pairs and compare the two edge SETS exactly — "
        "a full cross-engine pair-layer verdict at scales the sweep's "
        "value-hash compare has not been run",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(max(16, args.cores * 2)))
        .config("spark.driver.memory", "16g")
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", f"/tmp/ccuf_spark_{os.getpid()}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    rec: dict = {"sf_dir": args.sf_dir, "edges": args.edges, "checks": {}}

    # --- edge extraction -------------------------------------------------
    t0 = time.time()
    if args.edges == "duckdb":
        from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (
            _minhash_oracle,
        )
        from tests.oracle_mirror import duckdb_conn

        con = duckdb_conn(args.sf_dir)
        con.execute(f"SET memory_limit='{args.duckdb_mem}'")
        spill = f"/tmp/ccuf_duck_spill_{os.getpid()}"
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET temp_directory='{spill}'")
        tbl = con.execute(
            f"SELECT doc_a, doc_b FROM ({_minhash_oracle()})"
        ).fetch_arrow_table()
        doc_a = tbl.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        doc_b = tbl.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        pdf = qs["dedup_minhash_lsh"](spark, args.sf_dir).select("doc_a", "doc_b").toPandas()
        doc_a = pdf["doc_a"].to_numpy(dtype=np.int64)
        doc_b = pdf["doc_b"].to_numpy(dtype=np.int64)
    rec["n_edges"] = int(len(doc_a))
    rec["edges_s"] = round(time.time() - t0, 2)

    if args.compare_engine_pairs and args.edges == "duckdb":
        t0 = time.time()
        epdf = (
            qs["dedup_minhash_lsh"](spark, args.sf_dir).select("doc_a", "doc_b").toPandas()
        )
        got_pairs = np.unique(
            np.stack(
                [epdf["doc_a"].to_numpy(np.int64), epdf["doc_b"].to_numpy(np.int64)], axis=1
            ),
            axis=0,
        )
        want_pairs = np.unique(np.stack([doc_a, doc_b], axis=1), axis=0)
        ok_pairs = got_pairs.shape == want_pairs.shape and bool(
            np.array_equal(got_pairs, want_pairs)
        )
        rec["checks"]["minhash_pair_set"] = {
            "status": "pass" if ok_pairs else "fail",
            "engine_pairs": int(len(epdf)),
            "oracle_pairs": int(len(doc_a)),
            "secs": round(time.time() - t0, 2),
            "detail": "exact (doc_a, doc_b) SET equality, oracle SQL vs engine",
        }

    # --- reference components (union-find) -------------------------------
    t0 = time.time()
    verts, comp = union_find_components(doc_a, doc_b)
    rec["n_vertices"] = int(len(verts))
    rec["n_components"] = int(np.unique(comp).size)
    rec["unionfind_s"] = round(time.time() - t0, 2)

    # --- check 1: engine connected components, every row -----------------
    t0 = time.time()
    cc = qs["dedup_connected_components"](spark, args.sf_dir).toPandas()
    rec["engine_cc_s"] = round(time.time() - t0, 2)
    cc = cc.sort_values("doc_id")
    got_v = cc["doc_id"].to_numpy(dtype=np.int64)
    got_c = cc["component"].to_numpy(dtype=np.int64)
    ok_cc = (
        len(got_v) == len(verts)
        and bool(np.array_equal(got_v, verts))
        and bool(np.array_equal(got_c, comp))
    )
    rec["checks"]["connected_components"] = {
        "status": "pass" if ok_cc else "fail",
        "rows": int(len(got_v)),
        "detail": "exact full-population (doc_id, component) match"
        if ok_cc
        else f"mismatch: engine {len(got_v)} verts vs union-find {len(verts)}; "
        f"first diffs v={verts[np.flatnonzero(~np.isin(verts, got_v))[:3]].tolist() if len(got_v) != len(verts) else 'n/a'}",
    }

    # --- check 2: filtered corpus counts ----------------------------------
    n_total = pq.ParquetFile(f"{args.sf_dir}/documents.parquet").metadata.num_rows
    n_dropped = int((comp != verts).sum())
    t0 = time.time()
    fc = qs["dedup_filtered_corpus"](spark, args.sf_dir).toPandas()
    rec["engine_fc_s"] = round(time.time() - t0, 2)
    got = (int(fc["n_total"][0]), int(fc["n_dropped"][0]), int(fc["n_kept"][0]))
    want = (int(n_total), n_dropped, int(n_total) - n_dropped)
    ok_fc = got == want
    rec["checks"]["filtered_corpus"] = {
        "status": "pass" if ok_fc else "fail",
        "engine": got,
        "unionfind": want,
        "detail": "counts derived from union-find + parquet footer row count",
    }

    # --- check 3 (optional): full-population PageRank ---------------------
    if args.pagerank:
        t0 = time.time()
        pr = qs["graph_pagerank_neardup"](spark, args.sf_dir).toPandas()
        rec["engine_pr_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        want_r = _pagerank_reference(verts, doc_a, doc_b)
        pr = pr.sort_values("doc_id")
        ok_pr = (
            len(pr) == len(verts)
            and bool(np.array_equal(pr["doc_id"].to_numpy(np.int64), verts))
            and bool(np.array_equal(pr["pagerank"].to_numpy(np.float64), want_r))
        )
        rec["checks"]["pagerank"] = {
            "status": "pass" if ok_pr else "fail",
            "ranks_compared": int(len(pr)),
            "recompute_s": round(time.time() - t0, 2),
            "detail": "full-population bit-identical quantized ranks"
            if ok_pr
            else f"mismatch: {int((pr['pagerank'].to_numpy(np.float64) != want_r).sum()) if len(pr) == len(verts) else 'vertex set differs'}",
        }

    rec["status"] = (
        "pass" if all(c["status"] == "pass" for c in rec["checks"].values()) else "fail"
    )
    with open(args.out, "a", buffering=1) as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))
    return 0 if rec["status"] == "pass" else 1


if __name__ == "__main__":
    sys.exit(main())

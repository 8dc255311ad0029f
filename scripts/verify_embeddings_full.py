#!/usr/bin/env python
"""Full-population cross-implementation verdict for the embedding
dedup family (`dedup_embedding_cosine`, `dedup_semdedup`) at scales
the registered DuckDB oracle cannot reach.

The registered oracles join the corpus against itself inside DuckDB
(O(Σ cell²) pair cosines in SQL) — tractable at sf1, already hours at
sf10. But the engines' cosine semantics make an EXACT numpy mirror
possible with no sampling and no tolerance:

- the cosine is a LEFT-TO-RIGHT float64 fold over dimensions
  (functions/vectors.py::dot / sql_dot). Accumulating over the
  dimension axis (`acc += A[:, d] * B[:, d]`) applies that identical
  IEEE op sequence to EVERY pair at once — vectorized across pairs,
  sequential across dims, bit-identical to the scalar loop.
- the 6dp quantization is HALF_UP (away from zero) on the product
  double (functions/exact.py::roundk). Mirrored sign-aware with
  floor(|y| + 0.5), falling back to exact decimal.Decimal within 1e-6
  of a tie so a boundary value never double-rounds (cosines are in
  [-1, 1], so |y| ≤ 1e6 and ulp(|y| + 0.5) < 1e-6 everywhere else).
- the cell assignment ranks by (max quantized sim, min cid) —
  np.argmax returns the FIRST maximum, and centroid columns are
  sorted by cid, so the tie rule falls out of the layout.

Checks (all exact, full-population):
1. dedup_semdedup: every (vec_id, cluster, max_sim_lower, keep) row —
   the assignment layer AND the per-vector max over in-cell
   lower-id pairs (including sub-τ pairs, which the emitted-pair
   query never shows).
2. dedup_embedding_cosine: the emitted (vec_a, vec_b, cos_sim) pair
   set, bit-identical cosines included — soundness AND completeness
   (the mirror enumerates every in-cell pair, so a pair the engine
   wrongly dropped would surface as a missing row).

Usage:
    python scripts/verify_embeddings_full.py [--sf-dir /tmp/sf10]
        [--cores 12] [--out /tmp/emb_full.jsonl]
"""

from __future__ import annotations

import argparse
import decimal
import json
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def round6_vec(y: np.ndarray) -> np.ndarray:
    """Sign-aware vectorized mirror of roundk(col, 6)'s outer ROUND:
    HALF_UP (away from zero) at scale 0 of y = x·10⁶, then the caller
    divides by 10⁶. floor(|y| + 0.5) is exact whenever the addition
    cannot cross an integer boundary — guaranteed for |y| ≤ ~1e9 when
    |frac| is ≥ 1e-6 from a tie; nearer entries use decimal.Decimal on
    the double's exact expansion (BigDecimal HALF_UP, the same rule
    Spark's ROUND applies)."""
    a = np.abs(y)
    out = np.floor(a + 0.5)
    frac = a - np.floor(a)
    suspects = np.flatnonzero(np.abs(frac - 0.5) < 1e-6)
    for i in suspects:
        out[i] = float(
            decimal.Decimal(float(a[i])).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
            )
        )
    return np.copysign(out, y)


def seq_fold_rows(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Per-row dot product as the engines' left-to-right fold: one IEEE
    add per dimension, in dimension order, for every row at once."""
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for d in range(A.shape[1]):
        acc = acc + A[:, d] * B[:, d]
    return acc


def load_store(sf_dir: str):
    """(vec_ids sorted asc, E float64 N×dim, nrm) — the numpy vector
    store with the engines' exact norm fold."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vec_ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    emb = t.column("embedding").combine_chunks()
    import pyarrow as pa

    if isinstance(emb, pa.ChunkedArray):
        emb = emb.chunk(0)
    dim = len(emb[0])
    # .flatten() honors the array offset; .values would silently
    # misalign every vector on a sliced/offset chunk
    vals = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    E = vals.reshape(len(vec_ids), dim)
    order = np.argsort(vec_ids, kind="stable")
    vec_ids, E = vec_ids[order], E[order]
    nrm = np.sqrt(seq_fold_rows(E, E))
    # a zero norm would propagate NaN through the quantized cosines,
    # and the mirror's argmax/strict-> NaN handling differs from the
    # engines' — fail loudly on degenerate input instead
    assert (nrm > 0).all(), "zero-norm embedding in store"
    return vec_ids, E, nrm


def assign_cells(vec_ids, E, nrm, k: int) -> np.ndarray:
    """cluster (= centroid vec_id) per vector: max round6 cosine to the
    first-k-ids codebook, ties to the smallest cid. Column-chunked so
    the sims matrix stays bounded."""
    cent_mask = vec_ids < k
    C, cn, cids = E[cent_mask], nrm[cent_mask], vec_ids[cent_mask]
    n = len(vec_ids)
    best_sim = np.full(n, -np.inf)
    best_cid = np.zeros(n, dtype=np.int64)
    blk = max(1, int(2e7) // n)
    for j0 in range(0, len(cids), blk):
        j1 = min(j0 + blk, len(cids))
        acc = np.zeros((n, j1 - j0), dtype=np.float64)
        for d in range(E.shape[1]):
            acc += E[:, d : d + 1] * C[j0:j1, d][None, :]
        sims = round6_vec((acc / (nrm[:, None] * cn[j0:j1][None, :]) * 1e6).ravel())
        sims = sims.reshape(n, j1 - j0) / 1e6
        # argmax is the FIRST max within the block; across blocks a
        # strictly-greater sim wins, equal sims keep the earlier
        # (smaller) cid — exactly min(struct(neg_sim, cid)).
        bj = np.argmax(sims, axis=1)
        bs = sims[np.arange(n), bj]
        take = bs > best_sim
        best_sim[take] = bs[take]
        best_cid[take] = cids[j0 + bj[take]]
    return best_cid


def reference_outputs(sf_dir: str, row_block: int = 4096) -> dict:
    """The full-population numpy reference for both family members:
    cell assignment, per-vector max over in-cell lower-id pairs, and
    the τ-filtered emitted pair set — all with the engines' exact fold
    and quantization semantics. Shared by main() and the unit tests
    (which pin it against the registered DuckDB oracle SQL)."""
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (
        EMB_COSINE_TAU,
        SEMDEDUP_TAU,
        _semdedup_k,
    )

    t0 = time.time()
    vec_ids, E, nrm = load_store(sf_dir)
    n = len(vec_ids)
    k = _semdedup_k(n)
    cluster = assign_cells(vec_ids, E, nrm, k)
    assign_s = round(time.time() - t0, 2)

    t0 = time.time()
    mx = np.full(n, -np.inf)
    pa_list, pb_list, cs_list = [], [], []
    order = np.argsort(cluster, kind="stable")
    bounds = np.flatnonzero(np.diff(cluster[order])) + 1
    total_pairs = 0
    for mem in np.split(order, bounds):
        w = len(mem)
        if w < 2:
            continue
        # members arrive vec_id-ascending (stable sort of an ascending
        # array), so i < j in cell order IS va < vb
        Ec, nc, ids = E[mem], nrm[mem], vec_ids[mem]
        cell_mx = np.full(w, -np.inf)
        for i0 in range(0, w, row_block):
            i1 = min(i0 + row_block, w)
            acc = np.zeros((i1 - i0, w), dtype=np.float64)
            for d in range(E.shape[1]):
                acc += Ec[i0:i1, d : d + 1] * Ec[:, d][None, :]
            cs = round6_vec((acc / (nc[i0:i1, None] * nc[None, :]) * 1e6).ravel())
            cs = cs.reshape(i1 - i0, w) / 1e6
            valid = np.arange(w)[None, :] > np.arange(i0, i1)[:, None]
            total_pairs += int(valid.sum())
            masked = np.where(valid, cs, -np.inf)
            cell_mx = np.maximum(cell_mx, masked.max(axis=0))
            ii, jj = np.nonzero(valid & (cs >= EMB_COSINE_TAU))
            if len(ii):
                pa_list.append(ids[i0 + ii])
                pb_list.append(ids[jj])
                cs_list.append(cs[ii, jj])
        mx[mem] = cell_mx
    ref_a = np.concatenate(pa_list) if pa_list else np.array([], dtype=np.int64)
    ref_b = np.concatenate(pb_list) if pb_list else np.array([], dtype=np.int64)
    ref_c = np.concatenate(cs_list) if cs_list else np.array([], dtype=np.float64)
    porder = np.lexsort((ref_b, ref_a))
    ref_mx = np.where(np.isneginf(mx), -1.0, mx)
    return {
        "vec_ids": vec_ids,
        "cluster": cluster,
        "max_sim_lower": ref_mx,
        "keep": ref_mx < SEMDEDUP_TAU,
        "pair_a": ref_a[porder],
        "pair_b": ref_b[porder],
        "pair_cs": ref_c[porder],
        "n_vectors": n,
        "k": k,
        "total_cell_pairs": total_pairs,
        "assign_s": assign_s,
        "pairs_s": round(time.time() - t0, 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--cores", type=int, default=12)
    ap.add_argument("--out", default="/tmp/emb_full.jsonl")
    ap.add_argument("--row-block", type=int, default=4096)
    args = ap.parse_args()

    rec: dict = {"sf_dir": args.sf_dir, "checks": {}}

    # --- numpy reference -------------------------------------------------
    ref = reference_outputs(args.sf_dir, args.row_block)
    vec_ids, n = ref["vec_ids"], ref["n_vectors"]
    cluster, ref_mx, ref_keep = ref["cluster"], ref["max_sim_lower"], ref["keep"]
    ref_a, ref_b, ref_c = ref["pair_a"], ref["pair_b"], ref["pair_cs"]
    rec.update(
        n_vectors=n,
        k=ref["k"],
        assign_s=ref["assign_s"],
        total_cell_pairs=ref["total_cell_pairs"],
        emitted_pairs=int(len(ref_a)),
        pairs_s=ref["pairs_s"],
    )

    # --- engine ----------------------------------------------------------
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(max(16, args.cores * 2)))
        .config("spark.driver.memory", "24g")
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", f"/tmp/embfull_spark_{os.getpid()}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()

    t0 = time.time()
    sd = qs["dedup_semdedup"](spark, args.sf_dir).toPandas().sort_values("vec_id")
    rec["engine_semdedup_s"] = round(time.time() - t0, 2)
    ok_sd = (
        len(sd) == n
        and bool(np.array_equal(sd["vec_id"].to_numpy(np.int64), vec_ids))
        and bool(np.array_equal(sd["cluster"].to_numpy(np.int64), cluster))
        and bool(np.array_equal(sd["max_sim_lower"].to_numpy(np.float64), ref_mx))
        and bool(np.array_equal(sd["keep"].to_numpy(bool), ref_keep))
    )
    rec["checks"]["semdedup"] = {
        "status": "pass" if ok_sd else "fail",
        "rows": int(len(sd)),
        "detail": "full-population (vec_id, cluster, max_sim_lower, keep) bit-identical"
        if ok_sd
        else "mismatch (assignment or max layer)",
    }

    t0 = time.time()
    ec = qs["dedup_embedding_cosine"](spark, args.sf_dir).toPandas()
    rec["engine_cosine_s"] = round(time.time() - t0, 2)
    ec = ec.sort_values(["vec_a", "vec_b"])
    ok_ec = (
        len(ec) == len(ref_a)
        and bool(np.array_equal(ec["vec_a"].to_numpy(np.int64), ref_a))
        and bool(np.array_equal(ec["vec_b"].to_numpy(np.int64), ref_b))
        and bool(np.array_equal(ec["cos_sim"].to_numpy(np.float64), ref_c))
    )
    rec["checks"]["embedding_cosine"] = {
        "status": "pass" if ok_ec else "fail",
        "rows": int(len(ec)),
        "detail": "full-population (vec_a, vec_b, cos_sim) set bit-identical"
        if ok_ec
        else f"mismatch: engine {len(ec)} pairs vs reference {len(ref_a)}",
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

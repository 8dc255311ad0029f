#!/usr/bin/env python
"""Full-population cross-implementation verdict for the ANN search
members (`sim_ann_ivf`, `sim_ann_lsh_bucketed`) at scales their
registered DuckDB oracles get expensive — the last embedding-family
members whose past-10x evidence was sampled (SF10_SCALE_r07.json:
216 / 60 re-folded pairs).

Same exactness argument as scripts/verify_embeddings_full.py: every
dot product in the family (assignment sims, hyperplane projections,
candidate scoring) is a left-to-right float64 fold over dimensions,
so a numpy mirror that accumulates over the dimension axis applies
the identical IEEE op sequence to every row at once; quantization is
the sign-aware HALF_UP-on-the-product-double with an exact Decimal
fallback at ties (round6_vec). The mirrors below recompute the FULL
search contract as the registered oracle SQL defines it:

- IVF: nlist = max(8, ⌊√N+0.5⌋), nprobe = max(3, ⌊√nlist+0.5⌋); cell
  membership = rank-1 centroid by (quantized sim DESC, cid); probes =
  every vec_id % 29 == 0 with their top-nprobe cells; candidates =
  members of probed cells minus the probe; top-3 by
  (cos_sim DESC, neighbor_id) — every probe's every rank compared.
- sign-LSH: 2 tables × 4 ±1-hyperplane bits; probe/top-k contract
  imported from plans.similarity (LSH_PROBE_LIMIT / LSH_TOPK);
  candidates = bucket collision in ANY table (per-pair MAX dedupes);
  top-3 by (cos_sim DESC, neighbor_id).

Usage:
    python scripts/verify_ann_full.py [--sf-dir /tmp/sf10] [--cores 12]
        [--out /tmp/ann_full.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from verify_embeddings_full import (  # noqa: E402
    assign_cells,
    load_store,
    round6_vec,
)


def _cos6_one_to_many(p: np.ndarray, pn: float, C: np.ndarray, cn: np.ndarray) -> np.ndarray:
    """Exact quantized cosine of one probe against many candidates:
    the same dimension-sequential fold, vectorized across candidates."""
    acc = np.zeros(len(C), dtype=np.float64)
    for d in range(len(p)):
        acc = acc + p[d] * C[:, d]
    return round6_vec(acc / (pn * cn) * 1e6) / 1e6


def _topk_rows(probe_id, cand_ids, cos, k):
    """Top-k by (cos DESC, neighbor_id ASC) with 1-based ranks — the
    ROW_NUMBER() contract both registered oracles use."""
    order = np.lexsort((cand_ids, -cos))[:k]
    return [
        (int(probe_id), int(cand_ids[j]), float(cos[j]), r + 1)
        for r, j in enumerate(order)
    ]


def reference_ivf(sf_dir: str) -> list[tuple]:
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.advanced_ops import (
        _PROBE_MOD,
        _TOPK,
        _ivf_k,
        _ivf_nprobe,
    )

    vec_ids, E, nrm = load_store(sf_dir)
    n = len(vec_ids)
    k = _ivf_k(n)
    nprobe = _ivf_nprobe(k)
    member = assign_cells(vec_ids, E, nrm, k)

    cent_mask = vec_ids < k
    C, cn, cids = E[cent_mask], nrm[cent_mask], vec_ids[cent_mask]
    cell_members: dict[int, np.ndarray] = {
        int(c): np.flatnonzero(member == c) for c in np.unique(member)
    }

    probe_idx = np.flatnonzero(vec_ids % _PROBE_MOD == 0)
    rows: list[tuple] = []
    for i in probe_idx:
        sims = _cos6_one_to_many(E[i], nrm[i], C, cn)
        top_cells = cids[np.lexsort((cids, -sims))[:nprobe]]
        cand = np.concatenate(
            [cell_members[int(c)] for c in top_cells if int(c) in cell_members]
        )
        cand = cand[vec_ids[cand] != vec_ids[i]]
        if not len(cand):
            continue
        cos = _cos6_one_to_many(E[i], nrm[i], E[cand], nrm[cand])
        rows.extend(_topk_rows(vec_ids[i], vec_ids[cand], cos, _TOPK))
    return rows


def reference_lsh(sf_dir: str) -> list[tuple]:
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.functions.vectors import (
        LSH_TABLES,
        _table_planes,
    )
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.similarity import (
        LSH_PROBE_LIMIT,
        LSH_TOPK,
    )

    vec_ids, E, nrm = load_store(sf_dir)
    buckets = []
    for t in range(LSH_TABLES):
        b = np.zeros(len(vec_ids), dtype=np.int64)
        for kbit, plane in enumerate(_table_planes(t)):
            proj = np.zeros(len(vec_ids), dtype=np.float64)
            pl = np.asarray(plane, dtype=np.float64)
            for d in range(E.shape[1]):
                proj = proj + E[:, d] * pl[d]
            b += np.where(proj > 0, 1 << kbit, 0)
        buckets.append(b)

    probe_idx = np.flatnonzero(vec_ids < LSH_PROBE_LIMIT)
    rows: list[tuple] = []
    for i in probe_idx:
        cand_mask = np.zeros(len(vec_ids), dtype=bool)
        for t in range(LSH_TABLES):
            cand_mask |= buckets[t] == buckets[t][i]
        cand_mask[i] = False
        cand = np.flatnonzero(cand_mask)
        if not len(cand):
            continue
        cos = _cos6_one_to_many(E[i], nrm[i], E[cand], nrm[cand])
        rows.extend(_topk_rows(vec_ids[i], vec_ids[cand], cos, LSH_TOPK))
    return rows


def _compare(pdf, ref_rows, rank_col):
    got = sorted(
        zip(
            pdf["probe_id"].astype("int64"),
            pdf["neighbor_id"].astype("int64"),
            pdf["cos_sim"].astype("float64"),
            pdf[rank_col].astype("int64"),
        )
    )
    want = sorted((a, b, c, r) for a, b, c, r in ref_rows)
    ok = len(got) == len(want) and all(
        g[0] == w[0] and g[1] == w[1] and g[2] == w[2] and g[3] == w[3]
        for g, w in zip(got, want)
    )
    return {
        "status": "pass" if ok else "fail",
        "rows": len(got),
        "detail": f"full-population (probe_id, neighbor_id, cos_sim, {rank_col}) bit-identical"
        if ok
        else f"mismatch: engine {len(got)} rows vs reference {len(want)}",
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--cores", type=int, default=12)
    ap.add_argument("--out", default="/tmp/ann_full.jsonl")
    args = ap.parse_args()

    rec: dict = {"sf_dir": args.sf_dir, "checks": {}}

    t0 = time.time()
    ref_ivf = reference_ivf(args.sf_dir)
    rec["ivf_ref_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    ref_lsh = reference_lsh(args.sf_dir)
    rec["lsh_ref_s"] = round(time.time() - t0, 2)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(max(16, args.cores * 2)))
        .config("spark.driver.memory", "24g")
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", f"/tmp/annfull_spark_{os.getpid()}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()

    t0 = time.time()
    ivf = qs["sim_ann_ivf"](spark, args.sf_dir).toPandas()
    rec["engine_ivf_s"] = round(time.time() - t0, 2)
    rank_col = "rk" if "rk" in ivf.columns else "rank"
    rec["checks"]["sim_ann_ivf"] = _compare(ivf, ref_ivf, rank_col)

    t0 = time.time()
    lsh = qs["sim_ann_lsh_bucketed"](spark, args.sf_dir).toPandas()
    rec["engine_lsh_s"] = round(time.time() - t0, 2)
    rank_col = "rk" if "rk" in lsh.columns else "rank"
    rec["checks"]["sim_ann_lsh_bucketed"] = _compare(lsh, ref_lsh, rank_col)

    rec["status"] = (
        "pass" if all(c["status"] == "pass" for c in rec["checks"].values()) else "fail"
    )
    with open(args.out, "a", buffering=1) as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))
    return 0 if rec["status"] == "pass" else 1


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Full-population exact verdict for dedup_prefix_filter_jaccard past
the SQL oracle's reach (VERDICT r7, next-round item 2).

The member's registered DuckDB oracle is quadratic in shingle document
frequency (the token-level `inter` join): at full sf1 it spilled 31 GB
and ran >1.5 h without finishing; at sf10 it is hopeless. The round-7
exact-mirror discipline closes the gap: replay the operator's entire
deterministic pipeline in numpy — shingling, document-frequency
ordering, prefix extraction, candidate blocking, the length and
positional filters, and exact set-intersection verification — and
compare the FULL population of emitted rows bit-exactly against the
engine:

- soundness: every engine row's (n_common, n_union, jaccard) is
  recomputed from the raw shingle sets with integer set arithmetic
  and the engines' shared quantization (round6_vec);
- completeness: the mirror enumerates EVERY candidate the prefix
  blocking admits (every pair sharing a prefix shingle, before any
  engine join machinery) and adjudicates each one, so a pair the
  engine's salted/filtered joins wrongly dropped would surface as a
  missing row. Absolute completeness beyond the blocked space is the
  prefix-filter theorem (Chaudhuri et al. SSJoin; Xiao et al. PPJoin)
  — mathematics shared by engine, oracle, and mirror — and the
  length/positional filters' admissibility is separately cross-checked
  against the filter-free registered oracle SQL at sf0.01/sf1-sub
  (tests/test_prefix_jaccard_full_verifier.py pins this mirror against
  that oracle on a tie-forcing synthetic corpus).

Mirror semantics pinned to the engines:
- shingles: distinct 3-token whitespace shingles, docs with >= 3
  tokens (text.split(' ') keeps empty tokens, as STRING_SPLIT and
  F.split do);
- ordering: (document frequency ASC, shingle string ASC) — shingle ids
  are assigned in lexicographic order so (dfc, id) == (dfc, sh);
- prefix length: m - ceil(0.6 * m) + 1 with the DOUBLE product the
  engine computes (F.ceil(F.lit(t) * m));
- filters: the half-unit-relaxed length and positional bounds,
  verbatim float arithmetic;
- quantization: jaccard = round6_vec((nc / nu) * 1e6) / 1e6, the
  multiply-form HALF_UP shared by every engine ROUND site.

Usage: python scripts/verify_prefix_jaccard_full.py \
          [--sf-dir /tmp/sf10] [--out /tmp/pfj_full.jsonl]
Appends one JSON verdict line per run; the round artifact collects
them as PFJ_FULL_r{N}.json.
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

from verify_embeddings_full import round6_vec  # noqa: E402

from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (  # noqa: E402
    PF_JACCARD_T,
)

# Work-granule for candidate-pair buffering before chunk-local unique:
# big enough that the O(n log n) sorts amortize, small enough that a
# chunk stays cache-of-RAM friendly (64M int64 keys = 512 MB).
_CHUNK_KEYS = 64_000_000


def load_shingles(sf_dir: str):
    """Per-doc distinct shingle sets with lexicographic shingle ids.

    Returns (doc_ids asc, flat shingle-id array, per-doc offsets,
    per-doc sizes m, vocab size V). Docs with < 3 tokens carry m = 0
    (excluded from toks by both engines)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t.column("text").to_pylist()
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]

    vocab: dict[str, int] = {}
    per_doc: list[np.ndarray] = []
    empty = np.empty(0, dtype=np.int64)
    for j in order:
        toks = texts[j].split(" ")
        if len(toks) < 3:
            per_doc.append(empty)
            continue
        shs = {
            " ".join((toks[i], toks[i + 1], toks[i + 2]))
            for i in range(len(toks) - 2)
        }
        per_doc.append(
            np.fromiter(
                (vocab.setdefault(s, len(vocab)) for s in shs),
                dtype=np.int64,
                count=len(shs),
            )
        )

    # provisional first-seen ids -> lexicographic ranks, so integer id
    # order IS the engines' ORDER BY sh (binary/codepoint collation)
    words = np.array(list(vocab.keys()))
    rank = np.empty(len(words), dtype=np.int64)
    rank[np.argsort(words, kind="stable")] = np.arange(len(words))

    m = np.fromiter((len(a) for a in per_doc), dtype=np.int64, count=len(per_doc))
    offsets = np.concatenate(([0], np.cumsum(m)))
    flat = rank[np.concatenate(per_doc)] if len(words) else empty
    return doc_ids, flat, offsets, m, len(words)


def _ordered_prefix(flat, offsets, m, V):
    """(prefix_sh, prefix_docidx, ia, ma): the prefix entries in the
    engines' (dfc ASC, sh ASC) per-doc order, with 1-based positions."""
    dfc = np.bincount(flat, minlength=V)
    n_docs = len(m)
    doc_index = np.repeat(np.arange(n_docs, dtype=np.int64), m)
    # primary doc, then dfc, then lexicographic id — np.lexsort keys
    # are listed minor-to-major
    order = np.lexsort((flat, dfc[flat], doc_index))
    s_flat, s_doc = flat[order], doc_index[order]
    i_pos = np.arange(len(s_flat), dtype=np.int64) - np.repeat(offsets[:-1], m) + 1
    # prefix cutoff: m - ceil(t*m) + 1, t*m as the engine's double product
    cutoff = m - np.ceil(PF_JACCARD_T * m.astype(np.float64)).astype(np.int64) + 1
    mask = i_pos <= cutoff[s_doc]
    return s_flat[mask], s_doc[mask], i_pos[mask], m[s_doc[mask]]


def _candidates(p_sh, p_doc, p_ia, p_ma, n_docs):
    """Distinct blocked candidate pairs surviving the length and
    positional filters, as packed int64 keys (docidx_a * 2^bits +
    docidx_b). Enumerates every pair sharing a prefix shingle —
    grouped by shingle, pairs within a group via cached triu indices —
    and filters each emission chunk before the chunk-local unique."""
    bits = max(1, int(n_docs - 1).bit_length())
    assert 2 * bits <= 62, "doc index domain too wide for packed keys"
    shift = np.int64(1) << np.int64(bits)

    order = np.lexsort((p_doc, p_sh))
    g_sh, g_doc, g_ia, g_ma = p_sh[order], p_doc[order], p_ia[order], p_ma[order]
    bounds = np.concatenate(
        ([0], np.flatnonzero(np.diff(g_sh)) + 1, [len(g_sh)])
    )
    of = PF_JACCARD_T / (1.0 + PF_JACCARD_T)

    triu_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    uniq_chunks: list[np.ndarray] = []
    buf: list[np.ndarray] = []
    buffered = 0
    emissions = survivors = 0

    def flush():
        nonlocal buffered
        if buf:
            uniq_chunks.append(np.unique(np.concatenate(buf)))
            buf.clear()
            buffered = 0

    for gi in range(len(bounds) - 1):
        lo, hi = bounds[gi], bounds[gi + 1]
        k = hi - lo
        if k < 2:
            continue
        if k in triu_cache:
            iu, ju = triu_cache[k]
        else:
            iu, ju = np.triu_indices(k, 1)
            if k <= 512:  # cache only small widths — a few MB total
                triu_cache[k] = (iu, ju)
        # docs ascend within a group (lexsort minor key), so a < b holds
        ma, mb = g_ma[lo:hi][iu], g_ma[lo:hi][ju]
        ia, ib = g_ia[lo:hi][iu], g_ia[lo:hi][ju]
        emissions += len(ma)
        keep = np.minimum(ma, mb) >= PF_JACCARD_T * np.maximum(ma, mb) - 0.5
        keep &= 1 + np.minimum(ma - ia, mb - ib) >= of * (ma + mb) - 0.5
        if not keep.any():
            continue
        survivors += int(keep.sum())
        keys = g_doc[lo:hi][iu[keep]] * shift + g_doc[lo:hi][ju[keep]]
        buf.append(keys)
        buffered += len(keys)
        if buffered >= _CHUNK_KEYS:
            flush()
    flush()
    if not uniq_chunks:
        return np.empty(0, dtype=np.int64), bits, emissions, survivors
    cand = np.unique(np.concatenate(uniq_chunks))
    return cand, bits, emissions, survivors


def _verify_pairs(cand_keys, bits, flat, offsets, m, V):
    """Exact n_common for every candidate pair via the stamp-gather
    pattern: keys are sorted (np.unique), hence grouped by docidx_a;
    per group, stamp doc_a's shingle ids, gather every partner's flat
    entries with one vectorized index expression, and segment-sum the
    membership hits with add.reduceat."""
    a_idx = (cand_keys >> np.int64(bits)).astype(np.int64)
    b_idx = (cand_keys & ((np.int64(1) << np.int64(bits)) - 1)).astype(np.int64)
    n_common = np.zeros(len(cand_keys), dtype=np.int64)
    stamp = np.full(V, -1, dtype=np.int64)
    g_bounds = np.concatenate(
        ([0], np.flatnonzero(np.diff(a_idx)) + 1, [len(a_idx)])
    )
    for gi in range(len(g_bounds) - 1):
        lo, hi = g_bounds[gi], g_bounds[gi + 1]
        a = a_idx[lo]
        stamp[flat[offsets[a] : offsets[a + 1]]] = a
        bs = b_idx[lo:hi]
        lens = m[bs]
        starts = offsets[bs]
        total = int(lens.sum())
        if total == 0:
            continue
        seg = np.concatenate(([0], np.cumsum(lens)[:-1]))
        gather = np.arange(total, dtype=np.int64) + np.repeat(starts - seg, lens)
        # cast before reduceat: np.add.reduceat on bool is logical-or
        hits = (stamp[flat[gather]] == a).astype(np.int64)
        n_common[lo:hi] = np.add.reduceat(hits, seg)
    return a_idx, b_idx, n_common


def reference_output(sf_dir: str) -> dict:
    """The full-population mirror: every blocked candidate adjudicated
    exactly. Returns arrays sorted by (doc_a, doc_b) for the emitted
    rows plus blocking statistics."""
    doc_ids, flat, offsets, m, V = load_shingles(sf_dir)
    p_sh, p_doc, p_ia, p_ma = _ordered_prefix(flat, offsets, m, V)
    cand, bits, emissions, filtered = _candidates(
        p_sh, p_doc, p_ia, p_ma, len(doc_ids)
    )
    a_idx, b_idx, nc = _verify_pairs(cand, bits, flat, offsets, m, V)
    ma, mb = m[a_idx], m[b_idx]
    nu = ma + mb - nc
    ratio = nc.astype(np.float64) / nu.astype(np.float64)
    keep = ratio >= PF_JACCARD_T
    jacc = round6_vec(ratio[keep] * 1e6) / 1e6
    return {
        "doc_a": doc_ids[a_idx[keep]],
        "doc_b": doc_ids[b_idx[keep]],
        "n_common": nc[keep],
        "n_union": nu[keep],
        "jaccard": jacc,
        "stats": {
            "docs": len(doc_ids),
            "vocab": V,
            "emissions": int(emissions),
            "after_filters": int(filtered),
            "distinct_candidates": len(cand),
            "emitted": int(keep.sum()),
        },
    }


def compare_engine(pdf, ref) -> dict:
    """Bit-exact full-population set compare of the engine result
    against the mirror (both keyed by (doc_a, doc_b))."""
    got = np.lexsort((pdf["doc_b"].to_numpy(np.int64), pdf["doc_a"].to_numpy(np.int64)))
    checks = {
        "rows": len(pdf) == len(ref["doc_a"]),
    }
    if checks["rows"]:
        checks["pairs"] = bool(
            np.array_equal(pdf["doc_a"].to_numpy(np.int64)[got], ref["doc_a"])
            and np.array_equal(pdf["doc_b"].to_numpy(np.int64)[got], ref["doc_b"])
        )
        checks["n_common"] = bool(
            np.array_equal(pdf["n_common"].to_numpy(np.int64)[got], ref["n_common"])
        )
        checks["n_union"] = bool(
            np.array_equal(pdf["n_union"].to_numpy(np.int64)[got], ref["n_union"])
        )
        checks["jaccard"] = bool(
            np.array_equal(pdf["jaccard"].to_numpy(np.float64)[got], ref["jaccard"])
        )
    ok = all(checks.values()) and len(checks) == 5
    return {
        "status": "pass" if ok else "fail",
        "rows": int(len(pdf)),
        "checks": checks,
        "detail": "full-population (doc_a, doc_b, n_common, n_union, jaccard) bit-identical"
        if ok
        else "mismatch",
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--out", default="/tmp/pfj_full.jsonl")
    ap.add_argument(
        "--save-parquet",
        default=None,
        help="on pass, save the certified rows here — the sf10 suite "
        "closure (verify_advanced_suite_sf10.py) swaps them in for the "
        "member's intractable oracle SQL",
    )
    args = ap.parse_args()

    rec: dict = {"sf_dir": args.sf_dir, "checks": {}}

    t0 = time.time()
    ref = reference_output(args.sf_dir)
    rec["mirror_s"] = round(time.time() - t0, 2)
    rec["stats"] = ref["stats"]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(2 * args.cores))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    t0 = time.time()
    pdf = e.queries()["dedup_prefix_filter_jaccard"](spark, args.sf_dir).toPandas()
    rec["engine_s"] = round(time.time() - t0, 2)
    rec["checks"]["dedup_prefix_filter_jaccard"] = compare_engine(pdf, ref)

    rec["status"] = (
        "pass" if all(c["status"] == "pass" for c in rec["checks"].values()) else "fail"
    )
    if args.save_parquet and rec["status"] == "pass":
        import pyarrow as pa

        pq.write_table(
            pa.table(
                {
                    "doc_a": ref["doc_a"],
                    "doc_b": ref["doc_b"],
                    "n_common": ref["n_common"],
                    "n_union": ref["n_union"],
                    "jaccard": ref["jaccard"],
                }
            ),
            args.save_parquet,
        )
        rec["saved"] = args.save_parquet
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))
    return 0 if rec["status"] == "pass" else 1


if __name__ == "__main__":
    sys.exit(main())

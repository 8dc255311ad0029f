#!/usr/bin/env python
"""Spark-side-only scale run: execute selected registered queries at a
large scale factor (default /tmp/sf10 = 100x sf0.1, built by composing
scripts/gen_sf1.py on /tmp/sf1) and journal wall time + output
cardinality. No oracle — DuckDB's single-node formulations are
intractable at this scale (the recursive-CTE components oracle already
took 18 min at sf1); the evidence this run produces is the SCALE
posture itself: the operator completes, output cardinality is sane,
guards trip (or don't) as designed, and time scales sublinearly.

Composition note: re-replicating sf1 makes document near-dup clusters
~100 wide (suffix tokens compose) and introduces exact text duplicates
across copy pairs (i,0)/(0,i) — deliberately harsher than linear
scaling for the dedup family's star-chain / hot-cell / cap guards.

Round 7 adds SELF-CHECKS (scripts/self_checks.py): after the noop-write
execution, each query's result is validated — via its full registered
DuckDB oracle where that oracle is tractable at probe scale (with an
interrupt watchdog and key-sampled value comparison past 2M rows), or
via bespoke sampled invariants (exact recomputation of hash-sampled
claims) for the members whose oracle is the quadratic/recursive side.
The journal rows carry a "self_check" object; --no-self-check restores
the completion-only round-6 behavior.

Usage: python scripts/scale_run.py [--sf-dir /tmp/sf10]
           [--journal /tmp/sf10_scale.jsonl] [--only a,b,c]
           [--no-self-check]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

# Heaviest members of each family: the dedup/similarity chain (cluster
# width stress), full-corpus text ops, fact-table TPC-H heads, and the
# event-stream family. Suites and streaming drains are excluded — their
# cost is fixture- and startup-dominated, not data-scale-dominated.
DEFAULT = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_volume_customers",
    "json_extract_events",
    "events_sessionization",
    "events_multires_rollup",
    "window_running_lag",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_semdedup",
    "dedup_connected_components",
    "dedup_filtered_corpus",
    "graph_pagerank_neardup",
    "sim_cosine_topk_bruteforce",
    "sim_ann_lsh_bucketed",
    "sim_ann_ivf",
    "cluster_kmeans_embeddings",
    "embedding_centroids",
    "text_fingerprint",
    "text_quality_score",
    "text_tfidf_top_terms",
    "corpus_quality_filter",
    "corpus_decontaminate",
    "corpus_pack_sequences",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--journal", default="/tmp/sf10_scale.jsonl")
    ap.add_argument("--only", default="")
    ap.add_argument("--no-self-check", action="store_true")
    args = ap.parse_args()

    names = args.only.split(",") if args.only else DEFAULT
    # Last-record-wins (mirrors sweep_sf1.py): a query whose LATEST
    # journal entry is an error — a regression caught on re-run — must
    # not be skipped on resume because some OLDER line says "pass".
    latest: dict[str, str] = {}
    if os.path.exists(args.journal):
        with open(args.journal) as f:
            for line in f:
                rec = json.loads(line)
                latest[rec["name"]] = rec.get("status", "")
    done = {n for n, s in latest.items() if s == "pass"}

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "72g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", "/tmp/sf10_spark_local")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    if not args.no_self_check:
        from self_checks import run_self_check
    out = open(args.journal, "a", buffering=1)
    n_fail = 0
    for name in names:
        if name in done:
            print(f"skip {name} (already green)", flush=True)
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf_dir)
            # noop write FIRST: it evaluates every output column, which
            # .count() does not — Catalyst legally prunes whole
            # subtrees under count (a left join keyed by an aggregate
            # preserves cardinality, window columns don't change it),
            # so a count-only run can report "pass" without ever
            # executing the operator's real pipeline.
            df.write.format("noop").mode("overwrite").save()
            t_exec = round(time.time() - t0, 2)
            rec = {
                "name": name,
                "status": "pass",
                "rows": df.count(),
                "secs": t_exec,
            }
            if not args.no_self_check:
                t1 = time.time()
                sc = run_self_check(spark, args.sf_dir, name, df, qs, osql)
                sc["secs"] = round(time.time() - t1, 2)
                rec["self_check"] = sc
                if sc["status"] != "pass":
                    rec["status"] = "self-check-" + sc["status"]
                    n_fail += 1
        except Exception as ex:  # noqa: BLE001 — journal and continue
            rec = {
                "name": name,
                "status": "error",
                "err": f"{type(ex).__name__}: {str(ex)[:500]}",
                "secs": round(time.time() - t0, 2),
            }
            n_fail += 1
        out.write(json.dumps(rec) + "\n")
        print(f"{rec['status']:5s} {name} {rec}", flush=True)
    out.close()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

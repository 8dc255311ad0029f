#!/usr/bin/env python
"""Layered oracle verdict for `advanced_misc_suite` at sf10 — the last
registry member without a 100x hash-grade compare (VERDICT r7 item 2).

The suite digest's oracle embeds every member's oracle SQL verbatim.
Three embedded members are intractable in DuckDB at sf10:

- `dedup_prefix_filter_jaccard`: quadratic token-level inter join —
  swapped for the rows certified FULL-POPULATION by the numpy mirror
  (scripts/verify_prefix_jaccard_full.py --save-parquet);
- `graph_pagerank_neardup`: the quantized-iteration SQL last completed
  at sf3 in 4577 s — swapped for the numpy mirror's ranks recomputed
  here from the DuckDB-extracted oracle edge set (bit-identical to the
  engine at sf10/sf30, CC_UNIONFIND_r07.json);
- `corpus_end_to_end_accounting`: embeds the recursive-reach CC CTE
  (OOM past ~10x) — ONLY that subquery is swapped for path-halving
  union-find components over the same oracle edges (the
  verify_accounting_sf10.py precedent).

Every other character of the registered suite oracle — the ten
tractable member oracles and all digest folds — runs verbatim in
DuckDB, and the engine's suite DataFrame is compared with the driver's
own hash-grade compare. Each swapped table is itself full-population
certified by an exact cross-implementation mirror, so the layered
verdict composes certified layers, not assumptions.

Usage:
    python scripts/verify_advanced_suite_sf10.py [--sf-dir /tmp/sf10]
        [--pfj-parquet /tmp/pfj_sf10_certified.parquet]
        [--duckdb-mem 40GB] [--cores 12] [--out /tmp/adv_suite.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from verify_cc_unionfind import (  # noqa: E402
    _pagerank_reference,
    union_find_components,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--pfj-parquet", default="/tmp/pfj_sf10_certified.parquet")
    ap.add_argument("--duckdb-mem", default="40GB")
    ap.add_argument("--cores", type=int, default=12)
    ap.add_argument("--out", default="/tmp/adv_suite.jsonl")
    args = ap.parse_args()

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (
        _minhash_oracle,
    )
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.registry import (
        REGISTRY,
        load_all,
    )
    from tests.oracle_mirror import compare, duckdb_conn

    load_all()
    rec: dict = {"sf_dir": args.sf_dir, "name": "advanced_misc_suite"}

    con = duckdb_conn(args.sf_dir)
    con.execute(f"SET memory_limit='{args.duckdb_mem}'")
    spill = f"/tmp/advsuite_duck_spill_{os.getpid()}"
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")

    # --- certified layer 1: components + ranks from the oracle edges ----
    t0 = time.time()
    tbl = con.execute(
        f"SELECT doc_a, doc_b FROM ({_minhash_oracle()})"
    ).fetch_arrow_table()
    doc_a = tbl.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
    doc_b = tbl.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
    rec["edges_s"] = round(time.time() - t0, 2)
    rec["n_edges"] = int(len(doc_a))

    t0 = time.time()
    verts, comp = union_find_components(doc_a, doc_b)
    ranks = _pagerank_reference(verts, doc_a, doc_b)
    rec["mirror_s"] = round(time.time() - t0, 2)

    con.register("cc_arrow", pa.table({"doc_id": verts, "component": comp}))
    con.execute("CREATE TEMP TABLE cc_components AS SELECT * FROM cc_arrow")
    con.register("pr_arrow", pa.table({"doc_id": verts, "pagerank": ranks}))
    con.execute("CREATE TEMP TABLE pr_certified AS SELECT * FROM pr_arrow")

    # --- certified layer 2: the prefix-Jaccard full-population rows -----
    assert os.path.exists(args.pfj_parquet), (
        f"{args.pfj_parquet} missing — run verify_prefix_jaccard_full.py "
        "--save-parquet first (its pass certifies these rows)"
    )
    con.execute(
        f"CREATE TEMP TABLE pfj_certified AS "
        f"SELECT * FROM read_parquet('{args.pfj_parquet}')"
    )

    # --- the registered suite oracle with ONLY those subqueries swapped -
    suite_sql = REGISTRY["advanced_misc_suite"].oracle
    swaps = (
        (
            REGISTRY["dedup_prefix_filter_jaccard"].oracle,
            "SELECT doc_a, doc_b, n_common, n_union, jaccard FROM pfj_certified",
        ),
        (
            REGISTRY["graph_pagerank_neardup"].oracle,
            "SELECT doc_id, pagerank FROM pr_certified",
        ),
        (
            REGISTRY["dedup_connected_components"].oracle,
            "SELECT doc_id, component FROM cc_components",
        ),
    )
    for needle, replacement in swaps:
        assert needle in suite_sql, (
            "suite oracle no longer embeds a member oracle verbatim — "
            "re-derive the swap"
        )
        suite_sql = suite_sql.replace(needle, replacement)

    t0 = time.time()
    odf = con.execute(suite_sql).fetchdf()
    rec["oracle_s"] = round(time.time() - t0, 2)

    # --- engine ----------------------------------------------------------
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(max(16, args.cores * 2)))
        .config("spark.driver.memory", "24g")
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", f"/tmp/advsuite_spark_{os.getpid()}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    t0 = time.time()
    pdf = e.queries()["advanced_misc_suite"](spark, args.sf_dir).toPandas()
    rec["spark_s"] = round(time.time() - t0, 2)

    problems = compare(pdf, odf)
    rec["rows"] = int(len(pdf))
    rec["status"] = "pass" if not problems else "fail"
    if problems:
        rec["problems"] = [p[:500] for p in problems]
    with open(args.out, "a", buffering=1) as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))
    return 0 if rec["status"] == "pass" else 1


if __name__ == "__main__":
    sys.exit(main())

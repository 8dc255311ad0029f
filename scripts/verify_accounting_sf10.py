#!/usr/bin/env python
"""Layered oracle verdict for `corpus_end_to_end_accounting` at scales
where its registered oracle is intractable.

The accounting oracle (_end_to_end_oracle) EMBEDS the connected-
components recursive-reach CTE verbatim — the one subquery whose
memory ceiling is measured and documented (SF3_SWEEP_r07.json: OOM at
22.3 GiB; the sf10 registry sweep: OOM at the 12 GB cap after 68 min).
Every other part of the composition (quality filter, decontamination,
the verdict CASE, the per-source rollup) runs fine in DuckDB at sf10.

So: verify in layers. The CC subquery's fixpoint is already certified
full-population at sf10 by path-halving union-find over the SQL-oracle
edge set (CC_UNIONFIND_r07.json — all 500,000 (doc_id, component)
rows bit-identical). This script recomputes those components the same
way, registers them as a DuckDB temp table, swaps the recursive
subquery for a read of that table — string-replacing the embedded CTE
text, so every OTHER character of the registered oracle runs verbatim
— and compares the engine result with the driver's hash-grade compare.

Usage:
    python scripts/verify_accounting_sf10.py [--sf-dir /tmp/sf10]
        [--duckdb-mem 40GB] [--cores 8] [--out /tmp/accounting.jsonl]
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

from verify_cc_unionfind import union_find_components  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--duckdb-mem", default="40GB")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--out", default="/tmp/accounting.jsonl")
    args = ap.parse_args()

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.registry import (
        load_all,
    )

    load_all()  # populate REGISTRY (registration is lazy)

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (
        _minhash_oracle,
    )
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.registry import (
        REGISTRY,
    )
    from tests.oracle_mirror import compare, duckdb_conn

    rec: dict = {"sf_dir": args.sf_dir, "name": "corpus_end_to_end_accounting"}

    con = duckdb_conn(args.sf_dir)
    con.execute(f"SET memory_limit='{args.duckdb_mem}'")
    spill = f"/tmp/acct_duck_spill_{os.getpid()}"
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")

    # --- layer 1: components via union-find over the SQL-oracle edges ---
    t0 = time.time()
    tbl = con.execute(f"SELECT doc_a, doc_b FROM ({_minhash_oracle()})").fetch_arrow_table()
    doc_a = tbl.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
    doc_b = tbl.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
    verts, comp = union_find_components(doc_a, doc_b)
    rec["n_edges"] = int(len(doc_a))
    rec["n_cc_vertices"] = int(len(verts))
    rec["cc_s"] = round(time.time() - t0, 2)

    import pyarrow as pa

    cc_tbl = pa.table({"doc_id": verts, "component": comp})
    con.register("cc_components_arrow", cc_tbl)
    con.execute(
        "CREATE TEMP TABLE cc_components AS SELECT * FROM cc_components_arrow"
    )

    # --- layer 2: the registered oracle with ONLY the recursive CTE
    # swapped for the certified components table -------------------------
    cc_sql = REGISTRY["dedup_connected_components"].oracle
    acct_sql = REGISTRY["corpus_end_to_end_accounting"].oracle
    assert cc_sql in acct_sql, "accounting oracle no longer embeds the CC oracle verbatim"
    layered_sql = acct_sql.replace(
        cc_sql, "SELECT doc_id, component FROM cc_components"
    )
    t0 = time.time()
    odf = con.execute(layered_sql).fetchdf()
    rec["oracle_s"] = round(time.time() - t0, 2)

    # --- engine ----------------------------------------------------------
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(max(16, args.cores * 2)))
        .config("spark.driver.memory", "16g")
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", f"/tmp/acct_spark_{os.getpid()}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    t0 = time.time()
    pdf = e.queries()["corpus_end_to_end_accounting"](spark, args.sf_dir).toPandas()
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

#!/usr/bin/env python
"""Full-scale (sf1) oracle parity sweep, sharded and resumable.

Runs every registered query at a 10x data scale (/tmp/sf1, built by
scripts/gen_sf1.py) against its DuckDB oracle with the same
hash-grade comparison the driver uses (tests/oracle_mirror.compare).
Round 5 proved this sweep finds oracle-blind cross-engine defect
classes (float serialization, op-order folds) that sf0.01 parity
structurally cannot.

Shards split the registry round-robin by registration index, which
spreads each suite family across shards (family members register
consecutively). Each shard appends verdicts to its own JSONL journal;
re-running a shard skips names already green in its journal, so an
interrupted shard resumes where it stopped.

Usage:
    python scripts/sweep_sf1.py --shard 0 --of 4 [--sf-dir /tmp/sf1]
        [--journal /tmp/sf1_sweep] [--only name1,name2] [--force]

DuckDB is capped (memory_limit + temp spill) so a pathological oracle
spills to disk instead of drawing the kernel OOM killer (round 5: an
uncapped all-pairs oracle hit 117 GB). `dedup_prefix_filter_jaccard`
is skipped by default — its all-pairs oracle is quadratic in cluster
width (31 GB spill, >1.5 h at sf1); scripts/sweep_prefix_jaccard_sf1.py
verifies that member's contract with a width-bounded oracle instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SKIP = {
    # Quadratic all-pairs oracle; covered by sweep_prefix_jaccard_sf1.py.
    "dedup_prefix_filter_jaccard": "quadratic oracle; bounded-oracle script covers it",
    # This digest suite EMBEDS the prefix-filter member (and so its
    # quadratic oracle) plus three iterative operators — intractable at
    # full sf1 for the same oracle-cost reason. All 13 members are
    # individually registered and swept; the suite row itself gets its
    # 10x-cluster evidence on the bounded sub-corpus dir
    # (`python scripts/sweep_prefix_jaccard_sf1.py advanced_misc_suite`).
    "advanced_misc_suite": "embeds the quadratic prefix-filter oracle; bounded sub-corpus run covers it",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--of", type=int, default=1)
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--journal", default="/tmp/sf1_sweep")
    ap.add_argument("--only", default="")
    ap.add_argument("--force", action="store_true", help="re-run even if green in journal")
    ap.add_argument("--duckdb-mem", default="20GB")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    if not (args.of >= 1 and 0 <= args.shard < args.of):
        ap.error(f"--shard must be in [0, --of); got {args.shard} of {args.of}")

    os.makedirs(args.journal, exist_ok=True)
    jpath = f"{args.journal}/shard_{args.shard}_of_{args.of}.jsonl"
    # Last-record-wins: a query whose LATEST journal entry is a fail
    # (e.g. a --force re-run after a code change regressed it) must be
    # re-run on resume — treating any historical pass as permanently
    # green would let a stale line mask a known failure.
    latest: dict[str, str] = {}
    if os.path.exists(jpath) and not args.force:
        with open(jpath) as f:
            for line in f:
                rec = json.loads(line)
                latest[rec["name"]] = rec.get("status", "")
    done = {n for n, s in latest.items() if s in ("pass", "skip")}

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(max(16, args.cores * 2)))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", f"/tmp/sf1_spark_shard{args.shard}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from tests.oracle_mirror import compare, duckdb_conn

    con = duckdb_conn(args.sf_dir)
    con.execute(f"SET memory_limit='{args.duckdb_mem}'")
    # PID-unique spill dir: two sweep processes given the same shard
    # number (e.g. two --only runs over different members) must never
    # share a DuckDB temp dir — concurrent instances clobber each
    # other's temp files (observed: one oracle died mid-read, another
    # crashed on a temp-file remove, 2.3 h of recursive-CTE work lost).
    spill = f"/tmp/sf1_duck_spill_shard{args.shard}_{os.getpid()}"
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")

    qs, osql = e.queries(), e.oracle_sql()
    names = [n for i, n in enumerate(qs) if i % args.of == args.shard]
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]

    out = open(jpath, "a", buffering=1)
    fails = 0
    for name in names:
        if name in done:
            print(f"skip {name} (already green)", flush=True)
            continue
        if name in SKIP:
            out.write(json.dumps({"name": name, "status": "skip", "reason": SKIP[name]}) + "\n")
            print(f"skip {name}: {SKIP[name]}", flush=True)
            continue
        t0 = time.time()
        try:
            pdf = qs[name](spark, args.sf_dir).toPandas()
            t_spark = time.time() - t0
            t1 = time.time()
            odf = con.execute(osql[name]).fetchdf()
            t_oracle = time.time() - t1
            problems = compare(pdf, odf)
            rec = {
                "name": name,
                "status": "fail" if problems else "pass",
                "rows": len(pdf),
                "spark_s": round(t_spark, 2),
                "oracle_s": round(t_oracle, 2),
            }
            if problems:
                rec["problems"] = [p[:500] for p in problems]
                fails += 1
        except Exception as ex:  # noqa: BLE001 — journal and continue
            rec = {
                "name": name,
                "status": "error",
                "err": f"{type(ex).__name__}: {str(ex)[:500]}",
                "secs": round(time.time() - t0, 2),
            }
            fails += 1
        out.write(json.dumps(rec) + "\n")
        print(f"{rec['status']:5s} {name} {rec}", flush=True)
    out.close()
    print(f"shard {args.shard}/{args.of}: {len(names)} assigned, {fails} failures")
    if not names:
        # Zero assigned queries is a sweep-orchestration mistake (wrong
        # --only spelling, mis-sized shard set), not a green shard.
        print("ERROR: no queries assigned to this shard", file=sys.stderr)
        return 1
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

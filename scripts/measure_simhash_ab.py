#!/usr/bin/env python
"""Interleaved A/B of dedup_simhash's parallelism-repair shuffle keying
(VERDICT r10, next-round item 5).

Arms (both through the noop sink, per-rep arm-order rotation — the r10
join-conf lesson):
- keyed:      scatter_by(docs, "doc_id") — the groupBy(doc_id) reuses
              the repartition's hashpartitioning: 1 Exchange total and
              no round-robin sortBeforeRepartition pass.
- roundrobin: scatter(docs) — the pre-r11 shape (2 Exchanges,
              partial/final agg split).

Usage: python scripts/measure_simhash_ab.py [--sf-dir DIR] [--cores N]
           [--reps N] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--out", default="/tmp/simhash_ab.json")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cores)
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark import get_spark
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (
        _simhash_plan,
    )

    spark = get_spark("simhash_ab")
    spark.sparkContext.setLogLevel("ERROR")

    arms = ["keyed", "roundrobin"]
    build = {
        "keyed": lambda: _simhash_plan(spark, args.sf_dir, keyed_scatter=True),
        "roundrobin": lambda: _simhash_plan(spark, args.sf_dir, keyed_scatter=False),
    }
    # Warm-up: one unmeasured pass per arm (codegen compile, caches).
    for a in arms:
        build[a]().write.format("noop").mode("overwrite").save()

    walls: dict[str, list[float]] = {a: [] for a in arms}
    for rep in range(args.reps):
        order = arms[rep % len(arms):] + arms[: rep % len(arms)]
        for arm in order:
            spark.sparkContext.setJobDescription(f"simhash_ab/{arm}/rep{rep}")
            t0 = time.perf_counter()
            build[arm]().write.format("noop").mode("overwrite").save()
            walls[arm].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)

    rec = {
        "member": "dedup_simhash",
        "sf_dir": args.sf_dir,
        "cores": args.cores,
        "reps": args.reps,
        "action": "noop sink",
        "arms": {
            a: {
                "walls_s": walls[a],
                "min_s": min(walls[a]),
                "median_s": round(statistics.median(walls[a]), 3),
                "spread_s": round(max(walls[a]) - min(walls[a]), 3),
            }
            for a in arms
        },
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Interleaved A/B of spark.sql.adaptive.advisoryPartitionSizeInBytes
on sim_ann_ivf (VERDICT r10, next-round item 3).

Residual from r10: with the index frames floored, sim_ann_ivf's
dominant stage is the window-input read of the post-join exchange,
AQE-coalesced to ~4 tasks at ~4.7 MB total (sf1) — byte-based
coalescing is compute-blind to the per-row cosine work downstream.
The two structural forcings were rejected (broadcast hint breaks the
>8 GB serving contract; manual repartition forfeits AQE skew-join
splitting), leaving the advisory size as the measured lever. It is
runtime-settable, so arms share one session and the warm IVF index;
arm order rotates per rep (r10 lesson). Control queries with no
post-join coalescing (window_rank_topn: 1 exchange, no join) separate
a real effect from host drift.

NOTE: the conf is SESSION-WIDE — landing it would re-shape every AQE
coalesce decision, so the bar is a beyond-spread sim_ann_ivf win with
flat controls, at BOTH SFs.

Usage: python scripts/measure_ivf_advisory_ab.py [--sf-dir DIR]
           [--cores N] [--reps N] [--arms default,4m,1m,512k] [--out P]
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

CONF = "spark.sql.adaptive.advisoryPartitionSizeInBytes"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--arms", default="default,4m,1m,512k")
    ap.add_argument(
        "--queries", default="sim_ann_ivf,sim_ann_lsh_bucketed,window_rank_topn"
    )
    ap.add_argument("--out", default="/tmp/ivf_advisory_ab.json")
    args = ap.parse_args()
    arms = args.arms.split(",")
    queries = args.queries.split(",")

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cores)
    from spotify_serverless_etl_pipeline_engineering_with_azure_spark import (
        get_spark,
        registry,
    )

    spark = get_spark("ivf_advisory_ab")
    spark.sparkContext.setLogLevel("ERROR")
    default_advisory = spark.conf.get(CONF)
    qs = registry.queries()

    def set_arm(arm: str) -> None:
        spark.conf.set(CONF, default_advisory if arm == "default" else arm)

    # Warm-up: index builds + codegen, once per query under the default.
    set_arm("default")
    for q in queries:
        qs[q](spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    walls: dict[str, dict[str, list[float]]] = {
        a: {q: [] for q in queries} for a in arms
    }
    for rep in range(args.reps):
        order = arms[rep % len(arms):] + arms[: rep % len(arms)]
        for arm in order:
            set_arm(arm)
            for q in queries:
                spark.sparkContext.setJobDescription(f"advisory_ab/{arm}/{q}/rep{rep}")
                t0 = time.perf_counter()
                qs[q](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                walls[arm][q].append(round(time.perf_counter() - t0, 3))
                spark.sparkContext.setJobDescription(None)
    set_arm("default")

    rec = {
        "purpose": "VERDICT r10 item 3: advisoryPartitionSizeInBytes on sim_ann_ivf's post-join coalescing",
        "conf": CONF,
        "default_value": default_advisory,
        "sf_dir": args.sf_dir,
        "cores": args.cores,
        "reps": args.reps,
        "action": "noop sink",
        "arms": {
            a: {
                q: {
                    "walls_s": walls[a][q],
                    "min_s": min(walls[a][q]),
                    "median_s": round(statistics.median(walls[a][q]), 3),
                    "spread_s": round(max(walls[a][q]) - min(walls[a][q]), 3),
                }
                for q in queries
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

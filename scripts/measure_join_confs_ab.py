#!/usr/bin/env python
"""Interleaved A/B of join-strategy confs over the headline bench set
(guide §3.1/§9): arm `default` = committed session confs (sort-merge
preferred), arm `shj` = spark.sql.join.preferSortMergeJoin=false (planner
may pick shuffled-hash when its size conditions hold), arm `aqe_shj` =
spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m (AQE rewrites
SMJ->SHJ at runtime when every post-shuffle partition fits). Both confs
are runtime-settable, so arms interleave inside ONE session and share
every cache/codegen warm state — the same discipline as bench.py.

Usage: python scripts/measure_join_confs_ab.py [reps] [sf_dir] [q1,q2,...]
(optional third arg restricts the measured set — for targeting the
SortMergeJoin-bearing queries at larger SFs; controls recommended).
Prints per-arm per-query medians/mins and writes JSON to stdout tail.
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_serverless_etl_pipeline_engineering_with_azure_spark import get_spark, registry

from bench import HEADLINE  # same query set, same order

ARMS = {
    "default": {},
    "shj": {"spark.sql.join.preferSortMergeJoin": "false"},
    "aqe_shj": {
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m"
    },
}
# Confs touched by any arm, reset to these before each pass.
BASELINE = {
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    queries = sys.argv[3].split(",") if len(sys.argv) > 3 else list(HEADLINE)
    spark = get_spark("sse_join_ab")
    qs = registry.queries()

    def set_arm(arm: str) -> None:
        for k, v in {**BASELINE, **ARMS[arm]}.items():
            spark.conf.set(k, v)

    # Warm-up pass (default arm): codegen, parquet caches, index builds.
    set_arm("default")
    for name in queries:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    walls: dict[str, dict[str, list[float]]] = {
        a: {n: [] for n in queries} for a in ARMS
    }
    arm_names = list(ARMS)
    for rep in range(reps):
        # Rotate arm order per rep: host drift moves in minutes-long
        # monotone waves (the bench.py interleaving rationale), so a
        # fixed arm order systematically flatters whichever arm runs
        # last. Rotation cancels the first-order drift in the median.
        for arm in arm_names[rep % len(arm_names):] + arm_names[: rep % len(arm_names)]:
            set_arm(arm)
            for name in queries:
                spark.sparkContext.setJobDescription(f"{arm}/{name}/rep{rep}")
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                walls[arm][name].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "arms": {},
    }
    for arm in ARMS:
        med = {n: round(median(v), 3) for n, v in walls[arm].items()}
        mn = {n: round(min(v), 3) for n, v in walls[arm].items()}
        out["arms"][arm] = {
            "total_median": round(sum(med.values()), 3),
            "total_min": round(sum(mn.values()), 3),
            "median": med,
            "min": mn,
            # Raw per-rep walls in execution order: bimodality and
            # drift waves are invisible in median/min summaries.
            "walls": {n: [round(x, 3) for x in v] for n, v in walls[arm].items()},
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

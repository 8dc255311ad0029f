#!/usr/bin/env python
"""Interleaved A/B of dedup_prefix_filter_jaccard's verification arms
(VERDICT r9, next-round item 1).

The r9 id-keyed rewrite left ~48 µs·core per filter-surviving candidate
in JVM array_intersect (boxed OpenHashSet insert+probe per element) —
95%+ of the member's uncontended sf10 wall. _pfj_plan exposes the
verification backend so the arms can be timed against the IDENTICAL
candidate join and SQL tail:

- arrow: _pfj_intersect_batches — vectorized numpy sorted-merge via
  pipelined mapInArrow (production since r10);
- jvm:   size(array_intersect(sa, sb)) — the pre-r10 shape;
- hof:   size(filter(sa, x -> array_contains(sb, x))) — the
  higher-order-function arm the verdict asked to measure; O(|sa|·|sb|)
  linear scans, included for the record.

Arms run INTERLEAVED (a full round of all arms per repetition) so
host drift hits every arm equally; the shared _pfj_index is warmed
once before timing so neither arm pays the one-off build. Reports
per-arm wall lists, min, median, and the row count (which must agree
across arms — a cheap cross-check on top of the pinned equality test).

Usage: python scripts/measure_pfj_ab.py [--sf-dir /tmp/sf1]
          [--cores 24] [--reps 3] [--arms arrow,jvm,hof]
          [--out /tmp/pfj_ab.json]
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
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--cores", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--arms", default="arrow,jvm")
    ap.add_argument("--out", default="/tmp/pfj_ab.json")
    args = ap.parse_args()
    arms = args.arms.split(",")

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

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (
        _pfj_index,
        _pfj_plan,
    )

    t0 = time.time()
    _pfj_index(spark, args.sf_dir)  # shared index: warm once, outside timing
    index_s = round(time.time() - t0, 2)

    walls: dict[str, list[float]] = {a: [] for a in arms}
    rows: dict[str, int] = {}
    for rep in range(args.reps):
        # Rotate arm order per rep (r10 join-conf A/B lesson: a fixed
        # order flatters the last arm on a cooling host).
        for arm in arms[rep % len(arms):] + arms[: rep % len(arms)]:
            t0 = time.time()
            n = _pfj_plan(spark, args.sf_dir, verify=arm).count()
            walls[arm].append(round(time.time() - t0, 2))
            rows[arm] = n
            print(f"rep {rep} {arm}: {walls[arm][-1]} s, {n} rows", flush=True)

    assert len(set(rows.values())) == 1, f"arms disagree on row count: {rows}"
    rec = {
        "member": "dedup_prefix_filter_jaccard",
        "sf_dir": args.sf_dir,
        "cores": args.cores,
        "reps": args.reps,
        "action": "count()",
        "index_warm_s": index_s,
        "rows": next(iter(rows.values())),
        "arms": {
            a: {
                "walls_s": walls[a],
                "min_s": min(walls[a]),
                "median_s": round(statistics.median(walls[a]), 2),
            }
            for a in arms
        },
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

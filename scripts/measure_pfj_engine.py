#!/usr/bin/env python
"""Uncontended engine wall for dedup_prefix_filter_jaccard at scale
(VERDICT r8, next-round item 2).

PFJ_FULL_r08.json's sf10 engine_s (10,679.69 s) ran CONCURRENTLY with
the 300x connected-components verdict, so it is an upper bound under
host contention, not a measurement — the single-process numpy mirror
covered the same population in 1,316 s. This script re-runs ONLY the
engine member on a quiet host and attributes the wall to stages via
the Spark event log (the ride-along self-join vs the result-sized
final distinct — the plan's two shuffle-bearing phases), so the
k x-redundant row-local intersections' documented price gets a
measured magnitude.

Usage: python scripts/measure_pfj_engine.py [--sf-dir /tmp/sf10]
           [--cores 32] [--out /tmp/pfj_engine_uncontended.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_event_log(log_dir: str) -> list[dict]:
    """Stage-level wall/shuffle attribution from the JSON event log.
    Returns stages sorted by duration desc: name, duration_s, shuffle
    read/write bytes, input bytes, task count."""
    stages = []
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        paths.extend(os.path.join(root, fn) for fn in files)
    for path in paths:
        with open(path, errors="ignore") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerStageCompleted":
                    continue
                si = ev["Stage Info"]
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                if sub is None or comp is None:
                    continue
                # Coerce values defensively: internal metrics serialize
                # as JSON numbers, but non-internal accumulators (and
                # some Spark versions' SQL metrics like "number of
                # output rows") serialize as strings — summing those
                # raw would TypeError.
                def _num(v):
                    try:
                        return int(v)
                    except (TypeError, ValueError):
                        return 0

                acc = {
                    a.get("Name"): _num(a.get("Value"))
                    for a in si.get("Accumulables", [])
                }
                stages.append(
                    {
                        "stage": si["Stage ID"],
                        "name": si.get("Stage Name", "")[:120],
                        "duration_s": round((comp - sub) / 1000.0, 1),
                        "tasks": si.get("Number of Tasks"),
                        "shuffle_read_b": acc.get(
                            "internal.metrics.shuffle.read.localBytesRead", 0
                        )
                        + acc.get(
                            "internal.metrics.shuffle.read.remoteBytesRead", 0
                        ),
                        "shuffle_write_b": acc.get(
                            "internal.metrics.shuffle.write.bytesWritten", 0
                        ),
                        "input_b": acc.get("internal.metrics.input.bytesRead", 0),
                        "output_rows": acc.get("number of output rows", None),
                    }
                )
    stages.sort(key=lambda s: -s["duration_s"])
    return stages


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--out", default="/tmp/pfj_engine_uncontended.json")
    args = ap.parse_args()

    import tempfile

    log_dir = tempfile.mkdtemp(prefix="pfj_eventlog_")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(2 * args.cores))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        # Single plain-JSON log file: Spark 4 defaults to rolled +
        # zstd-compressed logs, which the attribution parse below
        # would have to decompress; neither matters for a one-query
        # local run.
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    rec: dict = {
        "member": "dedup_prefix_filter_jaccard",
        "sf_dir": args.sf_dir,
        "cores": args.cores,
        "contention": "none (dedicated run; nothing else on the host)",
        "action": "toPandas (same action as PFJ_FULL_r08's engine_s)",
    }
    t0 = time.time()
    pdf = e.queries()["dedup_prefix_filter_jaccard"](spark, args.sf_dir).toPandas()
    rec["engine_s"] = round(time.time() - t0, 2)
    rec["rows"] = int(len(pdf))
    spark.stop()
    time.sleep(2)  # let the event log flush/close

    stages = parse_event_log(log_dir)
    rec["stages_top"] = stages[:12]
    rec["stage_wall_total_s"] = round(sum(s["duration_s"] for s in stages), 1)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "stages_top"}))
    for s in stages[:12]:
        print(
            f"stage {s['stage']:>4} {s['duration_s']:>8.1f}s tasks={s['tasks']:>3} "
            f"shufR={s['shuffle_read_b']/2**30:6.1f}G shufW={s['shuffle_write_b']/2**30:6.1f}G "
            f"in={s['input_b']/2**30:5.1f}G rows={s['output_rows']} {s['name']}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Diagnose the sim_ann_ivf bimodality seen at sf1 (walls flip between
~2.7 s and ~6-7 s under IDENTICAL plans and confs — observed in every
arm of the join-conf A/B, so it is not a conf effect). Runs the query
N times in one warm session with the event log on, then attributes
each rep's wall to stages via the job-description → job → stage
mapping, so the slow mode's extra seconds get a named stage.

Usage: python scripts/diagnose_ivf_bimodal.py [reps] [sf_dir] [query]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from measure_pfj_engine import parse_event_log  # noqa: E402  (sibling script)

sys.path.insert(0, os.path.join(REPO, "scripts"))


def parse_jobs(log_dir: str) -> list[dict]:
    """(description, job_id, stage_ids, result) per job from the log."""
    jobs = []
    for root, _dirs, files in os.walk(log_dir):
        for fn in files:
            with open(os.path.join(root, fn), errors="ignore") as f:
                for line in f:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if ev.get("Event") == "SparkListenerJobStart":
                        jobs.append(
                            {
                                "job": ev["Job ID"],
                                "desc": (ev.get("Properties") or {}).get(
                                    "spark.job.description", ""
                                ),
                                "stages": ev.get("Stage IDs", []),
                            }
                        )
    return jobs


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    qname = sys.argv[3] if len(sys.argv) > 3 else "sim_ann_ivf"
    log_dir = tempfile.mkdtemp(prefix="ivf_eventlog_")

    from spotify_serverless_etl_pipeline_engineering_with_azure_spark import (
        get_spark,
        registry,
    )

    spark = get_spark(
        "sse_ivf_diag",
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    qs = registry.queries()
    # Warm-up: index build + one unmeasured pass.
    qs[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()

    walls = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"diag/{qname}/rep{i}")
        t0 = time.perf_counter()
        qs[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    time.sleep(2)

    stages = {s["stage"]: s for s in parse_event_log(log_dir)}
    jobs = parse_jobs(log_dir)
    print("walls:", walls)
    per_rep: dict[str, list] = {}
    for j in jobs:
        if j["desc"].startswith("diag/"):
            per_rep.setdefault(j["desc"], []).extend(j["stages"])
    for desc in sorted(per_rep):
        rows = [stages[sid] for sid in per_rep[desc] if sid in stages]
        rows.sort(key=lambda s: -s["duration_s"])
        total = round(sum(s["duration_s"] for s in rows), 1)
        print(f"\n{desc}: stage-wall total {total}s")
        for s in rows[:5]:
            print(
                f"  stage {s['stage']:>4} {s['duration_s']:>6.1f}s tasks={s['tasks']:>3} "
                f"shufR={s['shuffle_read_b']/2**20:7.1f}M shufW={s['shuffle_write_b']/2**20:7.1f}M "
                f"rows={s['output_rows']} {s['name'][:60]}"
            )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion through the noop sink (full plan
runs, nothing ships to the driver — measuring the engine, not
toPandas)."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spotify_serverless_etl_pipeline_engineering_with_azure_spark import get_spark, registry

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "top_customers_by_revenue",
    "join_broadcast_enrich",
    "window_rank_topn",
    "window_running_lag",
    "events_tumbling_window",
    "events_sessionization",
    "json_extract_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_fingerprint",
    "text_quality_score",
    "sim_cosine_topk_bruteforce",
    "sim_ann_lsh_bucketed",
    "sim_ann_ivf",
    "asof_join_events",
    "range_join_close_events",
    "merge_upsert_orders",
    "events_multires_rollup",
    "streaming_tumbling_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # 'sf<number>' basenames carry their scale factor; anything else
    # (custom dirs) reports 0.0 rather than dying on float().
    m = re.fullmatch(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.0
    spark = get_spark("sse_bench")
    qs = registry.queries()

    # Warm-up: one unmeasured pass per query amortizes one-time session
    # costs (janino codegen compile, parquet footer/listing caches,
    # Python worker spin-up) so the measured pass reflects steady-state
    # per-row throughput — the quantity that extrapolates to cluster
    # scale, where fixed seconds of compile time are noise.
    for name in HEADLINE:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Three measured passes, report the per-query minimum: single-shot
    # timings of sub-second queries on a 32-thread local JVM carry
    # multi-hundred-ms scheduler/GC noise, and the steady-state floor is
    # the quantity that extrapolates to cluster scale. n=3 exists to
    # kill run-to-run ambiguity: round 2 flagged two apparent
    # regressions that were single-run noise at n=2.
    timings: dict[str, float] = {}
    for _ in range(3):
        for name in HEADLINE:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dump .explain("formatted") for the round-10 plan evidence.

Writes plans/r10/<query>_after.txt for every headline bench query plus
the round-touched prefix-Jaccard member, and <query>_before.txt for the
queries whose plan this round changed (reproduced from the still-live
A/B arms: verify="jvm" is the round-9 JVM array_intersect shape).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_serverless_etl_pipeline_engineering_with_azure_spark import get_spark, registry
from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import _pfj_plan

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


def dump(df, path: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(path, "w") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue())} bytes)")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("sse_plans_r10")
    qs = registry.queries()
    only = sys.argv[1:]
    names = only or HEADLINE
    for name in names:
        if name == "dedup_prefix_filter_jaccard":
            continue
        dump(qs[name](spark, sf_dir), os.path.join(out_dir, f"{name}_after.txt"))
    if not only or "dedup_prefix_filter_jaccard" in only:
        # The round-touched member: before = the round-9 JVM
        # array_intersect arm (kept live for A/B), after = the
        # committed arrow kernel arm.
        dump(
            _pfj_plan(spark, sf_dir, verify="jvm"),
            os.path.join(out_dir, "dedup_prefix_filter_jaccard_before.txt"),
        )
        dump(
            _pfj_plan(spark, sf_dir, verify="arrow"),
            os.path.join(out_dir, "dedup_prefix_filter_jaccard_after.txt"),
        )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dump .explain("formatted") for the round-11 plan evidence.

Writes plans/r11/<query>_after.txt for every headline bench query, and
<query>_before.txt for the queries whose plan this round changed,
reproduced from the still-live A/B arms:

- dedup_prefix_filter_jaccard: before = verify="arrow_unfused" (the r10
  production shape — unfused kernel + Catalyst jaccard Filter);
  after = the fused-threshold kernel (no Filter above MapInArrow).
- dedup_simhash: before = _simhash_plan(keyed_scatter=False) (round-
  robin scatter, 2 Exchanges); after = scatter_by(docs, "doc_id")
  (agg reuses the partitioning, 1 Exchange).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_serverless_etl_pipeline_engineering_with_azure_spark import get_spark, registry
from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.dedup import (
    _pfj_plan,
    _simhash_plan,
)

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


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans_r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        with open(os.path.join(out_dir, f"{name}_after.txt"), "w") as f:
            f.write(formatted(df))
        print(f"dumped {name}_after")

    # Before shapes from the still-live comparator arms.
    with open(
        os.path.join(out_dir, "dedup_prefix_filter_jaccard_before.txt"), "w"
    ) as f:
        f.write(formatted(_pfj_plan(spark, sf_dir, verify="arrow_unfused")))
    with open(
        os.path.join(out_dir, "dedup_prefix_filter_jaccard_after.txt"), "w"
    ) as f:
        f.write(formatted(_pfj_plan(spark, sf_dir, verify="arrow")))
    with open(os.path.join(out_dir, "dedup_simhash_before.txt"), "w") as f:
        f.write(formatted(_simhash_plan(spark, sf_dir, keyed_scatter=False)))
    print("dumped before/after arms")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

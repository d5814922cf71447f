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
# Round 4 rotation (r3 VERDICT action #4): the window is (a) the nine
# queries displaced out of round 3 (last hard row: r1), (b) queries NEW or
# CHANGED this round — the three dialect-semantics queries, json_each_props
# (the json_each lowering gained SQLite's scalar null/true/false rows),
# json1_mutators (json_tree gained id/parent), and streaming_window_counts
# (replay memo + awaitTermination hardening) — then (c) r2-verified queries
# oldest-first.  111 registered vs a 50-row window means eleven r2-verified
# queries must wait for round 5 (listed LAST below, chosen as the ones whose
# machinery is also exercised by an in-window sibling); every registered
# query, in-window or not, stays green in the identical local oracle suite
# (tests/test_queries_oracle.py + scripts/verify_contract.py).
_PRIORITY = [
    # (a) displaced in round 3, last driver row r1
    "sample_hash_split",
    "text_dup_ngram_fraction",
    "sim_topk_bruteforce",
    "sim_lsh_buckets",
    "sim_ivf_topk",
    "sim_cosine_neardup",
    "sim_neardup_components",
    "sim_ivf_recall",
    "sim_ivf_multiprobe",
    # (b) new this round: SQLite arithmetic/affinity dialect semantics +
    # the quality-bucketed token-budget curation recipe
    "dialect_int_division",
    "dialect_cast_affinity",
    "dialect_truthiness",
    "pipeline_quality_mix",
    # (b) changed this round
    "json_each_props",
    "json1_mutators",
    "streaming_window_counts",
    # (c) r2-verified, oldest-coverage-first
    "q2_min_cost_supplier",
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
    "q21_sole_returner",
    "q22_anti_join_avg",
    "limit_offset",
    "json_extraction",
    "agg_approx_distinct",
    "agg_salted_skew",
    "asof_join_events",
    "date_modifier_functions",
    "strftime_code_coverage",
    "dedup_exact",
    "dedup_canonical_keep",
    "pivot_event_types",
    "rollup_time_hierarchy",
    "unpivot_charge_components",
    "window_lag_lead",
    "text_contamination_check",
    "text_pii_scrub",
    "mix_token_budget",
    "mm_image_meta",
    # --- everything below is PAST the 50-row window this round ---
    "text_gopher_rules",
    # r2-verified, deferred to round 5: each has an in-window sibling
    # exercising the same machinery (approx aggs, cube/rollup, multimodal
    # stubs, k-means IVF, incremental LSH, int8 scan, shard packing,
    # stratified windows, distribution windows, gopher-rule token HOFs)
    # plus the local oracle suite.
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

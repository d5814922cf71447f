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
from dsq_spark.queries import streaming_q  # noqa: F401,E402

# The driver's correctness harness checks only the FIRST 50 registry entries,
# so registration order decides which queries get a hard driver-verified row.
# Round 3 rotation (r2 VERDICT action #1): r1∪r2 covered 95/96 — the round-3
# window is (a) the one never-verified query, (b) queries NEW or CHANGED this
# round, then (c) every r1-only-verified query (45 of them), so after this
# round no query has gone two rounds without a hard driver row.  Everything
# displaced (the 50 green rows of CORRECTNESS_r02.json) stays covered by the
# identical local oracle suite (tests/test_queries_oracle.py +
# scripts/verify_contract.py).
_PRIORITY = [
    # (a) never driver-verified (registered 96th in r2, after the snapshot)
    "sim_ivf_kmeans_recall",
    # (b) new this round
    "json1_mutators",
    "julianday_functions",
    "sim_pq_topk",
    "sim_pq_recall",
    "sim_ivfpq_topk",
    "sim_ivf_incremental",
    "text_charlm_quality",
    "text_chunk_documents",
    "dedup_semantic",
    "text_remove_dup_spans",
    "streaming_window_counts",
    # (b) changed this round: TF-IDF vocab-broadcast hint removed (plan-only
    # change, values identical — re-prove), events ts-normalization cached
    "doc_tfidf_keywords",
    "sessionize_events",
    # (c) r1-only-verified, in registry order
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "agg_stats",
    "agg_having_distinct",
    "agg_group_concat",
    "agg_rollup",
    "join_outer_coverage",
    "join_semi_anti",
    "join_right_full",
    "join_cross_theta",
    "window_topn_per_group",
    "window_running_sum",
    "set_operations",
    "cte_scalar_subquery",
    "case_cast_coalesce",
    "regexp_functions",
    "string_functions",
    "date_functions",
    "hash_functions",
    "recursive_cte_series",
    "window_range_frame",
    "window_groups_frame",
    "baseline_groupby",
    "window_exclude_frame",
    "text_token_stats",
    "text_quality_scores",
    "text_langid_heuristic",
    "text_bpe_token_counts",
    "text_fingerprint",
    "pipeline_curation",
    # displaced past the 50-row window by the nine new round-3 queries (new
    # operators need their first hard row now); all stay green in the local
    # oracle suite and are first in line for the round-4 rotation
    "sample_hash_split",
    "text_dup_ngram_fraction",
    "sim_topk_bruteforce",
    "sim_lsh_buckets",
    "sim_ivf_topk",
    "sim_cosine_neardup",
    "sim_neardup_components",
    "sim_ivf_recall",
    "sim_ivf_multiprobe",
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

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
    HUGEINT, Spark's is BIGINT; row_number is int in Spark, bigint in DuckDB).
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

# The driver's correctness harness checks only the FIRST 50 registry entries,
# so registration order decides which queries get a hard driver-verified row.
# Round 1 checked core/text/dedup/similarity; rotate the window for round 2:
# the 4 queries that failed in r1 (nanos-timestamp fix must be re-proven),
# then the 24 tpch_extra + 3 multimodal queries that have never had a driver
# row, then the rest (all green in CORRECTNESS_r01.json and still covered by
# tests/test_queries_oracle.py locally).
_PRIORITY = [
    "window_lag_lead",
    "json_extraction",
    "sessionize_events",
    "agg_approx_distinct",
    # new in round 2 — no prior driver row exists for these
    "pack_token_shards",
    "sample_stratified",
    "dedup_canonical_keep",
    "text_pii_scrub",
    "emb_quantize_int8",
    "dedup_incremental_lsh",
    "text_contamination_check",
    "mm_audio_stats",
    "agg_approx_quantile",
    "json_each_props",
    "text_gopher_rules",
    "mix_token_budget",
    "doc_tfidf_keywords",
    "sim_kmeans_refine",
    "sim_ivf_kmeans_topk",
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

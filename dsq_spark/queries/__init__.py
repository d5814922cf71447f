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


def queries():
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql():
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}

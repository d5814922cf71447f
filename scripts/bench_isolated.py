#!/usr/bin/env python
"""Isolated per-query timing: run ONE registered query in a fresh JVM.

The r2 VERDICT flagged six queries whose full-suite times grew >=2x vs r1
and prescribed the isolation protocol (one query per JVM, warm session,
min-of-3) to separate real plan regressions from suite-position noise
(GC/codegen-cache pressure from 90+ queries sharing one JVM).  Usage:

    python scripts/bench_isolated.py <query_name>[,<query_name>...] [sf_dir]

Prints one JSON line {"query": name, "sec": best} per query.  Drive it
per-query from a shell loop so every measurement gets its own JVM, or pass
a comma-separated list to amortize the session start across a small A/B
set (r10: still far less suite-position noise than the 121-query bench).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dsq_spark.session import get_spark
    import dsq_spark.queries as Q

    spark = get_spark("dsq-spark-bench-isolated")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    for qname in name.split(","):
        fn = Q.REGISTRY[qname].fn
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        best = float("inf")
        for _ in range(3):
            # same honesty rule as bench.py: drop persisted intermediates so
            # attempts 2-3 can't hit attempt 1's cache via plan matching
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception:
                from pyspark.sql import functions as F
                df.select([F.count(c) for c in df.columns]).collect()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"query": qname, "sec": round(best, 4)}), flush=True)


if __name__ == "__main__":
    main()

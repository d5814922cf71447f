#!/usr/bin/env python
"""Paired same-JVM A/B where each side is a PYTHON-LEVEL patch (e.g. the
rebalance quantum), alternated per attempt like ab_paired.py.

Usage:
    python scripts/ab_paired_py.py <patch_name> q1,q2,... [n_pairs]

Patches are defined in PATCHES below; each is (setup_a, setup_b) thunks
run before every attempt.  The table memo is cleared before every attempt
on BOTH sides so the patch takes effect (equal overhead both sides).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    patch = sys.argv[1]
    names = sys.argv[2].split(",")
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dsq_spark.session import get_spark
    import dsq_spark.queries as Q
    import dsq_spark.queries.base as B

    real_rebalance = B.rebalance

    PATCHES = {
        # A: size-aware quantum (current code); B: old cores-bound target
        "quantum": (
            lambda: None,
            lambda: setattr(B, "rebalance",
                            lambda df, quantum=None: real_rebalance(df)),
        ),
    }
    setup_a, setup_b = PATCHES[patch]

    spark = get_spark("dsq-ab-paired-py")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def attempt(fn, setup):
        B.rebalance = real_rebalance
        setup()
        B._TABLE_MEMO.clear()
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
        return time.perf_counter() - t0

    for qname in names:
        fn = Q.REGISTRY[qname].fn
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        a_times, b_times = [], []
        attempt(fn, setup_a)  # warmup, untimed
        for _ in range(n_pairs):
            a_times.append(attempt(fn, setup_a))
            b_times.append(attempt(fn, setup_b))
        print(json.dumps({
            "query": qname,
            "A_min": round(min(a_times), 4), "B_min": round(min(b_times), 4),
            "A_med": round(sorted(a_times)[len(a_times) // 2], 4),
            "B_med": round(sorted(b_times)[len(b_times) // 2], 4),
        }), flush=True)


if __name__ == "__main__":
    main()

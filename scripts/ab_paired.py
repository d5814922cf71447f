#!/usr/bin/env python
"""Paired same-JVM A/B of runtime-settable session confs.

For each query, attempts ALTERNATE between conf A and conf B inside one
warm JVM (A,B,A,B,...), so JVM warmup and host steal-time drift hit both
sides equally — the decision metric this host's 2-3x noise floor demands.

Usage:
    python scripts/ab_paired.py '<json A>' '<json B>' q1,q2,... [n_pairs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    conf_a = json.loads(sys.argv[1])
    conf_b = json.loads(sys.argv[2])
    names = sys.argv[3].split(",")
    n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dsq_spark.session import get_spark
    import dsq_spark.queries as Q

    spark = get_spark("dsq-ab-paired")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def attempt(fn, conf):
        for k, v in conf.items():
            spark.conf.set(k, v)
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
        attempt(fn, conf_a)  # warmup, untimed
        for _ in range(n_pairs):
            a_times.append(attempt(fn, conf_a))
            b_times.append(attempt(fn, conf_b))
        print(json.dumps({
            "query": qname,
            "A_min": round(min(a_times), 4), "B_min": round(min(b_times), 4),
            "A_med": round(sorted(a_times)[len(a_times) // 2], 4),
            "B_med": round(sorted(b_times)[len(b_times) // 2], 4),
        }), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Fresh-JVM per-config A/B: run a query list under session-conf overrides.

Usage:
    python scripts/ab_conf.py '<json conf dict>' q1,q2,... [sf_dir]

Prints one JSON line per query (min-of-3, clearCache per attempt — the
bench.py protocol).  Drive A/B/A/B from a shell loop so each config gets
its own JVM and host drift cancels across interleavings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    conf = json.loads(sys.argv[1])
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dsq_spark.session import get_spark
    import dsq_spark.queries as Q

    spark = get_spark("dsq-ab-conf", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    out = {}
    for qname in names:
        fn = Q.REGISTRY[qname].fn
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        best = float("inf")
        for _ in range(3):
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
        out[qname] = round(best, 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

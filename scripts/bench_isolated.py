"""Isolated per-query re-timing (fresh JVM per query): the r2 bench showed
six queries ≥2x their r1 suite times; VERDICT r2 action #4 asks whether any
is a real plan regression or just suite-position noise (GC/cache pressure
from 90+ queries sharing one JVM).  Run:

    python scripts/bench_isolated.py [query ...]

Each named query runs in its own subprocess (own SparkSession/JVM), timed
like bench.py (noop-write full evaluation, min of 2 warm runs after an
untimed warmup), at $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DEFAULT = [
    "sim_lsh_buckets", "window_range_frame", "json_extraction",
    "pipeline_curation", "mm_image_meta", "text_fingerprint",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from dsq_spark.session import get_spark
import dsq_spark.queries as Q

name = {name!r}
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("bench-isolated")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()

def ev(df):
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        from pyspark.sql import functions as F
        df.select([F.count(c) for c in df.columns]).collect()

fn = Q.REGISTRY[name].fn
ev(fn(spark, sf))  # warmup (code paths + file cache), untimed
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    ev(fn(spark, sf))
    best = min(best, time.perf_counter() - t0)
print("ISOLATED_RESULT " + json.dumps({"name": name, "sec": round(best, 4)}))
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = sys.argv[1:] or DEFAULT
    results = {}
    for name in names:
        out = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=repo, name=name)],
            capture_output=True, text=True)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("ISOLATED_RESULT ")]
        if line:
            rec = json.loads(line[0].split(" ", 1)[1])
            results[rec["name"]] = rec["sec"]
            print(f"{rec['name']}: {rec['sec']} s", flush=True)
        else:
            print(f"{name}: FAILED\n{out.stderr[-2000:]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scale-up curve: measure headline queries at 10x and 30x the sf0.1 data
and fit the growth exponent, to catch any operator whose cost curve would
not survive a 100x scale-up (the 100 TB question, empirically).

Scaled inputs are built once under /tmp/dsq_scale/x{K} by replicating
sf0.1 K times with key remapping that preserves the workload's *shape*:

  * facts scale, dimensions stay fixed (how real warehouses grow);
  * per-key row counts stay constant — order/user/doc/vector ids get a
    per-replica offset, so joins and windows grow linearly instead of
    quadratically (naive duplication would multiply join fan-out by K^2);
  * document text gets a replica-tag token spliced in every 2 words —
    with 3-word shingles EVERY shingle of replica r contains the tag, so
    shingle/minhash/simhash structure is preserved WITHIN a replica but
    replicas share no shingles at all.  (A first cut rotated tokens
    instead; rotation preserves all but the boundary shingles, which made
    every replica a near-dup of every other and grew LSH candidate pairs
    by K^2 — the measured alpha=2.0 was the data construction, not the
    plan.  Real corpora scaled 30x do not acquire 30 near-copies of every
    document.)

Timing protocol matches bench.py (noop-write full evaluation, min of 4
warm runs — this host shows 4-10x noise spikes, see BENCH_NOTES.md §1).
The exponent is the log-log slope between 10x and 30x: at sf0.1 most
queries are fixed-cost dominated (sub-second, and several base tables
are single parquet files that serialize the first stage into one task),
so only the two largest scales give a clean compute-bound signal.
alpha ~ 1.0 = linear; >1.3 investigate.  Queries whose probe is bounded
by design (the ANN single-cell probes, bounded verification baselines)
are expected FLAT — that flatness is the scale path working, not a bug.

Usage:
    python scripts/bench_scaling.py            # build + run, prints JSON
    python scripts/bench_scaling.py --rebuild  # force regeneration
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/dsq_scale"
FACTORS = [10, 30]

# Per-replica remap: column -> offset key ("max+1 of base table" units).
FACT_REMAP = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

QUERIES = [
    "baseline_groupby",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q21_sole_returner",
    "window_running_sum",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "doc_tfidf_keywords",
    "text_token_stats",
    "text_charlm_quality",
    "pack_token_shards",
]


def build(spark, k: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for name in DIMS:
        src, dst = f"{BASE}/{name}.parquet", f"{out_dir}/{name}.parquet"
        if not os.path.exists(dst):
            shutil.copy(src, dst)
    for name, keys in FACT_REMAP.items():
        dst = f"{out_dir}/{name}.parquet"
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(f"{BASE}/{name}.parquet")
        offs = {c: df.agg(F.max(c)).first()[0] + 1 for c in keys}
        reps = []
        for r in range(k):
            rep = df
            for c in keys:
                rep = rep.withColumn(c, F.col(c) + F.lit(r * offs[c]))
            if name == "documents" and r:
                # splice the replica tag in every 2 words: every 3-word
                # shingle contains it, so replicas share zero shingles
                rep = rep.withColumn(
                    "text",
                    F.array_join(F.flatten(F.expr(
                        f"transform(split(text, ' '), (w, i) -> "
                        f"CASE WHEN i % 2 = 1 THEN array('q{r}z', w) "
                        f"ELSE array(w) END)")), " "))
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(dst)


def evaluate(df) -> None:
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        from pyspark.sql import functions as F
        df.select([F.count(c) for c in df.columns]).collect()


def main() -> None:
    if "--rebuild" in sys.argv and os.path.isdir(ROOT):
        shutil.rmtree(ROOT)

    from dsq_spark.session import get_spark
    import dsq_spark.queries as Q

    spark = get_spark("dsq-spark-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    for k in FACTORS:
        build(spark, k, f"{ROOT}/x{k}")

    dirs = [(k, f"{ROOT}/x{k}") for k in FACTORS]
    subset = [a for a in sys.argv[1:] if not a.startswith("--")]
    results: dict[str, dict[str, float]] = {}
    for name in (subset or QUERIES):
        fn = Q.REGISTRY[name].fn
        row: dict[str, float] = {}
        for k, d in dirs:
            best = float("inf")
            for attempt in range(4):
                if attempt >= 3 and best > 8.0:
                    break  # slow query: three consistent runs are enough
                t0 = time.perf_counter()
                evaluate(fn(spark, d))
                best = min(best, time.perf_counter() - t0)
            row[f"x{k}"] = round(best, 3)
        row["alpha"] = round(
            math.log(row["x30"] / row["x10"]) / math.log(3), 2)
        results[name] = row
        print(json.dumps({name: row}), file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

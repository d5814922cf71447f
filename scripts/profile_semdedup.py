#!/usr/bin/env python
"""Phase-level wall timing for dedup_semantic: where do the ~5 s go?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dsq_spark.session import get_spark
from dsq_spark.queries.similarity import _km_refined, _km_assign_lit, DOT
from dsq_spark.queries.base import fround


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    for attempt in range(2):
        spark.catalog.clearCache()
        marks = []
        t0 = time.perf_counter()

        def mark(label):
            marks.append((label, time.perf_counter() - t0))

        v, cent = _km_refined(spark, sf_dir)
        v.count()
        mark("v persisted + Lloyd driver round-trips")
        nrm = (
            _km_assign_lit(v, cent)
            .select("vec_id", "vd", "cluster")
            .withColumn(
                "nrm",
                F.sqrt(F.expr("aggregate(zip_with(vd, vd, (x, y) -> x * y), "
                              "CAST(0.0 AS DOUBLE), (a, p) -> a + p)")),
            )
            .persist()
        )
        nrm.count()
        mark("nrm persisted (final assign)")
        a = nrm.select("cluster", F.col("vec_id").alias("id_a"),
                       F.col("vd").alias("vd_a"), F.col("nrm").alias("nrm_a"))
        b = nrm.select("cluster", F.col("vec_id").alias("id_b"),
                       F.col("vd").alias("vd_b"), F.col("nrm").alias("nrm_b"))
        cos = F.expr(DOT.format(a="vd_a", b="vd_b")) / (F.col("nrm_a") * F.col("nrm_b"))
        removed = (
            a.join(b, "cluster")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(cos >= 0.45)
            .select("cluster", F.col("id_b").alias("dup_id"))
            .distinct()
            .withColumnRenamed("cluster", "rcluster")
        )
        out = (
            nrm.select("cluster", "vec_id")
            .join(removed, (F.col("cluster") == F.col("rcluster"))
                  & (F.col("vec_id") == F.col("dup_id")), "left")
            .groupBy("cluster")
            .agg(
                F.count("*").cast("long").alias("n_members"),
                F.count("dup_id").cast("long").alias("n_removed"),
                fround((F.count("*") - F.count("dup_id")) * 1.0 / F.count("*"), 6)
                .alias("keep_fraction"),
            )
        )
        out.write.format("noop").mode("overwrite").save()
        mark("pair join + report (noop)")
        v.unpersist(); nrm.unpersist()

        print(f"--- attempt {attempt}")
        prev = 0.0
        for label, ts in marks:
            print(f"{ts - prev:7.2f}s  {label}")
            prev = ts
        print(f"{prev:7.2f}s  TOTAL")


if __name__ == "__main__":
    main()

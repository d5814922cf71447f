"""Capture .explain("formatted") for every registered query into plans/r11/.

Usage:
    python scripts/r10_plans.py before [name ...]   # default: all registered
    python scripts/r10_plans.py after  name [...]

Driver-only work (plan compilation, no job execution), so it can run while
other Spark work is idle.  Writes plans/r11/<query>_<tag>.txt.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r11")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    from dsq_spark.session import get_spark
    import dsq_spark.queries as Q

    spark = get_spark("r11-plans")
    spark.sparkContext.setLogLevel("ERROR")
    todo = names or list(Q.REGISTRY)
    for name in todo:
        q = Q.REGISTRY[name]
        try:
            df = q.fn(spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # noqa: BLE001
            plan = f"PLAN ERROR: {ex}\n"
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes", flush=True)


if __name__ == "__main__":
    main()

"""Scoped mirror of verify_contract.py: oracle-check only the queries named
on the command line (both ANSI legs), at $SPARK_GRAFT_SF_DIR.

Usage:
    python scripts/verify_some.py q1 q2 ...
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as E
from dsq_spark.session import get_spark
import duckdb

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
spark = get_spark("verify-some")
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"):
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")


def norm(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if v is None:
                vals.append("∅")
            elif isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.12g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


qs, orc = E.queries(), E.oracle_sql()
fails = []
for name in sys.argv[1:]:
    fn = qs[name]
    for ansi in ("false", "true"):
        try:
            spark.conf.set("spark.sql.ansi.enabled", ansi)
            sdf = fn(spark, SF)
            srows = [r.asDict() for r in sdf.collect()]
            cols = sorted(sdf.columns)
            if name not in orc:
                print(f"[ansi={ansi}] {name}: rows-only {len(srows)}", flush=True)
                continue
            o = con.sql(orc[name])
            ocols = [d[0] for d in o.description]
            orows = [dict(zip(ocols, r)) for r in o.fetchall()]
            ok = (sorted(ocols) == cols and len(orows) == len(srows)
                  and norm(srows, cols) == norm(orows, cols))
            if not ok:
                fails.append(f"{name}@ansi={ansi}")
            print(f"[ansi={ansi}] {name}: "
                  f"{'OK' if ok else f'MISMATCH rows={len(srows)}/{len(orows)}'}",
                  flush=True)
        except Exception as ex:
            fails.append(f"{name}@ansi={ansi}")
            print(f"[ansi={ansi}] {name}: ERR {str(ex).splitlines()[0][:160]}",
                  flush=True)
print("FAILS:", fails)

"""Constant-expression differential probe vs real sqlite3.

The r5/r6 judge technique: the fuzz grammar's column-involved shapes miss
classes that only fire on literal-only operands (no-affinity comparisons,
oversized literals, alias-emitted CASTs feeding the comparison compiler).
This sweep generates deep CONSTANT compositions — function results feeding
comparisons, typeof() of everything, boundary literals — and diffs
`SELECT <expr>` between sqlite3 and rewrite_query+Spark.

Exploration tool, not a test: prints mismatches for triage (known
documented residuals vs new bug classes).  Usage:

    python scripts/probe_constants.py [N] [SEED]
"""

from __future__ import annotations

import math
import random
import sqlite3
import sys


ATOMS = [
    "1", "0", "2", "-1", "2.5", "-0.5", "0.0", "'1'", "'0.5x'", "''",
    "'abc'", "' 1'", "NULL", "9223372036854775807", "9223372036854775808",
    "-9223372036854775808", "2147483647", "1e999", "9007199254740993",
    "9007199254740992.0", "x'41'", "x''", "'1.0'", "0.1", "'-2'",
]


def gen(r: random.Random, d: int) -> str:
    if d <= 0:
        return r.choice(ATOMS)
    forms = [
        lambda: r.choice(ATOMS),
        lambda: f"-{gen(r, d - 1)}",
        lambda: f"+{gen(r, d - 1)}",
        lambda: f"~{gen(r, d - 1)}",
        lambda: f"({gen(r, d - 1)})",
        lambda: (f"{gen(r, d - 1)} {r.choice(['+', '-', '*', '/', '%'])} "
                 f"{gen(r, d - 1)}"),
        lambda: (f"{gen(r, d - 1)} {r.choice(['&', '|', '<<', '>>'])} "
                 f"{gen(r, d - 1)}"),
        lambda: (f"{gen(r, d - 1)} "
                 f"{r.choice(['=', '!=', '<', '<=', '>', '>=', 'IS'])} "
                 f"{gen(r, d - 1)}"),
        lambda: f"{gen(r, d - 1)} || {gen(r, d - 1)}",
        lambda: f"typeof({gen(r, d - 1)})",
        lambda: f"hex({gen(r, d - 1)})",
        lambda: f"abs({gen(r, d - 1)})",
        lambda: f"length({gen(r, d - 1)})",
        lambda: f"min({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"max({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"nullif({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"coalesce({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"iif({gen(r, d - 1)}, {gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: (f"CAST({gen(r, d - 1)} AS "
                 f"{r.choice(['INTEGER', 'REAL', 'TEXT'])})"),
        lambda: f"round({gen(r, d - 1)})",
        lambda: f"upper({gen(r, d - 1)})",
        lambda: f"trim({gen(r, d - 1)})",
        lambda: f"instr({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: f"substr({gen(r, d - 1)}, 1, 2)",
        lambda: f"sign({gen(r, d - 1)})",
        lambda: (f"CASE {gen(r, d - 1)} WHEN {gen(r, d - 1)} THEN "
                 f"{gen(r, d - 1)} ELSE {gen(r, d - 1)} END"),
        lambda: f"{gen(r, d - 1)} IN ({gen(r, d - 1)}, {gen(r, d - 1)})",
        lambda: (f"{gen(r, d - 1)} BETWEEN {gen(r, d - 1)} "
                 f"AND {gen(r, d - 1)}"),
        lambda: f"date('2024-01-0{r.randint(1, 9)}')",
        lambda: f"unicode({gen(r, d - 1)})",
        lambda: f"quote({gen(r, d - 1)})",
    ]
    return r.choice(forms)()


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"i:{int(v)}"  # SQLite comparisons ARE 0/1 integers
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if isinstance(v, bytearray):
        return "b:" + bytes(v).hex()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"r:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    return "t:" + str(v)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0xC0FFEE
    from dsq_spark.functions import register_all
    from dsq_spark.rewrite import rewrite_query
    from dsq_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    register_all(spark)
    con = sqlite3.connect(":memory:")
    r = random.Random(seed)
    mismatches, errors, checked = [], [], 0
    while checked < n:
        expr = gen(r, r.randint(2, 3))
        try:
            want = con.execute(f"SELECT {expr}").fetchone()[0]
        except Exception:
            continue  # not valid SQLite — skip
        checked += 1
        try:
            rw = rewrite_query(f"SELECT {expr} AS r", {})
            got = spark.sql(rw).collect()[0][0]
        except Exception as e:
            errors.append((expr, str(e).split("\n")[0][:160]))
            continue
        cw, cg = canon(want), canon(got)
        if cw != cg:
            # int-valued float vs int is a CLASS mismatch in SQLite terms
            mismatches.append((expr, cg, cw))
    print(f"checked {checked}: {len(mismatches)} mismatches, "
          f"{len(errors)} engine errors")
    for e, g, w in mismatches[:60]:
        print(f"  MISMATCH {e!r}\n    engine={g}  sqlite={w}")
    for e, msg in errors[:20]:
        print(f"  ERROR    {e!r}\n    {msg}")


if __name__ == "__main__":
    main()

"""Round-10 repro harness: the r9 judge's defect families + ADVICE items,
run through rewrite_query + spark.sql and differenced against stdlib
sqlite3.

Usage: PYTHONPATH=/root/repo python scripts/r10_repro.py [group ...]
Groups: advice cte boolderived distinct groupsexclude chains values
        unionclass lagclass likenl all
"""
from __future__ import annotations

import math
import os
import sqlite3
import sys

ROWS = [
    (1, 2.5, "foo"), (2, -1.25, "Bar"), (3, None, None), (None, 0.0, ""),
    (5, 3.0, "baz"), (-4, 7.5, "FOO"), (0, None, "x y"), (6, 0.5, "it's"),
    (7, 0.5, "Foo"), (None, None, "%_"),
]
SCHEMA = {"a": "int", "b": "real", "c": "text"}

WROWS = [(1, "5kg"), (2, "x"), (3, "3"), (4, None), (5, " 2.5e1 "), (6, "")]
WSCHEMA = {"id": "int", "t": "text"}

REPROS = {
    # ADVICE r9 items 1-2: companion-column leakage
    "advice": [
        ("td", "SELECT * FROM (SELECT 1 AS v UNION ALL SELECT '1')"),
        ("td", "SELECT * FROM (SELECT 1 AS v UNION SELECT '1')"),
        ("td", "SELECT sum(v) AS s FROM (SELECT v FROM "
               "(SELECT 1 AS v UNION ALL SELECT '1'))"),
        ("td", "SELECT sum(a) AS s, (SELECT max(v) FROM "
               "(SELECT 1 AS v UNION ALL SELECT '1')) AS m FROM td"),
        ("td", "SELECT count(*) AS n FROM "
               "(SELECT 1 AS v UNION SELECT '1')"),
    ],
    # judge missing #1: kind tracking through CTE bodies
    "cte": [
        ("tw", "WITH u AS (SELECT t AS v FROM tw) SELECT sum(v) AS s FROM u"),
        ("tw", "WITH u AS (SELECT t AS v FROM tw) SELECT avg(v) AS s FROM u"),
        ("tw", "WITH u AS (SELECT t AS v FROM tw) "
               "SELECT min(v) AS m, typeof(min(v)) AS k FROM u"),
        ("tw", "WITH u AS (SELECT 1 AS v UNION ALL SELECT '1') "
               "SELECT sum(v) AS s FROM u"),
        ("tw", "WITH u AS (SELECT 1 AS v UNION SELECT '1') "
               "SELECT count(*) AS n FROM u"),
        ("td", "WITH u AS (SELECT c AS v FROM td), w AS (SELECT a AS x "
               "FROM td) SELECT sum(v) AS s, (SELECT sum(x) FROM w) AS s2 "
               "FROM u"),
    ],
    # judge wrong #1: boolean-valued derived column into an aggregate
    "boolderived": [
        ("td", "SELECT avg(v) AS s FROM (SELECT (a AND ~1e999) AS v FROM td)"),
        ("td", "SELECT avg(v) AS s FROM (SELECT (a > 2) AS v FROM td)"),
        ("td", "SELECT sum(v) AS s, min(v) AS m FROM "
               "(SELECT (a > 2) AS v FROM td)"),
        ("td", "SELECT typeof(v) AS k, v FROM (SELECT (a > 2) AS v FROM td)"),
        ("td", "WITH u AS (SELECT (a > 2) AS v FROM td) "
               "SELECT avg(v) AS s FROM u"),
    ],
    # judge wrong #3: DISTINCT dynamic aggregates
    "distinct": [
        ("tw", "SELECT sum(DISTINCT t) AS s FROM tw"),
        ("tw", "SELECT avg(DISTINCT t) AS s FROM tw"),
        ("tw", "SELECT total(DISTINCT t) AS s FROM tw"),
        ("tw", "SELECT sum(DISTINCT t) AS s, count(DISTINCT t) AS n FROM tw"),
        ("td", "SELECT sum(DISTINCT a) AS s FROM td"),
        ("td", "SELECT avg(DISTINCT b) AS s FROM td"),
        ("tw", "SELECT id > 3 AS g, sum(DISTINCT t) AS s FROM tw GROUP BY id > 3"),
        ("tw", "SELECT min(DISTINCT t) AS m, max(DISTINCT t) AS x FROM tw"),
    ],
    # judge wrong #4 / missing #2: SQL-path GROUPS / EXCLUDE frames
    "groupsexclude": [
        ("td", "SELECT a, sum(a) OVER (ORDER BY c GROUPS BETWEEN 1 "
               "PRECEDING AND CURRENT ROW) AS s FROM td"),
        ("td", "SELECT a, count(*) OVER (ORDER BY c GROUPS BETWEEN 1 "
               "PRECEDING AND 1 FOLLOWING) AS n FROM td"),
        ("td", "SELECT a, sum(b) OVER (ORDER BY a GROUPS BETWEEN UNBOUNDED "
               "PRECEDING AND CURRENT ROW) AS s FROM td"),
        ("tw", "SELECT id, sum(t) OVER (ORDER BY id GROUPS BETWEEN 1 "
               "PRECEDING AND CURRENT ROW) AS s FROM tw"),
        ("td", "SELECT a, sum(a) OVER (ORDER BY a ROWS BETWEEN 2 PRECEDING "
               "AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS s FROM td"),
        ("td", "SELECT a, sum(a) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED "
               "PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS s FROM td"),
        ("td", "SELECT a, sum(a) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED "
               "PRECEDING AND CURRENT ROW EXCLUDE TIES) AS s FROM td"),
        ("td", "SELECT a, sum(a) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED "
               "PRECEDING AND CURRENT ROW EXCLUDE NO OTHERS) AS s FROM td"),
        ("td", "SELECT a, count(*) OVER (ORDER BY c GROUPS BETWEEN CURRENT "
               "ROW AND UNBOUNDED FOLLOWING) AS n FROM td"),
        ("tw", "SELECT id, avg(t) OVER (ORDER BY id ROWS BETWEEN 1 "
               "PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS s FROM tw"),
        ("td", "SELECT a, min(b) OVER (ORDER BY a ROWS BETWEEN 2 PRECEDING "
               "AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS m FROM td"),
        ("td", "SELECT a, sum(a) OVER (ORDER BY c GROUPS BETWEEN 1 "
               "PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS s FROM td"),
    ],
    # judge missing #4: mixed-operator compound chains
    "chains": [
        ("td", "SELECT 1 AS v INTERSECT SELECT 1 UNION SELECT '1'"),
        ("td", "SELECT 1 AS v UNION SELECT '1' INTERSECT SELECT '1'"),
        ("td", "SELECT 1 AS v UNION ALL SELECT 1 UNION SELECT '1'"),
        ("td", "SELECT 1 AS v UNION SELECT '1' EXCEPT SELECT 1"),
        ("td", "SELECT a AS v FROM td UNION SELECT c FROM td EXCEPT "
               "SELECT 1"),
        ("td", "SELECT 1 AS v EXCEPT SELECT 1 UNION ALL SELECT '1'"),
    ],
    # judge missing #5: mixed-class VALUES
    "values": [
        ("td", "VALUES (1), ('1')"),
        ("td", "VALUES (1, 'a'), ('1', 2), (1.0, x'41')"),
        ("td", "SELECT * FROM (VALUES (1), ('1'), (2.5))"),
        ("td", "SELECT 9 AS v UNION VALUES (1), ('1')"),
    ],
    # judge wrong #5: int-vs-real compound arm class
    "unionclass": [
        ("td", "SELECT 1.0 AS v UNION SELECT 1"),
        ("td", "SELECT typeof(v) AS k, v FROM (SELECT 1.0 AS v UNION SELECT 1)"),
        ("td", "SELECT typeof(v) AS k, v FROM (SELECT 3 AS v INTERSECT SELECT 3.0)"),
        ("td", "SELECT typeof(v) AS k, v FROM (SELECT 2 AS v UNION SELECT 2.5)"),
    ],
    # judge wrong #6: class loss through window value functions
    "lagclass": [
        ("td", "SELECT a, typeof(lag(CASE WHEN a > 2 THEN a ELSE c END) "
               "OVER (ORDER BY a)) AS k FROM td"),
        ("td", "SELECT a, typeof(first_value(CASE WHEN a > 2 THEN a ELSE c "
               "END) OVER (ORDER BY a)) AS k FROM td"),
    ],
    # judge wrong #2 (seed 13131): BETWEEN with unary-plus / fold
    # affinity — `+x` strips column affinity, CASE/iif/coalesce results
    # carry none even when they fold to a bare column
    "between": [
        ("td", "SELECT a, (+b BETWEEN c AND 0 || "
               "typeof(0xFFFFFFFFFFFFFFFF)) AS r FROM td"),
        ("td", "SELECT a FROM td WHERE (+'1.0' || a BETWEEN "
               "iif(0.0, c, a) AND upper(0x10))"),
        ("td", "SELECT a, (+b >= c) AS r FROM td"),
        ("td", "SELECT a, ('1.01' <= iif(0.0, c, a)) AS r FROM td"),
        ("td", "SELECT a, ('1.01' <= coalesce(a, a)) AS r FROM td"),
        ("td", "SELECT a, ('1.01' <= CASE WHEN 1 THEN a END) AS r "
               "FROM td"),
        ("td", "SELECT a, ('1.01' <= (a)) AS r FROM td"),
        ("td", "SELECT a, (c BETWEEN +a AND +b) AS r FROM td"),
        ("td", "SELECT a, (ifnull(c, 0) > a) AS r FROM td"),
    ],
    # ADVICE r9 item 4: LIKE anchor vs trailing newline
    "likenl": [
        ("td", "SELECT 'abc' || char(10) LIKE 'abc' AS r"),
        ("td", "SELECT 'abc' || char(10) LIKE 'ab_' AS r"),
        ("td", "SELECT 'abc' || char(10) LIKE 'abc' ESCAPE '!' AS r"),
        ("td", "SELECT c || char(10) LIKE c AS r FROM td"),
        ("td", "SELECT 'abc' || char(10) GLOB 'abc' AS r"),
        ("td", "SELECT 'abc' || char(10) LIKE 'abc%' AS r"),
    ],
}


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    return str(v)


def main():
    groups = sys.argv[1:] or ["all"]
    if "all" in groups:
        groups = list(REPROS)
    from dsq_spark.session import get_spark
    from dsq_spark.functions import register_all
    from dsq_spark.rewrite import rewrite_query

    spark = get_spark("r10-repro")
    register_all(spark)
    spark.createDataFrame(ROWS, "a long, b double, c string") \
        .createOrReplaceTempView("td")
    spark.createDataFrame(WROWS, "id long, t string") \
        .createOrReplaceTempView("tw")
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE td(a INTEGER, b REAL, c TEXT)")
    con.executemany("INSERT INTO td VALUES (?,?,?)", ROWS)
    con.execute("CREATE TABLE tw(id INTEGER, t TEXT)")
    con.executemany("INSERT INTO tw VALUES (?,?)", WROWS)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from probe_constants import classify

    n_bad = 0
    for grp in groups:
        for tbl, q in REPROS[grp]:
            schema = WSCHEMA if tbl == "tw" else SCHEMA
            try:
                cur = con.execute(q)
                want_cols = len(cur.description)
                want_raw = sorted(cur.fetchall(),
                                  key=lambda r: tuple(canon(v) for v in r))
                want = [tuple(canon(v) for v in r) for r in want_raw]
            except sqlite3.OperationalError as e:
                print(f"[{grp}] SQLITE-ERR {q!r}: {e}")
                continue
            try:
                rq = rewrite_query(q, schema)
                if isinstance(rq, tuple):
                    rq = rq[0]
                res = spark.sql(rq)
                got_cols = len(res.columns)
                got_raw = sorted((tuple(r) for r in res.collect()),
                                 key=lambda r: tuple(canon(v) for v in r))
                got = [tuple(canon(v) for v in r) for r in got_raw]
            except Exception as e:
                n_bad += 1
                print(f"[{grp}] ENGINE-ERR {q!r}: {type(e).__name__} "
                      f"{str(e)[:300]}")
                continue
            if want_cols != got_cols:
                n_bad += 1
                print(f"[{grp}] NCOLS {q!r}: want {want_cols} cols, "
                      f"got {got_cols} ({res.columns})")
                continue
            if want != got and len(want) == len(got):
                # the probe gate's policy: per-cell deltas inside the
                # documented PARITY surface families (class-render,
                # class-blob-text, class-num, overflow-wrap) are
                # reported CLASS, not hard failures
                fams = set()
                for wr, gr in zip(want_raw, got_raw):
                    for wv, gv in zip(wr, gr):
                        if canon(gv) == canon(wv):
                            continue
                        fam = classify(gv, wv)
                        if fam is None:
                            fams = None
                            break
                        fams.add(fam)
                    if fams is None:
                        break
                if fams is not None:
                    print(f"[{grp}] CLASS({','.join(sorted(fams))}) {q!r}")
                    continue
            if want != got:
                n_bad += 1
                d = [(a, b) for a, b in zip(want, got) if a != b][:3]
                print(f"[{grp}] VALUE {q!r}\n  want={want[:8]}\n  "
                      f"got ={got[:8]}\n  diff={d}")
            else:
                print(f"[{grp}] OK {q!r}")
    print(f"\n{n_bad} failing")


if __name__ == "__main__":
    main()

"""Round-9 repro harness: the r8 judge's six defect families, run through
rewrite_query + spark.sql and differenced against stdlib sqlite3.

Usage: PYTHONPATH=/root/repo python scripts/r9_repro.py [group ...]
Groups: quote winagg compound derived casebase dynlike filter all
"""
from __future__ import annotations

import math
import sqlite3
import sys

ROWS = [
    (1, 2.5, "foo"), (2, -1.25, "Bar"), (3, None, None), (None, 0.0, ""),
    (5, 3.0, "baz"), (-4, 7.5, "FOO"), (0, None, "x y"), (6, 0.5, "it's"),
    (7, 0.5, "Foo"), (None, None, "%_"),
]
SCHEMA = {"a": "int", "b": "real", "c": "text"}

# judge's windowed-aggregate table: c = ('5kg','x','3',NULL,' 2.5e1 ','')
WROWS = [(1, "5kg"), (2, "x"), (3, "3"), (4, None), (5, " 2.5e1 "), (6, "")]
WSCHEMA = {"id": "int", "t": "text"}

REPROS = {
    "quote": [
        ("td", "SELECT a, quote(CASE '1' WHEN a THEN -1 ELSE c END) AS q FROM td"),
        ("td", "SELECT quote(CASE WHEN a > 0 THEN b ELSE c END) AS q FROM td"),
    ],
    "winagg": [
        ("tw", "SELECT id, sum(t) OVER (ORDER BY id) AS s FROM tw"),
        ("tw", "SELECT id, avg(t) OVER (ORDER BY id) AS s FROM tw"),
        ("tw", "SELECT id, total(t) OVER (ORDER BY id) AS s FROM tw"),
        ("tw", "SELECT id, group_concat(t, '|') OVER (ORDER BY id) AS s FROM tw"),
        ("tw", "SELECT id, group_concat(t) OVER (ORDER BY id) AS s FROM tw"),
        ("td", "SELECT a, sum(a) OVER (ORDER BY a) AS s FROM td"),
        ("td", "SELECT a, total(b) OVER (PARTITION BY c) AS s FROM td"),
        ("tw", "SELECT sum(t) AS s FROM tw"),
        ("tw", "SELECT total(t) AS s FROM tw"),
        ("tw", "SELECT group_concat(t, '|') AS s FROM tw"),
    ],
    "filter": [
        ("td", "SELECT c, count(*) FILTER (WHERE a > 0) AS n FROM td GROUP BY c"),
        ("td", "SELECT sum(b) FILTER (WHERE a > 2) AS s FROM td"),
        ("tw", "SELECT sum(t) FILTER (WHERE id > 1) AS s FROM tw"),
        ("td", "SELECT a, sum(b) FILTER (WHERE a > 0) OVER (ORDER BY a) AS s FROM td"),
        ("tw", "SELECT id, total(t) FILTER (WHERE id > 1) OVER (ORDER BY id) AS s FROM tw"),
        ("tw", "SELECT total(t) FILTER (WHERE id > 1) AS s FROM tw"),
        ("tw", "SELECT group_concat(t, '|') FILTER (WHERE id > 1) AS s FROM tw"),
        ("tw", "SELECT sum(t) FILTER (WHERE id IN (2, 6)) AS s FROM tw"),
        ("tw", "SELECT avg(t) FILTER (WHERE id > 3) AS s FROM tw"),
        ("tw", "SELECT count(*) FILTER (WHERE id > 3) AS s FROM tw"),
        ("tw", "SELECT id, count(*) FILTER (WHERE t <> '') OVER (ORDER BY id) AS s FROM tw"),
        ("tw", "SELECT id, group_concat(t) FILTER (WHERE id <> 2) OVER (ORDER BY id) AS s FROM tw"),
    ],
    "compound": [
        ("td", "SELECT 1 AS v UNION SELECT '1'"),
        ("td", "SELECT '1' AS v EXCEPT SELECT 1"),
        ("td", "SELECT 1 AS v INTERSECT SELECT '1'"),
        ("td", "SELECT a AS v FROM td UNION SELECT c FROM td"),
        ("td", "SELECT a AS v FROM td UNION SELECT c FROM td ORDER BY v"),
        ("td", "SELECT c AS v FROM td EXCEPT SELECT a FROM td"),
        ("td", "SELECT c AS v FROM td INTERSECT SELECT a FROM td"),
        ("td", "SELECT 1.0 AS v UNION SELECT 1 UNION SELECT '1'"),
        ("td", "SELECT b AS v FROM td UNION ALL SELECT a FROM td ORDER BY v"),
    ],
    "derived": [
        ("td", "SELECT sum(v) AS s FROM (SELECT '5kg' AS v UNION ALL SELECT 2 UNION ALL SELECT 'x')"),
        ("td", "SELECT min(v) AS m FROM (SELECT 20 AS v UNION ALL SELECT '9' UNION ALL SELECT 100)"),
        ("td", "SELECT max(v) AS m FROM (SELECT 20 AS v UNION ALL SELECT '9' UNION ALL SELECT 100)"),
        ("td", "SELECT sum(v) AS s FROM (SELECT c AS v FROM td)"),
        ("td", "SELECT avg(v) AS s FROM (SELECT c AS v FROM td UNION ALL SELECT a FROM td)"),
    ],
    "casebase": [
        ("td", "SELECT CASE min('abc', 9223372036854775807) WHEN 9223372036854775808.0 THEN 'eq' ELSE 'ne' END AS r"),
        ("td", "SELECT CASE min('abc', 9007199254740993) WHEN 9007199254740992.0 THEN 'eq' ELSE 'ne' END AS r"),
        ("td", "SELECT CASE max('abc', 9223372036854775807) WHEN 9223372036854775807 THEN 'eq' ELSE 'ne' END AS r"),
    ],
    "dynlike": [
        ("td", "SELECT a FROM td WHERE 'a!b' LIKE ('a' || upper(c) || '!b') ESCAPE '!'"),
        ("td", "SELECT c LIKE c ESCAPE '!' AS r FROM td"),
        ("td", "SELECT c, c LIKE ('%' || c) ESCAPE '\\' AS r FROM td"),
        ("td", "SELECT 'x!%y' LIKE ('x!' || c) ESCAPE '!' AS r FROM td"),
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

    spark = get_spark("r9-repro")
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

    n_bad = 0
    for grp in groups:
        for tbl, q in REPROS[grp]:
            schema = WSCHEMA if tbl == "tw" else SCHEMA
            try:
                want = sorted(tuple(canon(v) for v in r)
                              for r in con.execute(q).fetchall())
            except sqlite3.OperationalError as e:
                print(f"[{grp}] SQLITE-ERR {q!r}: {e}")
                continue
            try:
                rq = rewrite_query(q, schema)
                if isinstance(rq, tuple):
                    rq = rq[0]
                got = sorted(tuple(canon(v) for v in r)
                             for r in spark.sql(rq).collect())
            except Exception as e:
                n_bad += 1
                print(f"[{grp}] ENGINE-ERR {q!r}: {type(e).__name__} "
                      f"{str(e)[:300]}")
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

"""WITH RECURSIVE iterative evaluator (dsq_spark.recursive) vs DuckDB."""

import duckdb
import pytest

from dsq_spark.recursive import parse_recursive, run_recursive


def _duck(sql, views=None):
    con = duckdb.connect()
    for name, rows_sql in (views or {}).items():
        con.execute(f"CREATE VIEW {name} AS {rows_sql}")
    return con.execute(sql).fetchall()


def test_parse_non_recursive_is_none():
    assert parse_recursive("SELECT 1") is None
    assert parse_recursive("WITH x AS (SELECT 1) SELECT * FROM x") is None


def test_series_union_all(spark):
    sql = """WITH RECURSIVE t(n) AS (
      SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 50
    ) SELECT count(*) AS c, sum(n) AS s FROM t"""
    got = run_recursive(spark, sql).collect()[0]
    want = _duck(sql)[0]
    assert (got.c, got.s) == want == (50, 1275)


def test_cyclic_graph_union_distinct_terminates(spark):
    # Reachability over a graph WITH A CYCLE: UNION (distinct) must reach a
    # fixpoint instead of looping forever. a→b→c→a, c→d.
    edges = "SELECT * FROM VALUES ('a','b'),('b','c'),('c','a'),('c','d') AS e(src, dst)"
    spark.sql(edges).createOrReplaceTempView("edges")
    sql = """WITH RECURSIVE reach(node) AS (
      SELECT 'a' UNION SELECT dst FROM edges JOIN reach ON src = node
    ) SELECT node FROM reach ORDER BY node"""
    got = [r.node for r in run_recursive(spark, sql).collect()]
    want = [r[0] for r in _duck(sql, views={"edges": edges})]
    assert got == want == ["a", "b", "c", "d"]


def test_multi_union_base_and_trailing_cte(spark):
    # base itself contains a UNION (split must take the LAST top-level one);
    # a trailing non-recursive CTE after the recursive body is re-wrapped.
    sql = """WITH RECURSIVE t(n) AS (
      SELECT 1 UNION SELECT 2
      UNION ALL
      SELECT n + 2 FROM t WHERE n < 6
    ), doubled AS (SELECT n * 2 AS d FROM t)
    SELECT sum(d) AS s, count(*) AS c FROM doubled"""
    got = run_recursive(spark, sql).collect()[0]
    want = _duck(sql)[0]
    assert (got.s, got.c) == want


def test_cte_name_does_not_clobber_existing_view(spark):
    # A pre-existing temp view sharing the CTE's name must survive the
    # evaluation (the iteration binding uses a unique internal view name).
    spark.sql("SELECT 'original' AS tag").createOrReplaceTempView("t")
    sql = """WITH RECURSIVE t(n) AS (
      SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5
    ) SELECT sum(n) AS s FROM t"""
    assert run_recursive(spark, sql).collect()[0].s == 15
    assert spark.sql("SELECT tag FROM t").collect()[0].tag == "original"
    # and no internal __dsq_rec views are left behind
    leftover = [v.name for v in spark.catalog.listTables()
                if v.name.startswith("__dsq_rec")]
    assert leftover == []
    spark.catalog.dropTempView("t")


def test_nonconvergent_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        run_recursive(
            spark,
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t) "
            "SELECT * FROM t",
            max_iterations=5,
        )


def test_registry_query_matches_oracle(spark, sf_dir):
    import dsq_spark.queries as Q

    q = Q.REGISTRY["recursive_cte_series"]
    got = {
        (str(r.month), r.n_orders, r.revenue)
        for r in q.fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    want = {(str(m), n, rev) for m, n, rev in con.execute(q.oracle).fetchall()}
    assert got == want and len(got) == 80

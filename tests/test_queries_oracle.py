"""Mirror of the driver's correctness gate: run every registered query on
Spark AND its DuckDB oracle at sf0.001, compare row count, column names, and
order-insensitively compare values (exact match — the queries are built to be
deterministic across engines)."""

from __future__ import annotations

import math

import pytest

import dsq_spark.queries as Q


def _normalize(rows, cols):
    """Rows → sorted list of tuples of canonical strings (order-insensitive)."""
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if v is None:
                vals.append("∅")
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    # 12 significant digits: our explicit rounding (2-6 dp)
                    # already removed engine noise; this just canonicalizes
                    # float repr (e.g. 0.1+0.2 artifacts can't appear).
                    vals.append(f"{v:.12g}")
            elif isinstance(v, bool):
                vals.append(str(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", sorted(Q.REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = Q.REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]
    cols = sorted(sdf.columns)

    if q.oracle is None:
        assert len(spark_rows) >= 0  # rows-only smoke for non-SQL ops
        return

    ora = duck.sql(q.oracle)
    ora_cols = [d[0] for d in ora.description]
    assert sorted(ora_cols) == cols, f"{name}: column names differ: {sorted(ora_cols)} vs {cols}"
    ora_rows = [dict(zip(ora_cols, row)) for row in ora.fetchall()]

    assert len(ora_rows) == len(spark_rows), f"{name}: row count {len(spark_rows)} vs oracle {len(ora_rows)}"
    left, right = _normalize(spark_rows, cols), _normalize(ora_rows, cols)
    if left != right:
        diffs = [(a, b) for a, b in zip(left, right) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")


def test_chunking_drops_null_text_rows(spark, tmp_path):
    """text_chunk_documents on a corpus containing NULL text: Spark's
    size(NULL) is -1 and sequence(1, -1, 24) would throw — both engines
    must instead DROP the row (regression test for the NULL-text crash)."""
    import duckdb

    import dsq_spark.queries as Q

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "en", "web", 22),
         (2, None, "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    q = Q.REGISTRY["text_chunk_documents"]
    rows = q.fn(spark, str(tmp_path)).collect()
    assert {r["doc_id"] for r in rows} == {1}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'")
    orows = con.sql(q.oracle).fetchall()
    assert len(orows) == len(rows)

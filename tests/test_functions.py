"""Extended function library tests (SURVEY §2.8 stdlib parity)."""

from __future__ import annotations

import pytest

from dsq_spark.functions import register_all
from dsq_spark.rewrite import rewrite_query


@pytest.fixture(scope="module", autouse=True)
def udfs(spark):
    register_all(spark)


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


def test_url_family(spark):
    u = "'https://user@example.com:8443/a/b?x=1&y=two#frag'"
    assert one(spark, f"url_scheme({u})") == "https"
    assert one(spark, f"url_host({u})") == "example.com"
    assert one(spark, f"url_port({u})") == 8443
    assert one(spark, f"url_path({u})") == "/a/b"
    assert one(spark, f"url_param({u}, 'y')") == "two"
    assert one(spark, f"url_fragment({u})") == "frag"
    assert one(spark, "url_port('https://x.com/')") is None


def test_date_family_multiformat(spark):
    """best-effort parsing accepts several formats (reference README.md:695-698)."""
    for lit in ("'2021-04-01T11:22:33Z'", "'2021-04-01 11:22:33'",
                "'2021/04/01 11:22:33'", "'04/01/2021 11:22:33'"):
        assert one(spark, f"date_year({lit})") == 2021, lit
        assert one(spark, f"date_month({lit})") == 4
        assert one(spark, f"date_hour({lit})") == 11
    assert one(spark, "date_day('2021-04-01')") == 1
    assert one(spark, "date_unix('1970-01-02')") == 86400
    assert one(spark, "date_year('not a date')") is None


def test_hash_and_strings(spark):
    assert one(spark, "sha256('abc')") == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert one(spark, "replicate('ab', 3)") == "ababab"
    assert one(spark, "charindex('ll', 'hello')") == 3
    assert one(spark, "proper('hello world')") == "Hello World"


def test_split_part_negative_index(spark):
    """split_part(x, '.', -1) returns the LAST part (reference
    scripts/test.py:338-340 pins negative-index semantics)."""
    assert one(spark, "split_part('a.b.c', '.', -1)") == "c"
    assert one(spark, "split_part('a.b.c', '.', 2)") == "b"


def test_rewritten_aggregates(spark):
    sql = rewrite_query(
        "SELECT percentile_90(v) AS p90, stdev(v) AS sd, mode(v) AS md "
        "FROM (SELECT 1 v UNION ALL SELECT 2 UNION ALL SELECT 2 UNION ALL SELECT 10)")
    row = spark.sql(sql).collect()[0]
    assert row["md"] == 2
    assert row["p90"] == pytest.approx(7.6)

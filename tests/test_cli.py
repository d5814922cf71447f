"""CLI end-to-end tests (reference scripts/test.py golden strategy)."""

from __future__ import annotations

import io
import json
import os
from contextlib import redirect_stdout

import pytest

from dsq_spark.cli import parse_args, run

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _run(argv, spark):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run(argv, spark)
    return rc, buf.getvalue()


@pytest.fixture(scope="module", autouse=True)
def fixtures(tmp_path_factory):
    os.makedirs(FIX, exist_ok=True)
    with open(f"{FIX}/cli_users.csv", "w") as fh:
        fh.write("id,name\n1,Alice\n2,Bob\n")
    with open(f"{FIX}/cli_ages.json", "w") as fh:
        json.dump([{"id": 1, "age": 33}, {"id": 2, "age": 41}], fh)


def test_parse_last_arg_heuristic():
    # last arg with a space = query; without = file (main.go:502-508)
    a = parse_args(["f.csv", "SELECT 1 FROM {}"])
    assert a.files == ["f.csv"] and a.query == "SELECT 1 FROM {}"
    a = parse_args(["f.csv"])
    assert a.files == ["f.csv"] and a.query is None


def test_cross_format_join(spark):
    rc, out = _run([
        f"{FIX}/cli_users.csv", f"{FIX}/cli_ages.json",
        "SELECT {0}.name, {1}.age FROM {0} JOIN {1} ON {0}.id = {1}.id ORDER BY age",
    ], spark)
    assert rc == 0
    assert json.loads(out) == [{"name": "Alice", "age": 33}, {"name": "Bob", "age": 41}]


def test_pretty_output(spark):
    rc, out = _run(["--pretty", f"{FIX}/cli_users.csv",
                    "SELECT COUNT(1) AS n FROM {}"], spark)
    assert rc == 0
    assert out == "+---+\n| n |\n+---+\n| 2 |\n+---+\n(1 row)\n"


def test_queryless_dump(spark):
    rc, out = _run([f"{FIX}/cli_ages.json"], spark)
    assert json.loads(out) == [{"age": 33, "id": 1}, {"age": 41, "id": 2}]


def test_schema_json(spark):
    rc, out = _run(["--schema", f"{FIX}/cli_ages.json"], spark)
    shape = json.loads(out)
    assert shape["kind"] == "array"
    assert shape["array"]["object"]["age"] == {"kind": "scalar", "scalar": "number"}


def test_no_input_files(spark):
    rc, _ = _run([], spark)
    assert rc == 1


def test_extended_functions_via_cli(spark):
    rc, out = _run([
        f"{FIX}/cli_users.csv",
        "SELECT url_host('https://ex.com/p') AS h, percentile_50(CAST(id AS INT)) AS med FROM {}",
    ], spark)
    rows = json.loads(out)
    assert rows[0]["h"] == "ex.com"


def test_query_from_file(spark, tmp_path):
    sql = tmp_path / "q.sql"
    sql.write_text("SELECT COUNT(1) AS n FROM {}\n")
    rc, out = _run(["-f", str(sql), f"{FIX}/cli_users.csv"], spark)
    assert rc == 0 and json.loads(out) == [{"n": 2}]


def test_empty_query_file_errors(tmp_path):
    sql = tmp_path / "empty.sql"
    sql.write_text("")
    with pytest.raises(SystemExit):
        parse_args(["-f", str(sql), "x.csv"])


def test_cache_file_flag(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("DSQ_SPARK_CACHE_DIR", str(tmp_path / "c"))
    rc, out = _run(["-D", f"{FIX}/cli_users.csv",
                    "SELECT COUNT(1) AS n FROM {}"], spark)
    assert rc == 0
    first = out.splitlines()[0]
    assert "dsq-cache-" in first  # cache path printed (reference -D)


def test_write_parquet_dataset_layout(spark, tmp_path):
    from dsq_spark.io_out import write_parquet_dataset

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr", f"doc {i}") for i in range(30)],
        ["doc_id", "lang", "text"],
    )
    out = tmp_path / "ds"
    write_parquet_dataset(df, str(out), partition_by=("lang",),
                          max_records_per_file=7)
    dirs = sorted(p.name for p in out.iterdir() if p.is_dir())
    assert dirs == ["lang=en", "lang=fr"]
    back = spark.read.parquet(str(out))
    assert back.count() == 30
    # partition pruning: a lang filter must prune to the one directory
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.filter(back.lang == "fr").explain("formatted")
    assert "lang=fr" in buf.getvalue() or "PartitionFilters" in buf.getvalue()


def test_cli_with_recursive_routes(spark, tmp_path, capsys):
    """WITH RECURSIVE through the CLI entry runs the iterative evaluator."""
    import json as _json

    from dsq_spark import cli

    p = tmp_path / "seed.csv"
    p.write_text("n\n1\n")
    rc = cli.run(
        [str(p),
         "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n < 4) "
         "SELECT count(*) AS c FROM t"],
        spark=spark,
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out == [{"c": 4}]


def test_double_quote_string_fallback(spark, tmp_path, capsys):
    """SQLite's double-quote misfeature: a double-quoted token that fails
    column resolution is retried as a string literal — the reference's own
    suite relies on it (split_part(url_host(request), ".", -1))."""
    import json as _json

    from dsq_spark import cli

    p = tmp_path / "logs.csv"
    p.write_text("id,request\n1,https://one.com/x\n2,https://two.org/y\n")
    rc = cli.run([str(p),
                  'SELECT split_part(url_host(request), ".", -1) AS tld '
                  "FROM {} ORDER BY tld"], spark)
    assert rc == 0
    assert _json.loads(capsys.readouterr().out) == [{"tld": "com"}, {"tld": "org"}]
    # a double-quoted token that DOES resolve stays an identifier
    p2 = tmp_path / "dq.csv"
    p2.write_text("a,a b\n1,2\n")
    rc = cli.run([str(p2), 'SELECT "a b" FROM {}'], spark)
    assert rc == 0
    assert _json.loads(capsys.readouterr().out) == [{"a b": "2"}]


def test_compact_dataset(spark, tmp_path):
    from dsq_spark.io_out import compact_dataset

    src = tmp_path / "frag"
    # 40 tiny files
    spark.range(4000).selectExpr("id", "id % 5 AS k").repartition(40) \
        .write.parquet(str(src))
    import os
    before = sum(f.endswith(".parquet") for _, _, fs in os.walk(src) for f in fs)
    assert before >= 40
    after = compact_dataset(spark, str(src))
    assert after < before
    back = spark.read.parquet(str(src))
    assert back.count() == 4000 and set(back.columns) == {"id", "k"}


def test_compact_dataset_uri_scheme(spark, tmp_path):
    # all FS ops resolve from the path's own scheme (Hadoop FileSystem API),
    # so an explicit file:// URI must work the same as a bare local path —
    # the shape object-store paths (s3a://...) take.
    from dsq_spark.io_out import compact_dataset

    src = tmp_path / "frag_uri"
    spark.range(500).selectExpr("id").repartition(10).write.parquet(str(src))
    after = compact_dataset(spark, "file://" + str(src))
    assert after >= 1
    assert spark.read.parquet(str(src)).count() == 500


def test_cache_miss_stderr_message(spark, tmp_path, capsys):
    """Cold/invalidated cache announces re-import on stderr exactly like the
    reference ('Cache invalid, re-import required.'); a warm hit stays
    silent (scripts/test.py:289-317)."""
    import os

    from dsq_spark import cli

    os.environ["DSQ_SPARK_CACHE_DIR"] = str(tmp_path / "cache")
    try:
        f = tmp_path / "t.csv"
        f.write_text("a,b\n1,2\n")
        args = ["-C", str(f), "SELECT a FROM {}"]
        assert cli.run(args, spark) == 0
        assert "Cache invalid, re-import required." in capsys.readouterr().err
        assert cli.run(args, spark) == 0
        assert "Cache invalid" not in capsys.readouterr().err
        f.write_text("a,b\n1,3\n")
        assert cli.run(args, spark) == 0
        assert "Cache invalid, re-import required." in capsys.readouterr().err
    finally:
        del os.environ["DSQ_SPARK_CACHE_DIR"]


def test_write_clustered_dataset_enables_skipping(spark, tmp_path, sf_dir):
    """Range clustering must yield (near-)disjoint per-file min/max key
    ranges, so a range predicate overlaps only a small fraction of files —
    the data-skipping contract at 100 TB."""
    import glob as _glob

    import pyarrow.parquet as pq

    from dsq_spark.io_out import write_clustered_dataset

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = tmp_path / "clustered"
    write_clustered_dataset(orders, str(out), cluster_by=("o_orderdate",),
                            num_files=8)
    ranges = []
    for f in _glob.glob(str(out / "*.parquet")):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(md.row_group(rg).column(i)
                       for i in range(md.num_columns)
                       if md.row_group(rg).column(i).path_in_schema == "o_orderdate")
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    ranges.sort()
    # consecutive file ranges must not interleave (boundary overlap of one
    # key value is fine — repartitionByRange splits on key boundaries)
    overlaps = sum(1 for (a, b), (c, d) in zip(ranges, ranges[1:]) if c < b)
    assert overlaps <= 1, ranges
    # a 30-day predicate overlaps only a small fraction of the files
    lo = ranges[0][0]
    import datetime as _dt

    hi = lo + _dt.timedelta(days=30)
    touched = sum(1 for a, b in ranges if a <= hi and b >= lo)
    assert touched <= max(2, len(ranges) // 2), (touched, len(ranges))


def test_write_zordered_dataset_skips_on_both_columns(spark, tmp_path, sf_dir):
    """Z-order clustering must give every file a bounding box that is
    narrow in BOTH interleaved dimensions: a band predicate on EITHER
    column overlaps only a fraction of the files (single-key range
    clustering can only do this for one column)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from dsq_spark.io_out import write_zordered_dataset

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = tmp_path / "zordered"
    write_zordered_dataset(orders, str(out),
                           zorder_by=("o_custkey", "o_totalprice"),
                           num_files=16)

    stats = {"o_custkey": [], "o_totalprice": []}
    for f in _glob.glob(str(out / "*.parquet")):
        md = pq.read_metadata(f)
        for cname in stats:
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(md.row_group(rg).column(i)
                           for i in range(md.num_columns)
                           if md.row_group(rg).column(i).path_in_schema == cname)
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            stats[cname].append((min(mins), max(maxs)))
    n_files = len(stats["o_custkey"])
    assert n_files >= 8
    for cname, ranges in stats.items():
        glo = min(a for a, _ in ranges)
        ghi = max(b for _, b in ranges)
        span = ghi - glo
        # every file's bounding box is narrow in this dimension on average
        mean_span = sum(b - a for a, b in ranges) / n_files
        assert mean_span <= 0.75 * span, (cname, mean_span, span)
        # a 10%-of-range band predicate touches a minority of files
        lo = glo + 0.45 * span
        hi = glo + 0.55 * span
        touched = sum(1 for a, b in ranges if a <= hi and b >= lo)
        assert touched <= max(2, (2 * n_files) // 3), (cname, touched, n_files)


def test_pretty_table_streams_without_collect(spark, monkeypatch):
    """pretty_table must never materialize the result driver-side: widths
    come from a first toLocalIterator pass, rows stream in a second — an
    un-LIMITed --pretty at cluster scale stays one-partition-bounded
    (r3 verdict item)."""
    import io

    from pyspark.sql import DataFrame

    from dsq_spark.io_out import pretty_table

    df = spark.createDataFrame(
        [(1, "aa"), (2, "b" * 20), (3, None)], "n int, s string")

    def boom(self):
        raise AssertionError("pretty_table must not collect()")

    monkeypatch.setattr(DataFrame, "collect", boom)
    buf = io.StringIO()
    pretty_table(df.orderBy("n"), buf)
    out = buf.getvalue()
    assert out.endswith("(3 rows)\n")
    assert "| " + "b" * 20 + " |" in out
    # numeric right-alignment and centered header survive the streaming path
    assert out.splitlines()[1].startswith("|")


def test_csv_sqlite_arithmetic_semantics(spark, tmp_path):
    """The flagship dsq scenario: CSV ingest makes every column TEXT, and
    SQLite's coercion rules are what make arithmetic on it usable.
    Through the real CLI path (schema kinds fed to the rewriter):
    integer division on text ('7'/2 = 3), CAST prefix-parse + arithmetic,
    text-coercion in '*', and bare-column truthiness filtering."""
    csv = tmp_path / "inv.csv"
    csv.write_text("name,qty,price\nwidget,7,2.50\ngadget,3,10\njunk,x,5kg\n")
    rc, out = _run([str(csv),
                    "SELECT name, qty / 2 AS half, "
                    "CAST(qty AS INTEGER) + 1 AS nxt, price * 2 AS dbl "
                    "FROM {} WHERE qty"], spark)
    assert rc == 0
    assert json.loads(out) == [
        {"name": "widget", "half": 3, "nxt": 8, "dbl": 5},
        {"name": "gadget", "half": 1, "nxt": 4, "dbl": 20},
    ]
    # '5kg' is truthy (numeric prefix 5), 'x' is falsy (no prefix -> 0)
    rc, out = _run([str(csv), "SELECT count(*) AS n FROM {} WHERE price"],
                   spark)
    assert json.loads(out) == [{"n": 3}]
    rc, out = _run([str(csv), "SELECT count(*) AS n FROM {} WHERE qty"],
                   spark)
    assert json.loads(out) == [{"n": 2}]


def test_cli_default_json_is_quiet(spark, tmp_path):
    """Default-mode JSON loudness, pinned END-TO-END (r6 VERDICT
    missing-#1, decided r7): out of the box, malformed JSON in a JSON1
    call NULLs instead of raising — the deliberate scale posture
    (PARITY.md records the why: the raising guard doubles the
    get_json_object cost and one dirty row would kill a whole job;
    `--strict-json` restores the reference's loudness)."""
    csv = tmp_path / "docs.csv"
    csv.write_text('id,doc\n1,"{""a"": 1}"\n2,not json\n')
    rc, out = _run([str(csv),
                    "SELECT id, json_extract(doc, '$.a') AS a FROM {} "
                    "ORDER BY id"], spark)
    assert rc == 0
    assert json.loads(out) == [{"id": "1", "a": "1"},
                               {"id": "2", "a": None}]


def test_strict_json_flag_sets_env():
    """--strict-json reaches both consumers (function registration and the
    rewrite-time json_each lowering) through DSQ_STRICT_JSON."""
    import os

    os.environ.pop("DSQ_STRICT_JSON", None)
    try:
        a = parse_args(["--strict-json", "f.csv", "SELECT 1 FROM {}"])
        assert a is not None and a.files == ["f.csv"]
        assert os.environ.get("DSQ_STRICT_JSON") == "1"
    finally:
        os.environ.pop("DSQ_STRICT_JSON", None)


def test_cli_unquoted_numeric_comparison_is_lexical(spark, capsys):
    """The dsq CSV gotcha end-to-end: without -n every column is TEXT, and
    SQLite's comparison affinity makes `score > 90` — the UNQUOTED
    number — lexical too ('100' < '90'), exactly like the documented
    quoted form `score > "90"`.  With -n (convert-numbers) the comparison
    is numeric and '100' qualifies (reference README.md:550-589)."""
    import json

    fix = "tests/fixtures/u.csv"
    assert run([fix, "SELECT name FROM {} WHERE score > 90"], spark) == 0
    rows = json.loads(capsys.readouterr().out)
    assert [r["name"] for r in rows] == []  # '100' excluded lexically
    assert run(["-n", fix, "SELECT name FROM {} WHERE score > 90"],
               spark) == 0
    rows = json.loads(capsys.readouterr().out)
    assert [r["name"] for r in rows] == ["Bob"]

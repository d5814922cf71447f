"""Driver-checkable queries for the SQLite date/time modifier surface.

These run the SQLite-dialect SQL through the CLI's own rewriter
(dsq_spark.rewrite) so the driver's oracle comparison exercises the exact
compile path a dsq user hits: modifiers ('start of X', '±N units',
'weekday N'), and the strftime %-code table including the codes with no
Java-pattern equivalent (%w %W %s). Reference behavior: README.md:698
passes the date/time family to SQLite's C implementation.

Oracles are DuckDB-dialect equivalents chosen so the semantics coincide
(month arithmetic is applied only from month starts, where SQLite's
overflow normalization and DuckDB's clamping agree; weekday advance uses
isodow arithmetic)."""

from __future__ import annotations

from dsq_spark.queries.base import rebalance, register, t


def _sqlite_sql(spark, sql: str):
    from dsq_spark.functions import register_all
    from dsq_spark.rewrite import rewrite_query

    register_all(spark)
    return spark.sql(rewrite_query(sql))


@register(
    "date_modifier_functions",
    oracle="""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       count(*) AS n_orders,
       min(strftime(o_orderdate + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S')) AS min_next_day,
       min(strftime(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH,
                    '%Y-%m-%d')) AS next_month_start,
       min(strftime(o_orderdate + ((8 - isodow(o_orderdate)) % 7) * INTERVAL 1 DAY,
                    '%Y-%m-%d')) AS min_next_monday,
       min(CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)) AS min_epoch
FROM orders
GROUP BY 1
""",
    doc="SQLite datetime modifiers ('start of month', '+1 day', '+1 month', "
        "'weekday 1', 'start of day' epoch) compiled by the CLI rewriter to "
        "Catalyst expressions — pure JVM, no UDFs (reference README.md:698). "
        "Project-then-aggregate shape: each compiled chain is a named column "
        "of one codegen'd projection (subexpression elimination collapses "
        "the shared parse probe), and the aggregate consumes plain strings.",
)
def date_modifier_functions(spark, sf_dir):
    # r10: rebalance before the view — the single-row-group bench file
    # scans as ONE task, serializing the five compiled datetime chains
    # onto one core (measured 4.8 → 1.7 s; no-op at scale, see base.py).
    rebalance(t(spark, sf_dir, "orders")).createOrReplaceTempView(
        "dsq_dt_orders")
    return _sqlite_sql(spark, """
SELECT month_start,
       count(*) AS n_orders,
       min(next_day) AS min_next_day,
       min(next_month) AS next_month_start,
       min(next_monday) AS min_next_monday,
       min(epoch_day) AS min_epoch
FROM (SELECT date(o_orderdate, 'start of month') AS month_start,
             datetime(o_orderdate, '+1 day') AS next_day,
             date(o_orderdate, 'start of month', '+1 month') AS next_month,
             date(o_orderdate, 'weekday 1') AS next_monday,
             unixepoch(o_orderdate, 'start of day') AS epoch_day
      FROM dsq_dt_orders) z
GROUP BY month_start
""")


@register(
    "strftime_code_coverage",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS ymd,
       min(strftime(ts, '%j|%w|%W')) AS min_codes,
       max(CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR)) AS max_epoch,
       count(*) AS n
FROM events
GROUP BY 1
""",
    doc="strftime %-codes incl. the non-Java-pattern ones (%w Sunday=0, "
        "%W Monday-first week-of-year, %s epoch) — compiled to a concat() "
        "of JVM expressions at rewrite time.  Project-then-aggregate so the "
        "three compiled strftime chains share one codegen'd projection.",
)
def strftime_code_coverage(spark, sf_dir):
    rebalance(t(spark, sf_dir, "events")).createOrReplaceTempView(
        "dsq_dt_events")
    return _sqlite_sql(spark, """
SELECT ymd,
       min(codes) AS min_codes,
       max(ep) AS max_epoch,
       count(*) AS n
FROM (SELECT strftime('%Y-%m-%d', ts) AS ymd,
             strftime('%j|%w|%W', ts) AS codes,
             strftime('%s', ts) AS ep
      FROM dsq_dt_events) z
GROUP BY ymd
""")


@register(
    "julianday_functions",
    oracle="""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       round(min(julian(o_orderdate) - 0.5), 6) AS min_jd,
       min(strftime(o_orderdate + INTERVAL 12 HOUR,
                    '%Y-%m-%d %H:%M:%S')) AS noon_dt,
       min(strftime(DATE '1970-01-01' + CAST(o_orderkey % 20000 AS BIGINT)
                    * INTERVAL 1 DAY, '%Y-%m-%d')) AS key_date,
       min(strftime(make_timestamp((1600000000 + o_orderkey % 86400)
                    * 1000000), '%Y-%m-%d %H:%M:%S')) AS auto_dt,
       count(*) AS n
FROM orders
GROUP BY 1
""",
    doc=(
        "Numeric Julian-day-number timevalues through the CLI rewriter "
        "(SQLite lang_datefunc: a numeric time value is a JDN): "
        "julianday() extraction, JDN→datetime round-trips with modifier "
        "stacking, runtime numeric expressions as timevalues, and the "
        "'auto' modifier's out-of-range→epoch fallback.  DuckDB oracle: "
        "julian() (noon-based — offset 0.5 from SQLite's), interval "
        "arithmetic from the epoch date, and make_timestamp.  All pure "
        "Catalyst expression chains — no UDFs, map-side only."
    ),
)
def julianday_functions(spark, sf_dir):
    rebalance(t(spark, sf_dir, "orders")).createOrReplaceTempView(
        "dsq_jd_orders")
    return _sqlite_sql(spark, """
SELECT month_start,
       round(min(jd), 6) AS min_jd,
       min(noon) AS noon_dt,
       min(keyd) AS key_date,
       min(autod) AS auto_dt,
       count(*) AS n
FROM (SELECT date(o_orderdate, 'start of month') AS month_start,
             julianday(o_orderdate) AS jd,
             datetime(julianday(o_orderdate), '+12 hours') AS noon,
             date(2440587.5 + (o_orderkey % 20000)) AS keyd,
             datetime(1600000000 + o_orderkey % 86400, 'auto') AS autod
      FROM dsq_jd_orders) z
GROUP BY month_start
""")

"""Extended relational coverage: TPC-H-pattern queries adapted to the
driver's star schema (no partsupp table), plus window-distribution
functions, CUBE, LIMIT/OFFSET, and an event-time as-of join.

Each query exercises a distinct optimizer/operator path noted in its doc —
the goal is that SURVEY.md §2's inventory rows each have a live, oracle-
checked exemplar.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dsq_spark.queries.base import register, t


@register(
    "q4_priority_exists",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape: EXISTS decorrelates to a left-semi join "
        "(SURVEY J5); priority counts over a date slice.",
)
def q4_priority_exists(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    ret = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(ret, o.o_orderkey == ret.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q12_conditional_agg",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
""",
    doc="TPC-H Q12 shape: CASE-in-SUM conditional aggregation after an "
        "equi-join with a pushed date filter.",
)
def q12_conditional_agg(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_count"),
        )
    )


@register(
    "q14_promo_ratio",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-12-01'
""",
    doc="TPC-H Q14 shape: global conditional-ratio aggregate; part side "
        "broadcasts (small dim).",
)
def q14_promo_ratio(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-12-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q17_avg_subquery",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
       count(*) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
""",
    doc="TPC-H Q17 shape: correlated scalar AVG subquery → per-key "
        "pre-aggregate + broadcast join (no per-row subquery execution).",
)
def q17_avg_subquery(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # decorrelate: one aggregate over lineitem, joined back on the key
    avg_q = l.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_q), l.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 210)
GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    doc="TPC-H Q18 shape: IN-subquery over a grouped HAVING → semi-join "
        "against the aggregated key set.",
)
def q18_large_orders(spark, sf_dir):
    c, o, l = (t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders"),
               t(spark, sf_dir, "lineitem"))
    big = (
        l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 210).select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_ored_predicates",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30 AND p_size BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 40 AND p_size BETWEEN 1 AND 30)
""",
    doc="TPC-H Q19 shape: disjunctive multi-column predicates over a join — "
        "exercises CNF conversion / partial pushdown.",
)
def q19_ored_predicates(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 30) & F.col("p_size").between(1, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 40) & F.col("p_size").between(1, 30))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "q22_anti_join_avg",
    oracle="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       count(*) AS n_custs,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
""",
    doc="TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join.",
)
def q22_anti_join_avg(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    ab = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_custs"),
             F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@register(
    "window_distribution",
    oracle="""
SELECT o_orderkey,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       first_value(o_orderkey) OVER w AS first_key,
       nth_value(o_orderkey, 2) OVER w AS second_key
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
    doc="Window distribution functions (SURVEY W1/W2): ntile, percent_rank, "
        "cume_dist, first_value, nth_value.",
)
def window_distribution(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@register(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="CUBE grouping sets (SURVEY A6 — Spark superset over SQLite).",
)
def agg_cube(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 20
""",
    doc="LIMIT/OFFSET pagination with a deterministic tiebreak (SURVEY O2).",
)
def limit_offset(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(20).limit(10)
    )


@register(
    "asof_join_events",
    oracle="""
WITH signups AS (
  SELECT user_id, ts AS signup_ts, event_id AS signup_id
  FROM events WHERE event_type = 'signup'
),
purchases AS (
  SELECT user_id, ts AS p_ts, event_id AS p_id, value
  FROM events WHERE event_type = 'purchase' AND user_id < 100
)
SELECT p.user_id, p.p_id,
       CAST(max(s.signup_id) AS BIGINT) AS last_signup_id,
       count(*) AS n_prior_signups
FROM purchases p
JOIN signups s ON s.user_id = p.user_id AND s.signup_ts <= p.p_ts
GROUP BY p.user_id, p.p_id
""",
    doc="Event-time as-of join (SURVEY J6 — absent in the reference, core "
        "for time-series): each purchase matched to its latest prior "
        "signup. Implemented as a range join + max aggregate; at scale "
        "this becomes a broadcast range join or a union+window merge.",
)
def asof_join_events(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_uid"), F.col("ts").alias("signup_ts"),
        F.col("event_id").alias("signup_id"))
    p = e.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 100)).select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
    return (
        p.join(s, (p.user_id == s.s_uid) & (s.signup_ts <= p.p_ts))
        .groupBy("user_id", "p_id")
        .agg(F.max("signup_id").cast("long").alias("last_signup_id"),
             F.count("*").alias("n_prior_signups"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
  AND cn.n_name IN ('NATION_0', 'NATION_1')
  AND sn.n_name IN ('NATION_0', 'NATION_1')
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q7 shape: bilateral trade volume — nation dims joined twice "
        "under different roles (alias discipline), both broadcast.",
)
def q7_volume_shipping(spark, sf_dir):
    l, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    c, s = t(spark, sf_dir, "customer"), t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    nations = ["NATION_0", "NATION_1"]
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter((F.col("cust_nation") != F.col("supp_nation"))
                & F.col("cust_nation").isin(nations) & F.col("supp_nation").isin(nations))
        .groupBy("cust_nation", "supp_nation",
                 F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
WITH all_rev AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         rn.n_name AS supp_region_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation rn ON s_nationkey = rn.n_nationkey
)
SELECT o_year,
       round(sum(CASE WHEN supp_region_nation = 'NATION_0' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share,
       count(*) AS n_items
FROM all_rev
GROUP BY o_year
""",
    doc="TPC-H Q8 shape: market-share ratio of one nation's suppliers per "
        "order year (conditional-sum / total-sum).",
)
def q8_market_share(spark, sf_dir):
    l, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    s, n = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.year("o_orderdate").cast("long").alias("o_year"),
                vol.alias("volume"), F.col("n_name"))
    )
    return j.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("n_name") == "NATION_0", F.col("volume")).otherwise(0.0))
            / F.sum("volume"), 6).alias("mkt_share"),
        F.count("*").alias("n_items"),
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) - l_quantity * 10.0
                           AS DECIMAL(18, 4))) AS DOUBLE), 2) AS profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE p_name LIKE '%a%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 shape: profit by supplier nation and year with a LIKE "
        "part filter (fixed 10.0 stand-in for missing partsupp supplycost).",
)
def q9_product_profit(spark, sf_dir):
    l, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    s, n, p = (t(spark, sf_dir, "supplier"), t(spark, sf_dir, "nation"),
               t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%")))
    # Decimal accumulation: the per-group sums reach ~1e7 where double
    # addition-order noise crosses the 2dp rounding boundary between
    # engines; decimal addition is exact and order-independent.
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("l_quantity") * 10.0).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("profit"))
    )


@register(
    "pivot_event_types",
    oracle="""
SELECT user_bucket,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM (SELECT CAST(floor(user_id / 100) AS BIGINT) AS user_bucket, event_type FROM events) z
GROUP BY user_bucket
""",
    doc="PIVOT (long→wide): event-type counts per user bucket via Spark's "
        "pivot operator — compiles to the same conditional-sum plan the "
        "oracle spells out, one shuffle.",
)
def pivot_event_types(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    out = (
        e.select(F.floor(F.col("user_id") / 100).cast("long").alias("user_bucket"),
                 "event_type")
        .groupBy("user_bucket")
        .pivot("event_type", types)
        .count()
    )
    # pivot leaves NULL for empty cells; oracle's conditional sums give 0
    return out.select(
        "user_bucket",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in types],
    )


@register(
    "rollup_time_hierarchy",
    oracle="""
SELECT CAST(year(ts) AS BIGINT) AS y,
       CAST(month(ts) AS BIGINT) AS m,
       CAST(day(ts) AS BIGINT) AS d,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY ROLLUP (year(ts), month(ts), day(ts))
""",
    doc="Hypertable-style time-hierarchy rollup: day/month/year/grand-total "
        "aggregates in ONE pass (ROLLUP grouping sets) — the scale path for "
        "multi-granularity dashboards: no per-granularity rescans.",
)
def rollup_time_hierarchy(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            F.year("ts").cast("long").alias("y"),
            F.month("ts").cast("long").alias("m"),
            F.dayofmonth("ts").cast("long").alias("d"),
            "value",
        )
        .rollup("y", "m", "d")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "agg_salted_skew",
    oracle="""
SELECT event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value,
       round(max(value), 2) AS max_value
FROM events
GROUP BY event_type
""",
    doc="Skew-resistant two-phase aggregation: events.event_type has ~5 "
        "distinct values (pathological shuffle skew at 100 TB — a handful "
        "of reducers get everything). Phase 1 pre-aggregates on "
        "(event_type, salt=crc32(event_id)%32) spreading each hot key over "
        "32 reducers; phase 2 merges the 5x32 partials. Same result as the "
        "plain groupBy oracle; partial-agg arithmetic stays exact "
        "(counts/max exact, sum reassociation absorbed by rounding).",
)
def agg_salted_skew(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    salted = (
        e.withColumn("salt", (F.crc32(F.col("event_id").cast("string")) % 32))
        .groupBy("event_type", "salt")
        .agg(F.count("*").alias("pn"), F.sum("value").alias("pv"),
             F.max("value").alias("pm"))
    )
    return salted.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pv"), 2).alias("total_value"),
        F.round(F.max("pm"), 2).alias("max_value"),
    )

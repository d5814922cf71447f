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

from dsq_spark.queries.base import fround, register, t


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
       floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
       floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cume,
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
        fround(F.percent_rank().over(w), 6).alias("pct_rank"),
        fround(F.cume_dist().over(w), 6).alias("cume"),
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
    # r10: tried rebalance() on the single-task lineitem scan here; the
    # round-robin exchange measured SLOWER than the 1-task broadcast-join
    # chain it parallelized (0.80 -> 1.32 s in-suite, both after-runs
    # agree) — the per-row work (4 hash probes + a decimal mult) is too
    # cheap to pay a full shuffle for.  Kept the plain scan.
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


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) z
GROUP BY c_count
""",
    doc="TPC-H Q13 shape: order-count-per-customer distribution via a "
        "LEFT OUTER join (SURVEY J2) and double aggregation. Scale plan: "
        "pre-aggregate orders by o_custkey BEFORE the join so the shuffle "
        "carries one partial-count row per customer instead of every order "
        "row (aggregate-below-join; at 100 TB orders >> customer this cuts "
        "the join's shuffle volume by the avg orders-per-customer factor). "
        "coalesce(n,0) reproduces count(o_orderkey)'s null-group semantics "
        "because o_orderkey is never NULL in a matched row.",
)
def q13_customer_distribution(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, round(CAST(total_rev AS DOUBLE), 2) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
""",
    doc="TPC-H Q15 shape: top supplier(s) by quarterly revenue — scalar "
        "subquery against an aggregated view. Revenue accumulates in "
        "decimal so the `= max` comparison is exact and addition-order-"
        "independent across engines (cf. q9). Spark impl replaces the "
        "second scan of the view with an unpartitioned window max over the "
        "already-aggregated (tiny: one row per supplier) set, then "
        "broadcasts supplier for the name lookup — lineitem is read once.",
)
def q15_top_supplier(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
              .cast("decimal(18,4)")).alias("total_rev")
    )
    w = Window.partitionBy()
    top = rev.withColumn("mx", F.max("total_rev").over(w)).filter(
        F.col("total_rev") == F.col("mx"))
    s = t(spark, sf_dir, "supplier")
    return top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name",
        F.round(F.col("total_rev").cast("double"), 2).alias("total_revenue"),
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey)
SELECT p_partkey, p_brand, s_name,
       floor(unit_cost * 10000 + 0.5) / 10000 AS unit_cost
FROM cost
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size <= 10
  AND unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                   WHERE c2.l_partkey = cost.l_partkey)
""",
    doc="TPC-H Q2 shape (no partsupp table): cheapest supplier(s) per "
        "small part, i.e. a correlated min subquery over an aggregated "
        "view. unit_cost is a deterministic per-row double op (no "
        "accumulation), so min-selection and the `=` correlation are exact "
        "in both engines. Spark impl decorrelates with a window min over "
        "l_partkey — that repartitions only the small aggregated set "
        "(one row per part-supplier pair), never lineitem itself. part "
        "is filtered (p_size <= 10) before its broadcast. Display "
        "rounding is floor(x*1e4 + 0.5)/1e4 on BOTH engines rather than "
        "round(x, 4): a 2dp-price / integer-quantity quotient lands on "
        "exact 4dp half-way points often enough (6 of 3919 rows at sf0.1) "
        "that the engines' different round() implementations disagree by "
        "one ulp of the last digit; the floor form is the same IEEE ops "
        "on the same doubles, so it cannot.",
)
def q2_min_cost_supplier(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        (F.min(F.col("l_extendedprice") / F.col("l_quantity"))).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("best", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best"))
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = t(spark, sf_dir, "supplier")
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_brand", "s_name",
                fround(F.col("unit_cost"), 4).alias("unit_cost"))
    )


@register(
    "q16_supplier_variety",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%' AND p_size IN (1,2,3,4,5)
GROUP BY p_brand, p_type, p_size
""",
    doc="TPC-H Q16 shape (lineitem stands in for partsupp): distinct-"
        "supplier variety per (brand, type, size) with negated predicates. "
        "Exact COUNT(DISTINCT) — Catalyst expands to a two-phase "
        "aggregation (dedup on the grouping+distinct keys, then count). "
        "The part filter is applied before the broadcast join, so the "
        "scan prunes to the 5 sizes up front.",
)
def q16_supplier_variety(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 2, 3, 4, 5))
    )
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q21_sole_returner",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""",
    doc="TPC-H Q21 shape (l_returnflag='R' stands in for the "
        "receipt>commit lateness predicate): suppliers who were the SOLE "
        "returner on multi-supplier finished orders — the classic "
        "EXISTS + NOT-EXISTS pair of correlated self-joins. Spark impl "
        "decorrelates BOTH subqueries into one per-order aggregate "
        "(n_suppliers = countDistinct suppkey, n_ret_suppliers = "
        "countDistinct suppkey where R): EXISTS(other supplier) == "
        "n_suppliers >= 2; NOT EXISTS(other R supplier), given l1 is R, "
        "== n_ret_suppliers == 1. One scan + one shuffle of lineitem "
        "replaces two correlated probes — at 100 TB this is the "
        "difference between 3 lineitem shuffles and 1 (plus the "
        "broadcastable per-order digest).",
)
def q21_sole_returner(spark, sf_dir):
    # r10: tried rebalance() on the single-task lineitem scan; the extra
    # round-robin exchange measured SLOWER (1.34 -> 2.14 s in-suite) —
    # the countDistinct digest already shuffles on l_orderkey, so the
    # partial-agg parallelism it bought was cheaper than the added
    # full-width exchange.  Kept the plain scan.
    # r10 (second pass): the two countDistinct's forced an Expand x2 over
    # every lineitem row (two-round distinct agg), and numwait re-scanned
    # lineitem (l1 = the R rows) to join back against qualifying orders.
    # A (l_orderkey, l_suppkey) pair aggregate carries everything both
    # passes needed: n_supp = count of pairs, n_ret_supp = pairs with any
    # R row, and — because a qualifying order has EXACTLY ONE returning
    # supplier (n_ret_supp == 1) — that supplier's key and its R-row count
    # ride the same aggregate (max/sum over the when-guarded pair).  One
    # lineitem scan, no Expand, no lineitem-sized join (guide §2.3, §3).
    l = t(spark, sf_dir, "lineitem")
    pairs = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("cnt_r"))
    per_order = (
        pairs.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.count(F.when(F.col("cnt_r") > 0, 1)).alias("n_ret_supp"),
            F.max(F.when(F.col("cnt_r") > 0, F.col("l_suppkey"))).alias("ret_supp"),
            F.sum(F.when(F.col("cnt_r") > 0, F.col("cnt_r"))).alias("ret_rows"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    return (
        per_order.join(o.select("o_orderkey"),
                       F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("ret_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("ret_rows").cast("long").alias("numwait"))
    )


@register(
    "q20_heavy_shippers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%a%'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 4 * (SELECT avg(l_quantity) FROM lineitem)
)
""",
    doc="TPC-H Q20 shape (no partsupp): suppliers who shipped any "
        "name-matched part in quantity above 4x the global per-line "
        "average — IN-semi-join against a grouped HAVING whose threshold "
        "is a scalar subquery. Spark impl: the scalar aggregate broadcasts "
        "as a 1-row cross join (never recomputed per group), the part "
        "filter broadcasts into the lineitem join, and the IN becomes a "
        "left-semi join on the distinct supplier set.",
)
def q20_heavy_shippers(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    avg_qty = l.agg(F.avg("l_quantity").alias("aq"))
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .crossJoin(F.broadcast(avg_qty))
        .filter(F.col("sq") > 4 * F.col("aq"))
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier")
    return s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name")


@register(
    "q11_important_parts",
    oracle="""
WITH natsup AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_3','NATION_7','NATION_8')
), val AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS value
  FROM lineitem JOIN natsup ON l_suppkey = s_suppkey
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey,
       round(CAST(value AS DOUBLE), 2) AS value
FROM val
WHERE value > (SELECT sum(value) * 0.001 FROM val)
""",
    doc="TPC-H Q11 shape (no partsupp: lineitem revenue stands in for stock "
        "value): per-part value from a nation group's suppliers, kept only when "
        "above a fraction of the total — a scalar aggregate over the same "
        "derived table it filters. The nation-filtered supplier set "
        "broadcasts; the derived per-part aggregate is persisted because "
        "BOTH the threshold scalar and the filter consume it (one "
        "computation, two readers); the scalar joins back as a broadcast "
        "1-row cross join, never a single-partition window. Decimal "
        "accumulation keeps the threshold comparison exact across engines.",
)
def q11_important_parts(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_7", "NATION_8"))
    natsup = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    l = t(spark, sf_dir, "lineitem")
    val = (
        l.join(F.broadcast(natsup), l.l_suppkey == natsup.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("value")
        )
        .persist()
    )
    threshold = val.agg((F.sum("value") * F.lit(0.001)).alias("thr"))
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("value").cast("double"), 2).alias("value"),
        )
    )


@register(
    "unpivot_charge_components",
    oracle="""
WITH longf AS (
  SELECT l_returnflag, 'extendedprice' AS component, l_extendedprice AS value FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'tax', l_tax FROM lineitem
)
SELECT l_returnflag, component,
       round(CAST(sum(value) AS DOUBLE), 2) AS total,
       round(avg(value), 6) AS mean
FROM longf
GROUP BY l_returnflag, component
""",
    doc=(
        "UNPIVOT (wide->long melt, the inverse of pivot_event_types): the "
        "three lineitem charge columns aggregate per flag in ONE scan "
        "(decimal-exact sums, 6dp-rounded means), and the 3-row-per-flag "
        "RESULT melts into (component, total, mean) rows — the r10 "
        "optimization round moved the melt above the aggregate so the "
        "Expand triples 9 aggregated rows, not 6M lineitem rows "
        "(identical values: decimal sums are order-exact and the means "
        "keep the same rounding discipline)."
    ),
)
def unpivot_charge_components(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    # r10 optimization (guide §2.3 "aggregate before you shuffle"): the
    # unpivot Expand tripled lineitem (6M → 18M rows at sf0.1) BEFORE the
    # aggregation; aggregating the three columns per flag first (one scan,
    # 3 sums + 3 avgs per group, same map-side partial aggregation) and
    # melting the 3-rows-per-flag RESULT computes the identical values —
    # decimal sums are order-exact, and avg keeps the same 6dp rounding
    # discipline the melt relied on.  Plan: Expand over 3 aggregated rows
    # per flag instead of over every lineitem row.
    agg = l.groupBy("l_returnflag").agg(*[
        x for c in ("extendedprice", "discount", "tax") for x in (
            F.round(F.sum(F.col(c).cast("decimal(18,6)")).cast("double"), 2)
            .alias(f"t_{c}"),
            F.round(F.avg(c), 6).alias(f"m_{c}"),
        )
    ])
    return agg.select(
        "l_returnflag",
        F.expr("explode(array("
               "named_struct('component', 'extendedprice', 'total', t_extendedprice, 'mean', m_extendedprice), "
               "named_struct('component', 'discount', 'total', t_discount, 'mean', m_discount), "
               "named_struct('component', 'tax', 'total', t_tax, 'mean', m_tax)))").alias("z"),
    ).select("l_returnflag", "z.component", "z.total", "z.mean")

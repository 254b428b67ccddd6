"""Generic analytics + GetRequest-API queries: the joins/windows the
Spark engine adds beyond the reference, and the chained/fan-out Get
contracts. See registry.py for the oracle-parity conventions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_instrument_spark.registry_base import (
    P_CTE,
    R_CTE,
    _bucket_sql,
    _pts,
    query,
)
from open_instrument_spark.session import prepare
from open_instrument_spark.sources.tables import load_tables

# ===========================================================================
# Generic analytics extensions (engine breadth + bench headliners): the
# reference has no joins (SURVEY.md §2.6) — these demonstrate the joins/
# windows the Spark engine adds for free, with decimal-exact oracles.
# ===========================================================================

@query(
    "analytics_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                CAST(1 - l_discount AS DECIMAL(5,2))) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def analytics_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan → pushed filter → 2-key
    groupBy with decimal-exact sums (cross-engine deterministic)."""
    prepare(spark)
    li = load_tables(spark, sf_dir).table("lineitem")
    dec = lambda c, s: F.col(c).cast(f"decimal(18,{s})")
    out = (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 4)).alias("_sq"),
            F.sum(dec("l_extendedprice", 4)).alias("_sbp"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(5,2)")
            ).alias("_sdp"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sbp").cast("double").alias("sum_base_price"),
            F.col("_sdp").cast("double").alias("sum_disc_price"),
            (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            "count_order",
        )
    )
    return out


@query(
    "analytics_revenue_by_nation",
    oracle="""
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                CAST(1 - l.l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def analytics_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join revenue rollup: fact-fact shuffle join on orderkey,
    then broadcast joins to the small customer/nation dims (the shape
    Catalyst must get right at 100 TB: two big-table shuffles max,
    dims never shuffled)."""
    prepare(spark)
    t = load_tables(spark, sf_dir)
    li, orders, cust, nation = t.table("lineitem"), t.table("orders"), t.table("customer"), t.table("nation")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(5,2)")
    )
    out = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).alias("_rev"), F.count(F.lit(1)).alias("n_items"))
        .select("n_name", F.col("_rev").cast("double").alias("revenue"), "n_items")
    )
    return out


@query(
    "analytics_top_orders_per_customer",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, rn AS rank
FROM ranked WHERE rn <= 3
""",
)
def analytics_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the canonical top-k-per-group window
    (single shuffle on the partition key, rank prune)."""
    from pyspark.sql import Window

    prepare(spark)
    orders = load_tables(spark, sf_dir).table("orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


@query(
    "analytics_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                CAST(1 - l.l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def analytics_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped order priority (adapted to the synthetic schema:
    o_orderpriority stands in for ship priority): selective dim filter broadcast
    into the fact-fact join, decimal-exact revenue, distributed top-10
    (TakeOrderedAndProject — no global sort). Driver-window oracled."""
    prepare(spark)
    t = load_tables(spark, sf_dir)
    cust = t.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t.table("orders").filter(F.col("o_orderdate") < "1995-03-15 00:00:00")
    li = t.table("lineitem").filter(F.col("l_shipdate") > "1995-03-15 00:00:00")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(5,2)")
    )
    out = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("_rev"))
        .select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )
    return out


@query(
    "api_get_chained",
    oracle=f"""
WITH {P_CTE},
rng AS (
  SELECT * FROM p
  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    AND ts <= TIMESTAMP '2024-01-20 00:00:00'
),
r AS (
  SELECT series_key, ts, dval, lag(dval) OVER w AS pv,
         epoch(ts) AS t, lag(epoch(ts)) OVER w AS pt
  FROM rng
  WINDOW w AS (PARTITION BY series_key ORDER BY ts)
),
rated AS (
  SELECT series_key, ts, (dval - pv) / (t - pt) AS dval
  FROM r
  WHERE pt IS NOT NULL AND t > pt AND (dval - pv) / (t - pt) >= 0
),
m AS (
  SELECT series_key, {_bucket_sql(300_000)} AS ts, avg(dval) AS dval
  FROM rated GROUP BY 1, 2
),
k AS (
  SELECT series_key, ts, dval,
         row_number() OVER (PARTITION BY series_key ORDER BY ts DESC) AS rn
  FROM m
)
SELECT series_key, ts, round(dval, 6) AS dval FROM k WHERE rn <= 5
""",
)
def api_get_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end GetRequest lifecycle (server/store.cc:105-274 shape):
    trailing-* glob match → inclusive time range → Go-style CHAINED
    mutation pipeline rate→5m-mean (M11 chaining, go/src/store.go:102-131)
    → max_values last-N cap — all one declarative Catalyst plan."""
    import datetime as dt

    from open_instrument_spark.plans.api import GetRequest, get

    out = get(
        _pts(spark, sf_dir),
        GetRequest(
            variable="/events/*",
            min_timestamp=dt.datetime(2024, 1, 10),
            max_timestamp=dt.datetime(2024, 1, 20),
            mutations=[("rate", None), ("mean", "5m")],
            max_values=5,
        ),
    )
    return out.select("series_key", "ts", F.round("dval", 6).alias("dval"))


@query(
    "api_get_fanout",
    oracle=f"""
WITH {P_CTE}, {R_CTE}
SELECT 'rate' AS mutation, series_key, ts, (dval - pv) / (t - pt) AS dval
FROM r WHERE pt IS NOT NULL AND t > pt AND (dval - pv) / (t - pt) >= 0
UNION ALL
SELECT 'delta' AS mutation, series_key, ts, dval - pv AS dval
FROM r WHERE pt IS NOT NULL AND t > pt AND dval - pv >= 0
""",
)
def api_get_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C++ fan-out contract (M11): each requested mutation applies
    independently to the RAW stream, one output stream per mutation
    (server/store.cc:140-147; lib/openinstrument.proto:117-119).
    Returned as a tagged union so the result is one DataFrame."""
    from open_instrument_spark.plans.api import GetRequest, get

    streams = get(
        _pts(spark, sf_dir),
        GetRequest(
            variable="/events/*",
            min_timestamp=None,
            max_timestamp=None,
            mutations=[("rate", None), ("delta", None)],
            chain_mutations=False,
        ),
    )
    tagged = [
        s.select(F.lit(tag).alias("mutation"), "series_key", "ts", "dval")
        for tag, s in zip(["rate", "delta"], streams)
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out




@query(
    "analytics_large_volume",
    oracle="""
WITH q AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, q.total_qty
FROM q
JOIN orders o ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
""",
)
def analytics_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume customers: the group-HAVING
    semi-join plan shape the other analytics queries don't exercise.
    The qualifying-orders aggregate (result-scale after the HAVING
    filter) is explicitly broadcast into the orders join, and the tiny
    joined frame broadcasts into customer — at 100 TB neither fact
    table shuffles for the joins; the only full shuffle is the
    lineitem quantity aggregation, which is map-side partial. Sums are
    exact (quantities are integral doubles, far under 2^53), and the
    top-100 breaks o_totalprice ties by (o_orderdate, o_orderkey) for
    deterministic cross-engine order."""
    prepare(spark)
    t = load_tables(spark, sf_dir)
    li = t.table("lineitem")
    orders = t.table("orders")
    cust = t.table("customer")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    picked = orders.join(
        F.broadcast(qualifying),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    out = (
        cust.join(F.broadcast(picked), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )
    return out


@query(
    "analytics_cohort_retention",
    oracle="""
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
a AS (SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w
      FROM events),
c AS (SELECT user_id,
             CAST(floor(epoch(first_ts) / 604800) AS BIGINT) AS cw
      FROM f)
SELECT c.cw AS cohort_week, a.w - c.cw AS offset_w,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM a JOIN c USING (user_id)
GROUP BY 1, 2
""",
)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over the events table (late r8, the
    product-analytics staple the temporal family was missing): cohort =
    a user's first-seen epoch week, one row per (cohort_week,
    week_offset) with the count of cohort users still active that week.

    Shape: first-seen and per-week activity are both user-keyed
    aggregates, the join is co-partitioned on user_id, and the final
    matrix is |weeks|² rows. Week arithmetic is epoch-floor on whole
    seconds, so Spark's truncating unix_timestamp and DuckDB's
    fractional epoch() floor to the same week on any input."""
    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    wk_ts = F.floor(F.unix_timestamp("ts") / 604800).cast("long")
    activity = ev.select("user_id", wk_ts.alias("w")).distinct()
    cohort = ev.groupBy("user_id").agg(
        F.floor(F.unix_timestamp(F.min("ts")) / 604800)
        .cast("long")
        .alias("cw")
    )
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("w") - F.col("cw")).alias("offset_w"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )

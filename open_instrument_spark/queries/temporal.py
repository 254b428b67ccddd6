"""Temporal-extension queries: as-of join, sessionization, funnel.
See registry.py for the oracle-parity conventions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_instrument_spark.registry_base import query
from open_instrument_spark.session import prepare
from open_instrument_spark.sources.tables import load_tables

# ===========================================================================
# Temporal extensions: as-of join + sessionization (operators/temporal.py)
# ===========================================================================

@query(
    "temporal_asof_join",
    oracle="""
WITH l AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, ts, max(value) AS r_value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT l.user_id, l.ts, l.value, r.ts AS r_ts, r.r_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def temporal_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the user's most recent prior-or-equal
    view. Union + one window pass — one shuffle on user_id, no range join
    (DuckDB's native ASOF JOIN is the oracle)."""
    from open_instrument_spark.operators.temporal import as_of_join

    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    left = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = as_of_join(left, right, on=["user_id"], value_cols=["value"])
    return out.select("user_id", "ts", "value", "r_ts", "r_value")


@query(
    "temporal_sessionize",
    oracle="""
WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 6 HOUR AS session_end,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid
""",
)
def temporal_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (6 h) per user via native session_window — the
    same expression runs incrementally under Structured Streaming. Oracle:
    gaps-and-islands SQL (session end = last event + gap, both engines)."""
    from open_instrument_spark.operators.temporal import sessionize

    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    return sessionize(ev, "user_id", gap="6 hours")


@query(
    "temporal_funnel",
    oracle="""
WITH l AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, ts FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
j AS (
  SELECT l.user_id, l.ts, r.ts AS r_ts
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
)
SELECT user_id,
       count(*) AS n_purchases,
       CAST(sum(CASE WHEN r_ts IS NOT NULL
                      AND r_ts >= ts - INTERVAL 1 HOUR THEN 1 ELSE 0 END)
            AS BIGINT) AS n_converted
FROM j GROUP BY user_id
""",
)
def temporal_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per user, purchases whose most recent prior
    view is within 1 hour (the as-of join with tolerance, then a
    group-count) — the classic product-analytics composition of the
    temporal operators. Driver-window oracled (native DuckDB ASOF JOIN +
    interval filter on the oracle side)."""
    from open_instrument_spark.operators.temporal import as_of_join

    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts").distinct()
    j = as_of_join(purch, views, on=["user_id"], tolerance="1 hour", value_cols=[])
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(
            F.when(F.col("r_ts").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_converted"),
    )



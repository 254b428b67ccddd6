"""Query registry: every implemented operator exposed as a named query
with a DuckDB oracle twin (the driver's correctness gate).

Each Spark callable takes (spark, sf_dir) → DataFrame; each oracle is
ANSI SQL over the same parquet tables (views: region nation customer
supplier part orders lineitem events documents embeddings).

Conventions for oracle parity:
- session pinned to UTC (prepare()) so naive-timestamp math matches;
- aggregate doubles rounded to 6 decimals on BOTH sides (cross-engine
  float summation differs in association order, never in magnitude);
- every computed column aliased identically on both sides.

The events table stands in for the reference's points model
(FIXTURES.md §2): event_type → variable name, user_id → label,
value → dval.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_instrument_spark.operators import aggregate as agg_ops
from open_instrument_spark.operators import mutate, select
from open_instrument_spark.session import prepare
from open_instrument_spark.sources.tables import load_tables, points_from_dir

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    return points_from_dir(spark, sf_dir)


# DuckDB twin of model.events_to_points + model.series_key for the events
# mapping (single label ⇒ quoting/sorting never triggers).
P_CTE = """
p AS (
  SELECT '/events/' || event_type AS name,
         CAST(user_id AS VARCHAR) AS user_id,
         '/events/' || event_type || '{user_id=' || CAST(user_id AS VARCHAR) || '}' AS series_key,
         ts,
         value AS dval
  FROM events
)
"""

# lag-pair CTE shared by the rate/delta oracles (window = one series)
R_CTE = """
r AS (
  SELECT name, series_key, ts,
         dval, lag(dval) OVER w AS pv,
         epoch(ts) AS t, lag(epoch(ts)) OVER w AS pt
  FROM p
  WINDOW w AS (PARTITION BY series_key ORDER BY ts)
)
"""


def _bucket_sql(interval_ms: int, ts: str = "ts") -> str:
    return (
        f"make_timestamp(CAST(floor(epoch_ms({ts}) / {interval_ms}) AS BIGINT)"
        f" * {interval_ms} * 1000)"
    )


# ---------------------------------------------------------------------------
# Flagship (SURVEY.md §7.2 step 1): scan → filter → per-series rate →
# epoch-aligned 5-minute windows → sum by variable name.
# Exercises F1-family matching, M1 RATE, A3 SUM + A7 group-by-name.
# ---------------------------------------------------------------------------

@query(
    "flagship_rate_sum",
    oracle=f"""
WITH {P_CTE}, {R_CTE}
SELECT name,
       {_bucket_sql(300_000)} AS ts,
       round(sum((dval - pv) / (t - pt)), 6) AS sum_rate
FROM r
WHERE pt IS NOT NULL AND t > pt AND (dval - pv) / (t - pt) >= 0
GROUP BY 1, 2
""",
)
def flagship_rate_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum of per-second rates of every /events/* series, 5-min tumbling
    windows, grouped by variable name (M1 + A3/A7)."""
    pts = _pts(spark, sf_dir)
    rated = mutate.rate(pts)
    out = agg_ops.aggregate_by_name(rated, "sum", 300_000)
    return out.select("name", "ts", F.round("value", 6).alias("sum_rate"))


def run_entry(spark: SparkSession) -> DataFrame:
    """Driver smoke check: flagship at sf0.001."""
    return flagship_rate_sum(spark, "/root/testdata/sf0.001")

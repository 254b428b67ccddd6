"""Shared registry infrastructure (split out of registry.py in r6):
the QUERIES/ORACLES dicts the @query decorator populates, the session
helpers, and the DuckDB CTE fragments every domain module builds on.

Domain query definitions live in open_instrument_spark/queries/
({tsdb,llm,analytics,temporal}.py); the public surface — driver-window
ordering, re-exports, the conventions documented for oracle parity —
is open_instrument_spark.registry, which is the ONLY module external
code should import.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


from open_instrument_spark.operators import mutate
from open_instrument_spark.session import prepare
from open_instrument_spark.sources.tables import points_from_dir

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

NOW = "2024-01-31 00:00:00"


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
# mapping (two labels, keys pre-sorted k < user_id; quoting never
# triggers on these values).
P_CTE = """
p0 AS (
  SELECT '/events/' || event_type AS name,
         CAST(user_id AS VARCHAR) AS user_id,
         CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 3 != 0
              THEN json_extract_string(props, '$.k') END AS k,
         ts,
         value AS dval
  FROM events
),
p AS (
  SELECT name, user_id, k,
         name || '{' ||
           CASE WHEN k IS NOT NULL THEN 'k=' || k || ',' ELSE '' END ||
           'user_id=' || user_id || '}' AS series_key,
         ts, dval
  FROM p0
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


def _raw(points: DataFrame) -> DataFrame:
    """Standard raw-points output shape: (series_key, ts, dval)."""
    pts = mutate._with_key(points)
    return pts.select("series_key", "ts", "dval")



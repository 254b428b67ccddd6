"""Per-series linear-trend extrapolation and counter statistics —
PromQL-shaped extensions (`predict_linear`, `deriv`, `resets`,
`changes`) the reference lacks but every monitoring engine grows into.
North-star TSDB additions alongside the EWMA → Holt → Holt-Winters
forecasting ladder (operators/resample.py).

All pure JVM window/aggregate expressions: one hash exchange on
series_key per query (the window sort and the final groupBy share the
same clustering, so Catalyst reuses the exchange — plan-asserted in
tests/test_plan_shapes.py).

Numerics: the least-squares slope uses covar_pop / var_pop, which both
Spark and DuckDB compute with the shift-invariant co-moment recurrence,
so raw epoch-seconds x values (~1.7e9) lose no precision and the
extrapolation is evaluated at the shift-invariant offset
(x_last + horizon - avg_x) from avg(y). Cross-engine re-association is
absorbed by the standard 6-dp rounding on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from open_instrument_spark.operators.mutate import _with_key


def _x() -> Column:
    """Epoch seconds (with sub-second fraction) as double — the same
    value DuckDB's epoch(ts) yields, the R_CTE precedent."""
    return F.col("ts").cast("double")


def predict_linear(points: DataFrame, horizon_s: float = 3600.0) -> DataFrame:
    """Least-squares line per series over the selected range; emit the
    per-hour derivative and the value extrapolated ``horizon_s`` past
    the last sample (PromQL ``deriv`` + ``predict_linear`` over a Get
    selection). Series without two distinct timestamps are dropped
    (slope undefined — var_pop(x) = 0).

    Single groupBy, no window pass: slope = covar_pop(x, y) /
    var_pop(x) is shift-invariant in x, and the forecast
    ``avg_y + slope * (max_x + h - avg_x)`` only ever sees the small
    in-range offset, so no per-series centering join is needed.
    """
    pts = (
        _with_key(points)
        .where(F.col("dval").isNotNull())  # string samples carry no trend
        .select("series_key", _x().alias("x"), F.col("dval").alias("y"))
    )
    g = pts.groupBy("series_key").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.covar_pop("x", "y").alias("cxy"),
        F.var_pop("x").alias("vx"),
        F.avg("x").alias("ax"),
        F.avg("y").alias("ay"),
        F.max("x").alias("mx"),
    )
    slope = F.col("cxy") / F.col("vx")
    predict = F.col("ay") + slope * (F.col("mx") + F.lit(float(horizon_s))
                                     - F.col("ax"))
    return (
        g.where(F.col("vx") > 0)
        .select(
            "series_key",
            "n_samples",
            F.round(slope * 3600.0, 6).alias("deriv_per_hour"),
            F.round(predict, 6).alias("predict_1h"),
        )
    )


def counter_stats(points: DataFrame) -> DataFrame:
    """Per-series counter health: number of resets (value decreased —
    PromQL ``resets``) and number of value changes (PromQL
    ``changes``) across the selected range, plus the sample count.
    Walk order is pinned to (ts, dval) like every sequential kernel in
    this repo so ties are deterministic cross-engine. Integer outputs —
    compared exactly.
    """
    pts = (
        _with_key(points)
        .where(F.col("dval").isNotNull())  # same numeric-only contract
        .select("series_key", "ts", "dval")  # as the streaming twin
    )
    w = Window.partitionBy("series_key").orderBy("ts", "dval")
    pv = F.lag("dval").over(w)
    stepped = pts.select(
        "series_key",
        F.when(F.col("dval") < pv, 1).otherwise(0).alias("is_reset"),
        F.when(pv.isNotNull() & (F.col("dval") != pv), 1).otherwise(0)
        .alias("is_change"),
    )
    return stepped.groupBy("series_key").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("is_reset").cast("long").alias("resets"),
        F.sum("is_change").cast("long").alias("changes"),
    )

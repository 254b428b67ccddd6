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
        # Same numeric-only contract as the streaming twin. NaN is
        # filtered alongside NULL: Spark SQL treats NaN as ordered-
        # greater-than-everything and NaN = NaN, while the streaming
        # twin's Python floats say NaN != NaN — dropping NaN on BOTH
        # sides keeps the bit-equality contract instead of leaving the
        # divergence latent.
        .where(F.col("dval").isNotNull() & ~F.isnan("dval"))
        .select("series_key", "ts", "dval")
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


def increase(points: DataFrame, interval_ms: int = 86_400_000) -> DataFrame:
    """PromQL ``increase``-shaped counter growth per (series, tumbling
    window), reset-corrected: each step contributes ``v - prev`` when
    the counter grew and ``v`` when it reset (the counter restarted
    from ~0, so everything it shows IS new growth) — i.e. the exact
    total a monotone counter accumulated, without PromQL's
    range-boundary extrapolation (declared divergence: extrapolation
    estimates unseen growth, a query-time presentation choice; the
    batch engine reports what the samples prove — DIVERGENCES.md).
    The first sample of each (series, window) contributes nothing (its
    growth belongs to the unseen gap before the window).

    One exchange: the lag window and the (series, window) groupBy share
    the series_key clustering. Output: (series_key, ts, n_samples,
    increase).
    """
    pts = (
        _with_key(points)
        .where(F.col("dval").isNotNull() & ~F.isnan("dval"))
        .select(
            "series_key",
            F.window("ts", f"{interval_ms // 1000} seconds").start.alias("win"),
            "ts", "dval",
        )
    )
    w = Window.partitionBy("series_key", "win").orderBy("ts", "dval")
    pv = F.lag("dval").over(w)
    step = (
        F.when(pv.isNull(), 0.0)
        .when(F.col("dval") >= pv, F.col("dval") - pv)
        .otherwise(F.col("dval"))
    )
    return (
        pts.select("series_key", "win", step.alias("step"))
        .groupBy("series_key", F.col("win").alias("ts"))
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.round(F.sum("step"), 6).alias("increase"),
        )
    )


def irate(points: DataFrame) -> DataFrame:
    """PromQL ``irate``: the instantaneous per-second rate from the
    LAST TWO samples of each series in the selected range,
    reset-aware — on a counter reset the new value is the growth
    (irate = v / dt), the same correction as :func:`increase`. One row
    per series with ≥2 samples; ties in ts break on dval (the pinned
    walk order), and a zero time-gap pair is dropped (undefined rate),
    matching rate()'s guard. Single window exchange on series_key.
    Output: (series_key, ts, irate_per_sec)."""
    pts = (
        _with_key(points)
        .where(F.col("dval").isNotNull() & ~F.isnan("dval"))
        .select("series_key", "ts", "dval")
    )
    # walk backwards: rn 1 = newest sample, lead = the one before it
    w = Window.partitionBy("series_key").orderBy(
        F.col("ts").desc(), F.col("dval").desc())
    ranked = pts.select(
        "series_key", "ts", "dval",
        F.row_number().over(w).alias("rn"),
        F.lead("dval").over(w).alias("pv"),
        F.lead("ts").over(w).alias("pt"),
    )
    dt_s = F.col("ts").cast("double") - F.col("pt").cast("double")
    growth = F.when(F.col("dval") >= F.col("pv"),
                    F.col("dval") - F.col("pv")).otherwise(F.col("dval"))
    return (
        ranked.where((F.col("rn") == 1) & F.col("pv").isNotNull()
                     & (dt_s > 0))
        .select(
            "series_key", "ts",
            F.round(growth / dt_s, 6).alias("irate_per_sec"),
        )
    )


def idelta(points: DataFrame) -> DataFrame:
    """PromQL ``idelta``: the SIGNED difference of each series' last
    two samples — irate's gauge sibling (promql/functions.go
    funcIdelta; public): no reset correction, no per-second division,
    because a gauge going down is data, not a counter restart. Same
    backwards walk, same tie/zero-gap guards as :func:`irate`
    (zero-gap pairs dropped for symmetry with the rate family — a
    duplicate-timestamp pair has no defined "last two"). One window
    exchange. Output: (series_key, ts, idelta)."""
    pts = (
        _with_key(points)
        .where(F.col("dval").isNotNull() & ~F.isnan("dval"))
        .select("series_key", "ts", "dval")
    )
    w = Window.partitionBy("series_key").orderBy(
        F.col("ts").desc(), F.col("dval").desc())
    ranked = pts.select(
        "series_key", "ts", "dval",
        F.row_number().over(w).alias("rn"),
        F.lead("dval").over(w).alias("pv"),
        F.lead("ts").over(w).alias("pt"),
    )
    dt_s = F.col("ts").cast("double") - F.col("pt").cast("double")
    return (
        ranked.where((F.col("rn") == 1) & F.col("pv").isNotNull()
                     & (dt_s > 0))
        .select(
            "series_key", "ts",
            F.round(F.col("dval") - F.col("pv"), 6).alias("idelta"),
        )
    )


def quantile_over_time(points: DataFrame, q: float = 0.95,
                       interval_ms: int = 86_400_000) -> DataFrame:
    """PromQL ``quantile_over_time``: the linearly-interpolated
    q-quantile of each series' samples per tumbling window — the
    per-series latency-percentile panel (distinct from
    ``agg_p95_by_name``'s cross-series percentile). Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` share the
    sorted[(n-1)q] linear-interpolation definition, so the estimator
    replays under the hash gate (rounded 6 dp — interpolation
    arithmetic re-associates). One aggregation exchange. Output:
    (series_key, ts, n_samples, q<percent>)."""
    pts = (
        _with_key(points)
        .where(F.col("dval").isNotNull() & ~F.isnan("dval"))
        .select(
            "series_key",
            F.window("ts", f"{interval_ms // 1000} seconds").start.alias("ts"),
            "dval",
        )
    )
    out_col = f"q{int(round(q * 100)):02d}"
    return pts.groupBy("series_key", "ts").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.round(F.percentile("dval", F.lit(float(q))), 6).alias(out_col),
    )


def topk_series(points: DataFrame, k: int = 3,
                interval_ms: int = 86_400_000,
                ascending: bool = False) -> DataFrame:
    """PromQL ``topk(k, sum_over_time(...))`` shape: the k
    highest-volume series per (name, window) — the "which label values
    dominate this metric" dashboard panel. Rank compares the ROUNDED
    (6 dp) window sum with series_key as tiebreak, so the order — not
    just the values — is pinned cross-engine (the weighted_sample
    precedent: re-associated float sums differ in the last bits
    between engines; an unrounded rank could flip near-ties).

    ``ascending=True`` is PromQL ``bottomk`` — identical plan, the
    rank window flipped (value asc, series_key tiebreak unchanged).

    One aggregation exchange on (name, series_key, window) + one rank
    exchange on (name, window) — both post-aggregation sizes. Output:
    (name, ts, series_key, value, rank).
    """
    pts = _with_key(points).where(F.col("dval").isNotNull())
    win = F.window("ts", f"{interval_ms // 1000} seconds").start.alias("ts")
    summed = (
        pts.groupBy("name", "series_key", win)
        .agg(F.round(F.sum("dval"), 6).alias("value"))
    )
    order = F.col("value").asc() if ascending else F.col("value").desc()
    w = Window.partitionBy("name", "ts").orderBy(
        order, F.col("series_key").asc())
    return (
        summed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def offset_compare(points: DataFrame, offset_ms: int = 604_800_000,
                   interval_ms: int = 3_600_000) -> DataFrame:
    """PromQL ``offset`` comparison: each (name, window) aggregate next
    to the SAME aggregate one offset earlier (default week-over-week
    on hourly sums) — the seasonal-regression panel. One aggregation,
    reused for both sides of a self-equi-join on the shifted window
    start (the offset must be a multiple of the window so shifted
    starts align exactly); windows with no counterpart keep NULLs
    (the "no data last week" case is the signal, not an error).
    Output: (name, ts, value, value_prev, wow_ratio).
    """
    if offset_ms % interval_ms != 0:
        raise ValueError(
            f"offset ({offset_ms} ms) must be a multiple of the window "
            f"({interval_ms} ms) or shifted starts cannot align")
    pts = points.where(F.col("dval").isNotNull())
    win = F.window("ts", f"{interval_ms // 1000} seconds").start.alias("ts")
    cur = (
        pts.groupBy("name", win)
        .agg(F.round(F.sum("dval"), 6).alias("value"))
    )
    prev = cur.select(
        "name",
        (F.col("ts") + F.expr(f"INTERVAL {offset_ms // 1000} SECOND"))
        .alias("ts"),
        F.col("value").alias("value_prev"),
    )
    return (
        cur.join(prev, ["name", "ts"], "left")
        .select(
            "name", "ts", "value", "value_prev",
            F.round(F.col("value") / F.col("value_prev"), 6)
            .alias("wow_ratio"),
        )
    )


def mad_outliers(points: DataFrame, interval_ms: int = 86_400_000,
                 threshold: float = 3.5, c: float = 0.6745,
                 by: tuple[str, ...] = ("series_key",)) -> DataFrame:
    """Robust outlier detection via the modified z-score (Iglewicz &
    Hoaglin 1993): per group (default: series) and tumbling window, med = median(x),
    MAD = median(|x − med|), and a sample is an outlier when
    c·|x − med| / MAD > threshold (c = 0.6745 scales MAD to σ under
    normality). The robust companion to the mean/stddev ``zscore`` —
    immune to the very outliers it hunts, the standard anomaly pass
    where spikes would drag a plain z-score's own baseline.

    Plan: the two nested medians run as percentile WINDOW functions
    over the same unordered (series_key, window) partitioning — ONE
    exchange + sort serves both (the second window spec reuses the
    first's distribution), and the closing aggregation groups on the
    same keys, so no further shuffle at scale. No Python anywhere.

    Parity: Spark exact ``percentile`` ≡ DuckDB ``quantile_cont``
    (the quantile_over_time precedent); med/mad re-associate in the
    interpolation and are rounded 6 dp for output, while the outlier
    COUNT compares the unrounded ratio — the registry query documents
    the measured margin to the threshold so the boundary cannot flip
    cross-engine.

    ``by`` picks the grouping — ("series_key",) for the PromQL
    per-series panel, ("name",) for the fleet-wide cross-series sweep
    (the agg_p95_by_name flavor) where individual series are sparse.

    Output: (*by, ts, n_samples, med, mad, n_outliers);
    MAD = 0 (over half the window identical) ⇒ n_outliers = 0 (the
    Iglewicz-Hoaglin convention rather than dividing by zero)."""
    keys = list(by)
    pts = (
        _with_key(points)
        .where(F.col("dval").isNotNull() & ~F.isnan("dval"))
        .select(
            *keys,
            F.window("ts", f"{interval_ms // 1000} seconds").start.alias("ts"),
            "dval",
        )
    )
    w = Window.partitionBy(*keys, "ts")
    step = (
        pts.withColumn("_med", F.percentile("dval", F.lit(0.5)).over(w))
        .withColumn("_ad", F.abs(F.col("dval") - F.col("_med")))
    )
    step = step.withColumn("_mad", F.percentile("_ad", F.lit(0.5)).over(w))
    is_out = (
        (F.col("_mad") > 0)
        & (F.lit(float(c)) * F.col("_ad") / F.col("_mad") > F.lit(float(threshold)))
    )
    return step.groupBy(*keys, "ts").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.round(F.max("_med"), 6).alias("med"),
        F.round(F.max("_mad"), 6).alias("mad"),
        F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
    )


def count_values(points: DataFrame,
                 interval_ms: int = 86_400_000) -> DataFrame:
    """PromQL ``count_values``: how many samples carry each value per
    (name, window) — the cardinality/mode panel ("what values does this
    integer-ish metric actually take"). Values are floor-bucketed to
    integers: the synthetic corpus is continuous (exact doubles would
    make every count 1), and ``floor`` is bit-exact cross-engine where
    round's half-way rule is not (samples here land EXACTLY on .5 —
    measured, min |v−⌊v⌋−0.5| = 0 at sf0.01).

    One aggregation exchange, map-side combinable. Output:
    (name, ts, value, n)."""
    pts = points.where(F.col("dval").isNotNull() & ~F.isnan("dval"))
    win = F.window("ts", f"{interval_ms // 1000} seconds").start.alias("ts")
    return (
        pts.groupBy("name", win, F.floor("dval").cast("long").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("name", "ts", "value", "n")
    )


def range_aggregations(points: DataFrame,
                       interval_ms: int = 86_400_000) -> DataFrame:
    """The PromQL ``*_over_time`` range-aggregation family per series
    over tumbling windows: avg / min / max / sum / count / last /
    present (promql/functions.go func{Avg,Min,Max,Sum,Count,Last,
    Present}OverTime — public PromQL docs). Completes the range-vector
    surface next to :func:`quantile_over_time`.

    Spark shape: ALL SEVEN ride one groupBy (a single aggregation
    exchange, every member map-side combinable) — ``last_over_time``
    is the lexicographic (ts, dval) struct MAX (the argmax-without-
    rank idiom: no sort window, dval tie-breaks equal timestamps
    deterministically on both engines), ``present_over_time`` is the
    constant 1.0 PromQL defines (a group exists only if samples do).
    avg/sum rounded 6 dp (re-associated float folds); min/max/last are
    row values, exact. Output: (series_key, ts, avg_ot, min_ot,
    max_ot, sum_ot, count_ot, last_ot, present_ot)."""
    pts = (
        _with_key(points)
        .where(F.col("dval").isNotNull() & ~F.isnan("dval"))
        .select(
            "series_key",
            F.window("ts", f"{interval_ms // 1000} seconds")
            .start.alias("win"),
            F.col("ts").alias("sts"),
            "dval",
        )
    )
    return (
        pts.groupBy("series_key", F.col("win").alias("ts"))
        .agg(
            F.round(F.avg("dval"), 6).alias("avg_ot"),
            F.min("dval").alias("min_ot"),
            F.max("dval").alias("max_ot"),
            F.round(F.sum("dval"), 6).alias("sum_ot"),
            F.count(F.lit(1)).alias("count_ot"),
            F.max(F.struct("sts", "dval"))["dval"].alias("last_ot"),
            F.lit(1.0).alias("present_ot"),
        )
    )


# ===========================================================================
# PromQL instant-vector math + calendar functions (r14)
# ===========================================================================

_INF = float("inf")
_NAN = float("nan")


def _scalar_expr(fn: str, c: Column, *, to: float = 1.0,
                 lo: float | None = None, hi: float | None = None) -> Column:
    """One PromQL math function as a pure JVM column expression
    (promql/functions.go func{Abs,Ceil,Floor,Sqrt,Exp,Ln,Log2,Log10,
    Sgn,Clamp,ClampMin,ClampMax,Round} — public PromQL docs). IEEE
    edge semantics are PromQL's, not Spark's defaults: ln/log2/log10
    of 0 is -Inf and of a negative is NaN (Spark's builtin log yields
    NULL for both — rewritten here), sqrt of a negative is NaN,
    round(v, to) is floor(v/to + 0.5)*to (Go's half-up, NOT
    half-even). All stay inside whole-stage codegen — no UDFs."""
    f = fn.lower()
    # The PromQL trigonometric family (promql/functions.go simpleFunc
    # table): plain libm maps, NaN outside the inverse functions'
    # domains (Spark already matches — asin(2) is NaN, not NULL).
    trig = {"sin": F.sin, "cos": F.cos, "tan": F.tan, "asin": F.asin,
            "acos": F.acos, "atan": F.atan, "sinh": F.sinh,
            "cosh": F.cosh, "tanh": F.tanh, "asinh": F.asinh,
            "acosh": F.acosh, "atanh": F.atanh, "deg": F.degrees,
            "rad": F.radians}
    if f in trig:
        return trig[f](c)
    if f == "abs":
        return F.abs(c)
    if f == "ceil":
        return F.ceil(c).cast("double")
    if f == "floor":
        return F.floor(c).cast("double")
    if f == "sqrt":
        return F.sqrt(c)          # Spark: NaN for negatives (IEEE), kept
    if f == "exp":
        return F.exp(c)
    if f in ("ln", "log2", "log10"):
        base = {"ln": F.log, "log2": F.log2, "log10": F.log10}[f]
        return (
            F.when(c > 0, base(c))
            .when(c == 0, F.lit(-_INF))
            .otherwise(F.lit(_NAN))
        )
    if f == "sgn":
        return F.signum(c)
    if f == "round":
        if to <= 0:
            raise ValueError(f"round 'to' must be > 0, got {to}")
        return F.floor(c / F.lit(float(to)) + F.lit(0.5)) * F.lit(float(to))
    if f == "clamp_min":
        if lo is None:
            raise ValueError("clamp_min requires lo")
        return F.greatest(c, F.lit(float(lo)))
    if f == "clamp_max":
        if hi is None:
            raise ValueError("clamp_max requires hi")
        return F.least(c, F.lit(float(hi)))
    if f == "clamp":
        if lo is None or hi is None:
            raise ValueError("clamp requires lo and hi")
        return F.greatest(F.least(c, F.lit(float(hi))), F.lit(float(lo)))
    raise ValueError(f"unknown scalar function {fn!r}")


def scalar_map(points: DataFrame, fn: str, *, to: float = 1.0,
               lo: float | None = None, hi: float | None = None) -> DataFrame:
    """Apply one PromQL math function to every sample of every series
    — ``abs(rate(...))``-style instant-vector arithmetic, the last
    PromQL function class this engine lacked (selection, mutation,
    aggregation, label manipulation, absent, *_over_time all exist).

    A pure narrow map: no shuffle, no window — Catalyst fuses it into
    whatever scan or mutation feeds it, so at 100 TB it rides the
    parent stage for free. ``clamp`` with lo > hi returns the EMPTY
    frame (the documented PromQL special case), not an error.
    Output: (series_key, ts, dval) with dval transformed."""
    pts = _with_key(points).select("series_key", "ts", "dval")
    if fn.lower() == "clamp" and lo is not None and hi is not None and lo > hi:
        return pts.where(F.lit(False))
    return pts.withColumn("dval", _scalar_expr(fn, F.col("dval"),
                                               to=to, lo=lo, hi=hi))


def calendar_components(points: DataFrame) -> DataFrame:
    """The PromQL calendar-function family evaluated on each sample's
    own timestamp (promql/functions.go func{Year,Month,DayOfMonth,
    DayOfWeek,DayOfYear,Hour,Minute,DaysInMonth}): the per-sample
    analog of applying PromQL's time functions to a range vector —
    "which hour-of-day / day-of-week does this series fire in" is the
    standard seasonality question over a metrics corpus.

    All eight ride ONE narrow projection (UTC-pinned session, so the
    components are pure integer calendar math — engine-portable and
    hash-gateable). day_of_week is PromQL's 0=Sunday (Spark's
    dayofweek is 1=Sunday, shifted here); days_in_month via last_day.
    Output: (series_key, ts, dval, year, month, day_of_month,
    day_of_week, day_of_year, hour, minute, days_in_month)."""
    ts = F.col("ts")
    return _with_key(points).select(
        "series_key", "ts", "dval",
        F.year(ts).cast("int").alias("year"),
        F.month(ts).cast("int").alias("month"),
        F.dayofmonth(ts).cast("int").alias("day_of_month"),
        (F.dayofweek(ts) - 1).cast("int").alias("day_of_week"),
        F.dayofyear(ts).cast("int").alias("day_of_year"),
        F.hour(ts).cast("int").alias("hour"),
        F.minute(ts).cast("int").alias("minute"),
        F.dayofmonth(F.last_day(ts)).cast("int").alias("days_in_month"),
    )


def scalar_math_family(points: DataFrame,
                       specs: dict[str, tuple | str]) -> DataFrame:
    """Several PromQL math functions of the same samples as sibling
    columns — ``specs`` maps output column → function name or
    (name, params-dict). One narrow projection computes all of them
    (the mutate_over_time_family pattern: a dashboard wanting
    abs+clamped+log of one selector pays one pass, and the gate query
    exercises every :func:`_scalar_expr` member under one hash).
    Output: (series_key, ts, dval, <one column per spec>)."""
    pts = _with_key(points)
    cols = []
    for out, spec in specs.items():
        fn, params = (spec, {}) if isinstance(spec, str) else spec
        cols.append(_scalar_expr(fn, F.col("dval"), **params).alias(out))
    return pts.select("series_key", "ts", "dval", *cols)

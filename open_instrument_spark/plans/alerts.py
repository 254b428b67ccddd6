"""Alert rules — threshold conditions with a ``for``-duration over any
Get-pipeline result, the Prometheus-alerting-rule sibling of
``plans.rules`` (north-star extension; the reference has no alerting).

Semantics (the Prometheus model, public): a series whose sample
violates the condition enters PENDING; once the violation has held
CONTINUOUSLY for ``for_duration`` it is FIRING; any non-violating
sample resets it to INACTIVE (resolution). "Continuously" is judged
on the sample timeline — a breach run is the maximal span of
consecutive violating samples, and a sample fires when the run has
covered at least the duration by its timestamp.

The whole state machine is three window functions — a cumulative
count of non-breach rows forms the run id, a min-over-run gives the
run start, a timestamp difference classifies — so it runs in
whole-stage codegen with ONE shuffle (the per-series sort the window
needs), and, being pure SQL, replays under the DuckDB value-hash gate
(`alert_rule_states` / `alert_rule_transitions`) — an ALERTING engine
whose exact firing behavior is oracle-verified.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from open_instrument_spark.functions.durations import parse_duration_ms
from open_instrument_spark.plans.api import GetRequest, get

_OPS = {
    ">": lambda c, t: c > t,
    ">=": lambda c, t: c >= t,
    "<": lambda c, t: c < t,
    "<=": lambda c, t: c <= t,
}


@dataclass(frozen=True)
class AlertRule:
    """``request`` is the expression (evaluated through the Get
    pipeline); the alert compares its ``dval``/``value`` samples
    against ``threshold`` with ``condition``; ``for_duration`` is the
    continuous-violation requirement before PENDING → FIRING."""

    name: str
    request: GetRequest
    condition: str = ">"
    threshold: float = 0.0
    for_duration: str = "0s"


def classify_states(samples: DataFrame, condition: str, threshold: float,
                    for_duration, key_col: str = "series_key",
                    value_col: str = "dval") -> DataFrame:
    """Per-sample alert states over (key, ts, value) rows. Returns the
    input columns plus ``state`` ∈ inactive|pending|firing. Tie order
    pinned (ts, value) like the rest of the engine."""
    if condition not in _OPS:
        raise ValueError(f"condition must be one of {sorted(_OPS)}")
    for_us = parse_duration_ms(for_duration) * 1000
    breach = _OPS[condition](F.col(value_col), F.lit(threshold))
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy("ts", value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.when(breach, 0).otherwise(1)).over(w_cum)
    df = samples.withColumn("_breach", breach).withColumn("_run", run)
    w_run = Window.partitionBy(key_col, "_run")
    run_start = F.min(
        F.when(F.col("_breach"), F.unix_micros(F.col("ts").cast("timestamp")))
    ).over(w_run)
    state = (
        F.when(~F.col("_breach"), F.lit("inactive"))
        .when(
            F.unix_micros(F.col("ts").cast("timestamp")) - run_start
            >= F.lit(for_us),
            F.lit("firing"),
        )
        .otherwise(F.lit("pending"))
    )
    return df.withColumn("state", state).drop("_breach", "_run")


def transitions(states: DataFrame, key_col: str = "series_key",
                value_col: str = "dval") -> DataFrame:
    """State-change events: the first sample of each series plus every
    sample whose state differs from its predecessor — what a notifier
    consumes (pending→firing = page, firing→inactive = resolve).

    ``value_col`` is the tie-break column and must name the sample value
    column of the input — pass ``value_col="value"`` when composing with
    ``evaluate_alert`` (whose output names the sample column ``value``)."""
    if value_col not in states.columns:
        raise ValueError(
            f"transitions: value_col {value_col!r} not in input columns "
            f"{states.columns} (evaluate_alert outputs name it 'value')"
        )
    w = Window.partitionBy(key_col).orderBy("ts", value_col)
    prev = F.lag("state").over(w)
    return (
        states.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("state")))
        .withColumnRenamed("_prev", "from_state")
    )


def evaluate_alert(points: DataFrame, rule: AlertRule,
                   now: dt.datetime | None = None) -> DataFrame:
    """Evaluate the rule's expression through the Get pipeline, then
    classify. Aggregation outputs (name[, label_value], ts, value) are
    keyed by name (+ label value); mutation/raw outputs by series_key
    (computed if absent). Output: (alert, series_key, ts, value,
    state)."""
    import dataclasses

    req = dataclasses.replace(rule.request, now=now) if now is not None \
        else rule.request
    out = get(points, req)
    if isinstance(out, list):
        raise ValueError("alert rules require a single output stream set")
    cols = set(out.columns)
    if "dval" in cols:
        if "series_key" not in cols:
            from open_instrument_spark.model import series_key

            out = out.withColumn("series_key", series_key())
        samples = out.select("series_key", "ts", "dval")
    else:
        key = F.concat(
            F.col("name"),
            *( [F.lit("{"), F.col("label_value"), F.lit("}")]
               if "label_value" in cols else [] ),
        )
        samples = out.select(
            key.alias("series_key"), "ts", F.col("value").alias("dval")
        )
    states = classify_states(samples, rule.condition, rule.threshold,
                             rule.for_duration)
    return states.select(
        F.lit(rule.name).alias("alert"), "series_key", "ts",
        F.col("dval").alias("value"), "state",
    )


def alerts_series(states: DataFrame) -> DataFrame:
    """The Prometheus ``ALERTS{alertname, alertstate}`` idiom: active
    alert states re-entered into the TSDB as a synthetic points series
    (name ``/alerts``, value 1.0 per active sample), so alert history
    is queryable/recordable/retained with the same Get pipeline and
    store machinery as any other variable. Inactive samples emit
    nothing — series presence IS the signal, exactly like the
    original."""
    return states.filter(F.col("state") != "inactive").select(
        F.lit("/alerts").alias("name"),
        F.create_map(
            F.lit("alertname"), F.col("alert"),
            F.lit("alertstate"), F.col("state"),
            F.lit("series"), F.col("series_key"),
        ).alias("labels"),
        "ts",
        F.lit(1.0).alias("dval"),
        F.lit(None).cast("string").alias("sval"),
    )


def slo_burn_rate(points: DataFrame, bad, slo: float = 0.95,
                  short_ms: int = 86_400_000,
                  long_ms: int = 604_800_000,
                  factor: float = 1.0) -> DataFrame:
    """Multiwindow SLO burn-rate alerting (the Google SRE workbook
    pattern, ch. 5 "Alerting on SLOs"; public): burn rate = (bad
    fraction of traffic) / (1 − slo) — how many times faster than
    budget the error budget is burning. A page requires BOTH the short
    window (fast detection) and the long window (sustained, not a
    blip) above ``factor``; the long window also gates flapping: when
    the long burn recovers, pages stop even if the short window still
    spikes.

    ``bad`` is a boolean Column marking error traffic (e.g.
    ``F.col("name") == "/events/error"``). Traffic is weighted by
    ``dval``. Long windows must tile short ones (long % short == 0) so
    each short window joins exactly one long window.

    Spark shape: two windowed aggregations over one scan branch + an
    equi-join of |short windows| rows against |long windows| rows —
    post-aggregation sizes, broadcastable. All ratios rounded 6 dp
    (re-associated float division); the page decision compares the
    UNROUNDED burns (the quality_pass z>0 precedent). Output:
    (ts, traffic, burn_short, burn_long, page) per short window.
    """
    if long_ms % short_ms != 0:
        raise ValueError(
            f"long window ({long_ms} ms) must tile short ({short_ms} ms)")
    budget = 1.0 - slo
    if budget <= 0:
        raise ValueError("slo must be < 1")
    pts = points.where(F.col("dval").isNotNull()).select(
        "ts", "dval", bad.alias("_bad")
    )

    def ratio(interval_ms: int):
        win = F.window("ts", f"{interval_ms // 1000} seconds").start
        # try_divide: a window whose accumulated traffic is 0.0 (dval=0
        # rows pass the isNotNull filter) gets a NULL burn — plain
        # division would throw DIVIDE_BY_ZERO under ANSI. NULL then
        # propagates through page's three-valued AND, and DuckDB's
        # division-by-zero NULL matches on the oracle side.
        return (
            pts.groupBy(win.alias("ts"))
            .agg(
                F.sum("dval").alias("traffic"),
                (F.try_divide(
                    F.sum(F.when(F.col("_bad"), F.col("dval")).otherwise(0.0)),
                    F.sum("dval")) / F.lit(budget)).alias("burn"),
            )
        )

    s = ratio(short_ms)
    lg = ratio(long_ms).select(
        F.col("ts").alias("lts"), F.col("burn").alias("burn_long_raw"))
    # each short window's owning long window: floor its start
    lts_of_short = F.timestamp_micros(
        (F.unix_micros("ts") / (long_ms * 1000)).cast("long")
        * (long_ms * 1000)
    )
    return (
        s.withColumn("lts", lts_of_short)
        .join(lg, "lts")
        .select(
            "ts",
            F.round("traffic", 6).alias("traffic"),
            F.round("burn", 6).alias("burn_short"),
            F.round("burn_long_raw", 6).alias("burn_long"),
            ((F.col("burn") > factor)
             & (F.col("burn_long_raw") > factor)).alias("page"),
        )
    )

"""Alert rules (plans/alerts.py): hand-traced state machine, reset
semantics, for-duration boundary, and the transition feed."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_instrument_spark.plans.alerts import (
    AlertRule,
    classify_states,
    evaluate_alert,
    transitions,
)
from open_instrument_spark.plans.api import GetRequest

BASE = dt.datetime(2024, 1, 1)


def _samples(spark, rows):
    return spark.createDataFrame(
        [("s", BASE + dt.timedelta(minutes=m), float(v)) for m, v in rows],
        "series_key string, ts timestamp, dval double",
    )


def test_classify_hand_traced(spark):
    """Breach run: pending until the run has covered for_duration,
    firing at/after, reset to inactive on the first good sample, and a
    NEW breach starts a fresh pending run (no memory of the old one).
    Boundary: ts - run_start == for_duration fires (>=)."""
    rows = [(0, 1.0), (10, 9.0), (20, 9.0), (30, 9.0), (40, 1.0),
            (50, 9.0), (60, 9.0)]
    out = classify_states(_samples(spark, rows), ">", 5.0, "20m")
    got = [(r["ts"].minute + 60 * r["ts"].hour, r["state"])
           for r in sorted(out.collect(), key=lambda r: r["ts"])]
    assert got == [(0, "inactive"), (10, "pending"), (20, "pending"),
                   (30, "firing"), (40, "inactive"), (50, "pending"),
                   (60, "pending")]


def test_transitions_feed(spark):
    rows = [(0, 1.0), (10, 9.0), (20, 9.0), (30, 9.0), (40, 1.0)]
    st = classify_states(_samples(spark, rows), ">", 5.0, "20m")
    tr = sorted(transitions(st).collect(), key=lambda r: r["ts"])
    assert [(r["from_state"], r["state"]) for r in tr] == [
        (None, "inactive"), ("inactive", "pending"),
        ("pending", "firing"), ("firing", "inactive")]


def test_evaluate_alert_keys_aggregation_by_label(spark):
    """An aggregation-with-label expression keys states by
    name{label_value}; zero-duration rule fires immediately."""
    pts = spark.createDataFrame(
        [("/m", {"h": hv}, BASE + dt.timedelta(minutes=m), v, None)
         for hv, m, v in [("a", 0, 9.0), ("a", 1, 9.0),
                          ("b", 0, 1.0), ("b", 1, 1.0)]],
        "name string, labels map<string,string>, ts timestamp, "
        "dval double, sval string",
    )
    rule = AlertRule(
        name="hot", request=GetRequest(
            variable="/m", aggregation="max", aggregation_labels=["h"],
            sample_interval="30s"),
        condition=">=", threshold=5.0, for_duration="0s",
    )
    out = evaluate_alert(pts, rule).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["series_key"], set()).add(r["state"])
    assert by_key == {"/m{a}": {"firing"}, "/m{b}": {"inactive"}}
    assert {r["alert"] for r in out} == {"hot"}


def test_bad_condition_rejected(spark):
    with pytest.raises(ValueError):
        classify_states(_samples(spark, [(0, 1.0)]), "!=", 5.0, "0s")


def test_transitions_composes_with_evaluate_alert(spark):
    """The natural composition transitions(evaluate_alert(...)) works
    via value_col='value' (evaluate_alert names the sample column
    'value', not 'dval'); a missing tie-break column is rejected
    eagerly with a clear message rather than failing at resolution."""
    pts = spark.createDataFrame(
        [("/m", {"h": "a"}, BASE + dt.timedelta(minutes=m), v, None)
         for m, v in [(0, 1.0), (1, 9.0), (2, 9.0), (3, 1.0)]],
        "name string, labels map<string,string>, ts timestamp, "
        "dval double, sval string",
    )
    rule = AlertRule(
        name="hot", request=GetRequest(
            variable="/m", aggregation="max", sample_interval="30s"),
        condition=">=", threshold=5.0, for_duration="0s",
    )
    out = evaluate_alert(pts, rule)
    tr = sorted(transitions(out, value_col="value").collect(),
                key=lambda r: r["ts"])
    assert [(r["from_state"], r["state"]) for r in tr] == [
        (None, "inactive"), ("inactive", "firing"),
        ("firing", "inactive")]
    with pytest.raises(ValueError, match="value_col"):
        transitions(out)  # default 'dval' is absent here


def test_alerts_series_roundtrips_through_get(spark):
    """ALERTS-style synthetic series: active states become /alerts
    points whose presence is the signal, and they answer a normal Get
    request (label-matched) like any other variable."""
    from open_instrument_spark.plans.alerts import alerts_series
    from open_instrument_spark.plans.api import get

    pts = _samples(spark, [(0, 1.0), (10, 9.0), (20, 9.0), (30, 9.0)])
    st = classify_states(pts, ">", 5.0, "20m").withColumn(
        "alert", F.lit("hi")).withColumnRenamed("dval", "value")
    out = alerts_series(st.select(
        "alert", "series_key", "ts", F.col("value").alias("dval"), "state"))
    rows = out.collect()
    assert {r["labels"]["alertstate"] for r in rows} == {"pending", "firing"}
    assert all(r["name"] == "/alerts" and r["dval"] == 1.0 for r in rows)
    assert len(rows) == 3                       # inactive emits nothing
    got = get(out, GetRequest(variable="/alerts{alertstate=firing}"))
    assert got.count() == 1


def test_slo_burn_rate_hand_traced(spark):
    """Multiwindow burn rate: short window over budget + long window
    over budget => page; a short spike inside a healthy long window
    does NOT page; ratios are traffic-weighted."""
    from open_instrument_spark.plans.alerts import slo_burn_rate

    rows = []
    # hours 0-5: 10% bad (burn 2.0 at slo=0.95) — sustained breach
    for h in range(6):
        rows.append(("/events/ok", BASE + dt.timedelta(hours=h), 90.0))
        rows.append(("/events/error", BASE + dt.timedelta(hours=h), 10.0))
    # day 2, hour 0: a lone 50% spike, rest of the day clean
    rows.append(("/events/ok", BASE + dt.timedelta(days=1), 50.0))
    rows.append(("/events/error", BASE + dt.timedelta(days=1), 50.0))
    for h in range(1, 24):
        rows.append(("/events/ok", BASE + dt.timedelta(days=1, hours=h),
                     1000.0))
    pts = spark.createDataFrame(rows, "name string, ts timestamp, dval double")
    got = {r["ts"]: r for r in slo_burn_rate(
        pts, F.col("name") == "/events/error", slo=0.95,
        short_ms=3_600_000, long_ms=86_400_000, factor=1.0).collect()}
    h0 = got[BASE]
    assert (h0["burn_short"], h0["page"]) == (2.0, True)
    assert h0["burn_long"] == 2.0          # day 1 is uniformly 10% bad
    spike = got[BASE + dt.timedelta(days=1)]
    assert spike["burn_short"] == 10.0     # 50% bad / 5% budget
    assert spike["burn_long"] < 1.0 and not spike["page"]  # day absorbed it
    clean = got[BASE + dt.timedelta(days=1, hours=5)]
    assert clean["burn_short"] == 0.0 and not clean["page"]

    with pytest.raises(ValueError):
        slo_burn_rate(pts, F.lit(True), short_ms=7_000_000)  # doesn't tile
    with pytest.raises(ValueError):
        slo_burn_rate(pts, F.lit(True), slo=1.0)

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

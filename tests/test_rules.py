"""Recording rules (plans/rules.py): evaluation matches the ad-hoc Get
pipeline over the same window, ticks are idempotent per (rule, window),
windows stay disjoint, and labels round-trip per rule shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_instrument_spark.plans.api import GetRequest, get
from open_instrument_spark.plans.rules import (
    RecordingRule,
    evaluate_rule,
    read_rules,
    record_rule,
    run_rules_tick,
    window_for,
)

BASE = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def points(spark):
    rows = []
    for h in range(3):                      # three hours of data
        for mi in (0, 20, 40):
            for host in ("a", "b"):
                rows.append(("/m/reqs", {"host": host},
                             BASE + dt.timedelta(hours=h, minutes=mi),
                             float(60 * h + mi + (1 if host == "b" else 0)),
                             None))
    rows.append(("/other", {"host": "a"}, BASE, 1.0, None))
    return spark.createDataFrame(
        rows, "name string, labels map<string,string>, ts timestamp, "
              "dval double, sval string")


AGG_RULE = RecordingRule(
    output="/derived/reqs/rate_sum",
    request=GetRequest(variable="/m/reqs", mutations=[("rate", None)],
                       aggregation="sum", sample_interval="5m"),
    interval="1h",
)
MUT_RULE = RecordingRule(
    output="/derived/reqs/rate",
    request=GetRequest(variable="/m/reqs", mutations=[("rate", None)]),
    interval="1h",
)


def test_window_alignment():
    s, e = window_for(AGG_RULE, BASE + dt.timedelta(hours=2, minutes=35))
    assert s == BASE + dt.timedelta(hours=1)
    assert e == BASE + dt.timedelta(hours=2)


def test_evaluate_matches_adhoc_get(spark, points):
    """The recorded rows must be exactly the ad-hoc request's rows for
    the same window, re-labeled under the output name."""
    import dataclasses

    now = BASE + dt.timedelta(hours=2, minutes=5)
    got = evaluate_rule(points, AGG_RULE, now)
    s, e = window_for(AGG_RULE, now)
    adhoc = get(points, dataclasses.replace(
        AGG_RULE.request, min_timestamp=s, max_timestamp=e)
    ).filter(F.col("ts") < F.lit(e))
    assert {(r["ts"], r["dval"]) for r in got.collect()} == \
        {(r["ts"], r["value"]) for r in adhoc.collect()}
    names = {r["name"] for r in got.collect()}
    assert names == {"/derived/reqs/rate_sum"}


def test_tick_idempotent_and_windows_disjoint(spark, points, tmp_path):
    store = str(tmp_path / "rules")
    t1 = BASE + dt.timedelta(hours=1, minutes=1)   # window [0h, 1h)
    t2 = BASE + dt.timedelta(hours=2, minutes=1)   # window [1h, 2h)
    run_rules_tick(points, store, [AGG_RULE, MUT_RULE], t1)
    run_rules_tick(points, store, [AGG_RULE, MUT_RULE], t2)
    def snap():
        return sorted(
            (r["name"], tuple(sorted((r["labels"] or {}).items())),
             r["ts"], r["dval"], r["sval"])
            for r in read_rules(spark, store).collect()
        )

    once = snap()
    # repeat tick 2 (crash recovery / backfill repair): byte-idempotent
    record_rule(points, store, AGG_RULE, t2)
    record_rule(points, store, MUT_RULE, t2)
    again = snap()
    assert once == again
    # windows disjoint: no ts appears under both win partitions
    agg = read_rules(spark, store, AGG_RULE.output).collect()
    assert len({r["ts"] for r in agg}) == len(agg) > 0
    # aggregation rule: unlabeled single series; mutation rule: labels kept
    assert all(r["labels"] == {} for r in agg)
    mut = read_rules(spark, store, MUT_RULE.output).collect()
    assert {r["labels"]["host"] for r in mut} == {"a", "b"}
    assert all(r["name"] == "/derived/reqs/rate" for r in mut)


def test_label_grouped_rule_records_label_map(spark, points, tmp_path):
    rule = RecordingRule(
        output="/derived/reqs/rate_sum_by_host",
        request=GetRequest(variable="/m/reqs", mutations=[("rate", None)],
                           aggregation="sum", aggregation_labels=["host"],
                           sample_interval="5m"),
        interval="1h",
    )
    store = str(tmp_path / "rules2")
    record_rule(points, store, rule, BASE + dt.timedelta(hours=2))
    out = read_rules(spark, store, rule.output).collect()
    assert {r["labels"]["host"] for r in out} == {"a", "b"}


def test_backfill_covers_history_and_equals_ticks(spark, points, tmp_path):
    """Backfill over [0h, 3h) must write exactly the three hourly
    windows and produce the same store as three live ticks."""
    s1 = str(tmp_path / "bf")
    s2 = str(tmp_path / "live")
    from open_instrument_spark.plans.rules import backfill_rule

    paths = backfill_rule(points, s1, AGG_RULE, BASE,
                          BASE + dt.timedelta(hours=3))
    assert len(paths) == 3
    for h in (1, 2, 3):
        record_rule(points, s2, AGG_RULE,
                    BASE + dt.timedelta(hours=h, minutes=1))

    def snap(store):
        return sorted((r["name"], r["ts"], r["dval"])
                      for r in read_rules(spark, store).collect())

    assert snap(s1) == snap(s2) and len(snap(s1)) > 0


def test_backfill_misaligned_start_skips_straddling_window(spark, points,
                                                           tmp_path):
    """A start inside a window must NOT materialize that window — the
    docstring promises 'every complete window inside [start, end)', so
    the first recorded window begins at start ceiled to the interval
    boundary (here 0:30 → 1:00), never before the requested range."""
    from open_instrument_spark.plans.rules import backfill_rule

    store = str(tmp_path / "bf_mis")
    paths = backfill_rule(points, store, AGG_RULE,
                          BASE + dt.timedelta(minutes=30),
                          BASE + dt.timedelta(hours=3))
    assert len(paths) == 2  # [1h,2h) and [2h,3h) only
    out = read_rules(spark, store).collect()
    assert out and min(r["ts"] for r in out) >= BASE + dt.timedelta(hours=1)
    # aligned start still records its own window (regression guard)
    store2 = str(tmp_path / "bf_al")
    assert len(backfill_rule(points, store2, AGG_RULE, BASE,
                             BASE + dt.timedelta(hours=3))) == 3


def test_ops_loop_composition(spark, tmp_path):
    """The full operations loop a production deployment runs on one
    cadence: raw store → recording rule materializes a derived series
    → an alert rule evaluates the RECORDED series (the Prometheus
    pairing: alert on cheap recorded data, not raw) → the maintenance
    tick ages the raw store without touching what the rule already
    recorded."""
    import glob
    import os

    from open_instrument_spark.operators.retention import PolicyItem
    from open_instrument_spark.plans.alerts import AlertRule, evaluate_alert
    from open_instrument_spark.plans.maintenance import maintenance_tick
    from open_instrument_spark.sources.ingest import write_points

    raw = str(tmp_path / "raw")
    rules_store = str(tmp_path / "derived")
    now = BASE + dt.timedelta(hours=3)

    rows = []
    for h in range(3):
        for mi in (0, 30):
            rows.append(("/svc/errors", {"host": "a"},
                         BASE + dt.timedelta(hours=h, minutes=mi),
                         float(10 * h), None))
    # plus aged data the maintenance pass will downsample
    rows += [("/svc/errors", {"host": "a"},
              BASE - dt.timedelta(days=400, hours=hh), 5.0, None)
             for hh in range(3)]
    pts_df = spark.createDataFrame(
        rows, "name string, labels map<string,string>, ts timestamp, "
              "dval double, sval string")
    write_points(pts_df, raw, n_buckets=2)

    # 1. record hourly error sums from the raw store
    rule = RecordingRule(
        output="/derived/svc/errors_sum",
        request=GetRequest(variable="/svc/errors", aggregation="sum",
                           sample_interval="1h"),
        interval="1h",
    )
    from open_instrument_spark.plans.rules import backfill_rule

    backfill_rule(spark.read.parquet(raw).drop("dt", "bucket"),
                  rules_store, rule, BASE, now)

    # 2. alert on the RECORDED series
    recorded = read_rules(spark, rules_store, rule.output)
    alert = AlertRule(
        name="errors_high",
        request=GetRequest(variable="/derived/svc/errors_sum"),
        condition=">", threshold=15.0, for_duration="30m",
    )
    states = {(r["ts"], r["state"])
              for r in evaluate_alert(recorded, alert).collect()}
    # hourly sums: 0, 20, 40 → inactive, pending (run start 1h), firing
    assert states == {
        (BASE, "inactive"),
        (BASE + dt.timedelta(hours=1), "pending"),
        (BASE + dt.timedelta(hours=2), "firing"),
    }

    # 3. maintenance ages the raw store; the derived store is untouched
    policy = [
        PolicyItem(("*",), keep=True, max_age="4w"),
        PolicyItem(("*",), keep=True, min_age="4w", max_age="5y",
                   mutations=(("mean", "1d"),)),
    ]
    derived_before = sorted(
        glob.glob(os.path.join(rules_store, "**", "*.parquet"),
                  recursive=True))
    maintenance_tick(spark, raw, policy, "2024-01-31 00:00:00",
                     n_buckets=2)
    aged = spark.read.parquet(raw).filter(F.col("ts") < "2023-06-01").collect()
    # the 3 hourly points straddle a date boundary → two daily means
    assert len(aged) == 2 and all(r["dval"] == 5.0 for r in aged)
    assert derived_before == sorted(
        glob.glob(os.path.join(rules_store, "**", "*.parquet"),
                  recursive=True))

"""PromQL instant-vector math + calendar functions (r14,
operators/trend.py::scalar_map / scalar_math_family /
calendar_components) and the one-pass cross-series aggregator tail
(operators/aggregate.py::aggregate_by_name_multi): the IEEE edge
semantics the corpus-level hash gates (strictly positive dvals) never
reach, the exp-vs-numpy pin that replaces exp's hash gate, and the
family ≡ single-function equalities."""

from __future__ import annotations

import math
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from open_instrument_spark.operators import aggregate as agg_ops
from open_instrument_spark.operators.trend import (
    calendar_components,
    scalar_map,
    scalar_math_family,
)


def _utc(*a):
    return datetime(*a, tzinfo=timezone.utc).replace(tzinfo=None)


def _pts(spark, vals, base_ts=None):
    base = base_ts or _utc(2024, 3, 10, 12, 0, 0)
    rows = [("m", base.replace(minute=i), float(v))
            for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "name string, ts timestamp, dval double") \
        .withColumn("series_key", F.col("name"))


def _vals(df):
    return [r.dval for r in df.orderBy("ts").collect()]


# ---------------------------------------------------------------------------
# scalar_map: PromQL IEEE edge semantics (promql/functions.go contracts)
# ---------------------------------------------------------------------------

def test_ln_branches_promql_not_spark_null(spark):
    out = _vals(scalar_map(_pts(spark, [math.e, 0.0, -3.0]), "ln"))
    assert out[0] == pytest.approx(1.0)
    assert out[1] == float("-inf")          # ln(0) = -Inf, not NULL
    assert math.isnan(out[2])               # ln(<0) = NaN, not NULL
    for fn in ("log2", "log10"):
        o = _vals(scalar_map(_pts(spark, [0.0, -1.0]), fn))
        assert o[0] == float("-inf") and math.isnan(o[1])


def test_sqrt_sgn_abs_edges(spark):
    assert math.isnan(_vals(scalar_map(_pts(spark, [-4.0]), "sqrt"))[0])
    assert _vals(scalar_map(_pts(spark, [-7.5, 0.0, 2.5]), "sgn")) == [-1.0, 0.0, 1.0]
    assert _vals(scalar_map(_pts(spark, [-7.5]), "abs")) == [7.5]


def test_round_is_go_half_up_not_half_even(spark):
    # math.Floor(v/to + 0.5) * to: 2.5 -> 3 AND 3.5 -> 4 (half-even
    # would send 2.5 -> 2); negative halves go UP toward +inf: -2.5 -> -2.
    out = _vals(scalar_map(_pts(spark, [2.5, 3.5, -2.5]), "round", to=1.0))
    assert out == [3.0, 4.0, -2.0]
    out = _vals(scalar_map(_pts(spark, [1.24, 1.26]), "round", to=0.5))
    assert out == [1.0, 1.5]


def test_clamp_family_and_empty_special_case(spark):
    p = _pts(spark, [10.0, 150.0, 400.0])
    assert _vals(scalar_map(p, "clamp", lo=50.0, hi=300.0)) == [50.0, 150.0, 300.0]
    assert _vals(scalar_map(p, "clamp_min", lo=100.0)) == [100.0, 150.0, 400.0]
    assert _vals(scalar_map(p, "clamp_max", hi=200.0)) == [10.0, 150.0, 200.0]
    # The documented PromQL special case: min > max -> EMPTY vector.
    assert scalar_map(p, "clamp", lo=300.0, hi=50.0).count() == 0


def test_scalar_map_validation(spark):
    p = _pts(spark, [1.0])
    with pytest.raises(ValueError):
        scalar_map(p, "nosuch")
    with pytest.raises(ValueError):
        scalar_map(p, "round", to=0.0)
    with pytest.raises(ValueError):
        scalar_map(p, "clamp_min")


def test_exp_matches_numpy_bitwise_tolerance(spark):
    # exp is deliberately NOT in the corpus hash gate (1 ulp at
    # exp(490) ~ 1e212 defeats any decimal rounding); pin the JVM
    # result against the C-library within 2 ulp instead.
    vals = [-700.0, -1.0, 0.0, 1.0, 50.0, 490.02, 709.0]
    out = _vals(scalar_map(_pts(spark, vals), "exp"))
    for v, o in zip(vals, out):
        expect = math.exp(v)
        assert o == pytest.approx(expect, rel=1e-15), (v, o, expect)


def test_family_equals_single_maps_and_one_projection(spark):
    p = _pts(spark, [0.3, 7.0, 42.0, 250.0])
    fam = scalar_math_family(p, {
        "a": "abs", "r": ("round", {"to": 0.5}),
        "c": ("clamp", {"lo": 1.0, "hi": 100.0}),
    })
    assert {"series_key", "ts", "dval", "a", "r", "c"} <= set(fam.columns)
    rows = fam.orderBy("ts").collect()
    for out_col, fn, params in (("a", "abs", {}), ("r", "round", {"to": 0.5}),
                                ("c", "clamp", {"lo": 1.0, "hi": 100.0})):
        single = _vals(scalar_map(p, fn, **params))
        assert [r[out_col] for r in rows] == single
    # One narrow projection: no shuffle anywhere in the plan.
    plan = fam._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# calendar_components
# ---------------------------------------------------------------------------

def test_calendar_components_known_dates(spark):
    # 2024-03-10 is a Sunday; 2024 is a leap year (Feb has 29 days).
    p = spark.createDataFrame(
        [("m", _utc(2024, 3, 10, 23, 45, 0), 1.0),
         ("m", _utc(2024, 2, 5, 0, 7, 0), 2.0)],
        "name string, ts timestamp, dval double") \
        .withColumn("series_key", F.col("name"))
    rows = {r.dval: r for r in calendar_components(p).collect()}
    r1 = rows[1.0]
    assert (r1.year, r1.month, r1.day_of_month) == (2024, 3, 10)
    assert r1.day_of_week == 0               # PromQL: Sunday = 0
    assert (r1.hour, r1.minute) == (23, 45)
    assert r1.day_of_year == 31 + 29 + 10    # leap-year offset
    assert r1.days_in_month == 31
    r2 = rows[2.0]
    assert r2.day_of_week == 1               # 2024-02-05 is a Monday
    assert r2.days_in_month == 29            # leap February


# ---------------------------------------------------------------------------
# aggregate_by_name_multi + the PromQL aggregator tail
# ---------------------------------------------------------------------------

def _named(spark, rows):
    return spark.createDataFrame(rows, "name string, ts timestamp, dval double")


def test_multi_equals_singles_and_tail_semantics(spark):
    t0 = _utc(2024, 1, 1, 0, 0, 0)
    p = _named(spark, [("a", t0, 2.0), ("a", t0.replace(second=10), 4.0),
                       ("a", t0.replace(second=20), 6.0), ("b", t0, 5.0)])
    out = agg_ops.aggregate_by_name_multi(
        p, {"s": "sum", "c": "count", "sd": "stddev", "sv": "stdvar",
            "g": "group"}, 60_000)
    rows = {r.name: r for r in out.collect()}
    a, b = rows["a"], rows["b"]
    assert a.s == 12.0 and a.c == 3
    # POPULATION moments (PromQL stddev/stdvar), not sample:
    assert a.sv == pytest.approx(8.0 / 3.0)
    assert a.sd == pytest.approx(math.sqrt(8.0 / 3.0))
    assert b.c == 1 and b.sd == 0.0 and b.sv == 0.0   # single-sample: 0, not NULL
    assert a.g == 1.0 and b.g == 1.0                   # group() = 1
    # Each member equals its single-aggregator run.
    for col, kind in (("s", "sum"), ("c", "count"), ("sd", "stddev")):
        single = {r.name: r.value
                  for r in agg_ops.aggregate_by_name(p, kind, 60_000).collect()}
        for n in ("a", "b"):
            got, want = rows[n][col], single[n]
            assert got == pytest.approx(want)


def test_multi_single_exchange_plan(spark):
    t0 = _utc(2024, 1, 1)
    p = _named(spark, [("a", t0, 1.0), ("a", t0, 2.0)])
    out = agg_ops.aggregate_by_name_multi(
        p, {"s": "sum", "c": "count", "sd": "stddev"}, 60_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # All requested aggregators fold through ONE shuffle.
    assert plan.count("Exchange") == 1


def test_multi_validation(spark):
    p = _named(spark, [("a", _utc(2024, 1, 1), 1.0)])
    with pytest.raises(ValueError):
        agg_ops.aggregate_by_name_multi(p, {}, 60_000)
    with pytest.raises(ValueError):
        agg_ops.aggregate_by_name_multi(p, {"x": "nosuch"}, 60_000)


def test_trig_family_matches_libm_and_domains(spark):
    # The trig members outside the corpus hash gate (inverse/
    # hyperbolic) pinned against the C library; domain exits are NaN
    # per PromQL, never NULL.
    vals = [-2.0, -0.5, 0.0, 0.5, 1.0, 2.0, 490.02]
    for fn, ref in (("sin", math.sin), ("cos", math.cos),
                    ("tan", math.tan), ("atan", math.atan),
                    ("sinh", math.sinh), ("cosh", math.cosh),
                    ("tanh", math.tanh),
                    ("deg", math.degrees), ("rad", math.radians)):
        out = _vals(scalar_map(_pts(spark, vals), fn))
        for v, o in zip(vals, out):
            assert o == pytest.approx(ref(v), rel=1e-13), (fn, v)
    # inverse functions: NaN outside the domain, exact inside
    out = _vals(scalar_map(_pts(spark, [-2.0, 0.5, 2.0]), "asin"))
    assert math.isnan(out[0]) and math.isnan(out[2])
    assert out[1] == pytest.approx(math.asin(0.5))
    out = _vals(scalar_map(_pts(spark, [0.5, 3.0]), "acosh"))
    assert math.isnan(out[0])
    assert out[1] == pytest.approx(math.acosh(3.0))
    out = _vals(scalar_map(_pts(spark, [-1.5, 0.5]), "atanh"))
    assert math.isnan(out[0])
    assert out[1] == pytest.approx(math.atanh(0.5))
    out = _vals(scalar_map(_pts(spark, [-3.0, 3.0]), "asinh"))
    assert out == pytest.approx([math.asinh(-3.0), math.asinh(3.0)])

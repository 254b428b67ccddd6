"""Holt linear (double exponential) smoothing — bit-exact python
replay, trend-following sanity, and plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_instrument_spark.operators.resample import holt_kernel


def replay(vals, alpha=0.25, beta=0.5):
    out = []
    l = b = 0.0
    for i, x in enumerate(vals):
        if i == 0:
            l, b = x, 0.0
        else:
            lp = l
            l = alpha * x + (1.0 - alpha) * (l + b)
            b = beta * (l - lp) + (1.0 - beta) * b
        out.append(l + b)
    return out


def test_holt_kernel_matches_replay():
    vals = [3.0, 1.5, 4.25, 4.25, -2.0, 100.0, 0.125]
    ts = list(range(len(vals)))
    _, got = holt_kernel(ts, vals, "1s")
    assert list(got) == replay(vals)


def test_holt_tracks_linear_trend():
    # on an exact line the forecast converges onto the next point
    vals = [float(2 * i) for i in range(60)]
    _, got = holt_kernel(list(range(60)), vals, "1s")
    assert abs(got[-1] - 120.0) < 0.01  # forecast for step 60


def test_holt_single_point():
    _, got = holt_kernel([0], [7.5], "1s")
    assert list(got) == [7.5]


def test_holt_frame_is_one_exchange(spark):
    from open_instrument_spark.operators.resample import holt
    from tests.test_plan_shapes import plan_of

    pts = spark.createDataFrame(
        [("a{}", dt.datetime(2024, 1, 1), 1.0, None, "a{}")],
        "name string, ts timestamp, dval double, sval string, series_key string",
    ).select("series_key", "ts", "dval")
    plan = plan_of(holt(pts, restore_labels=False))
    assert plan.count("Exchange") == 1  # one shuffle on series_key


def test_holt_spark_equals_kernel(spark):
    import numpy as np

    from open_instrument_spark.operators.resample import holt

    rows = []
    rng = np.random.RandomState(3)
    for s in ["s1{}", "s2{}"]:
        for i in range(40):
            rows.append(
                (s, dt.datetime(2024, 1, 1, 0, 0, i), float(rng.randn()))
            )
    pts = spark.createDataFrame(rows, "series_key string, ts timestamp, dval double")
    got = holt(pts, restore_labels=False).orderBy("series_key", "ts").collect()
    for s in ["s1{}", "s2{}"]:
        vals = [r[2] for r in rows if r[0] == s]
        exp = replay(vals)
        gv = [r["dval"] for r in got if r["series_key"] == s]
        assert gv == exp  # bit-exact


def test_holt_winters_kernel_hand_computed_seasonal_engagement():
    """Period-2 trace where a seasonal slot WRITTEN at i=1 is READ at
    i=3 (sp=0.75) — the seasonality path, not just Holt with extra
    zeros. All constants binary-exact; asserted equal, not approx."""
    from open_instrument_spark.operators.resample import holt_winters_kernel

    ts = [0, 1, 2, 3]
    xs = [4.0, 8.0, 6.0, 10.0]
    _, out = holt_winters_kernel(ts, xs, None, period=2)
    assert list(out) == [4.0, 5.5, 6.9375, 7.9921875]


def test_holt_winters_reduces_to_holt_with_zero_gamma():
    """γ=0 freezes the zero-init seasonal slots, so the forecast must
    equal plain Holt exactly on any input."""
    import numpy as np

    from open_instrument_spark.operators.resample import (
        holt_kernel,
        holt_winters_kernel,
    )

    rng = np.random.RandomState(3)
    xs = rng.standard_normal(50).tolist()
    ts = list(range(50))
    _, want = holt_kernel(ts, xs, None)
    _, got = holt_winters_kernel(ts, xs, None, gamma=0.0, period=7)
    assert list(got) == list(want)


def test_cusum_kernel_hand_computed():
    """Spike decays, sustained drift accumulates — the CUSUM contract.
    Reference level = first value (4.0)."""
    from open_instrument_spark.operators.resample import cusum_kernel

    xs = [4.0, 9.0, 1.0, 6.0, 6.0, 6.0]
    # c: 0, 5, max(0,5-3)=2, 4, 6, 8
    _, out = cusum_kernel(list(range(6)), xs, None)
    assert list(out) == [0.0, 5.0, 2.0, 4.0, 6.0, 8.0]
    # pure spike fully decays
    _, out2 = cusum_kernel([0, 1, 2, 3], [4.0, 9.0, -10.0, 4.0], None)
    assert list(out2) == [0.0, 5.0, 0.0, 0.0]

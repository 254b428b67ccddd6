"""mad_outliers unit tests: hand-computed med/MAD/count, the MAD=0
convention, and per-series vs cross-series grouping."""

from __future__ import annotations

import datetime as dt

import pytest


def _rows(vals, name="/events/x", user="1"):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    return [
        (name, {"user_id": user}, t0 + dt.timedelta(minutes=i), float(v))
        for i, v in enumerate(vals)
    ]


@pytest.fixture()
def mk(spark):
    def make(rows):
        return spark.createDataFrame(
            rows,
            "name string, labels map<string,string>, ts timestamp, dval double",
        )
    return make


def test_mad_hand_computed(mk):
    from open_instrument_spark.operators.trend import mad_outliers

    # med=3, |x-med| = [2,1,0,1,2,97] → MAD=1.5; only 100 crosses:
    # 0.6745*97/1.5 = 43.6 > 3.5; next largest 0.6745*2/1.5 = 0.9
    out = mad_outliers(mk(_rows([1, 2, 3, 4, 5, 100])), by=("name",)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_samples"] == 6
    assert r["med"] == 3.5  # even count: interpolated median of 1..5,100
    # recompute: sorted [1,2,3,4,5,100] → med = (3+4)/2 = 3.5
    # ad = [2.5,1.5,0.5,0.5,1.5,96.5] sorted → MAD = (1.5+1.5)/2 = 1.5
    assert r["mad"] == 1.5
    assert r["n_outliers"] == 1


def test_mad_zero_means_no_outliers(mk):
    from open_instrument_spark.operators.trend import mad_outliers

    # over half identical → MAD = 0 → convention: nothing flagged,
    # even though 50 differs wildly from the median
    out = mad_outliers(mk(_rows([7, 7, 7, 7, 50])), by=("name",)).collect()
    assert out[0]["mad"] == 0.0 and out[0]["n_outliers"] == 0


def test_mad_groups_independently(mk):
    from open_instrument_spark.operators.trend import mad_outliers

    rows = _rows([1, 2, 3, 4, 5, 100], name="/events/a") + _rows(
        [10, 20, 30, 40, 50], name="/events/b"
    )
    got = {r["name"]: r for r in mad_outliers(mk(rows), by=("name",)).collect()}
    assert got["/events/a"]["n_outliers"] == 1
    assert got["/events/b"]["n_outliers"] == 0

"""as_of_join / sessionize unit tests (paths the DuckDB oracle doesn't
cover: tolerance null-out, no-match rows, session merge boundaries)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_instrument_spark.operators.temporal import as_of_join, sessionize


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [("a", _ts(10), 1.0), ("a", _ts(30), 2.0), ("b", _ts(5), 3.0)],
        "key string, ts timestamp, v double",
    )
    right = spark.createDataFrame(
        [("a", _ts(9), 100.0), ("a", _ts(30), 200.0)],
        "key string, ts timestamp, w double",
    )
    out = {
        (r.key, r.ts): (r.r_ts, r.r_w)
        for r in as_of_join(left, right, on=["key"]).collect()
    }
    # latest right <= left.ts; equal ts matches; keys without rights -> NULL
    assert out[("a", _ts(10))] == (_ts(9), 100.0)
    assert out[("a", _ts(30))] == (_ts(30), 200.0)
    assert out[("b", _ts(5))] == (None, None)


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [("a", _ts(50), 1.0)], "key string, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [("a", _ts(10), 9.0)], "key string, ts timestamp, w double"
    )
    hit = as_of_join(left, right, on=["key"], tolerance="50 minutes").first()
    assert hit.r_w == 9.0
    miss = as_of_join(left, right, on=["key"], tolerance="30 minutes").first()
    assert miss.r_w is None and miss.r_ts is None


def test_sessionize_gap_boundary(spark):
    # gap = 10 min. Spark merges INCLUSIVELY at the boundary: an event at
    # exactly prev+gap (minute 19 after minute 9) joins the session; the
    # first strictly-later event (minute 30) starts a new one. The DuckDB
    # oracle mirrors this with `ts - lag(ts) > gap`.
    ev = spark.createDataFrame(
        [("u", _ts(0), 1.0), ("u", _ts(9), 2.0), ("u", _ts(19), 4.0), ("u", _ts(30), 8.0)],
        "user_id string, ts timestamp, value double",
    )
    rows = sorted(
        sessionize(ev, "user_id", gap="10 minutes").collect(),
        key=lambda r: r.session_start,
    )
    assert [(r.n_events, r.sum_value) for r in rows] == [(3, 7.0), (1, 8.0)]
    assert rows[0].session_end == _ts(29)


def test_get_default_window(spark):
    """F7 default: GetRequest with now set and no range → [now-1d, now]
    inclusive (server/store.cc:137-138; inclusive-both per SURVEY §7.0 #2)."""
    from open_instrument_spark.plans.api import GetRequest, get

    pts = spark.createDataFrame(
        [
            ("/v", {}, _ts(0) - dt.timedelta(days=2), 1.0, None),
            ("/v", {}, _ts(0) - dt.timedelta(hours=12), 2.0, None),
            ("/v", {}, _ts(0), 3.0, None),
        ],
        "name string, labels map<string,string>, ts timestamp, dval double, sval string",
    )
    out = get(pts, GetRequest(variable="/v", now=_ts(0)))
    assert sorted(r.dval for r in out.collect()) == [2.0, 3.0]


def test_rate_chunked_equals_plain(spark):
    """The chunked two-phase rate must be row-identical to the
    single-window rate for any chunk size (boundary handoff across
    empty and non-empty chunks)."""
    from open_instrument_spark.operators import mutate
    from open_instrument_spark.sources.tables import load_tables

    from tests.conftest import SF_SMOKE

    pts = load_tables(spark, SF_SMOKE).points()
    plain = {
        (r.series_key, r.ts, r.dval) for r in mutate.rate(pts).collect()
    }
    for chunk in ("1h", "1d", "2w"):
        chunked = {
            (r.series_key, r.ts, r.dval)
            for r in mutate.rate(pts, chunk=chunk).collect()
        }
        assert chunked == plain, chunk

    for fn in (mutate.rate_signed, mutate.delta, mutate.delta_signed):
        base = {(r.series_key, r.ts, r.dval) for r in fn(pts).collect()}
        got = {(r.series_key, r.ts, r.dval) for r in fn(pts, chunk="1d").collect()}
        assert got == base, fn.__name__


def test_asof_duplicate_right_ts_resolves_to_greatest(spark):
    """Duplicate (key, ts) right rows must resolve deterministically to
    the greatest value tuple (ingest.dedup convention), not an arbitrary
    partition-order winner."""
    left = spark.createDataFrame(
        [("a", _ts(10), 1.0)], "key string, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [("a", _ts(5), 100.0), ("a", _ts(5), 300.0), ("a", _ts(5), 200.0)],
        "key string, ts timestamp, w double",
    )
    for _ in range(3):  # stable across repeated runs
        out = as_of_join(left, right.repartition(8), on=["key"]).collect()
        assert [(r.r_ts, r.r_w) for r in out] == [(_ts(5), 300.0)]


def test_asof_single_window_node(spark):
    """The fill columns must come from ONE Window node (single shuffle)."""
    left = spark.createDataFrame(
        [("a", _ts(10), 1.0)], "key string, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [("a", _ts(5), 100.0, 7.0)],
        "key string, ts timestamp, w double, x double",
    )
    plan = as_of_join(left, right, on=["key"])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window") == 1, plan


def test_asof_duplicate_right_rows_pick_one_row_atomically(spark):
    """Duplicate right rows with NULLs in different columns: the as-of
    fill must carry ONE row (the greatest tuple), never synthesize a row
    mixing columns from different duplicates."""
    left = spark.createDataFrame(
        [("a", _ts(10), 1.0)], "key string, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [("a", _ts(5), 1.0, 9.0), ("a", _ts(5), 2.0, None)],
        "key string, ts timestamp, w double, x double",
    )
    out = as_of_join(left, right, on=["key"]).collect()
    # greatest tuple is (w=2.0, x=NULL) — x must NOT be backfilled to 9.0
    assert [(r.r_w, r.r_x) for r in out] == [(2.0, None)]


def test_get_with_aggregation_equals_composed_operators(spark):
    """S10: GetRequest with mutations + aggregation must compile to the
    same result as composing the operators directly (match → rate →
    label-grouped windowed sum)."""
    from open_instrument_spark.model import events_to_points
    from open_instrument_spark.operators import aggregate as agg_ops
    from open_instrument_spark.operators import mutate, select
    from open_instrument_spark.plans.api import GetRequest, get
    from open_instrument_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    pts = events_to_points(load_tables(spark, SF_SMOKE).table("events"))
    out = get(
        pts,
        GetRequest(
            variable="/events/*",
            mutations=[("rate", None)],
            aggregation="sum",
            aggregation_labels=["user_id"],
            sample_interval="6h",
        ),
    )
    want = agg_ops.aggregate(
        mutate.rate(select.match_variables(pts, "/events/*")),
        "sum", ["user_id"], 21_600_000,
    )
    got_rows = {
        (r["name"], r["label"], r["label_value"], r["ts"], round(r["value"], 9))
        for r in out.collect()
    }
    want_rows = {
        (r["name"], r["label"], r["label_value"], r["ts"], round(r["value"], 9))
        for r in want.collect()
    }
    assert got_rows == want_rows and got_rows


def test_get_request_mutation_max_gap(spark):
    """The proto's per-mutation max_gap_interpolate (proto:51) flows
    through the GetRequest surface: a 3-tuple mutation spec caps gap
    filling identically to calling the resample directly, and the cap
    is rejected on non-interpolating mutations."""
    import pytest as _pytest

    from open_instrument_spark.model import events_to_points
    from open_instrument_spark.operators import resample
    from open_instrument_spark.plans.api import GetRequest, get
    from open_instrument_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    pts = events_to_points(load_tables(spark, SF_SMOKE).table("events"))
    req = GetRequest(variable="/events/*", mutations=[("interpolate", "1d", 2)])
    via_api = {
        (r["series_key"], r["ts"], r["dval"])
        for r in get(pts, req).select("series_key", "ts", "dval").collect()
    }
    direct = {
        (r["series_key"], r["ts"], r["dval"])
        for r in resample.interpolate(
            pts.filter(pts.name.startswith("/events/")), "1d",
            max_gap_interpolate=2,
        ).select("series_key", "ts", "dval").collect()
    }
    assert via_api == direct and len(via_api) > 0
    # fewer rows than uncapped (the cap bites)
    uncapped = get(pts, GetRequest(variable="/events/*",
                                   mutations=[("interpolate", "1d")]))
    assert len(via_api) < uncapped.count()
    with _pytest.raises(ValueError, match="grid interpolators"):
        get(pts, GetRequest(variable="/events/*", mutations=[("rate", None, 2)]))

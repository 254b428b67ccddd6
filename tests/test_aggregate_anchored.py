"""A1 reference-exact drift-bucket aggregation: hand-traced goldens for
the ValueStreamCalculation kernel (lib/protobuf.cc:49-142) including its
quirks (stream-scan-order anchoring, Max 0-init, upper median, dropped
trailing bucket), plus Spark end-to-end equality against a pure-Python
replay of the same walk."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_instrument_spark.operators.aggregate import (
    _drift_calc_fns,
    aggregate,
    aggregate_anchored,
    value_stream_calculation,
)

FNS = _drift_calc_fns()


def _streams(*pairs):
    return [
        (np.asarray(t, dtype=np.int64), np.asarray(v, dtype=np.float64))
        for t, v in pairs
    ]


def test_drift_kernel_hand_traced_two_streams():
    """Hand trace, interval=10:
    A=(100,105,121 / 1,2,4), B=(103,130 / 10,20).
    Round 1 anchors at 100 (A first), collects A:100→1, B:103→10;
    round 2 adds A:105→2; round 3 contributes nothing → flush
    (ts=100, bucket=[1,10,2]); round 4 re-anchors at 121, collects
    A:121→4, B:130→20; round 5 exhausts input → the trailing bucket
    [4,20] is DROPPED (the C++ loop breaks before the flush check)."""
    streams = _streams(([100, 105, 121], [1, 2, 4]), ([103, 130], [10, 20]))
    for kind, want in [
        ("sum", 13.0),
        ("average", 13.0 / 3.0),
        ("max", 10.0),
        ("min", 1.0),
        ("median", 2.0),  # sorted [1,2,10], element [3//2]=2
    ]:
        out_t, out_v = value_stream_calculation(streams, 10, FNS[kind])
        assert out_t == [100], kind
        assert out_v == [want], kind


def test_drift_kernel_anchor_is_stream_scan_order_not_time_order():
    """Quirk (1): A=[100], B=[5] — the anchor comes from stream 0's
    value, so B's EARLIER point is bucketed later (and then dropped as
    the trailing bucket). Output is just (100, 1.0)."""
    streams = _streams(([100], [1.0]), ([5], [50.0]))
    out_t, out_v = value_stream_calculation(streams, 10, FNS["sum"])
    assert (out_t, out_v) == ([100], [1.0])


def test_drift_kernel_max_zero_init_bug():
    """Quirk: _DoMax inits at 0 (lib/protobuf.cc:109-115) — an
    all-negative bucket yields 0, faithfully reproduced. Two trailing
    sentinel points force the negative bucket to flush."""
    streams = _streams(([100, 1000, 2000], [-5.0, -3.0, 9.9]))
    out_t, out_v = value_stream_calculation(streams, 10, FNS["max"])
    # trace: bucket [-5] flushes when 1000 misses the bracket → max 0;
    # bucket [-3] flushes when 2000 misses → max 0; trailing [9.9]
    # dropped on exhaustion.
    assert out_t == [100, 1000]
    assert out_v == [0.0, 0.0]


def test_drift_kernel_upper_median_even_bucket():
    streams = _streams(([100, 101, 102, 103, 999], [4.0, 1.0, 3.0, 2.0, 7.0]))
    out_t, out_v = value_stream_calculation(streams, 10, FNS["median"])
    # sorted [1,2,3,4], element [4//2] = 3 (upper, never averaged)
    assert (out_t, out_v) == ([100], [3.0])


def test_drift_kernel_dense_single_stream_spans_rounds():
    """A single stream keeps contributing across while-rounds while its
    values stay inside the ±interval bracket of the anchor."""
    streams = _streams(([100, 104, 108, 150, 200], [1, 2, 3, 4, 5]))
    out_t, out_v = value_stream_calculation(streams, 10, FNS["sum"])
    assert (out_t, out_v) == ([100, 150], [6.0, 4.0])


def test_drift_kernel_empty_and_exhausted():
    assert value_stream_calculation([], 10, FNS["sum"]) == ([], [])
    assert value_stream_calculation(
        _streams(([], [])), 10, FNS["sum"]) == ([], [])
    # a lone point is always the dropped trailing bucket
    assert value_stream_calculation(
        _streams(([5], [1.0])), 10, FNS["sum"]) == ([], [])


def _python_replay(rows, interval_us, kind, by_label=None):
    """Pure-Python replay of aggregate_anchored on collected points."""
    from collections import defaultdict

    groups = defaultdict(lambda: defaultdict(list))
    for r in rows:
        if by_label is None:
            gkey = (r["name"],)
        else:
            lv = (r["labels"] or {}).get(by_label)
            if lv is None or lv == "":
                continue
            gkey = (r["name"], lv)
        groups[gkey][r["series_key"]].append((r["_t"], r["dval"]))
    out = set()
    for gkey, by_sk in groups.items():
        streams = []
        for sk in sorted(by_sk):
            pts = sorted(by_sk[sk])
            streams.append(
                (np.array([p[0] for p in pts], dtype=np.int64),
                 np.array([p[1] for p in pts], dtype=np.float64))
            )
        out_t, out_v = value_stream_calculation(streams, interval_us, FNS[kind])
        for t, v in zip(out_t, out_v):
            out.add(gkey + (t, round(v, 9)))
    return out


@pytest.mark.parametrize("kind", ["sum", "average", "max", "min", "median"])
def test_aggregate_anchored_spark_matches_python_replay(spark, kind):
    from open_instrument_spark.model import (
        epoch_seconds,
        events_to_points,
        with_series_key,
    )
    from open_instrument_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    pts = events_to_points(load_tables(spark, SF_SMOKE).table("events"))
    rows = (
        with_series_key(pts)
        .withColumn("_t", (epoch_seconds("ts") * 1_000_000).cast("long"))
        .collect()
    )
    want = _python_replay(rows, 30_000_000, kind)
    got = {
        (r["name"], int(r["ts"].timestamp() * 1_000_000), round(r["value"], 9))
        for r in aggregate_anchored(pts, kind, "30s").collect()
    }
    # timestamps in got are naive UTC (session pinned); normalize want
    want_n = {(n, t, v) for (n, t, v) in want}
    assert got == want_n


def test_aggregate_anchored_by_label_and_dispatch(spark):
    from open_instrument_spark.model import (
        epoch_seconds,
        events_to_points,
        with_series_key,
    )
    from open_instrument_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    pts = events_to_points(load_tables(spark, SF_SMOKE).table("events"))
    rows = (
        with_series_key(pts)
        .withColumn("_t", (epoch_seconds("ts") * 1_000_000).cast("long"))
        .collect()
    )
    want = _python_replay(rows, 30_000_000, "sum", by_label="k")
    res = aggregate(pts, "sum", by_labels=["k"], sample_interval="30s",
                    anchored=True)
    got = {
        (r["name"], r["label_value"],
         int(r["ts"].timestamp() * 1_000_000), round(r["value"], 9))
        for r in res.collect()
    }
    assert got == want
    assert res.columns == ["name", "label_value", "ts", "value", "label"]


def test_vectorized_walk_equals_spec_randomized():
    """The numpy walk must be bit-identical to the pure-Python spec on
    randomized ragged stream sets (incl. empty streams, ties, negative
    values, single-stream and wide cases)."""
    import random

    from open_instrument_spark.operators.aggregate import (
        value_stream_calculation_spec,
    )

    rng = random.Random(99)
    for trial in range(60):
        n = rng.randint(1, 12)
        streams = []
        for _ in range(n):
            m = rng.randint(0, 15)
            ts = sorted(rng.sample(range(1, 300), m)) if m else []
            streams.append(
                (ts, [float(rng.randint(-9, 9)) for _ in ts])
            )
        interval = rng.choice([1, 3, 7, 20])
        for kind in FNS:
            spec = value_stream_calculation_spec(streams, interval, FNS[kind])
            fast = value_stream_calculation(streams, interval, FNS[kind])
            assert (list(fast[0]), list(fast[1])) == (
                list(spec[0]), list(spec[1])
            ), (trial, kind)

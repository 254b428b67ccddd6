"""Cumulative le-bucket histograms + histogram_quantile
(operators/histogram.py): grid completeness, monotone cumulative
counts, merge-by-addition, PromQL interpolation exactness on a
hand-built distribution, quantile monotonicity in q, and the
no-raw-explode plan shape."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from open_instrument_spark.operators.histogram import (
    DEFAULT_LES,
    cumulative_from_counts,
    histogram_bucket_counts,
    histogram_buckets,
    histogram_quantile,
)


def _pts(spark, rows):
    return spark.createDataFrame(
        [("/m", datetime(2024, 1, 1, 0, 0, i % 60, i // 60), float(v))
         for i, v in enumerate(rows)],
        "name string, ts timestamp, dval double",
    )


def test_bucket_grid_complete_monotone_and_totaled(spark):
    vals = [1, 4, 7, 30, 80, 120, 400, 3]
    b = histogram_buckets(_pts(spark, vals)).collect()
    assert len(b) == len(DEFAULT_LES) + 1  # one day window, full grid
    by_idx = sorted(b, key=lambda r: r["idx"])
    cums = [r["cum"] for r in by_idx]
    assert cums == sorted(cums)                      # monotone
    assert cums[-1] == len(vals)                     # +Inf = total
    assert by_idx[-1]["le"] == float("inf")
    # hand-check: <=5 -> {1,4,3}; <=10 -> +{7}; <=25 -> same; <=50 ->
    # +{30}; <=100 -> +{80}; <=250 -> +{120}; inf -> +{400}
    assert cums == [3, 4, 4, 5, 6, 7, 8]


def test_buckets_merge_by_addition(spark):
    a, b = [1, 30, 400], [4, 7, 80, 120, 3]
    whole = {(r["idx"]): r["cum"]
             for r in histogram_buckets(_pts(spark, a + b)).collect()}
    pa = {r["idx"]: r["cum"] for r in histogram_buckets(_pts(spark, a)).collect()}
    pb = {r["idx"]: r["cum"] for r in histogram_buckets(_pts(spark, b)).collect()}
    assert whole == {i: pa[i] + pb[i] for i in whole}


def test_quantile_interpolation_exact(spark):
    """20 points uniform in (0, 100]: rank(0.9) = 18 lands in the
    (50, 100] bucket holding points 11..20 at cum 10..20 — PromQL
    interpolates 50 + 50 * (18 - 10) / 10 = 90."""
    vals = [5 * (i + 1) for i in range(20)]  # 5, 10, ..., 100
    q = histogram_quantile(histogram_buckets(_pts(spark, vals)), 0.9).collect()
    assert len(q) == 1
    assert q[0]["q90"] == pytest.approx(90.0, abs=1e-9)


def test_quantile_monotone_in_q_and_bounded(spark):
    vals = [1, 4, 7, 30, 80, 120, 400, 3, 9, 60, 200, 15]
    buckets = histogram_buckets(_pts(spark, vals))
    got = {}
    for q in (0.5, 0.9, 0.99):
        rows = histogram_quantile(buckets, q).collect()
        got[q] = rows[0][f"q{int(round(q * 100)):02d}"]
    assert got[0.5] <= got[0.9] <= got[0.99]
    assert all(0 < v <= max(DEFAULT_LES) for v in got.values())


def test_rank_in_inf_bucket_returns_highest_finite_le(spark):
    """All mass above the last finite bound: PromQL returns the
    second-to-last upper bound rather than +Inf."""
    q = histogram_quantile(
        histogram_buckets(_pts(spark, [300, 400, 500])), 0.9).collect()
    assert q[0]["q90"] == max(DEFAULT_LES)


def test_bucket_counts_streaming_equals_batch(spark, tmp_path):
    """The bucket build is a plain windowed aggregation, so it runs
    UNCHANGED as a streaming query — the closed-stream count table
    (and thus the full cumulative grid derived from it) must equal the
    batch build over the same rows. Like the CMS build equality (not a
    custom stateful twin): Spark's streaming state IS the histogram."""
    import os

    rows1 = [("/m", datetime(2024, 1, 1, 0, 0, i % 60), float(v))
             for i, v in enumerate([1, 4, 7, 30, 80])]
    rows2 = [("/m", datetime(2024, 1, 2, 0, 0, i % 60), float(v))
             for i, v in enumerate([120, 400, 3])] + \
            [("/n", datetime(2024, 1, 1, 12, 0, 0), 60.0)]
    schema = "name string, ts timestamp, dval double"

    src = str(tmp_path / "hist_src")
    dest = str(tmp_path / "hist_out")
    os.makedirs(src, exist_ok=True)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        counts = histogram_bucket_counts(stream)

        def sink(batch, _epoch):
            batch.write.mode("overwrite").parquet(dest)

        q = (
            counts.writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "hist_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for rows in (rows1, rows2):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
        run_once()

    streamed_counts = spark.read.parquet(dest)
    batch = spark.createDataFrame(rows1 + rows2, schema)
    assert ({tuple(r) for r in streamed_counts.collect()}
            == {tuple(r) for r in histogram_bucket_counts(batch).collect()})
    got = {tuple(r) for r in cumulative_from_counts(streamed_counts).collect()}
    want = {tuple(r) for r in histogram_buckets(batch).collect()}
    assert got == want and len(got) == 3 * (len(DEFAULT_LES) + 1)


def test_raw_points_are_never_exploded(spark):
    """The le-grid explode runs on POST-aggregation rows: in the
    executed plan every Generate (explode) sits above the first
    HashAggregate — the raw scan side is scan-project only."""
    plan = (
        histogram_buckets(_pts(spark, [1.0, 2.0]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    first_agg = plan.index("HashAggregate")
    gen = plan.find("Generate")
    assert gen != -1 and gen < first_agg  # plan prints top-down:
    # Generate appearing BEFORE the first (deepest-printed-last)
    # aggregate means it consumes aggregated rows, not the raw scan.


def test_stale_series_negative_age_and_flag(spark):
    """stale_series (operators/select.py): integer-microsecond ages,
    legitimate NEGATIVE age for series sampled after `now`, stale only
    past the threshold."""
    from open_instrument_spark.operators.select import stale_series

    rows = [
        ("/a", {"h": "x"}, datetime(2024, 1, 27, 23, 59, 59), 1.0),  # stale
        ("/b", {"h": "x"}, datetime(2024, 1, 30, 0, 0, 0), 1.0),     # fresh
        ("/c", {"h": "x"}, datetime(2024, 2, 1, 0, 0, 0), 1.0),      # future
    ]
    pts = spark.createDataFrame(
        rows, "name string, labels map<string,string>, ts timestamp, dval double")
    got = {r["name"]: r for r in stale_series(
        pts, "2024-01-31 00:00:00", max_age_ms=259_200_000).collect()}
    assert got["/a"]["stale"] and not got["/b"]["stale"]
    assert got["/c"]["age_us"] == -86_400_000_000 and not got["/c"]["stale"]
    assert got["/a"]["age_us"] == 3 * 86_400_000_000 + 1_000_000


def test_topk_series_rank_and_bound(spark):
    """topk_series (operators/trend.py): at most k rows per (name,
    window), ranks 1..k contiguous, values non-increasing in rank."""
    from open_instrument_spark.operators.trend import topk_series

    rows = []
    for s in range(6):
        for i in range(4):
            rows.append(("/m", {"u": str(s)},
                         datetime(2024, 1, 1, i), float(10 * s + i)))
    pts = spark.createDataFrame(
        rows, "name string, labels map<string,string>, ts timestamp, dval double")
    got = topk_series(pts, k=3).collect()
    assert len(got) == 3
    by_rank = sorted(got, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == [1, 2, 3]
    vals = [r["value"] for r in by_rank]
    assert vals == sorted(vals, reverse=True)
    assert vals[0] == 50 + 51 + 52 + 53  # the s=5 series dominates


def test_offset_compare_alignment_and_nulls(spark):
    """offset_compare: the prev side is the SAME aggregate shifted by
    the offset; the first windows (no history) keep NULLs; misaligned
    offsets raise."""
    import pytest as _pt

    from open_instrument_spark.operators.trend import offset_compare

    rows = [("/m", datetime(2024, 1, 1, h), 1.0 * (h + 1)) for h in range(3)] \
         + [("/m", datetime(2024, 1, 2, h), 10.0 * (h + 1)) for h in range(3)]
    pts = spark.createDataFrame(rows, "name string, ts timestamp, dval double")
    got = {r["ts"]: r for r in offset_compare(
        pts, offset_ms=86_400_000, interval_ms=3_600_000).collect()}
    assert len(got) == 6
    d2 = got[datetime(2024, 1, 2, 1)]
    assert (d2["value"], d2["value_prev"], d2["wow_ratio"]) == (20.0, 2.0, 10.0)
    d1 = got[datetime(2024, 1, 1, 1)]
    assert d1["value_prev"] is None and d1["wow_ratio"] is None

    with _pt.raises(ValueError):
        offset_compare(pts, offset_ms=5_400_000, interval_ms=3_600_000)


def test_increase_hand_traced_with_reset(spark):
    """increase (operators/trend.py): growth steps sum per (series,
    window); a reset contributes the restarted value; the window's
    first sample contributes nothing; windows are independent."""
    from open_instrument_spark.operators.trend import increase

    rows = [
        # day 1: 10 -> 25 -> 3 (reset) -> 9  => 15 + 3 + 6 = 24
        ("/c", {}, datetime(2024, 1, 1, 0), 10.0),
        ("/c", {}, datetime(2024, 1, 1, 6), 25.0),
        ("/c", {}, datetime(2024, 1, 1, 12), 3.0),
        ("/c", {}, datetime(2024, 1, 1, 18), 9.0),
        # day 2: 100 (first sample: no contribution) -> 101 => 1
        ("/c", {}, datetime(2024, 1, 2, 0), 100.0),
        ("/c", {}, datetime(2024, 1, 2, 6), 101.0),
    ]
    pts = spark.createDataFrame(
        rows,
        "name string, labels map<string,string>, ts timestamp, dval double")
    got = {r["ts"]: (r["n_samples"], r["increase"])
           for r in increase(pts).collect()}
    assert got == {datetime(2024, 1, 1): (4, 24.0),
                   datetime(2024, 1, 2): (2, 1.0)}


def test_irate_last_pair_and_reset(spark):
    """irate: last two samples only; counter reset uses the restarted
    value as growth; single-sample series dropped; zero-dt dropped."""
    from open_instrument_spark.operators.trend import irate

    rows = [
        # /a: ... 100@0:00, 160@0:30 => (160-100)/1800 s
        ("/a", {}, datetime(2024, 1, 1, 0, 0), 100.0),
        ("/a", {}, datetime(2024, 1, 1, 0, 30), 160.0),
        ("/a", {}, datetime(2023, 12, 1), 5.0),      # old history: ignored
        # /b: reset at the end: 50 -> 4 => 4/60 s
        ("/b", {}, datetime(2024, 1, 1, 0, 0), 50.0),
        ("/b", {}, datetime(2024, 1, 1, 0, 1), 4.0),
        # /c: single sample => dropped
        ("/c", {}, datetime(2024, 1, 1), 1.0),
    ]
    pts = spark.createDataFrame(
        rows,
        "name string, labels map<string,string>, ts timestamp, dval double")
    got = {r["series_key"].split("{")[0]: r["irate_per_sec"]
           for r in irate(pts).collect()}
    assert got == {"/a": round(60 / 1800, 6), "/b": round(4 / 60, 6)}


def test_quantile_over_time_interpolation(spark):
    """quantile_over_time: sorted[(n-1)q] linear interpolation per
    (series, window) — hand-checked on [1, 2, 3, 10]: p95 at position
    2.85 = 3 + 0.85*7 = 8.95; p50 = 2.5."""
    from open_instrument_spark.operators.trend import quantile_over_time

    rows = [("/m", {}, datetime(2024, 1, 1, i), float(v))
            for i, v in enumerate([10, 1, 3, 2])]
    pts = spark.createDataFrame(
        rows,
        "name string, labels map<string,string>, ts timestamp, dval double")
    q95 = quantile_over_time(pts, q=0.95).collect()
    assert [(r["n_samples"], r["q95"]) for r in q95] == [(4, 8.95)]
    q50 = quantile_over_time(pts, q=0.50).collect()
    assert [r["q50"] for r in q50] == [2.5]

"""Stateful streaming M7 interpolate (Go Interpolate as a stream
operator) — a member of the stateful-mutation family
(``rate_state``, ``rle_state``, ``uniform_state``).

The batch ``resample.interpolate`` needs each series' total order; on a
stream the same single-pass channel loop the reference runs
(mutations/mutations.go:90-137) carries naturally as per-series state in
``applyInPandasWithState``: ``(prev_t, prev_v, pending)`` across
micro-batches, emitting each grid point exactly once when the input
that crosses it arrives. Emission arithmetic is the kernel's
bit-for-bit (int-µs grid math + the same IEEE interpolation ops), so
for in-order input the stream's cumulative output equals the batch
operator's rows exactly — asserted by
``test_streaming_interpolate_matches_batch_across_batches``.

``max_gap_interpolate`` (proto:51) is honored identically to the batch
paths: long gaps stay unfilled, an exact on-grid input still passes
through.

Ordering contract (same as rate_stream): rows are sorted within each
micro-batch and state links batches in arrival order; a sample older
than the carried state is dropped (the t < pending guard subsumes it).
Fully late-tolerant interpolation belongs to the batch/compaction pass
over the store. Domain: non-negative epoch timestamps (DIVERGENCES
D14). State is one row per live series — bounded by series cardinality.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from open_instrument_spark.functions.durations import parse_duration_ms

OUT_SCHEMA = "series_key string, ts timestamp, dval double"
STATE_SCHEMA = "prev_us long, prev_v double, pending_us long"


def _make_emitter(interval_us: int, max_gap: int | None):
    def _emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "dval"], kind="mergesort")
        out_t: list[int] = []
        out_v: list[float] = []
        if state.exists:
            prev_t, prev_v, pending = state.get
        else:
            prev_t = None
            prev_v = pending = 0.0
        for ts, dval in zip(rows["ts"], rows["dval"]):
            t = ts.value // 1000  # pandas ns → µs
            v = float(dval)
            if prev_t is None:
                # first sample: grid anchor; on-grid input passes through
                # (mutations.go:99-105)
                if t % interval_us == 0:
                    out_t.append(t)
                    out_v.append(v)
                    prev_t, prev_v = t, v
                else:
                    prev_t, prev_v = t // interval_us * interval_us, v
                pending = prev_t + interval_us
                continue
            if t < pending:
                continue  # non-crossing inputs skipped (mutations.go:112)
            rate = v - prev_v
            if max_gap is not None and t - prev_t > max_gap * interval_us:
                if t % interval_us == 0:  # exact grid hit passes through
                    out_t.append(t)
                    out_v.append(prev_v + rate)
                pending = t - t % interval_us + interval_us
            else:
                while pending <= t:
                    pct = (pending - prev_t) / (t - prev_t)
                    out_t.append(pending)
                    out_v.append(prev_v + rate * pct)
                    pending += interval_us
            if prev_t < t:
                prev_t, prev_v = t, v
        if prev_t is not None:
            state.update((int(prev_t), float(prev_v), int(pending)))
        if out_t:
            yield pd.DataFrame(
                {
                    "series_key": key[0],
                    "ts": pd.to_datetime(out_t, unit="us"),
                    "dval": out_v,
                }
            )

    return _emit


def interpolate_stream(points_stream: DataFrame, interval,
                       max_gap_interpolate: int | None = None) -> DataFrame:
    """Per-series grid interpolation of a points stream; append-mode
    output (each grid point emitted once, when the input crossing it
    arrives). NoTimeout: series state lives as long as the query.

    Non-numeric samples (dval NULL) are filtered before the state
    machine, matching the batch operator (numeric interpolation only).
    Input needs ``series_key`` (``model.with_series_key``)."""
    interval_us = parse_duration_ms(interval) * 1000
    return (
        points_stream.select("series_key", "ts", "dval")
        .where("dval IS NOT NULL")
        .groupBy("series_key")
        .applyInPandasWithState(
            _make_emitter(interval_us, max_gap_interpolate),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

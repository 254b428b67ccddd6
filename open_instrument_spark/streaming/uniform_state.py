"""Stateful streaming M4 uniform-average resample (C++ UniformTimeSeries
as a stream operator) — the fourth member of the stateful-mutation
family (``rate_state``, ``rle_state``, ``interpolate_state``).

The batch ``resample.uniform_average`` emits, for every consecutive
input pair (prev, cur), each grid point g ∈ (prev_ts, cur_ts] of the
grid anchored at ``base = ts0 - ts0 % interval`` (lib/counter.cc:18-64),
linearly interpolated between the ADJACENT pair — unlike M7, no input
is ever skipped. That per-pair locality is exactly what carries across
micro-batches: state is ``(base, prev_t, prev_v)`` per series in
``applyInPandasWithState``; each arriving input emits its pair's grid
points once. Emission arithmetic is the SQL plan's bit-for-bit
(int-µs grid math, ``(v-pv)/(t-pt)*(g-pt)+pv`` with the exact-hit
short-circuit), so cumulative stream output equals the batch operator
exactly — asserted by
``test_streaming_uniform_matches_batch_across_batches``.

``max_gap_interpolate`` (proto:51) matches the batch path: a pair gap
over ``max_gap`` intervals leaves the cells unfilled, but an input
landing exactly ON a grid point still passes through.

Ordering contract (same as interpolate_state): rows sorted within each
micro-batch, state links batches in arrival order; a sample at or
before the carried prev timestamp is dropped (late data belongs to the
batch/compaction pass over the store). Domain: non-negative epoch
timestamps (DIVERGENCES D14). State is one row per live series —
bounded by series cardinality.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from open_instrument_spark.functions.durations import parse_duration_ms

OUT_SCHEMA = "series_key string, ts timestamp, dval double"
STATE_SCHEMA = "base_us long, prev_us long, prev_v double"


def _make_emitter(interval_us: int, max_gap: int | None):
    def _emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "dval"], kind="mergesort")
        out_t: list[int] = []
        out_v: list[float] = []
        if state.exists:
            base, prev_t, prev_v = state.get
        else:
            base = prev_t = None
            prev_v = 0.0
        for ts, dval in zip(rows["ts"], rows["dval"]):
            t = ts.value // 1000  # pandas ns → µs
            v = float(dval)
            if prev_t is None:
                # first sample anchors the grid and is never emitted
                # (counter.cc:21-29: n_out starts past it)
                base = t - t % interval_us
                prev_t, prev_v = t, v
                continue
            if t <= prev_t:
                continue  # late/duplicate: batch pass owns reordering
            # grid points in (prev_t, t]: smallest > prev_t .. largest <= t
            g_lo = prev_t + (interval_us - (prev_t - base) % interval_us)
            g_hi = t - (t - base) % interval_us
            if max_gap is not None and t - prev_t > max_gap * interval_us:
                # long gap unfilled; exact grid hit still passes through
                g_lo = g_hi if g_hi == t else g_hi + interval_us
            g = g_lo
            while g <= g_hi:
                if g == t:
                    out_t.append(g)
                    out_v.append(v)
                else:
                    out_t.append(g)
                    out_v.append(
                        (v - prev_v) / float(t - prev_t) * float(g - prev_t)
                        + prev_v
                    )
                g += interval_us
            prev_t, prev_v = t, v
        if prev_t is not None:
            state.update((int(base), int(prev_t), float(prev_v)))
        if out_t:
            yield pd.DataFrame(
                {
                    "series_key": key[0],
                    "ts": pd.to_datetime(out_t, unit="us"),
                    "dval": out_v,
                }
            )

    return _emit


def uniform_stream(points_stream: DataFrame, interval,
                   max_gap_interpolate: int | None = None) -> DataFrame:
    """Per-series M4 grid resample of a points stream; append-mode
    output (each grid point emitted once, when the input closing its
    straddling pair arrives). NoTimeout: series state lives as long as
    the query.

    Non-numeric samples (dval NULL) are filtered before the state
    machine, matching the batch operator (numeric resample only).
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

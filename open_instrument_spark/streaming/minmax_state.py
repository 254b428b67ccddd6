"""Stateful streaming M6 anchored Min/Max (Go ``mutations.Min``/``Max``
as stream operators) — the fifth member of the stateful-mutation family
(``rate_state``, ``rle_state``, ``interpolate_state``, ``uniform_state``).

The reference recurrence (mutations/mutations.go:139-191, implemented
batch-side in ``resample._minmax_anchored_kernel``) is: anchor at the
first sample's ts, accumulate min/max; when a sample arrives with
``t >= anchor + duration``, emit the accumulated value STAMPED AT THE
TRIGGERING SAMPLE'S ts (the trigger is excluded from the flushed bucket
and re-anchors the next one); the final partial bucket is NEVER emitted.
That last property makes the operator exactly append-mode streamable
with zero tail handling: a bucket only ever closes when its triggering
sample arrives, so cumulative stream output equals the batch kernel on
the same rows by construction — asserted across micro-batch boundaries
by ``test_streaming_minmax_anchored_matches_batch_across_batches``.

State is ``(anchor_us, acc)`` per series — one row per live series,
bounded by series cardinality. Ordering contract (same family-wide):
rows sorted within each micro-batch, state links batches in arrival
order; a sample at or before the carried anchor-bucket position is
processed in arrival order like the reference's channel loop (late data
belongs to the batch/compaction pass over the store).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from open_instrument_spark.functions.durations import parse_duration_ms

OUT_SCHEMA = "series_key string, ts timestamp, dval double"
STATE_SCHEMA = "anchor_us long, acc double"


def _make_emitter(duration_us: int, is_min: bool):
    pick = min if is_min else max

    def _emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "dval"], kind="mergesort")
        out_t: list[int] = []
        out_v: list[float] = []
        if state.exists:
            anchor, acc = state.get
        else:
            anchor = None
            acc = 0.0
        for ts, dval in zip(rows["ts"], rows["dval"]):
            t = ts.value // 1000  # pandas ns → µs
            v = float(dval)
            if anchor is None:
                anchor, acc = t, v
            elif t >= anchor + duration_us:
                out_t.append(t)
                out_v.append(acc)
                anchor, acc = t, v
            else:
                acc = pick(acc, v)
        if anchor is not None:
            state.update((int(anchor), float(acc)))
        if out_t:
            yield pd.DataFrame(
                {
                    "series_key": key[0],
                    "ts": pd.to_datetime(out_t, unit="us"),
                    "dval": out_v,
                }
            )

    return _emit


def _minmax_stream(points_stream: DataFrame, duration, is_min: bool) -> DataFrame:
    duration_us = parse_duration_ms(duration) * 1000
    return (
        points_stream.select("series_key", "ts", "dval")
        .where("dval IS NOT NULL")
        .groupBy("series_key")
        .applyInPandasWithState(
            _make_emitter(duration_us, is_min),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def min_anchored_stream(points_stream: DataFrame, duration) -> DataFrame:
    """Go Min (mutations.go:139-164) over a stream; append-mode, state
    one row per series. Non-numeric samples filtered like the batch
    kernel. Input needs ``series_key`` (``model.with_series_key``)."""
    return _minmax_stream(points_stream, duration, is_min=True)


def max_anchored_stream(points_stream: DataFrame, duration) -> DataFrame:
    """Go Max (mutations.go:166-191) over a stream; see
    :func:`min_anchored_stream`."""
    return _minmax_stream(points_stream, duration, is_min=False)

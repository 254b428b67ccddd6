"""Stateful streaming RLE writer (W3 as a stream operator).

The reference RLE-compresses on write: consecutive equal values extend
one record's ``end_timestamp`` instead of appending
(server/disk_datastore.cc:91-110 ``RecordNoLog``; Go
openinstrument.go:83-105 ``ValueStreamWriter`` — a per-series
last-value state machine). SURVEY.md §2.8 calls this the one genuinely
``mapGroupsWithState``-shaped operator in the system; here it is exactly
that: ``applyInPandasWithState`` keyed on ``series_key``, carrying the
open run ``(value, start, end, n)`` across micro-batches and emitting a
run only when a different value closes it.

Batch RLE (operators/rle.py) answers "compact what's stored"; this
answers "compact while ingesting" with unbounded, late-tolerant input —
state is one row per live series (bounded by series cardinality, the
same budget the reference spends on its live-map,
disk_datastore.h:230-234).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNS_SCHEMA = (
    "series_key string, dval double, ts timestamp, end_ts timestamp, run_len int"
)
STATE_SCHEMA = "dval double, start_us long, end_us long, n int"


def _close_runs(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values("ts")

    if state.exists:
        cur_v, start_us, end_us, n = state.get
    else:
        cur_v, start_us, end_us, n = None, 0, 0, 0

    closed: list[tuple[Any, int, int, int]] = []
    for ts, dval in zip(rows["ts"], rows["dval"]):
        us = ts.value // 1000  # pandas ns → µs
        if cur_v is not None and dval == cur_v:
            end_us, n = us, n + 1
        else:
            if cur_v is not None:
                closed.append((cur_v, start_us, end_us, n))
            cur_v, start_us, end_us, n = dval, us, us, 1

    state.update((float(cur_v), int(start_us), int(end_us), int(n)))
    if closed:
        yield pd.DataFrame(
            {
                "series_key": key[0],
                "dval": [c[0] for c in closed],
                "ts": pd.to_datetime([c[1] for c in closed], unit="us"),
                "end_ts": pd.to_datetime([c[2] for c in closed], unit="us"),
                "run_len": [c[3] for c in closed],
            }
        )


def rle_runs_stream(points_stream: DataFrame) -> DataFrame:
    """Closed RLE runs of a points stream, one open-run state per series.

    Append-mode output: a run appears once, when a value change closes
    it (the still-open tail run lives only in state — exactly the
    reference writer's behavior, openinstrument.go:88-101). NoTimeout:
    reference semantics accept late data indefinitely, so runs never
    auto-close on wall-clock.
    """
    return points_stream.select("series_key", "ts", "dval").groupBy(
        "series_key"
    ).applyInPandasWithState(
        _close_runs,
        outputStructType=RUNS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

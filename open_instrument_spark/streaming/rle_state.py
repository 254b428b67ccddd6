"""Stateful streaming RLE writer (W3 as a stream operator).

The reference RLE-compresses on write: consecutive equal values extend
one record's ``end_timestamp`` instead of appending
(server/disk_datastore.cc:91-110 ``RecordNoLog``; Go
openinstrument.go:83-105 ``ValueStreamWriter`` — a per-series
last-value state machine). SURVEY.md §2.8 calls this the one genuinely
``mapGroupsWithState``-shaped operator in the system; here it is exactly
that: ``applyInPandasWithState`` keyed on ``series_key``, carrying the
open run ``(dval, sval, start, end, n)`` across micro-batches and
emitting a run only when a different value closes it.

Equality matches batch ``rle_encode``'s ``eqNullSafe`` on (dval, sval):
nulls equal nulls, so string-sample runs (dval NULL — the reference's
flagship RLE use, config.txt:37-47) merge instead of fragmenting into
per-point singletons (pandas renders parquet NULL doubles as NaN, and
NaN != NaN under ``==``).

State-schema note: STATE_SCHEMA is part of the checkpoint contract —
changing it (as the sval addition did pre-release) breaks restarts from
checkpoints written under the old schema; migrate by draining the old
query and starting fresh.

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
    "series_key string, dval double, sval string, ts timestamp, "
    "end_ts timestamp, run_len int"
)
STATE_SCHEMA = "dval double, sval string, start_us long, end_us long, n int"

_NO_RUN = object()


def _norm(x: Any) -> Any:
    """NULL-normalize a sample value: parquet/Arrow nulls surface as NaN
    (doubles) or None (strings); both map to None so equality is
    eqNullSafe-shaped."""
    return None if x is None or (isinstance(x, float) and pd.isna(x)) else x


def _close_runs(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs))
    if "sval" not in rows.columns:
        rows = rows.assign(sval=None)
    rows = rows.sort_values("ts")

    if state.exists:
        dv, sv, start_us, end_us, n = state.get
        cur = (_norm(dv), _norm(sv))
    else:
        cur, start_us, end_us, n = _NO_RUN, 0, 0, 0

    closed: list[tuple[Any, Any, int, int, int]] = []
    for ts, dval, sval in zip(rows["ts"], rows["dval"], rows["sval"]):
        us = ts.value // 1000  # pandas ns → µs
        val = (_norm(dval), _norm(sval))
        if cur is not _NO_RUN and val == cur:
            end_us, n = us, n + 1
        else:
            if cur is not _NO_RUN:
                closed.append((cur[0], cur[1], start_us, end_us, n))
            cur, start_us, end_us, n = val, us, us, 1

    state.update((cur[0], cur[1], int(start_us), int(end_us), int(n)))
    if closed:
        yield pd.DataFrame(
            {
                "series_key": key[0],
                "dval": [c[0] for c in closed],
                "sval": [c[1] for c in closed],
                "ts": pd.to_datetime([c[2] for c in closed], unit="us"),
                "end_ts": pd.to_datetime([c[3] for c in closed], unit="us"),
                "run_len": [c[4] for c in closed],
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
    cols = ["series_key", "ts", "dval"]
    if "sval" in points_stream.columns:
        cols.append("sval")
    return points_stream.select(*cols).groupBy("series_key").applyInPandasWithState(
        _close_runs,
        outputStructType=RUNS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

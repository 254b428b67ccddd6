"""Stateful streaming alert evaluation — the streaming twin of
``plans.alerts.classify_states`` (twelfth member of the stateful
family), and like CUSUM a member whose natural home IS the live path:
a page should come from the ingest stream, not a batch replay. State
is ONE long per series (the current breach run's start µs, -1 when
not in breach); every sample emits its state, so cumulative stream
output equals the batch window-function classification exactly —
asserted across micro-batch boundaries (including a breach run
SPANNING a boundary) by
``test_streaming_alert_states_matches_batch_across_batches``.

Ordering contract (family-wide): rows sorted (ts, dval) within each
micro-batch, state links batches in arrival order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from open_instrument_spark.functions.durations import parse_duration_ms
from open_instrument_spark.plans.alerts import _OPS

OUT_SCHEMA = "series_key string, ts timestamp, dval double, state string"
STATE_SCHEMA = "run_start long"


def _make_emitter(condition: str, threshold: float, for_us: int):
    op = _OPS[condition]

    def _emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "dval"], kind="mergesort")
        run_start = state.get[0] if state.exists else -1
        out_t, out_v, out_s = [], [], []
        for ts, dval in zip(rows["ts"], rows["dval"]):
            x = float(dval)
            t = ts.value // 1000
            if op(x, threshold):
                if run_start < 0:
                    run_start = t
                s = "firing" if t - run_start >= for_us else "pending"
            else:
                run_start = -1
                s = "inactive"
            out_t.append(ts)
            out_v.append(x)
            out_s.append(s)
        if out_t:
            state.update((int(run_start),))
            yield pd.DataFrame(
                {"series_key": key[0], "ts": out_t, "dval": out_v,
                 "state": out_s}
            )

    return _emit


def alert_stream(points_stream: DataFrame, condition: str = ">",
                 threshold: float = 0.0,
                 for_duration="0s") -> DataFrame:
    """Per-series streaming alert states; append-mode, one state long
    per series. The comparison treats Python and SQL semantics
    identically because ``condition`` is a plain float comparison on
    both sides. Input needs ``series_key``
    (``model.with_series_key``)."""
    if condition not in _OPS:
        raise ValueError(f"condition must be one of {sorted(_OPS)}")
    for_us = parse_duration_ms(for_duration) * 1000
    return (
        points_stream.select("series_key", "ts", "dval")
        .where("dval IS NOT NULL")
        .groupBy("series_key")
        .applyInPandasWithState(
            _make_emitter(condition, threshold, for_us),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Stateful streaming EWMA — the streaming twin of ``resample.ewma``
(sixth member of the stateful-mutation family). The recurrence
y = α·x + (1-α)·y is the canonical streaming smoother: state is ONE
double per series, every input emits exactly one output, so
cumulative stream output equals the batch kernel bit-for-bit when α is
binary-exact (default 1/4) — asserted across micro-batch boundaries by
``test_streaming_ewma_matches_batch_across_batches``.

Ordering contract (family-wide): rows sorted within each micro-batch,
state links batches in arrival order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "series_key string, ts timestamp, dval double"
STATE_SCHEMA = "y double"


def _make_emitter(alpha: float):
    beta = 1.0 - alpha

    def _emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "dval"], kind="mergesort")
        if state.exists:
            (y,) = state.get
            first = False
        else:
            y = 0.0
            first = True
        out_t = []
        out_v = []
        for ts, dval in zip(rows["ts"], rows["dval"]):
            x = float(dval)
            y = x if first else alpha * x + beta * y
            first = False
            out_t.append(ts)
            out_v.append(y)
        if out_t:
            state.update((float(y),))
            yield pd.DataFrame(
                {"series_key": key[0], "ts": out_t, "dval": out_v}
            )

    return _emit


def ewma_stream(points_stream: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Per-series streaming EWMA; append-mode, one state double per
    series. Non-numeric samples filtered like the batch kernel. Input
    needs ``series_key`` (``model.with_series_key``)."""
    return (
        points_stream.select("series_key", "ts", "dval")
        .where("dval IS NOT NULL")
        .groupBy("series_key")
        .applyInPandasWithState(
            _make_emitter(alpha),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

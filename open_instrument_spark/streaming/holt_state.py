"""Stateful streaming Holt forecast — the streaming twin of
``resample.holt`` (seventh member of the stateful-mutation family).
State is TWO doubles per series (level l, trend b); every input emits
exactly one output (the one-step forecast l+b), so cumulative stream
output equals the batch kernel bit-for-bit when α, β are binary-exact
(defaults 1/4, 1/2) — asserted across micro-batch boundaries by
``test_streaming_holt_matches_batch_across_batches``.

Ordering contract (family-wide): rows sorted within each micro-batch,
state links batches in arrival order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "series_key string, ts timestamp, dval double"
STATE_SCHEMA = "l double, b double"


def _make_emitter(alpha: float, beta: float):
    ac = 1.0 - alpha
    bc = 1.0 - beta

    def _emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "dval"], kind="mergesort")
        if state.exists:
            l, b = state.get
            first = False
        else:
            l = b = 0.0
            first = True
        out_t = []
        out_v = []
        for ts, dval in zip(rows["ts"], rows["dval"]):
            x = float(dval)
            if first:
                l, b = x, 0.0
                first = False
            else:
                lp = l
                l = alpha * x + ac * (l + b)
                b = beta * (l - lp) + bc * b
            out_t.append(ts)
            out_v.append(l + b)
        if out_t:
            state.update((float(l), float(b)))
            yield pd.DataFrame(
                {"series_key": key[0], "ts": out_t, "dval": out_v}
            )

    return _emit


def holt_stream(points_stream: DataFrame, alpha: float = 0.25,
                beta: float = 0.5) -> DataFrame:
    """Per-series streaming Holt one-step forecast; append-mode, two
    state doubles per series. Non-numeric samples filtered like the
    batch kernel. Input needs ``series_key``
    (``model.with_series_key``)."""
    return (
        points_stream.select("series_key", "ts", "dval")
        .where("dval IS NOT NULL")
        .groupBy("series_key")
        .applyInPandasWithState(
            _make_emitter(alpha, beta),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Stateful streaming CUSUM drift detector — the streaming twin of
``resample.cusum`` (eleventh member of the stateful-mutation family),
and the member that most WANTS to be a stream: CUSUM is an alerting
statistic, so its natural home is the live ingest path, not a batch
replay. State is (reference level t = first value + slack, accumulator
c); every input emits exactly one output, so cumulative stream output
equals the batch kernel bit-for-bit (one IEEE subtract/add/max per
step; signed zero normalized with +0.0 on both sides) — asserted
across micro-batch boundaries by
``test_streaming_cusum_matches_batch_across_batches``.

Ordering contract (family-wide): rows sorted (ts, dval) within each
micro-batch, state links batches in arrival order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "series_key string, ts timestamp, dval double"
STATE_SCHEMA = "t double, c double"


def _make_emitter(slack: float):
    def _emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "dval"], kind="mergesort")
        if state.exists:
            t, c = state.get
            first = False
        else:
            t = c = 0.0
            first = True
        out_t = []
        out_v = []
        for ts, dval in zip(rows["ts"], rows["dval"]):
            x = float(dval)
            if first:
                t = x + slack
                first = False
            c = max(0.0, c + (x - t))
            out_t.append(ts)
            out_v.append(c + 0.0)
        if out_t:
            state.update((float(t), float(c)))
            yield pd.DataFrame(
                {"series_key": key[0], "ts": out_t, "dval": out_v}
            )

    return _emit


def cusum_stream(points_stream: DataFrame, slack: float = 0.0) -> DataFrame:
    """Per-series streaming one-sided CUSUM; append-mode, two state
    doubles per series. Non-numeric samples filtered like the batch
    kernel. Input needs ``series_key`` (``model.with_series_key``)."""
    return (
        points_stream.select("series_key", "ts", "dval")
        .where("dval IS NOT NULL")
        .groupBy("series_key")
        .applyInPandasWithState(
            _make_emitter(slack),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

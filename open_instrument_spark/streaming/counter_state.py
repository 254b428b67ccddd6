"""Stateful streaming counter health — the streaming twin of
``trend.counter_stats`` (thirteenth member of the stateful family, and
the first AGGREGATE twin that emits a running per-series summary rather
than per-point output). State is (last dval, n, resets, changes); each
micro-batch emits ONE row per touched series with the running totals,
so the last emitted row per series on a closed stream equals the batch
aggregate exactly (integers — no float caveats at all) — asserted by
``test_streaming_counter_stats_matches_batch``.

Ordering contract (family-wide): rows sorted by (ts, dval) within each
micro-batch, state links batches in arrival order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("series_key string, n_samples long, resets long, "
              "changes long")
STATE_SCHEMA = "last double, has_last boolean, n long, r long, c long"


def _emit(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs)).sort_values(["ts", "dval"], kind="mergesort")
    if state.exists:
        last, has_last, n, r, c = state.get
    else:
        last, has_last, n, r, c = 0.0, False, 0, 0, 0
    for dval in rows["dval"]:
        x = float(dval)
        n += 1
        if has_last:
            if x < last:
                r += 1
            if x != last:
                c += 1
        last, has_last = x, True
    if len(rows):
        state.update((float(last), bool(has_last), int(n), int(r), int(c)))
        yield pd.DataFrame(
            {"series_key": [key[0]], "n_samples": [n],
             "resets": [r], "changes": [c]}
        )


def counter_stats_stream(points_stream: DataFrame) -> DataFrame:
    """Per-series running resets/changes totals; append-mode, one
    summary row per touched series per micro-batch. Input needs
    ``series_key`` (``model.with_series_key``)."""
    return (
        points_stream.select("series_key", "ts", "dval")
        # NaN filtered like NULL (mirrors batch counter_stats): Python
        # float NaN comparisons (x != last → True, x < last → False)
        # disagree with Spark SQL NaN ordering, so NaN samples are
        # out-of-contract for both twins rather than silently divergent.
        .where("dval IS NOT NULL AND NOT isnan(dval)")
        .groupBy("series_key")
        .applyInPandasWithState(
            _emit,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

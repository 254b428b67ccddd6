"""Stateful streaming ``increase`` — the streaming twin of
``trend.increase`` (fourteenth member of the stateful family, second
AGGREGATE twin after counter_state). State is (current window, last
dval in it, running n, running reset-corrected sum); each micro-batch
emits one row per (series, window) it touched with the running totals,
so the last emitted row per (series, window) on a closed stream equals
the batch aggregate exactly (sum rounded 6 dp on both sides, the
standard float-fold convention).

Window semantics mirror the batch kernel bit-for-bit: epoch-aligned
tumbling windows; the FIRST sample of each (series, window) contributes
nothing (its growth belongs to the unseen gap before the window — the
lag window in trend.increase is partitioned by (series, window), so it
resets at every boundary); growth steps add ``v − prev``, a reset adds
``v``.

Ordering contract (family-wide): rows sorted by (ts, dval) within each
micro-batch, state links batches in arrival order; under the in-order
arrival contract a series' windows are visited monotonically, so state
only ever tracks the newest window (an older-window row would belong
to the batch/compaction layer, like every twin in the family). NaN is
filtered like NULL (the counter_state contract).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("series_key string, ts timestamp, n_samples long, "
              "increase double")
STATE_SCHEMA = ("win long, last double, has_last boolean, n long, s double")


def _emit_factory(interval_ms: int):
    win_us = interval_ms * 1000

    def _emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(
            ["ts", "dval"], kind="mergesort")
        if state.exists:
            win, last, has_last, n, s = state.get
        else:
            win, last, has_last, n, s = -1, 0.0, False, 0, 0.0
        touched: dict[int, tuple[int, float]] = {}
        fresh = 0  # rows landed in `win` THIS batch (0 for the
        # state-carried window, so a batch that immediately opens a new
        # window does not re-emit the previous window's final row)
        for ts, dval in zip(rows["ts"], rows["dval"]):
            x = float(dval)
            w = (ts.value // 1000) // win_us * win_us  # ns -> µs -> window
            if w != win:
                if win >= 0 and fresh:
                    touched[win] = (n, s)
                win, has_last, n, s, fresh = w, False, 0, 0.0, 0
            n += 1
            fresh += 1
            if has_last:
                s += (x - last) if x >= last else x
            last, has_last = x, True
        if len(rows):
            touched[win] = (n, s)
            state.update((int(win), float(last), bool(has_last),
                          int(n), float(s)))
            yield pd.DataFrame({
                "series_key": [key[0]] * len(touched),
                "ts": [pd.Timestamp(w, unit="us") for w in touched],
                "n_samples": [v[0] for v in touched.values()],
                "increase": [round(v[1], 6) for v in touched.values()],
            })

    return _emit


def increase_stream(points_stream: DataFrame,
                    interval_ms: int = 86_400_000) -> DataFrame:
    """Per-(series, window) running reset-corrected counter growth;
    append-mode, one summary row per touched (series, window) per
    micro-batch. Input needs ``series_key``
    (``model.with_series_key``)."""
    return (
        points_stream.select("series_key", "ts", "dval")
        .where("dval IS NOT NULL AND NOT isnan(dval)")
        .groupBy("series_key")
        .applyInPandasWithState(
            _emit_factory(interval_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

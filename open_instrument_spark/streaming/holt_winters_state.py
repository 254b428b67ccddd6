"""Stateful streaming Holt-Winters additive seasonal forecast — the
streaming twin of ``resample.holt_winters`` (tenth member of the
stateful-mutation family). State is (sample count, level, trend, the
``period`` seasonal slots); every input emits exactly one output (the
one-step forecast l + b + next slot), so cumulative stream output
equals the batch kernel bit-for-bit when α, β, γ are binary-exact
(defaults 1/4, 1/2, 1/4) — asserted across micro-batch boundaries by
``test_streaming_holt_winters_matches_batch_across_batches``.

Ordering contract (family-wide): rows sorted (ts, dval) within each
micro-batch, state links batches in arrival order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "series_key string, ts timestamp, dval double"
STATE_SCHEMA = "n long, l double, b double, sl array<double>"


def _make_emitter(alpha: float, beta: float, gamma: float, period: int):
    ac = 1.0 - alpha
    bc = 1.0 - beta
    gc = 1.0 - gamma

    def _emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "dval"], kind="mergesort")
        if state.exists:
            n, l, b, sl = state.get
            sl = list(sl)
        else:
            n, l, b = 0, 0.0, 0.0
            sl = [0.0] * period
        out_t = []
        out_v = []
        for ts, dval in zip(rows["ts"], rows["dval"]):
            x = float(dval)
            ph = n % period
            if n == 0:
                l, b = x, 0.0
            else:
                sp = sl[ph]
                lp = l
                l = alpha * (x - sp) + ac * (l + b)
                b = beta * (l - lp) + bc * b
                sl[ph] = gamma * (x - l) + gc * sp
            out_t.append(ts)
            out_v.append(l + b + sl[(n + 1) % period])
            n += 1
        if out_t:
            state.update((int(n), float(l), float(b),
                          [float(v) for v in sl]))
            yield pd.DataFrame(
                {"series_key": key[0], "ts": out_t, "dval": out_v}
            )

    return _emit


def holt_winters_stream(points_stream: DataFrame, alpha: float = 0.25,
                        beta: float = 0.5, gamma: float = 0.25,
                        period: int = 24) -> DataFrame:
    """Per-series streaming Holt-Winters one-step forecast;
    append-mode, state = count + two doubles + ``period`` slots per
    series. Non-numeric samples filtered like the batch kernel. Input
    needs ``series_key`` (``model.with_series_key``)."""
    return (
        points_stream.select("series_key", "ts", "dval")
        .where("dval IS NOT NULL")
        .groupBy("series_key")
        .applyInPandasWithState(
            _make_emitter(alpha, beta, gamma, period),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

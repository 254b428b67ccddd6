"""Stateful streaming SLO burn-rate — the streaming twin of
``plans.alerts.slo_burn_rate`` (fifteenth member of the stateful
family, and the first twin keyed by WINDOW rather than series: the
burn-rate page is a global decision, so the natural state cell is one
LONG window owning its short windows).

State per long window: parallel arrays of (short-window start,
traffic, bad traffic). Each micro-batch folds its rows into the
touched long windows' accumulators and emits one row per short window
CURRENTLY in each touched long window — all of them, not just the
batch-touched shorts, because a new batch moves the long window's burn
and with it every short row's ``burn_long``/``page``. Last emitted row
per short-window ``ts`` on a closed stream therefore equals the batch
operator exactly (ratios rounded 6 dp on both sides, the family float
convention; the page decision compares unrounded burns, knife-edge
landings measure-zero like the batch operator's own contract).

State is bounded by long/short (e.g. 7 rows at 1d/7d) per live long
window — the smallest state cell in the family.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("ts timestamp, traffic double, burn_short double, "
              "burn_long double, page boolean")
STATE_SCHEMA = "wins array<long>, traf array<double>, bad array<double>"


def _emit_factory(budget: float, factor: float):
    def _emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        if state.exists:
            wins, traf, bad = (list(x) for x in state.get)
        else:
            wins, traf, bad = [], [], []
        idx = {w: i for i, w in enumerate(wins)}
        # accumulation order within a sum is association-only (rounded
        # 6 dp at emit, the family convention); sort keeps replays
        # deterministic
        rows = rows.sort_values(["sws", "dval"], kind="mergesort")
        for sws, dval, is_bad in zip(rows["sws"], rows["dval"], rows["bad"]):
            i = idx.get(int(sws))
            if i is None:
                i = len(wins)
                idx[int(sws)] = i
                wins.append(int(sws))
                traf.append(0.0)
                bad.append(0.0)
            traf[i] += float(dval)
            if is_bad:
                bad[i] += float(dval)
        if not len(rows):
            return
        state.update((list(wins), [float(x) for x in traf],
                      [float(x) for x in bad]))
        lt = 0.0
        lb = 0.0
        for i in range(len(wins)):
            lt += traf[i]
            lb += bad[i]
        # zero accumulated traffic (dval=0 rows pass the isNotNull
        # filter) must NOT divide: the batch operator's SQL division
        # yields a NULL burn there, and an exception in this emitter
        # would crash the Python worker (the stream hangs retrying).
        # Mirror the NULL, including SQL three-valued AND for page.
        burn_long = lb / lt / budget if lt != 0.0 else None
        order = sorted(range(len(wins)), key=lambda i: wins[i])
        burns = [bad[i] / traf[i] / budget if traf[i] != 0.0 else None
                 for i in order]

        def page(b):
            c1 = None if b is None else b > factor
            c2 = None if burn_long is None else burn_long > factor
            if c1 is False or c2 is False:
                return False
            if c1 is None or c2 is None:
                return None
            return True

        yield pd.DataFrame({
            "ts": [pd.Timestamp(wins[i], unit="us") for i in order],
            "traffic": [round(traf[i], 6) for i in order],
            "burn_short": pd.Series(
                [None if b is None else round(b, 6) for b in burns],
                dtype=object),
            "burn_long": pd.Series(
                [None if burn_long is None else round(burn_long, 6)]
                * len(order), dtype=object),
            "page": pd.Series([page(b) for b in burns], dtype=object),
        })

    return _emit


def slo_burn_stream(points_stream: DataFrame, bad, slo: float = 0.95,
                    short_ms: int = 86_400_000,
                    long_ms: int = 604_800_000,
                    factor: float = 1.0) -> DataFrame:
    """Running multiwindow burn rate per short window; append-mode, one
    row per (long window, short window) per micro-batch that touched
    the long window. Same contract as the batch operator: ``bad`` is a
    boolean Column over the stream's columns, traffic weighted by
    ``dval``, long windows must tile short ones."""
    if long_ms % short_ms != 0:
        raise ValueError(
            f"long window ({long_ms} ms) must tile short ({short_ms} ms)")
    budget = 1.0 - slo
    if budget <= 0:
        raise ValueError("slo must be < 1")
    short_us = short_ms * 1000
    long_us = long_ms * 1000
    keyed = points_stream.where(F.col("dval").isNotNull()).select(
        (F.unix_micros(F.col("ts").cast("timestamp"))
         .cast("long") / long_us).cast("long").alias("lts"),
        ((F.unix_micros(F.col("ts").cast("timestamp"))
          .cast("long") / short_us).cast("long") * short_us).alias("sws"),
        "dval",
        bad.alias("bad"),
    )
    return keyed.groupBy("lts").applyInPandasWithState(
        _emit_factory(budget, factor),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Stateful streaming RATE (M1/M2 as a stream operator).

The batch ``mutate.rate`` needs each series' total order (a lag window);
on a stream the same semantics fall out of a per-series last-sample
state machine: carry ``(last_ts, last_dval)`` across micro-batches in
``applyInPandasWithState`` (the pattern of ``streaming/rle_state.py``),
emit ``(v - pv) / (t - pt)`` per arriving sample, drop negatives unless
``signed`` (counter-reset suppression, server/store.cc:301-318).

Arithmetic parity with batch: timestamps become fractional epoch seconds
exactly as ``model.epoch_seconds`` (µs / 1e6 — the same IEEE division
Spark's timestamp→double cast performs), so a rate computed here is
bit-identical to the batch operator's for in-order input.

Ordering contract: rows are sorted WITHIN each micro-batch, and state
links batches in arrival order — the streaming analog of the reference's
append-path assumption (server/store.cc:309 computes rates in record
order). A sample arriving in a later batch with an older timestamp than
the state's last is DROPPED (t > pt guard), mirroring how the batch
operator would never pair it backwards; fully late-tolerant rate belongs
to the batch/compaction pass over the store (streaming/ingest.py's
declared design).

State is one row per live series — bounded by series cardinality, the
same budget the reference spends on its live map
(disk_datastore.h:230-234).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RATE_SCHEMA = "series_key string, ts timestamp, dval double"
STATE_SCHEMA = "last_us long, last_v double"


def _make_emitter(signed: bool):
    def _emit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # Stable sort + dval tie-break: duplicate (series, ts) samples
        # (which ingest.dedup normally removes upstream) resolve
        # deterministically; the batch window is partition-order-arbitrary
        # on such ties, so determinism here is the stronger contract.
        rows = pd.concat(list(pdfs)).sort_values(["ts", "dval"], kind="mergesort")
        if state.exists:
            last_us, last_v = state.get
        else:
            last_us, last_v = None, None

        out_t: list[int] = []
        out_v: list[float] = []
        for ts, dval in zip(rows["ts"], rows["dval"]):
            us = ts.value // 1000  # pandas ns → µs
            if last_us is not None and us > last_us:
                # identical IEEE ops to the batch plan: t = µs / 1e6
                r = (dval - last_v) / (us / 1e6 - last_us / 1e6)
                if signed or r >= 0:
                    out_t.append(us)
                    out_v.append(r)
            # >= : a later equal-ts sample REPLACES the carried value
            # (mirrors batch lag, where the last equal-ts row becomes the
            # next row's predecessor; the equal-ts pair itself emits
            # nothing under the t > pt guard on either path)
            if last_us is None or us >= last_us:
                last_us, last_v = us, dval
        state.update((int(last_us), float(last_v)))
        if out_t:
            yield pd.DataFrame(
                {
                    "series_key": key[0],
                    "ts": pd.to_datetime(out_t, unit="us"),
                    "dval": out_v,
                }
            )

    return _emit


def rate_stream(points_stream: DataFrame, signed: bool = False) -> DataFrame:
    """Per-series rate of a points stream; append-mode output (each rate
    row emitted once, when its sample arrives). ``signed=True`` keeps
    negative rates (M2). NoTimeout: series state lives as long as the
    query — the reference never expires live series either.

    Non-numeric samples (dval NULL — e.g. string-valued points) are
    filtered BEFORE the state machine, matching the batch operator which
    rates numeric samples only; letting them through would poison the
    carried ``last_v`` with NaN and corrupt the next numeric sample's
    rate."""
    return (
        points_stream.select("series_key", "ts", "dval")
        .where("dval IS NOT NULL")
        .groupBy("series_key")
        .applyInPandasWithState(
            _make_emitter(signed),
            outputStructType=RATE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""GetRequest-shaped query API (SURVEY.md §3).

The reference's query "language" is the ``GetRequest`` protobuf
(lib/openinstrument.proto:91-135): variable matcher + time range +
mutations + aggregations + caps, executed imperatively in
server/store.cc:105-274. Here the same request shape compiles to ONE
declarative DataFrame — Catalyst is the analyzer/optimizer/executor
(stages 2-5 of the reference's lifecycle collapse into plan
construction).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from open_instrument_spark.functions.durations import parse_duration_ms
from open_instrument_spark.operators import mutate as _mutate
from open_instrument_spark.operators import select as _select
from open_instrument_spark.operators.aggregate import (
    DEFAULT_SAMPLE_INTERVAL_MS,
    aggregate as _aggregate,
)


@dataclass
class GetRequest:
    """Mirror of lib/openinstrument.proto:91-135 (the fields the servers
    actually honor — SURVEY.md §3.1/3.2)."""

    variable: str
    min_timestamp: dt.datetime | None = None
    max_timestamp: dt.datetime | None = None
    # [(kind, interval|None[, max_gap_interpolate])] — optional third
    # element mirrors the proto's per-mutation gap cap (proto:51)
    mutations: list[tuple] = field(default_factory=list)
    aggregation: str | None = None                            # sum/average/min/max/median
    aggregation_labels: list[str] = field(default_factory=list)
    sample_interval: int | str = DEFAULT_SAMPLE_INTERVAL_MS
    max_variables: int | None = None
    max_values: int | None = None
    chain_mutations: bool = True  # Go chaining vs C++ fan-out (SURVEY.md M11)
    # Reference default window: [now-1d, now] when no range is given
    # (server/store.cc:137-138). `now=None` disables defaulting (whole
    # history), since a batch engine usually wants explicit ranges.
    now: dt.datetime | None = None


def get(points: DataFrame, req: GetRequest) -> DataFrame | list[DataFrame]:
    """Execute a GetRequest against a points table.

    Mirrors the C++ lifecycle (server/store.cc:105-274): match → range →
    cap → mutate → aggregate. Returns one DataFrame (chained mutations /
    aggregation) or a list when fan-out mutations are requested without
    aggregation (C++ one-output-stream-per-mutation contract,
    lib/openinstrument.proto:117-119).
    """
    pts = _select.match_variables(points, req.variable)
    min_ts, max_ts = req.min_timestamp, req.max_timestamp
    if req.now is not None and min_ts is None and max_ts is None:
        min_ts, max_ts = req.now - dt.timedelta(days=1), req.now
    pts = _select.time_range(pts, min_ts, max_ts)
    if req.max_variables:
        pts = _select.cap_variables(pts, req.max_variables)

    if req.mutations and not req.chain_mutations and not req.aggregation:
        streams = _mutate.fan_out(pts, req.mutations)
        if req.max_values:
            streams = [_select.last_n_per_series(s, req.max_values) for s in streams]
        return streams

    if req.mutations:
        pts = _mutate.pipeline(pts, req.mutations)

    if req.aggregation:
        interval = parse_duration_ms(req.sample_interval)
        return _aggregate(pts, req.aggregation, req.aggregation_labels or None, interval)

    if req.max_values:
        pts = _select.last_n_per_series(pts, req.max_values)
    return pts


def list_variables(points: DataFrame, pattern: str | None = None, **kw) -> DataFrame:
    """List RPC analog (S11)."""
    return _select.list_series(points, pattern, **kw)

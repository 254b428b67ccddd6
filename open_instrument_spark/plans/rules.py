"""Recording rules — periodically materialize a Get-pipeline result as
a new variable, the Prometheus-recording-rule shape a production TSDB
pairs with raw ingest (not in the reference, which recomputes every
/get from raw streams — north-star extension; SURVEY §2.9 family).

Why at 100 TB: dashboards and alerts re-evaluate the same expensive
expression (rate → aggregate over a fleet) every few seconds; a
recording rule evaluates it ONCE per interval over just that
interval's slice and stores the tiny result series, so readers scan
the derived store instead of the raw one. The evaluation engine is
exactly the request pipeline (`plans.api.get` — match → range → cap →
mutate → aggregate), so a rule computes precisely what the equivalent
ad-hoc request would.

Storage contract: each rule owns
``{rules_store}/{slug(output)}/win={window_start_us}`` — one
partition per evaluated window, written with ``overwrite``. That
makes a tick IDEMPOTENT per (rule, window) — re-running a tick (crash
recovery, backfill repair) replaces its own partition byte-for-byte
and can never touch a neighboring window or another rule — the same
isolation trick as the streaming sink's ``epoch=N`` dirs. Windows are
epoch-aligned tumbling ``interval``s: ``window_for(now)`` evaluates
the last COMPLETE window, so a tick never records a half-window that
a later tick would have to amend (late raw data belongs to a re-run
of that window's tick — same late-data ownership as the rest of the
batch layer).
"""

from __future__ import annotations

import datetime as dt
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from open_instrument_spark.functions.durations import parse_duration_ms
from open_instrument_spark.plans.api import GetRequest, get


@dataclass(frozen=True)
class RecordingRule:
    """``output`` is the recorded variable name; ``request`` is WHAT to
    evaluate (selector + mutations + aggregation — time range fields
    are overwritten per window); ``interval`` is both the evaluation
    cadence and the window width."""

    output: str
    request: GetRequest
    interval: str = "1h"


def _slug(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]+", "_", name.strip("/"))


_EPOCH = dt.datetime(1970, 1, 1)


def window_for(rule: RecordingRule, now) -> tuple[dt.datetime, dt.datetime]:
    """The last COMPLETE epoch-aligned window at ``now``: [start, end)
    with end = now floored to the interval. Naive-UTC arithmetic
    (never ``datetime.timestamp()``, which reads the host zone)."""
    iv_ms = parse_duration_ms(rule.interval)
    now_ms = int((now - _EPOCH).total_seconds() * 1000)
    end_ms = (now_ms // iv_ms) * iv_ms
    return (
        _EPOCH + dt.timedelta(milliseconds=end_ms - iv_ms),
        _EPOCH + dt.timedelta(milliseconds=end_ms),
    )


def evaluate_rule(points: DataFrame, rule: RecordingRule, now) -> DataFrame:
    """Run the rule's request over its window and shape the result as
    POINTS under ``rule.output``: per-series labels are KEPT for
    mutation-only rules (record <output>{orig labels} = expr), an
    aggregation's grouping label comes back as ``{label: value}``, and
    a name-level aggregation records one unlabeled series. The range
    filter is inclusive-both (D2), so the window end is excluded here
    to keep adjacent windows disjoint."""
    import dataclasses

    start, end = window_for(rule, now)
    req = dataclasses.replace(
        rule.request, min_timestamp=start, max_timestamp=end, now=None
    )
    out = get(points, req)
    if isinstance(out, list):
        raise ValueError(
            "recording rules require a single output stream set — use "
            "chain_mutations=True or an aggregation (C++ fan-out mode "
            "yields one output per mutation, which has no single name)"
        )
    out = out.filter(F.col("ts") < F.lit(end))
    cols = set(out.columns)
    if "dval" in cols:        # mutation-only: points-shaped already
        shaped = out.select(
            F.lit(rule.output).alias("name"), "labels", "ts", "dval",
            *(["sval"] if "sval" in cols else
              [F.lit(None).cast("string").alias("sval")]),
        )
    else:                     # aggregation: (name[, label_value[, label]], ts, value)
        if "label_value" in cols:
            label_name = (
                F.col("label") if "label" in cols
                else F.lit(rule.request.aggregation_labels[0])
            )
            labels = F.create_map(label_name, F.col("label_value"))
        else:
            labels = F.create_map().cast("map<string,string>")
        shaped = out.select(
            F.lit(rule.output).alias("name"), labels.alias("labels"),
            "ts", F.col("value").alias("dval"),
            F.lit(None).cast("string").alias("sval"),
        )
    return shaped


def record_rule(points: DataFrame, rules_store: str, rule: RecordingRule,
                now) -> str:
    """One tick of one rule: evaluate the last complete window and
    overwrite its ``win=`` partition. Returns the partition path."""
    start, _ = window_for(rule, now)
    win_us = int((start - _EPOCH).total_seconds() * 1_000_000)
    path = f"{rules_store}/{_slug(rule.output)}/win={win_us}"
    evaluate_rule(points, rule, now).write.mode("overwrite").parquet(path)
    return path


def read_rules(spark, rules_store: str,
               output: str | None = None) -> DataFrame:
    """Read the derived store back as points (all rules, or one
    rule's series). The ``win`` partition level is folded away."""
    path = rules_store if output is None else f"{rules_store}/{_slug(output)}"
    opts = {"basePath": path} if output is not None else {}
    df = spark.read.options(**opts).parquet(
        f"{path}/win=*" if output is not None else f"{path}/*/win=*"
    )
    return df.drop("win")


def run_rules_tick(points: DataFrame, rules_store: str,
                   rules: list[RecordingRule], now) -> dict[str, str]:
    """The maintenance-loop entry (pair with plans.maintenance's
    cadence): evaluate every rule's last complete window. Idempotent —
    repeating a tick rewrites the same partitions with the same rows.
    Returns {rule output: partition written}."""
    return {r.output: record_rule(points, rules_store, r, now)
            for r in rules}


def backfill_rule(points: DataFrame, rules_store: str,
                  rule: RecordingRule, start, end) -> list[str]:
    """Record every complete window of ``rule`` inside [start, end) —
    the repair/bootstrap path when a rule is added over an existing
    corpus (or a window's raw data arrived late). Just the tick in a
    loop: same per-window overwrite, so backfilling over already-
    recorded windows is a no-op rewrite, and a crashed backfill can
    simply be restarted. A window straddling ``start`` (when ``start``
    is not interval-aligned) is NOT recorded — the first window begins
    at ``start`` ceiled to the interval boundary, so no materialized
    data predates the requested range. Returns the partition paths
    written."""
    iv_ms = parse_duration_ms(rule.interval)
    iv = dt.timedelta(milliseconds=iv_ms)
    paths = []
    # First complete window inside [start, end): ceil start to the
    # interval boundary; the tick evaluating [ceil(start), ceil+iv)
    # runs at now = ceil(start) + iv (window_for floors).
    start_ms = int((start - _EPOCH).total_seconds() * 1000)
    first_ms = -(-start_ms // iv_ms) * iv_ms
    now = _EPOCH + dt.timedelta(milliseconds=first_ms + iv_ms)
    while window_for(rule, now)[1] <= end:
        paths.append(record_rule(points, rules_store, rule, now))
        now = now + iv
    return paths

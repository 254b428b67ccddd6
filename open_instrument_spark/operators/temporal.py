"""Temporal operators the reference lacks but a Spark time-series engine
gets almost for free: as-of join and sessionization.

The reference has no joins at all (SURVEY.md §2.6) — its closest notion
is merging streams that share a variable. These are the two temporal
primitives every metrics/feature pipeline eventually needs:

- ``as_of_join``: for each left event, the most recent right event with
  ``right.ts <= left.ts`` per key. Implemented WITHOUT a range join:
  union both sides, one window pass with ``last(..., ignorenulls)`` —
  one shuffle on the key, linear in rows, skew-bounded by key cardinality
  (a broadcast-range join would be quadratic in the worst case and a
  Cartesian trap at 100 TB).
- ``sessionize``: gap-based session aggregation via Spark's native
  ``session_window`` (merge-able in Structured Streaming with
  watermarks, same code batch or streaming).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(left: DataFrame, right: DataFrame, on: Sequence[str],
               ts: str = "ts", value_cols: Sequence[str] | None = None,
               tolerance=None, prefix: str = "r_") -> DataFrame:
    """Attach to each left row the latest right row with right.ts <= left.ts.

    ``on``: equality keys; ``value_cols``: right columns to carry (default:
    everything except keys and ts); ``tolerance``: optional max lookback
    (duration string or Column interval) — older matches become NULL.

    Plan shape: union → single shuffle+sort on ``on`` → one Window node →
    filter. At equal timestamps the right row is visible to the left row
    (ASOF ``<=`` semantics, matching DuckDB's ASOF JOIN).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*on, ts)]

    clashes = {f"{prefix}{c}" for c in (*value_cols, ts)} & set(left.columns)
    if clashes:
        raise ValueError(
            f"as_of_join output columns {sorted(clashes)} already exist on the "
            "left side — pass a different `prefix` (unionByName would silently "
            "merge them and corrupt the as-of values)"
        )

    # The right row travels as ONE struct so the as-of fill picks a whole
    # row atomically: per-column last(ignorenulls) would synthesize a row
    # mixing columns from different duplicate right rows when some values
    # are NULL. Struct ordering (field-lexicographic: ts, then values)
    # also makes duplicate (key, ts) right rows resolve deterministically
    # to the greatest value tuple — same convention as ingest.dedup.
    r = right.select(
        *on,
        F.col(ts).alias(ts),
        F.struct(
            F.col(ts).alias("_rts"),
            *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
        ).alias("_r"),
        F.lit(0).alias("_side"),
    )
    l = left.withColumn("_side", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    # Left rows sort after right rows at equal ts (_side 1 > 0), which
    # preserves ASOF <= visibility.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        merged.withColumn("_filled", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_side", "_r")
    )
    out = out.select(
        *[c for c in out.columns if c != "_filled"],
        F.col("_filled._rts").alias(f"{prefix}{ts}"),
        *[F.col(f"_filled.{prefix}{c}").alias(f"{prefix}{c}") for c in value_cols],
    ).drop("_filled")
    if tolerance is not None:
        tol = F.expr(f"INTERVAL '{tolerance}'") if isinstance(tolerance, str) else tolerance
        stale = F.col(f"{prefix}{ts}") < (F.col(ts) - tol)
        for c in [*[f"{prefix}{c}" for c in value_cols], f"{prefix}{ts}"]:
            out = out.withColumn(c, F.when(~stale, F.col(c)))
    return out


def sessionize(events: DataFrame, key: str | Column, gap: str = "30 minutes",
               ts: str = "ts", aggs: Sequence[Column] | None = None) -> DataFrame:
    """Gap-based sessions per key: events closer than ``gap`` merge.

    Native ``session_window`` — the same expression works in Structured
    Streaming (with a watermark) where sessions merge incrementally; in
    batch it is one shuffle on (key, overlapping-window) with AQE-managed
    partitioning. Output: key, session_start/session_end, n_events + aggs.
    """
    aggs = list(aggs) if aggs is not None else [F.round(F.sum("value"), 6).alias("sum_value")]
    sw = F.session_window(F.col(ts), gap)
    grouped = events.groupBy(key, sw.alias("session")).agg(
        F.count(F.lit(1)).alias("n_events"), *aggs
    )
    rest = [c for c in grouped.columns if c != "session"]
    key_col, tail = rest[0], rest[1:]
    return grouped.select(
        key_col,
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        *tail,
    )

"""Run-length encoding of equal-valued sample runs (SURVEY.md §2.7 W3).

Reference: consecutive equal values per series collapse into one record
whose ``end_timestamp`` extends through the run (write path
server/disk_datastore.cc:91-110, Go ValueStreamWriter
openinstrument.go:83-105; reindex-time server/record_log.cc:156-167).

In the Spark engine RLE is a *storage* optimization that Parquet's
dictionary/RLE encodings already provide, so the operator exists for
semantic parity (and for producing reference-shaped ``(ts, end_ts,
value)`` records): the classic gaps-and-islands window — run boundary =
value change, run id = prefix sum of boundaries — entirely inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_instrument_spark.operators.mutate import SERIES_KEY_COL, _with_key


_OUT_COLS = ("name", "labels", "ts", "end_ts", "dval", "sval", SERIES_KEY_COL, "run_len")


def _encode_within(pts: DataFrame, part_cols: list[str]) -> DataFrame:
    """Gaps-and-islands run encode partitioned by ``part_cols``."""
    w = Window.partitionBy(*part_cols).orderBy("ts")
    changed = (
        ~(
            F.col("dval").eqNullSafe(F.lag("dval").over(w))
            & F.col("sval").eqNullSafe(F.lag("sval").over(w))
        )
    ).cast("int")
    runs = pts.withColumn("_run", F.sum(changed).over(w))
    return (
        runs.groupBy("name", *part_cols, "_run")
        .agg(
            F.first("labels").alias("labels"),
            F.min("ts").alias("ts"),
            F.max("ts").alias("end_ts"),
            F.first("dval").alias("dval"),
            F.first("sval").alias("sval"),
            F.count(F.lit(1)).alias("run_len"),
        )
    )


def rle_encode(points: DataFrame, chunk=None) -> DataFrame:
    """Collapse per-series runs of equal values.

    Output: (name, labels, ts, end_ts, dval, sval, series_key, run_len);
    ts = first timestamp of the run, end_ts = last (equal to ts for
    singleton runs, mirroring an unset end_timestamp).

    ``chunk=None``: one window per series — fine at metric-fleet series
    sizes, but a whole series lands in one task. ``chunk`` (duration):
    bounded-task two-phase variant with identical output — encode within
    (series, time-chunk), then merge equal-valued runs across chunk
    boundaries; the merge pass touches only each chunk's head/tail runs
    (≤2 rows per non-empty chunk), so no stage ever holds a whole series.
    """
    pts = _with_key(points)
    if chunk is None:
        return _encode_within(pts, [SERIES_KEY_COL]).select(*_OUT_COLS)

    from open_instrument_spark.functions.durations import parse_duration_ms
    from open_instrument_spark.model import epoch_seconds

    chunk_ms = parse_duration_ms(chunk)
    pts = pts.withColumn(
        "_c",
        F.floor((epoch_seconds("ts") * 1000).cast("long") / F.lit(chunk_ms)),
    )
    runs = _encode_within(pts, [SERIES_KEY_COL, "_c"])

    # Per-chunk run index / count: only a chunk's FIRST and LAST runs can
    # merge across boundaries (interior runs already maximal — adjacent
    # equal values inside a chunk were merged by the encoder).
    wc = Window.partitionBy(SERIES_KEY_COL, "_c").orderBy("ts")
    runs = runs.withColumn("_rn", F.row_number().over(wc)).withColumn(
        "_nr", F.count(F.lit(1)).over(Window.partitionBy(SERIES_KEY_COL, "_c"))
    )
    interior = runs.filter((F.col("_rn") > 1) & (F.col("_rn") < F.col("_nr")))
    boundary = runs.filter((F.col("_rn") == 1) | (F.col("_rn") == F.col("_nr")))

    # Islands over the (small) boundary-run sequence per series: merge a
    # run into its predecessor only when values match AND the predecessor
    # is from a DIFFERENT chunk (the head/tail pair of a multi-run chunk
    # never merges; a single-run chunk is one row, letting chains pass
    # through arbitrarily many chunks).
    wb = Window.partitionBy(SERIES_KEY_COL).orderBy("ts")
    new_island = (
        ~(
            F.col("dval").eqNullSafe(F.lag("dval").over(wb))
            & F.col("sval").eqNullSafe(F.lag("sval").over(wb))
        )
        | (F.lag("_c").over(wb) == F.col("_c"))
    ).cast("int")
    merged = (
        boundary.withColumn("_island", F.sum(new_island).over(wb))
        .groupBy("name", SERIES_KEY_COL, "_island")
        .agg(
            F.first("labels").alias("labels"),
            F.min("ts").alias("ts"),
            F.max("end_ts").alias("end_ts"),
            F.first("dval").alias("dval"),
            F.first("sval").alias("sval"),
            F.sum("run_len").alias("run_len"),
        )
    )
    return interior.select(*_OUT_COLS).unionByName(merged.select(*_OUT_COLS))


def rle_expand(encoded: DataFrame) -> DataFrame:
    """Inverse for reference-shaped records: one row at ts and one at
    end_ts when they differ (the reference never re-materializes interior
    samples either — a run only records its endpoints)."""
    tail = (
        encoded.filter(F.col("end_ts") > F.col("ts"))
        .withColumn("ts", F.col("end_ts"))
    )
    return (
        encoded.unionByName(tail)
        .select("name", "labels", "ts", "dval", "sval", SERIES_KEY_COL)
    )

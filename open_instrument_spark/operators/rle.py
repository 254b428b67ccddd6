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


def rle_encode(points: DataFrame) -> DataFrame:
    """Collapse per-series runs of equal values.

    Output: (name, labels, ts, end_ts, dval, sval, series_key, run_len);
    ts = first timestamp of the run, end_ts = last (equal to ts for
    singleton runs, mirroring an unset end_timestamp).

    Scale note: the window puts one series per task (fine at metric-fleet
    series sizes). For pathological series, apply the chunked two-phase
    pattern of mutate._pairwise_chunked — encode within time-chunks, then
    merge equal-valued runs across chunk boundaries (a pass over the
    per-chunk head/tail runs only).
    """
    pts = _with_key(points)
    w = Window.partitionBy(SERIES_KEY_COL).orderBy("ts")
    changed = (
        ~(
            F.col("dval").eqNullSafe(F.lag("dval").over(w))
            & F.col("sval").eqNullSafe(F.lag("sval").over(w))
        )
    ).cast("int")
    runs = pts.withColumn("_run", F.sum(changed).over(w))
    return (
        runs.groupBy("name", SERIES_KEY_COL, "_run")
        .agg(
            F.first("labels").alias("labels"),
            F.min("ts").alias("ts"),
            F.max("ts").alias("end_ts"),
            F.first("dval").alias("dval"),
            F.first("sval").alias("sval"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .select(
            "name", "labels", "ts", "end_ts", "dval", "sval", SERIES_KEY_COL, "run_len"
        )
    )


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

"""Count-min sketch (CMS) — the frequency member of the classic
mergeable-sketch trio this engine ships (HLL++ distinct counts in
agg_distinct_series_hll, Greenwald-Khanna percentiles in
agg_p95_approx_by_name, CMS point frequencies here; Cormode &
Muthukrishnan 2005, public).

Why a sketch at 100 TB: "how often does label value v occur under
name n" over a metric fleet has unbounded key cardinality — the exact
answer needs a (name, value) aggregation whose state grows with the
data. The CMS bucket table is FIXED-SIZE per name (d rows × w
buckets, counts only), mergeable across partitions/time windows by
plain addition (it's just a groupBy-count — Spark's map-side partial
aggregation already merges it), and answers any point query with
  est(v) = min over d rows of bucket_count[h_d(v)]
which is ≥ the true count always, and ≤ true + (2/w)·N with
probability 1−(1/2)^d for each query.

Spark shape: the sketch build is ONE explode (d copies per row) + ONE
groupBy — all JVM expressions; estimates are a broadcast join of the
bounded probe set against the bounded bucket table + a min
aggregation. Nothing leaves whole-stage codegen.

Hashing is the repo's engine-portable md5 idiom (dedup_minhash_md5 /
simhash_md5 precedent): bucket_d(v) = first 8 md5 nibbles of
'cms{d}:{v}' as an int, mod w — Spark `conv(substr(md5(..)))` and
DuckDB `CAST('0x' || substr(md5(..)) AS BIGINT)` produce identical
values, so the ENTIRE sketch — build, probe, min — replays under the
value-hash gate (`agg_cms_label_counts`), unlike builtin sketch aggs
whose binary blobs are engine-private. Reference scope: the reference
has no sketches; north-star extension (SURVEY §2.9 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["cms_table", "cms_estimate"]


def _bucket(d_col, value_col, w: int):
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cms"), d_col.cast("string"),
                               F.lit(":"), value_col)),
                1, 8,
            ),
            16, 10,
        ).cast("long"),
        F.lit(w),
    )


def cms_table(df: DataFrame, key_col: str, value_col: str,
              d: int = 3, w: int = 256) -> DataFrame:
    """Build the bucket-count table: one row per (key, hash row,
    occupied bucket) with its count — at most d·w rows per key
    regardless of input size. NULL values are excluded (no frequency
    without a value). Output: (key_col, d, bucket, n)."""
    rows = df.select(key_col, F.col(value_col).alias("_v")).where(
        F.col(value_col).isNotNull()
    )
    exploded = rows.select(
        key_col, "_v",
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("d"),
    )
    return (
        exploded.select(
            key_col, "d", _bucket(F.col("d"), F.col("_v"), w).alias("bucket")
        )
        .groupBy(key_col, "d", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(table: DataFrame, key_col: str, probe_values: list,
                 d: int = 3, w: int = 256) -> DataFrame:
    """Point-frequency estimates for each (key, probe value): the min
    over the d hash rows of that value's bucket count, 0 when a bucket
    was never touched (the guaranteed-overestimate property needs the
    empty bucket to count as 0, hence the left join + coalesce).
    Probes are a literal set — broadcast against the bounded table.
    Output: (key_col, value, est)."""
    spark = table.sparkSession
    keys = table.select(key_col).distinct()
    probes = spark.createDataFrame([(str(v),) for v in probe_values],
                                   "value string")
    grid = (
        keys.crossJoin(F.broadcast(probes))
        .crossJoin(F.broadcast(
            spark.createDataFrame([(i,) for i in range(d)], "d int")))
        .select(key_col, "value", "d",
                _bucket(F.col("d"), F.col("value"), w).alias("bucket"))
    )
    return (
        grid.join(F.broadcast(table), [key_col, "d", "bucket"], "left")
        .select(key_col, "value", F.coalesce("n", F.lit(0)).alias("n"))
        .groupBy(key_col, "value")
        .agg(F.min("n").alias("est"))
    )

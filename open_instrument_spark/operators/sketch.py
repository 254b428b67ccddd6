"""Mergeable sketches: count-min (frequency) and Bloom (membership).

Together with HLL++ distinct counts (agg_distinct_series_hll) and
Greenwald-Khanna percentiles (agg_p95_approx_by_name) these complete
the classic mergeable-sketch family — CMS per Cormode & Muthukrishnan
2005, Bloom per Bloom 1970; both public.

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

from pyspark.sql import Column, DataFrame, functions as F

from open_instrument_spark.session import local_df

__all__ = [
    "cms_table", "cms_estimate",
    "bloom_bits", "bloom_bitmap", "bloom_hit_expr", "bloom_probe_join",
    "bloom_decontaminate",
]


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
    probes = local_df(spark, [(str(v),) for v in probe_values],
                      "value string")
    grid = (
        keys.crossJoin(F.broadcast(probes))
        .crossJoin(F.broadcast(
            local_df(spark, [(i,) for i in range(d)], "d int")))
        .select(key_col, "value", "d",
                _bucket(F.col("d"), F.col("value"), w).alias("bucket"))
    )
    return (
        grid.join(F.broadcast(table), [key_col, "d", "bucket"], "left")
        .select(key_col, "value", F.coalesce("n", F.lit(0)).alias("n"))
        .groupBy(key_col, "value")
        .agg(F.min("n").alias("est"))
    )


# ---- Bloom filter (membership) ---------------------------------------------
#
# Why at 100 TB: benchmark DECONTAMINATION joins every corpus shingle
# against the benchmark shingle set. dedup.contamination broadcasts the
# raw benchmark shingles — fine for eval sets, but once the "deny list"
# grows to billions of n-grams (all past eval suites + user opt-outs)
# the raw set no longer broadcasts. A Bloom filter is FIXED-SIZE (m
# bits, chosen up front), mergeable by bitwise OR (the bit TABLE below
# merges by plain union-distinct — Spark's partial aggregation does
# it map-side), never false-negative, and its false-positive rate
# (1 - e^(-kn/m))^k is a knob. The filter ships to executors as a
# literal/broadcast, so the corpus side joins nothing; its only
# exchange is the per-doc rollup of map-side pre-combined rows.
#
# Hashing reuses the CMS md5 idiom, but all k bits come from ONE md5:
# bit_j(v) = nibbles [8j+1, 8j+8) of md5('bloom:{v}') mod m (k <= 4 —
# disjoint 32-bit windows of one digest; the standard cheap-hash-family
# Bloom construction, strictly stronger than Kirsch-Mitzenmacher double
# hashing). One digest per value is k× less hashing than the first
# cut's per-j salted digests, and the explode form (vs an interpreted
# higher-order filter) keeps the probe in whole-stage codegen with
# map-side partial aggregation. NB the dominant LOCAL cost factor is
# input parallelism, not the expression: the testdata corpus is one
# parquet row group, so callers repartition before this heavy map
# (query-layer shim; many-file production scans parallelize for free).
# Build + probe replay exactly in DuckDB so the whole pipeline sits
# under the driver's value-hash gate (dedup_bloom_contaminated), false
# positives included: they are deterministic, identical in both
# engines.


def _bloom_bit_exprs(value_col: Column, k: int, m: int) -> list[Column]:
    if not 1 <= k <= 4:
        raise ValueError(f"k must be in [1, 4] (disjoint md5 windows), got {k}")
    h = F.md5(F.concat(F.lit("bloom:"), value_col))
    return [
        F.pmod(
            F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("long"),
            F.lit(m),
        )
        for j in range(k)
    ]


def bloom_bits(df: DataFrame, value_col: str, k: int = 4,
               m: int = 8192) -> DataFrame:
    """Distributed build: the DISTINCT set bit positions for every
    value — at most ``m`` rows regardless of input size. This is the
    mergeable representation (merge = union-distinct; Spark's
    map-side partial dedup keeps the shuffle bounded by m per
    partition). Output: (bit long)."""
    vals = df.select(F.col(value_col).alias("_v")).where(
        F.col("_v").isNotNull()
    )
    return (
        vals.select(
            F.explode(F.array(*_bloom_bit_exprs(F.col("_v"), k, m)))
            .alias("bit")
        )
        .distinct()
    )


def bloom_bitmap(bits: DataFrame, m: int) -> str:
    """Collapse the bit table to a '0'/'1' string of length ``m`` — the
    broadcastable probe-side form. Driver materialization is bounded by
    m (a model artifact, like codebooks/centroids): keep m ≤ ~16M for
    this literal-string path; beyond that use :func:`bloom_probe_join`,
    which never leaves the cluster."""
    positions = {r["bit"] for r in bits.collect()}
    return "".join("1" if i in positions else "0" for i in range(m))


def bloom_hit_expr(value_col: Column, bitmap: str, k: int = 4,
                   m: int | None = None) -> Column:
    """Pure-JVM membership test: true iff all k bits for the value are
    set in the literal bitmap — one md5 per value. Codegen-friendly as
    a plain column over exploded rows (the fast path); also usable
    inside higher-order functions when avoiding the explode matters
    more than the interpreted-lambda constant."""
    m = len(bitmap) if m is None else m
    checks = [
        F.lit(bitmap).substr((b + 1).cast("int"), F.lit(1)) == "1"
        for b in _bloom_bit_exprs(value_col, k, m)
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_probe_join(bits: DataFrame, probes: DataFrame, value_col: str,
                     k: int = 4, m: int = 8192) -> DataFrame:
    """Large-m probe path: broadcast-join each probe value's k bit
    positions against the bit table; present iff all k matched. The
    probe side keeps its partitioning (broadcast join), then one
    count-distinct-j aggregation per value. Output: probes' columns +
    ``maybe_present`` boolean."""
    cols = probes.columns
    expl = probes.select(
        *cols,
        F.explode(F.array(*_bloom_bit_exprs(F.col(value_col), k, m)))
        .alias("bit"),
    )
    # left join (bits is distinct — no fan-out), not left_semi: a value
    # with NO set bits must still emit maybe_present=false.
    return (
        expl.join(F.broadcast(bits.withColumn("_in", F.lit(1))), "bit", "left")
        .groupBy(*cols)
        .agg(F.sum(F.coalesce("_in", F.lit(0))).alias("_hits"))
        .select(*cols, (F.col("_hits") == k).alias("maybe_present"))
    )


def bloom_decontaminate(docs: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", shingle_k: int = 5,
                        k: int = 4, m: int = 8192) -> DataFrame:
    """Bloom-filter decontamination: count each training doc's distinct
    word ``shingle_k``-gram shingles that MAY appear in the benchmark
    shingle set (never-false-negative superset of
    :func:`dedup.contamination` hits — property-tested).

    100 TB shape: the benchmark side collapses to an m-bit filter
    (bounded driver materialization) shipped as a literal — the corpus
    side never joins ANYTHING. The probe is explode-shingles → one md5
    per shingle → k codegen substr checks against the literal bitmap →
    count, with map-side partial aggregation collapsing to one row per
    doc before the single (doc_id) exchange. (A shuffle-free
    higher-order-filter form exists via :func:`bloom_hit_expr` inside
    ``F.filter``; the explode form is preferred — codegen, partial
    aggregation, and one digest per shingle.) Output: (doc_id,
    n_shingles, n_maybe_hits, flagged) with flagged = n_maybe_hits ≥ 2
    (mirrors contamination's min_overlap=2).
    """
    from open_instrument_spark.operators.dedup import shingles

    b_sh = benchmark.select(
        F.explode(shingles(F.col(text_col), shingle_k)).alias("sh")
    )
    bitmap = bloom_bitmap(bloom_bits(b_sh, "sh", k=k, m=m), m)
    exploded = docs.select(
        "doc_id",
        shingles(F.col(text_col), shingle_k).alias("_shs"),
    ).select(
        "doc_id",
        F.size("_shs").alias("n_shingles"),
        F.explode("_shs").alias("sh"),
    )
    hit = bloom_hit_expr(F.col("sh"), bitmap, k=k, m=m)
    return (
        exploded
        .groupBy("doc_id")
        .agg(
            F.max("n_shingles").alias("n_shingles"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("int")
            .alias("n_maybe_hits"),
        )
        .select(
            "doc_id", "n_shingles", "n_maybe_hits",
            (F.col("n_maybe_hits") >= 2).alias("flagged"),
        )
    )

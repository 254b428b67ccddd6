"""TSDB-core queries: flagship, selection F1-F9/S11, mutations M1-M9,
aggregations A2-A8, grid resampling M4/M7, retention W1, RLE W3,
ingest S1-S5, /export render. See registry.py for the oracle-parity
conventions these follow."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_instrument_spark.operators import aggregate as agg_ops
from open_instrument_spark.operators import mutate, select
from open_instrument_spark.registry_base import (
    NOW,
    ORACLES,
    P_CTE,
    R_CTE,
    _bucket_sql,
    _pts,
    _raw,
    query,
)
from open_instrument_spark.session import prepare
from open_instrument_spark.sources.tables import load_tables

# ===========================================================================
# Flagship (SURVEY.md §7.2 step 1): scan → filter → per-series rate →
# epoch-aligned 5-minute windows → sum by variable name.
# ===========================================================================

@query(
    "flagship_rate_sum",
    oracle=f"""
WITH {P_CTE}, {R_CTE}
SELECT name,
       {_bucket_sql(300_000)} AS ts,
       round(sum((dval - pv) / (t - pt)), 6) AS sum_rate
FROM r
WHERE pt IS NOT NULL AND t > pt AND (dval - pv) / (t - pt) >= 0
GROUP BY 1, 2
""",
)
def flagship_rate_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum of per-second rates of every /events/* series, 5-min tumbling
    windows, grouped by variable name (M1 + A3/A7)."""
    pts = _pts(spark, sf_dir)
    rated = mutate.rate(pts)
    out = agg_ops.aggregate_by_name(rated, "sum", 300_000)
    return out.select("name", "ts", F.round("value", 6).alias("sum_rate"))


def run_entry(spark: SparkSession) -> DataFrame:
    """Driver smoke check: flagship at sf0.001."""
    return flagship_rate_sum(spark, "/root/testdata/sf0.001")


# ===========================================================================
# Selection: F1-F9 + S11 List
# ===========================================================================

@query(
    "select_exact_name_label_range",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, ts, dval
FROM p
WHERE name = '/events/click' AND user_id = '7'
  AND ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'
""",
)
def select_exact_name_label_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 exact name + F3 label equality + F7 inclusive time range."""
    pts = select.match_variables(_pts(spark, sf_dir), "/events/click{user_id=7}")
    pts = select.time_range(pts, "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    return _raw(pts)


@query(
    "select_prefix_glob",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, ts, dval FROM p WHERE name LIKE '/events/s%'
""",
)
def select_prefix_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 trailing-star prefix glob."""
    return _raw(select.match_variables(_pts(spark, sf_dir), "/events/s*"))


@query(
    "select_label_present",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, ts, dval FROM p WHERE k IS NOT NULL
""",
)
def select_label_present(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 label presence ({k=*})."""
    return _raw(select.match_variables(_pts(spark, sf_dir), "/events/*{k=*}"))


@query(
    "select_label_absent",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, ts, dval FROM p WHERE k IS NULL
""",
)
def select_label_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 label absence ({k=}) — Go-only feature, supported."""
    return _raw(select.match_variables(_pts(spark, sf_dir), "/events/*{k=}"))


@query(
    "select_label_regex",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, ts, dval FROM p WHERE regexp_full_match(k, '4[0-9]')
""",
)
def select_label_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 anchored label regex ({k=/4[0-9]/}) — C++-only feature, supported."""
    return _raw(select.match_variables(_pts(spark, sf_dir), "/events/*{k=/4[0-9]/}"))


@query(
    "select_last_n_per_series",
    oracle=f"""
WITH {P_CTE},
ranked AS (
  SELECT series_key, ts, dval,
         row_number() OVER (PARTITION BY series_key ORDER BY ts DESC, dval DESC) AS rn
  FROM p
)
SELECT series_key, ts, dval FROM ranked WHERE rn <= 2
""",
)
def select_last_n_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 max_values: newest 2 values per series (go/src/store.go:151-153).
    Uses the library operator directly — its (dval, sval) desc tie-break
    matches the oracle's ts DESC, dval DESC ordering."""
    out = select.last_n_per_series(_pts(spark, sf_dir), 2)
    return out.select("series_key", "ts", "dval")


@query(
    "select_max_variables",
    oracle=f"""
WITH {P_CTE},
kept AS (SELECT DISTINCT series_key FROM p ORDER BY series_key LIMIT 25)
SELECT p.series_key, p.ts, p.dval FROM p JOIN kept USING (series_key)
""",
)
def select_max_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 max_variables: first 25 series in canonical-key order."""
    return _raw(select.cap_variables(_pts(spark, sf_dir), 25))


@query(
    "list_series",
    oracle=f"""
WITH {P_CTE}
SELECT name, series_key, max(ts) AS last_ts
FROM p
GROUP BY name, series_key
HAVING max(ts) >= TIMESTAMP '{NOW}' - INTERVAL 7 DAY
""",
)
def list_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 List RPC: distinct fresh series (max_age = 7 d of pinned NOW)."""
    out = select.list_series(
        _pts(spark, sf_dir), "/events/*", max_age_ms=7 * 86_400_000, now=NOW
    )
    return out.select("name", "series_key", "last_ts")


@query(
    "list_max_variables",
    oracle=f"""
WITH {P_CTE},
g AS (
  SELECT name, series_key, max(ts) AS last_ts
  FROM p
  GROUP BY name, series_key
  HAVING max(ts) >= TIMESTAMP '{NOW}' - INTERVAL 7 DAY
)
SELECT name, series_key, last_ts FROM g ORDER BY series_key LIMIT 40
""",
)
def list_max_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11×F8 interaction: List RPC truncated by max_variables
    (server/store.cc:365-367) — first 40 fresh series in canonical-key
    order. Deterministic because series_key is unique per group."""
    out = select.list_series(
        _pts(spark, sf_dir), "/events/*", max_age_ms=7 * 86_400_000,
        max_variables=40, now=NOW,
    )
    return out.select("name", "series_key", "last_ts")


# ===========================================================================
# Per-stream mutations M1-M3, M5, M6, M8, M9
# ===========================================================================

_RATE_EXPR = "(dval - pv) / (t - pt)"


@query(
    "mutate_rate",
    oracle=f"""
WITH {P_CTE}, {R_CTE}
SELECT series_key, ts, {_RATE_EXPR} AS dval
FROM r WHERE pt IS NOT NULL AND t > pt AND {_RATE_EXPR} >= 0
""",
)
def mutate_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 RATE per second, negatives dropped. Compared EXACTLY (the same
    IEEE ops run on both engines)."""
    return _raw(mutate.rate(_pts(spark, sf_dir)))


@query(
    "mutate_rate_chunked",
    oracle=f"""
WITH {P_CTE}, {R_CTE}
SELECT series_key, ts, {_RATE_EXPR} AS dval
FROM r WHERE pt IS NOT NULL AND t > pt AND {_RATE_EXPR} >= 0
""",
)
def mutate_rate_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 RATE via the two-phase CHUNKED plan (bounded task size for
    arbitrarily long series: within-chunk lags + per-chunk boundary
    handoff). Same oracle as mutate_rate — the exact-match gate proves
    the chunked algorithm bitwise-identical to the single-window one."""
    return _raw(mutate.rate(_pts(spark, sf_dir), chunk="1d"))


@query(
    "mutate_rate_signed",
    oracle=f"""
WITH {P_CTE}, {R_CTE}
SELECT series_key, ts, {_RATE_EXPR} AS dval
FROM r WHERE pt IS NOT NULL AND t > pt
""",
)
def mutate_rate_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 RATE_SIGNED: negatives kept."""
    return _raw(mutate.rate_signed(_pts(spark, sf_dir)))


@query(
    "mutate_delta",
    oracle=f"""
WITH {P_CTE}, {R_CTE}
SELECT series_key, ts, dval - pv AS dval
FROM r WHERE pt IS NOT NULL AND t > pt AND dval - pv >= 0
""",
)
def mutate_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 DELTA with the C++ >=0 filter."""
    return _raw(mutate.delta(_pts(spark, sf_dir)))


@query(
    "mutate_latest_daily",
    oracle=f"""
WITH {P_CTE},
b AS (
  SELECT series_key, {_bucket_sql(86_400_000)} AS bts, ts, dval,
         row_number() OVER (PARTITION BY series_key, {_bucket_sql(86_400_000)}
                            ORDER BY ts DESC, dval DESC) AS rn
  FROM p
)
SELECT series_key, bts AS ts, dval FROM b WHERE rn = 1
""",
)
def mutate_latest_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 LATEST per 1-day bucket (retention downsampling shape,
    config.txt:37-47). Row selection — compared exactly."""
    out = mutate.latest(_pts(spark, sf_dir), "1d")
    return out.select("series_key", "ts", "dval")


@query(
    "mutate_latest_string_daily",
    oracle="""
WITH sp AS (
  SELECT '/meta/agent{host=' || CAST(user_id AS VARCHAR) || '}' AS series_key,
         ts, max(event_type) AS sval
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT series_key,
         make_timestamp(CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT)
                        * 86400000 * 1000) AS bts,
         ts, sval,
         row_number() OVER (PARTITION BY series_key,
                            CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT)
                            ORDER BY ts DESC) AS rn
  FROM sp
)
SELECT series_key, bts AS ts, sval FROM b WHERE rn = 1
""",
)
def mutate_latest_string_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 LATEST over STRING samples: the reference stores string series
    (os-name etc., lib/openinstrument.proto:75-76), RLE-compresses them
    and downsamples via daily LATEST (config.txt:37-47) — strings are
    never aggregated. Points synthesized from events (event_type as the
    string sample, one '/meta/agent' series per host)."""
    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    # max() per (host, ts) makes exact-timestamp ties deterministic in
    # both engines (LATEST itself orders only by ts).
    sp = (
        ev.groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("sval"))
        .select(
            F.lit("/meta/agent").alias("name"),
            F.create_map(F.lit("host"), F.col("user_id").cast("string")).alias("labels"),
            "ts",
            F.lit(None).cast("double").alias("dval"),
            "sval",
        )
    )
    out = mutate.latest(sp, "1d")
    return out.select("series_key", "ts", "sval")


@query(
    "mutate_mean_resample",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, {_bucket_sql(3_600_000)} AS ts, round(avg(dval), 6) AS dval
FROM p GROUP BY 1, 2
""",
)
def mutate_mean_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 AVERAGE resample: hourly mean per series (aligned semantics)."""
    out = mutate.mean_resample(_pts(spark, sf_dir), "1h")
    return out.select("series_key", "ts", F.round("dval", 6).alias("dval"))


@query(
    "mutate_min_resample",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, {_bucket_sql(3_600_000)} AS ts, min(dval) AS dval
FROM p GROUP BY 1, 2
""",
)
def mutate_min_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 MIN resample: hourly min (selection — exact)."""
    out = mutate.min_resample(_pts(spark, sf_dir), "1h")
    return out.select("series_key", "ts", "dval")


@query(
    "mutate_max_resample",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, {_bucket_sql(3_600_000)} AS ts, max(dval) AS dval
FROM p GROUP BY 1, 2
""",
)
def mutate_max_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 MAX resample: hourly max (selection — exact)."""
    out = mutate.max_resample(_pts(spark, sf_dir), "1h")
    return out.select("series_key", "ts", "dval")


@query(
    "mutate_stddev_resample",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, {_bucket_sql(21_600_000)} AS ts, round(stddev_pop(dval), 6) AS dval
FROM p GROUP BY 1, 2
""",
)
def mutate_stddev_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 population stddev per 6-h bucket."""
    out = mutate.stddev_resample(_pts(spark, sf_dir), "6h")
    return out.select("series_key", "ts", F.round("dval", 6).alias("dval"))


# ===========================================================================
# Cross-stream aggregations A2-A8
# ===========================================================================

def _agg_by_name(spark, sf_dir, kind, interval_ms, round_out=True):
    out = agg_ops.aggregate_by_name(_pts(spark, sf_dir), kind, interval_ms)
    val = F.round("value", 6).alias("value") if round_out else F.col("value")
    return out.select("name", "ts", val)


@query(
    "agg_sum_by_name",
    oracle=f"""
WITH {P_CTE}
SELECT name, {_bucket_sql(3_600_000)} AS ts, round(sum(dval), 6) AS value
FROM p GROUP BY 1, 2
""",
)
def agg_sum_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A7: hourly SUM across all streams per variable name."""
    return _agg_by_name(spark, sf_dir, "sum", 3_600_000)


@query(
    "agg_avg_by_name",
    oracle=f"""
WITH {P_CTE}
SELECT name, {_bucket_sql(3_600_000)} AS ts, round(avg(dval), 6) AS value
FROM p GROUP BY 1, 2
""",
)
def agg_avg_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A7: hourly AVERAGE across streams per name."""
    return _agg_by_name(spark, sf_dir, "average", 3_600_000)


@query(
    "agg_cross_family",
    oracle=f"""
WITH {P_CTE}
SELECT name, {_bucket_sql(3_600_000)} AS ts,
       CAST(count(dval) AS BIGINT) AS cnt,
       round(coalesce(stddev_pop(dval), 0), 6) AS sd,
       round(coalesce(var_pop(dval), 0), 6) AS sv,
       CAST(1.0 AS DOUBLE) AS grp
FROM p GROUP BY 1, 2
""",
)
def agg_cross_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 × the PromQL cross-series aggregator tail (r14): count /
    stddev / stdvar / group per (name, hourly bucket), all four folded
    in ONE exchange via operators/aggregate.py::aggregate_by_name_multi
    — the promql/engine.go aggregation contract (population moments,
    group()=1), closing the aggregator gap the A2-A6 five + topk /
    bottomk / percentiles left open. The oracle replays every member
    in the same GROUP BY; both engines define the population moments
    of a single-sample bucket as 0.0 (verified), with a coalesce-to-0
    guard on both sides so the gate can never hinge on an engine NULL
    convention."""
    from open_instrument_spark.operators import aggregate as agg

    out = agg.aggregate_by_name_multi(
        _pts(spark, sf_dir),
        {"cnt": "count", "sd": "stddev", "sv": "stdvar", "grp": "group"},
        3_600_000,
    )
    return out.select(
        "name", "ts", "cnt",
        F.round(F.coalesce("sd", F.lit(0.0)), 6).alias("sd"),
        F.round(F.coalesce("sv", F.lit(0.0)), 6).alias("sv"),
        "grp",
    )


@query("agg_anchored_sum")
def agg_anchored_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 reference-EXACT drift-bucket SUM per name: the sequential
    ValueStreamCalculation walk (lib/protobuf.cc:49-85) as a grouped-map
    kernel, quirks included — first-seen-ts ±interval anchoring in
    stream-scan order, trailing bucket dropped. Rows-only in the driver
    over the FULL corpus (the recursive-CTE replay below costs a
    measured 75.5 s in DuckDB at sf0.01 — r10 re-measurement, see
    COVERAGE.md A1 — so the hash gate runs on the subset twin
    ``agg_anchored_median_user0``); the exact semantics are pinned by
    hand-traced goldens plus a pure-Python replay equality in
    tests/test_aggregate_anchored.py, and the full-corpus SUM walk was
    verified row-identical against the same recursive CTE once
    (4120/4120 rows) when the oracle landed."""
    out = agg_ops.aggregate_anchored(_pts(spark, sf_dir), "sum", "1h")
    return out.select("name", "ts", F.round("value", 6).alias("value"))


def _anchored_oracle(fold_sql: str, where_sql: str, interval_us: int) -> str:
    """Recursive-CTE replay of ValueStreamCalculation
    (lib/protobuf.cc:49-85): single-row-per-group state machine — one
    recursion step per while-round, state (its[], anchor, bucket[]) —
    with the round's scan computed by list lambdas in STREAM ORDER
    (sorted series_key, the kernel's pinned order). Reproduces all
    three quirks: anchor from stream-scan order while unset, flush
    stamped at the anchor, trailing bucket dropped (the ``len(alive)``
    recursion guard breaks BEFORE the flush check, like the C++ loop).
    ``fold_sql`` folds the flushed bucket (list_sum, upper-median, ...).
    """
    return f"""
WITH RECURSIVE {P_CTE},
st AS (
  SELECT name, series_key AS sk,
         list(epoch_us(ts) ORDER BY ts, dval) AS t,
         list(dval ORDER BY ts, dval) AS v
  FROM p {where_sql} GROUP BY 1, 2
),
grp AS (
  SELECT name, list(struct_pack(t := t, v := v) ORDER BY sk) AS ss
  FROM st GROUP BY 1
),
rec AS (
  SELECT name, list_transform(ss, x -> 0) AS its, CAST(0 AS BIGINT) AS anchor,
         CAST([] AS DOUBLE[]) AS bucket,
         CAST(NULL AS BIGINT) AS f_ts, CAST(NULL AS DOUBLE) AS f_val
  FROM grp
  UNION ALL
  SELECT name,
         list_transform(generate_series(1, len(ss)),
                        i -> its[i] + CASE WHEN inb[i] THEN 1 ELSE 0 END),
         CASE WHEN flush THEN 0 ELSE a END,
         CASE WHEN flush THEN CAST([] AS DOUBLE[])
              ELSE list_concat(bucket, appended) END,
         CASE WHEN flush THEN a END,
         CASE WHEN flush THEN {fold_sql} END
  FROM (
    SELECT *, len(appended) = 0 AND len(bucket) > 0 AS flush
    FROM (
      SELECT *,
        list_filter(
          list_transform(generate_series(1, len(ss)),
                         i -> CASE WHEN inb[i] THEN ss[i].v[its[i]+1] END),
          x -> x IS NOT NULL) AS appended
      FROM (
        SELECT *,
          list_transform(generate_series(1, len(ss)),
            i -> its[i] < len(ss[i].t)
                 AND ss[i].t[its[i]+1]
                     BETWEEN a - {interval_us} AND a + {interval_us}) AS inb
        FROM (
          SELECT *,
            CASE WHEN anchor != 0 THEN anchor ELSE alive[1] END AS a
          FROM (
            SELECT rec.*, grp.ss,
              list_filter(
                list_transform(generate_series(1, len(grp.ss)),
                  i -> CASE WHEN rec.its[i] < len(grp.ss[i].t)
                       THEN grp.ss[i].t[rec.its[i]+1] END),
                x -> x IS NOT NULL) AS alive
            FROM rec JOIN grp USING (name)
          ) q0
          WHERE len(alive) > 0
        ) q1
      ) q2
    ) q3
  ) q4
)
SELECT name, make_timestamp(f_ts) AS ts, round(f_val, 6) AS value
FROM rec WHERE f_ts IS NOT NULL
"""


@query(
    "agg_anchored_median_user0",
    oracle=_anchored_oracle(
        # lib/protobuf.cc:135-139 upper median: sorted[n/2], 1-based here
        "list_sort(bucket)[len(bucket) // 2 + 1]",
        "WHERE CAST(user_id AS BIGINT) % 5 = 0",
        3_600_000_000,
    ),
)
def agg_anchored_median_user0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 drift-bucket UPPER MEDIAN, hash-gated end to end: the
    recursive-CTE oracle replays the sequential stream walk round by
    round (state = per-stream iterators + anchor + bucket), so the
    driver gate covers anchoring order, bucket membership, iterator
    advancement, flush timing, the dropped trailing bucket, AND the
    upper-median fold. Restricted to user_id % 5 == 0 to keep the
    single-threaded SQL recursion inside test budget — the kernel is
    the same code path the full-corpus ``agg_anchored_sum`` runs."""
    from open_instrument_spark.model import label_value

    raw = _pts(spark, sf_dir)
    pts = raw.filter(label_value(raw, "user_id").cast("long") % 5 == 0)
    out = agg_ops.aggregate_anchored(pts, "median", "1h")
    return out.select("name", "ts", F.round("value", 6).alias("value"))


@query(
    "agg_p95_by_name",
    oracle=f"""
WITH {P_CTE}
SELECT name, {_bucket_sql(3_600_000)} AS ts,
       round(quantile_cont(dval, 0.95), 6) AS value
FROM p GROUP BY 1, 2
""",
)
def agg_p95_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family extension the reference lacks beyond MEDIAN: hourly
    exact P95 per name — JVM-side F.percentile, the same (n-1)*q linear
    interpolation as DuckDB quantile_cont (any "p<q>" string works:
    p50 ≡ median, p99.9, ...). In the driver window since the r7
    rotation."""
    return _agg_by_name(spark, sf_dir, "p95", 3_600_000)


@query("agg_p95_approx_by_name")
def agg_p95_approx_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of agg_p95_by_name: `approx_percentile`
    (Greenwald-Khanna sketch, accuracy 10⁴) — MERGEABLE partial state
    of bounded size per (name, hour) cell, where exact percentile must
    buffer every value of the group. Estimator output is
    engine-specific → rows-only; the ≤1%-of-exact-spread error bound
    is pytest-asserted next to the HLL twin
    (test_oracle_parity.py)."""
    pts = _pts(spark, sf_dir)
    return (
        pts.groupBy("name", F.window("ts", "1 hour").start.alias("ts"))
        .agg(
            F.percentile_approx("dval", 0.95, 10_000).alias("value")
        )
    )


@query(
    "agg_min_by_name",
    oracle=f"""
WITH {P_CTE}
SELECT name, {_bucket_sql(3_600_000)} AS ts, min(dval) AS value
FROM p GROUP BY 1, 2
""",
)
def agg_min_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A7: hourly MIN (exact)."""
    return _agg_by_name(spark, sf_dir, "min", 3_600_000, round_out=False)


@query(
    "agg_max_by_name",
    oracle=f"""
WITH {P_CTE}
SELECT name, {_bucket_sql(3_600_000)} AS ts, max(dval) AS value
FROM p GROUP BY 1, 2
""",
)
def agg_max_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A7: hourly MAX — true max, the reference's 0-init bug
    (lib/protobuf.cc:109-120) deliberately not reproduced."""
    return _agg_by_name(spark, sf_dir, "max", 3_600_000, round_out=False)


@query(
    "agg_median_by_name",
    oracle=f"""
WITH {P_CTE}
SELECT name, {_bucket_sql(21_600_000)} AS ts, round(median(dval), 6) AS value
FROM p GROUP BY 1, 2
""",
)
def agg_median_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A7: 6-hourly MEDIAN (continuous-interpolated; declared
    divergence from the reference's upper-median, SURVEY.md §7.0 #5)."""
    return _agg_by_name(spark, sf_dir, "median", 21_600_000)


@query(
    "agg_median_upper_by_name",
    oracle=f"""
WITH {P_CTE}
SELECT name, {_bucket_sql(21_600_000)} AS ts,
       list_sort(list(dval))[CAST(floor(count(*) / 2) AS INT) + 1] AS value
FROM p GROUP BY 1, 2
""",
)
def agg_median_upper_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 reference-exact MEDIAN: sorted bucket's element [n/2] — the
    upper median, middle pair never averaged (lib/protobuf.cc:135-142).
    Row selection, so values compare exactly (no rounding)."""
    return _agg_by_name(spark, sf_dir, "median_upper", 21_600_000, round_out=False)


@query(
    "agg_multi_label_sum",
    oracle=f"""
WITH {P_CTE}
SELECT name, 'user_id' AS label, user_id AS label_value,
       {_bucket_sql(21_600_000)} AS ts, round(sum(dval), 6) AS value
FROM p GROUP BY 1, 3, 4
UNION ALL
SELECT name, 'k' AS label, k AS label_value,
       {_bucket_sql(21_600_000)} AS ts, round(sum(dval), 6) AS value
FROM p WHERE k IS NOT NULL AND k != '' GROUP BY 1, 3, 4
""",
)
def agg_multi_label_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 multi-label fan-out (server/store.cc:190-249 loops the agg's
    label list): each label yields an independent grouping, union-tagged
    with the grouping label name."""
    out = agg_ops.aggregate(
        _pts(spark, sf_dir), "sum", ["user_id", "k"], 21_600_000
    )
    return out.select(
        "name", "label", "label_value", "ts", F.round("value", 6).alias("value")
    )


@query(
    "agg_avg_by_label_user",
    oracle=f"""
WITH {P_CTE}
SELECT name, user_id AS label_value, {_bucket_sql(21_600_000)} AS ts,
       round(avg(dval), 6) AS value
FROM p GROUP BY 1, 2, 3
""",
)
def agg_avg_by_label_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: AVERAGE grouped by the user_id label, 6-h windows."""
    out = agg_ops.aggregate_by_label(_pts(spark, sf_dir), "average", "user_id", 21_600_000)
    return out.select("name", "label_value", "ts", F.round("value", 6).alias("value"))


@query(
    "agg_sum_by_label_k",
    oracle=f"""
WITH {P_CTE}
SELECT name, k AS label_value, {_bucket_sql(21_600_000)} AS ts,
       round(sum(dval), 6) AS value
FROM p WHERE k IS NOT NULL
GROUP BY 1, 2, 3
""",
)
def agg_sum_by_label_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 + A10 drop-missing: SUM grouped by the sparse k label; streams
    lacking the label are skipped (openinstrument.go:151-206)."""
    out = agg_ops.aggregate_by_label(_pts(spark, sf_dir), "sum", "k", 21_600_000)
    return out.select("name", "label_value", "ts", F.round("value", 6).alias("value"))


@query(
    "agg_retained_single_labels",
    oracle=f"""
WITH {P_CTE},
members AS (SELECT DISTINCT name, user_id, k FROM p WHERE k IS NOT NULL),
ret AS (
  SELECT name, user_id, CASE WHEN count(*) = 1 THEN min(k) END AS retained_k
  FROM members GROUP BY name, user_id
),
a AS (
  SELECT name, user_id AS label_value, {_bucket_sql(86_400_000)} AS ts,
         round(avg(dval), 6) AS value
  FROM p GROUP BY 1, 2, 3
)
SELECT a.name, a.label_value, a.ts, a.value, ret.retained_k
FROM a LEFT JOIN ret ON a.name = ret.name AND a.label_value = ret.user_id
""",
)
def agg_retained_single_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 single-valued label retention (server/store.cc:208-227): daily
    AVERAGE by user_id, keeping the k label when the group's member
    streams carry exactly one distinct k value."""
    out = agg_ops.aggregate_by_label(
        _pts(spark, sf_dir), "average", "user_id", 86_400_000, retain_single_valued=True
    )
    return out.select(
        "name",
        "label_value",
        "ts",
        F.round("value", 6).alias("value"),
        F.col("retained_labels").getItem("k").alias("retained_k"),
    )


# ===========================================================================
# Grid resampling M4/M7 (interpolation)
# ===========================================================================

_UNIFORM_I_US = 86_400_000_000  # 1 day grid


@query(
    "resample_uniform_avg",
    oracle=f"""
WITH {P_CTE},
w AS (
  SELECT series_key, epoch_us(ts) AS t, dval,
         lag(epoch_us(ts)) OVER win AS pt, lag(dval) OVER win AS pv,
         min(epoch_us(ts)) OVER (PARTITION BY series_key) AS t0
  FROM p WINDOW win AS (PARTITION BY series_key ORDER BY ts)
),
pairs AS (
  SELECT series_key, t, dval, pt, pv,
         t0 - t0 % {_UNIFORM_I_US} AS base,
         pt + ({_UNIFORM_I_US} - (pt - (t0 - t0 % {_UNIFORM_I_US})) % {_UNIFORM_I_US}) AS g_lo,
         t - (t - (t0 - t0 % {_UNIFORM_I_US})) % {_UNIFORM_I_US} AS g_hi
  FROM w WHERE pt IS NOT NULL AND t > pt
)
SELECT series_key, make_timestamp(g) AS ts,
       CASE WHEN g = t THEN dval
            ELSE (dval - pv) / (t - pt) * (g - pt) + pv END AS dval
FROM pairs, unnest(generate_series(g_lo, g_hi, {_UNIFORM_I_US})) AS u(g)
WHERE g_lo <= g_hi
""",
)
def resample_uniform_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 C++ UniformTimeSeries (AVERAGE + sample_frequency): daily grid,
    linear interpolation between straddling points — pure Spark
    sequence+explode, golden-tested against lib/counter_test.cc."""
    from open_instrument_spark.operators import resample

    out = resample.uniform_average(_pts(spark, sf_dir), "1d")
    return out.select("series_key", "ts", "dval")


@query(
    "resample_interpolate_go",
    oracle=f"""
WITH {P_CTE},
b AS (
  SELECT series_key, epoch_us(ts) AS t, ts, dval,
         epoch_us(ts) - epoch_us(ts) % {_UNIFORM_I_US} AS cell
  FROM p
),
w AS (
  SELECT series_key, t, dval, cell,
         lag(cell) OVER (PARTITION BY series_key ORDER BY t) AS pcell
  FROM b
),
firsts AS (
  SELECT series_key, cell, arg_min(t, t) AS ft, arg_min(dval, t) AS fv
  FROM b GROUP BY 1, 2
),
anchors AS (SELECT series_key, min(cell) AS c0 FROM b GROUP BY 1),
acc AS (
  SELECT w.series_key, w.t, w.dval, w.pcell, w.cell,
         CASE WHEN w.pcell = a.c0 THEN w.pcell ELSE f.ft END AS pt, f.fv AS pv
  FROM w
  JOIN firsts f ON w.series_key = f.series_key AND w.pcell = f.cell
  JOIN anchors a ON w.series_key = a.series_key
  WHERE w.pcell IS NOT NULL AND w.cell > w.pcell
),
pass AS (
  SELECT series_key, arg_min(ts, t) AS ts, arg_min(dval, t) AS dval,
         min(t) AS t0
  FROM b GROUP BY series_key
)
SELECT series_key, make_timestamp(g) AS ts,
       pv + (dval - pv) * (CAST(g - pt AS DOUBLE) / CAST(t - pt AS DOUBLE)) AS dval
FROM acc, unnest(generate_series(pcell + {_UNIFORM_I_US}, cell, {_UNIFORM_I_US})) AS u(g)
UNION ALL
SELECT series_key, ts, dval FROM pass WHERE t0 % {_UNIFORM_I_US} = 0
""",
)
def resample_interpolate_go(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 Go Interpolate (NONE + sample_frequency,
    mutations/mutations.go:90-137): daily grid, inputs accepted only when
    they cross a grid cell, linear interpolation anchored at the grid
    base for the first cell. Pure-SQL plan (resample._interpolate_sql),
    golden-tested vs mutations_test.go AND row-identical to the Arrow
    kernel; the oracle replays the relational derivation in DuckDB."""
    from open_instrument_spark.operators import resample

    out = resample.interpolate(_pts(spark, sf_dir), "1d", restore_labels=False)
    return out.select("series_key", "ts", "dval")


@query("resample_interpolate_chunked", oracle=ORACLES["resample_interpolate_go"])
def resample_interpolate_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 with the bounded-task ``chunk=`` two-phase plan (per-(series,
    chunk) lag + tail-struct handoff): must be row-identical to the
    single-window form, so it shares resample_interpolate_go's oracle —
    the same exact-hash gate that proves rate/RLE chunked twins."""
    from open_instrument_spark.operators import resample

    out = resample.interpolate(
        _pts(spark, sf_dir), "1d", chunk="7d", restore_labels=False
    )
    return out.select("series_key", "ts", "dval")


_MAX_GAP_N = 2  # proto max_gap_interpolate: gaps > 2 grid intervals unfilled


@query(
    "resample_interpolate_max_gap",
    oracle=f"""
WITH {P_CTE},
b AS (
  SELECT series_key, epoch_us(ts) AS t, ts, dval,
         epoch_us(ts) - epoch_us(ts) % {_UNIFORM_I_US} AS cell
  FROM p
),
w AS (
  SELECT series_key, t, dval, cell,
         lag(cell) OVER (PARTITION BY series_key ORDER BY t) AS pcell
  FROM b
),
firsts AS (
  SELECT series_key, cell, arg_min(t, t) AS ft, arg_min(dval, t) AS fv
  FROM b GROUP BY 1, 2
),
anchors AS (SELECT series_key, min(cell) AS c0 FROM b GROUP BY 1),
acc AS (
  SELECT w.series_key, w.t, w.dval, w.pcell, w.cell,
         CASE WHEN w.pcell = a.c0 THEN w.pcell ELSE f.ft END AS pt, f.fv AS pv
  FROM w
  JOIN firsts f ON w.series_key = f.series_key AND w.pcell = f.cell
  JOIN anchors a ON w.series_key = a.series_key
  WHERE w.pcell IS NOT NULL AND w.cell > w.pcell
),
gated AS (
  SELECT *,
         CASE WHEN t - pt <= {_MAX_GAP_N} * {_UNIFORM_I_US}
                THEN pcell + {_UNIFORM_I_US}
              WHEN cell = t THEN cell
              ELSE cell + {_UNIFORM_I_US} END AS g_lo
  FROM acc
),
pass AS (
  SELECT series_key, arg_min(ts, t) AS ts, arg_min(dval, t) AS dval,
         min(t) AS t0
  FROM b GROUP BY series_key
)
SELECT series_key, make_timestamp(g) AS ts,
       pv + (dval - pv) * (CAST(g - pt AS DOUBLE) / CAST(t - pt AS DOUBLE)) AS dval
FROM gated, unnest(generate_series(g_lo, cell, {_UNIFORM_I_US})) AS u(g)
WHERE g_lo <= cell
UNION ALL
SELECT series_key, ts, dval FROM pass WHERE t0 % {_UNIFORM_I_US} = 0
""",
)
def resample_interpolate_max_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 + proto ``max_gap_interpolate`` (lib/openinstrument.proto:45-52):
    gaps between accepted inputs longer than N grid intervals are left
    unfilled (an accepted input exactly ON the grid still passes
    through). Same pure-SQL plan as resample_interpolate_go with the
    fill range gated; the oracle replays the gate in DuckDB."""
    from open_instrument_spark.operators import resample

    out = resample.interpolate(
        _pts(spark, sf_dir), "1d", max_gap_interpolate=_MAX_GAP_N,
        restore_labels=False,
    )
    return out.select("series_key", "ts", "dval")


def _anchored_oracle(value_sql: str, dur_us: int = 86_400_000_000) -> str:
    """DuckDB replay of the reference's Mean DATA-anchored buckets
    (mutations/mutations.go:10-49): each bucket is anchored at
    its own first sample's timestamp and flushes when t - anchor >
    duration, so bucket boundaries are a data-dependent recurrence. A
    recursive CTE walks exactly that anchor chain per series (the next
    anchor IS the first sample past anchor+duration); samples then
    attach to the greatest anchor ≤ t, which is precisely the kernel's
    assignment. Output stamped at the last included ts, like the
    kernel."""
    return f"""
WITH RECURSIVE {P_CTE},
s AS (SELECT series_key, epoch_us(ts) AS t, dval FROM p),
anch(series_key, a) AS (
  SELECT series_key, min(t) FROM s GROUP BY 1
  UNION ALL
  SELECT a.series_key,
         (SELECT min(t) FROM s
          WHERE s.series_key = a.series_key AND s.t > a.a + {dur_us})
  FROM anch a
  WHERE EXISTS (SELECT 1 FROM s
                WHERE s.series_key = a.series_key AND s.t > a.a + {dur_us})
),
asn AS (
  SELECT s.series_key, s.t, s.dval,
         (SELECT max(a) FROM anch
          WHERE anch.series_key = s.series_key AND anch.a <= s.t) AS a
  FROM s
)
SELECT series_key, make_timestamp(max(t)) AS ts, {value_sql} AS dval
FROM asn GROUP BY series_key, a
"""


@query("resample_mean_anchored", oracle=_anchored_oracle("round(avg(dval), 6)"))
def resample_mean_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 Go Mean with reference-exact data-anchored buckets (first-ts
    anchor, stamped at last-in-bucket ts) — golden-tested AND, since
    r6, fully DuckDB-oracled: the data-dependent anchor chain replays
    as a recursive CTE (see _anchored_oracle). Mean rounded to 6 on
    both sides (kernel sums in ts order, SQL avg in its own order)."""
    from open_instrument_spark.operators import resample

    out = resample.mean_anchored(_pts(spark, sf_dir), "1d", restore_labels=False)
    return out.select("series_key", "ts", F.round("dval", 6).alias("dval"))


@query(
    "mutate_ewma",
    oracle=f"""
WITH RECURSIVE {P_CTE},
s AS (
  SELECT series_key, ts, dval,
         row_number() OVER (PARTITION BY series_key ORDER BY ts, dval) AS rn
  FROM p
),
r(series_key, ts, rn, y) AS (
  SELECT series_key, ts, rn, dval FROM s WHERE rn = 1
  UNION ALL
  SELECT s.series_key, s.ts, s.rn, 0.25 * s.dval + 0.75 * r.y
  FROM r JOIN s ON s.series_key = r.series_key AND s.rn = r.rn + 1
)
SELECT series_key, ts, y AS dval FROM r
""",
)
def mutate_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing per series (α = 1/4 — binary-exact, so the
    sequential recurrence is the same two multiplies + add in any IEEE
    engine and the recursive-CTE oracle matches BIT-EXACTLY, compared
    unrounded). North-star TSDB extension: the classic display-side
    smoothing mutation the reference lacks. Arrow grouped-map kernel
    like the anchored resamples ((series, ts) pairs are unique in this
    corpus, so the walk order is deterministic)."""
    from open_instrument_spark.operators import resample

    out = resample.ewma(_pts(spark, sf_dir), restore_labels=False)
    return out.select("series_key", "ts", "dval")


@query(
    "mutate_holt_forecast",
    oracle=f"""
WITH RECURSIVE {P_CTE},
s AS (
  SELECT series_key, ts, dval,
         row_number() OVER (PARTITION BY series_key ORDER BY ts, dval) AS rn
  FROM p
),
r(series_key, ts, rn, l, b) AS (
  SELECT series_key, ts, rn, dval, CAST(0.0 AS DOUBLE) FROM s WHERE rn = 1
  UNION ALL
  SELECT s.series_key, s.ts, s.rn,
         0.25 * s.dval + 0.75 * (r.l + r.b),
         0.5 * ((0.25 * s.dval + 0.75 * (r.l + r.b)) - r.l) + 0.5 * r.b
  FROM r JOIN s ON s.series_key = r.series_key AND s.rn = r.rn + 1
)
SELECT series_key, ts, l + b AS dval FROM r
""",
)
def mutate_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear level+trend one-step forecast per series (α = 1/4,
    β = 1/2 — binary-exact, so every recurrence step is the same IEEE
    multiplies + adds in any engine and the recursive-CTE oracle
    matches BIT-EXACTLY, compared unrounded; the mutate_ewma
    precedent, one rung up the forecasting ladder). North-star TSDB
    extension (resample.holt_kernel)."""
    from open_instrument_spark.operators import resample

    out = resample.holt(_pts(spark, sf_dir), restore_labels=False)
    return out.select("series_key", "ts", "dval")


_ALERT_CTE = f"""
a AS (
  SELECT name, {_bucket_sql(21600000)} AS ts, SUM(dval) AS v
  FROM p GROUP BY 1, 2
),
runs AS (
  SELECT name, ts, v,
         CASE WHEN v > 1000.0 THEN 0 ELSE 1 END AS nb,
         SUM(CASE WHEN v > 1000.0 THEN 0 ELSE 1 END)
           OVER (PARTITION BY name ORDER BY ts, v
                 ROWS UNBOUNDED PRECEDING) AS run
  FROM a
),
cl AS (
  SELECT name, ts, v, nb,
         MIN(CASE WHEN nb = 0 THEN epoch_us(ts) END)
           OVER (PARTITION BY name, run) AS rs
  FROM runs
),
st AS (
  SELECT 'sum6h_high' AS alert, name AS series_key, ts,
         round(v, 6) AS value,
         CASE WHEN nb = 1 THEN 'inactive'
              WHEN epoch_us(ts) - rs >= 43200000000 THEN 'firing'
              ELSE 'pending' END AS state
  FROM cl
)
"""


def _alert_rule():
    from open_instrument_spark.plans.alerts import AlertRule
    from open_instrument_spark.plans.api import GetRequest

    return AlertRule(
        name="sum6h_high",
        request=GetRequest(variable="/events/*", aggregation="sum",
                           sample_interval="6h"),
        condition=">", threshold=1000.0, for_duration="12h",
    )


@query(
    "alert_rule_states",
    oracle=f"WITH {P_CTE},\n{_ALERT_CTE}\nSELECT * FROM st",
)
def alert_rule_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alerting engine (plans/alerts.py): per-sample
    inactive/pending/firing states for a Prometheus-shape rule — 6-hour
    SUM per variable name > 1000 for 12h. The whole state machine is
    three window functions (cumulative non-breach count = run id,
    min-over-run = run start, µs difference = classification), so the
    EXACT firing behavior replays under the DuckDB hash gate; the
    threshold sits 2.09 from the nearest 6h sum, far above cross-engine
    float-fold noise. Values rounded to 6 (engine sum association)."""
    from open_instrument_spark.plans.alerts import evaluate_alert

    pts = _pts(spark, sf_dir)
    out = evaluate_alert(pts, _alert_rule())
    return out.withColumn("value", F.round("value", 6))


@query(
    "alert_rule_transitions",
    oracle=f"""WITH {P_CTE},
{_ALERT_CTE},
tr AS (
  SELECT alert, series_key, ts, value, state,
         lag(state) OVER (PARTITION BY series_key ORDER BY ts, value)
           AS from_state
  FROM st
)
SELECT * FROM tr WHERE from_state IS NULL OR from_state != state
""",
)
def alert_rule_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The notifier feed: state-CHANGE events only (first sample plus
    every pending→firing page and →inactive resolve), from the same
    oracled state machine (plans/alerts.py transitions)."""
    from open_instrument_spark.plans.alerts import (
        evaluate_alert,
        transitions,
    )

    pts = _pts(spark, sf_dir)
    st = evaluate_alert(pts, _alert_rule()).withColumnRenamed(
        "value", "dval"
    )
    out = transitions(st)
    return out.select(
        "alert", "series_key", "ts",
        F.round("dval", 6).alias("value"), "state", "from_state",
    )


_CMS_PROBES = ["1", "2", "3", "5", "8", "13", "21", "34", "55", "89",
               "144", "9999999"]
_CMS_PROBE_SQL = "[" + ", ".join(f"'{p}'" for p in _CMS_PROBES) + "]"


@query(
    "agg_cms_label_counts",
    oracle=f"""
WITH pts AS (
  SELECT '/events/' || event_type AS name, CAST(user_id AS VARCHAR) AS v
  FROM events
),
tab AS (
  SELECT name, i,
         CAST(('0x' || substr(md5('cms' || i || ':' || v), 1, 8)) AS BIGINT)
           % 256 AS bucket,
         COUNT(*) AS n
  FROM pts CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)
  GROUP BY 1, 2, 3
),
grid AS (
  SELECT k.name, p.value, i.i,
         CAST(('0x' || substr(md5('cms' || i.i || ':' || p.value), 1, 8))
              AS BIGINT) % 256 AS bucket
  FROM (SELECT DISTINCT name FROM pts) k
  CROSS JOIN (SELECT unnest({_CMS_PROBE_SQL}) AS value) p
  CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) i
)
SELECT g.name, g.value, CAST(min(coalesce(t.n, 0)) AS BIGINT) AS est
FROM grid g
LEFT JOIN tab t ON t.name = g.name AND t.i = g.i AND t.bucket = g.bucket
GROUP BY 1, 2
""",
)
def agg_cms_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point-frequency estimates — per variable name,
    how often each probed user_id label value occurs, answered from
    the FIXED-SIZE bucket table instead of an unbounded (name, value)
    aggregation (the frequency member of the mergeable-sketch trio;
    see operators/sketch.py for the 100 TB case). Deterministic
    md5-seeded bucketing means build + probe + min all replay in SQL —
    a FULLY hash-gated sketch, unlike builtin sketch aggs whose binary
    state is engine-private. Probes include an absent id (9999999):
    its estimate is whatever its buckets collide with — usually 0,
    never negative, and identical in both engines."""
    from open_instrument_spark.operators.sketch import cms_estimate, cms_table

    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    pts = ev.select(
        F.concat(F.lit("/events/"), F.col("event_type")).alias("name"),
        F.col("user_id").cast("string").alias("v"),
    )
    tab = cms_table(pts, "name", "v")
    return cms_estimate(tab, "name", _CMS_PROBES)


@query(
    "mutate_cusum",
    oracle=f"""
WITH RECURSIVE {P_CTE},
s AS (
  SELECT series_key, ts, dval,
         row_number() OVER (PARTITION BY series_key ORDER BY ts, dval) AS rn
  FROM p
),
r(series_key, ts, rn, t, c) AS (
  SELECT series_key, ts, rn, dval, CAST(0.0 AS DOUBLE) FROM s WHERE rn = 1
  UNION ALL
  SELECT s.series_key, s.ts, s.rn, r.t,
         greatest(0.0, r.c + (s.dval - r.t))
  FROM r JOIN s ON s.series_key = r.series_key AND s.rn = r.rn + 1
)
SELECT series_key, ts, c + 0.0 AS dval FROM r
""",
)
def mutate_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided positive CUSUM drift statistic per series (Page's
    sequential change detector; reference level = the series' first
    value, slack 0 — both binary-exact, so every step is one IEEE
    subtract/add/max in any engine and the recursive-CTE oracle
    matches BIT-EXACTLY, compared unrounded; signed zero normalized
    with +0.0 on both sides). North-star TSDB extension
    (resample.cusum_kernel) — the alerting-side companion of
    mutate_zscore."""
    from open_instrument_spark.operators import resample

    out = resample.cusum(_pts(spark, sf_dir), restore_labels=False)
    return out.select("series_key", "ts", "dval")


_HW_P = 24
_HW_ZEROS = "[" + ", ".join(["0.0"] * _HW_P) + "]::DOUBLE[]"

@query(
    "mutate_holt_winters",
    oracle=f"""
WITH RECURSIVE {{P_CTE}},
s AS (
  SELECT series_key, ts, dval,
         row_number() OVER (PARTITION BY series_key ORDER BY ts, dval) AS rn
  FROM p
),
r(series_key, ts, rn, l, b, sl) AS (
  SELECT series_key, ts, rn, dval, CAST(0.0 AS DOUBLE), {_HW_ZEROS}
  FROM s WHERE rn = 1
  UNION ALL
  SELECT series_key, ts, rn, lnew,
         0.5 * (lnew - lold) + 0.5 * bold,
         list_slice(sl, 1, ph) ||
         [0.25 * (x - lnew) + 0.75 * sp] ||
         list_slice(sl, ph + 2, {_HW_P})
  FROM (
    SELECT s.series_key, s.ts, s.rn,
           ((s.rn - 1) % {_HW_P}) AS ph,
           r.sl AS sl, r.l AS lold, r.b AS bold, s.dval AS x,
           r.sl[((s.rn - 1) % {_HW_P}) + 1] AS sp,
           0.25 * (s.dval - r.sl[((s.rn - 1) % {_HW_P}) + 1])
             + 0.75 * (r.l + r.b) AS lnew
    FROM r JOIN s ON s.series_key = r.series_key AND s.rn = r.rn + 1
  )
)
SELECT series_key, ts,
       l + b + sl[(rn % {_HW_P}) + 1] AS dval
FROM r
""".replace("{P_CTE}", P_CTE),
)
def mutate_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal one-step forecast per series
    (α = 1/4, β = 1/2, γ = 1/4, period = 24 samples — all binary-exact,
    so every recurrence step is the same IEEE multiplies + adds in any
    engine and the recursive-CTE oracle — which carries the 24
    seasonal slots as a LIST column, rewriting one slot per step via
    list_slice concatenation — matches BIT-EXACTLY, compared unrounded;
    the mutate_ewma → mutate_holt_forecast ladder, seasonal rung).
    North-star TSDB extension (resample.holt_winters_kernel)."""
    from open_instrument_spark.operators import resample

    out = resample.holt_winters(_pts(spark, sf_dir), restore_labels=False)
    return out.select("series_key", "ts", "dval")


@query(
    "mutate_zscore",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, ts,
       CASE WHEN count(*) OVER w >= 2 AND (stddev_pop(dval) OVER w) > 0
            THEN round((dval - avg(dval) OVER w)
                       / (stddev_pop(dval) OVER w), 6)
       END AS z
FROM p
WINDOW w AS (PARTITION BY series_key ORDER BY ts
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
)
def mutate_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-sample z-score per series — the cheap anomaly signal
    (|z| threshold alerting) monitoring pipelines derive from raw
    points; NULL until the window holds ≥2 samples or when flat
    (σ = 0). Pure window plan: one exchange on series_key, identical
    window functions on the oracle side, rounded to 6 (σ re-associates
    across engines)."""
    from pyspark.sql import Window as W

    from open_instrument_spark.operators.mutate import _with_key

    pts = _with_key(_pts(spark, sf_dir))
    w = W.partitionBy("series_key").orderBy("ts").rowsBetween(-4, 0)
    n = F.count(F.lit(1)).over(w)
    mu = F.avg("dval").over(w)
    sd = F.stddev_pop("dval").over(w)
    return pts.select(
        "series_key", "ts",
        F.when((n >= 2) & (sd > 0), F.round((F.col("dval") - mu) / sd, 6))
        .alias("z"),
    )


def _minmax_anchored_oracle(value_sql: str, dur_us: int = 86_400_000_000) -> str:
    """DuckDB replay of the reference's Min/Max buckets
    (mutations/mutations.go:139-191), which differ from Mean's in three
    reference behaviors: the flush fires on ``t >= anchor + duration``
    (not ``>``), the output is stamped at the TRIGGERING sample's
    timestamp (the trigger is excluded from the flushed bucket and
    becomes the next anchor), and the final partial bucket is never
    emitted. The recursive CTE walks that >= anchor chain; each sample
    attaches to its bucket via ``anchor <= t < next_anchor``, and the
    tail bucket drops out naturally because its next_anchor is NULL."""
    return f"""
WITH RECURSIVE {P_CTE},
s AS (SELECT series_key, epoch_us(ts) AS t, dval FROM p),
anch(series_key, a) AS (
  SELECT series_key, min(t) FROM s GROUP BY 1
  UNION ALL
  SELECT a.series_key,
         (SELECT min(t) FROM s
          WHERE s.series_key = a.series_key AND s.t >= a.a + {dur_us})
  FROM anch a
  WHERE EXISTS (SELECT 1 FROM s
                WHERE s.series_key = a.series_key AND s.t >= a.a + {dur_us})
),
ab AS (
  SELECT series_key, a,
         lead(a) OVER (PARTITION BY series_key ORDER BY a) AS na
  FROM anch
),
asn AS (
  SELECT s.series_key, s.dval, ab.na
  FROM s JOIN ab ON s.series_key = ab.series_key
              AND s.t >= ab.a AND s.t < ab.na
)
SELECT series_key, make_timestamp(na) AS ts, {value_sql} AS dval
FROM asn GROUP BY series_key, na
"""


@query("resample_min_anchored", oracle=_minmax_anchored_oracle("min(dval)"))
def resample_min_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 Go Min with reference-exact anchored buckets
    (mutations/mutations.go:139-164): >= flush boundary, stamped at the
    triggering sample's ts, tail bucket dropped — golden-tested +
    recursive-CTE oracle (exact doubles, no rounding needed)."""
    from open_instrument_spark.operators import resample

    out = resample.min_anchored(_pts(spark, sf_dir), "1d", restore_labels=False)
    return out.select("series_key", "ts", "dval")


@query("resample_max_anchored", oracle=_minmax_anchored_oracle("max(dval)"))
def resample_max_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 Go Max with reference-exact anchored buckets
    (mutations/mutations.go:166-191): >= flush boundary, stamped at the
    triggering sample's ts, tail bucket dropped — golden-tested +
    recursive-CTE oracle (exact doubles, no rounding needed)."""
    from open_instrument_spark.operators import resample

    out = resample.max_anchored(_pts(spark, sf_dir), "1d", restore_labels=False)
    return out.select("series_key", "ts", "dval")


# ===========================================================================
# Retention W1, RLE W3, ingest S1-S5
# ===========================================================================

_D7 = 7 * 86_400_000
_D21 = 21 * 86_400_000


@query(
    "retention_policy",
    oracle=f"""
WITH {P_CTE},
aged AS (
  SELECT *, (epoch(TIMESTAMP '{NOW}') - epoch(ts)) * 1000 AS age FROM p
),
pol AS (
  SELECT *, CASE WHEN name LIKE '/events/error%' THEN 0
                 WHEN age <= {_D7} THEN 1
                 WHEN age >= {_D7} AND age <= {_D21} THEN 2
                 ELSE -1 END AS pol
  FROM aged
)
SELECT series_key, ts, round(dval, 6) AS dval FROM pol WHERE pol IN (0, 1)
UNION ALL
SELECT series_key, {_bucket_sql(86_400_000)} AS ts, round(avg(dval), 6) AS dval
FROM pol WHERE pol = 2 GROUP BY series_key, 2
""",
)
def retention_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 first-match retention (lib/retention_policy_manager.cc:20-47):
    /events/error* kept raw forever; everything else kept raw <= 7 d,
    downsampled to daily means between 7 and 21 d, default-DROPped
    beyond (ages relative to pinned NOW)."""
    from open_instrument_spark.operators.retention import PolicyItem, apply_retention

    policy = [
        PolicyItem(("/events/error*",), keep=True),
        PolicyItem(("/events/*",), keep=True, max_age="7d"),
        PolicyItem(("/events/*",), keep=True, min_age="7d", max_age="21d",
                   mutations=(("mean", "1d"),)),
    ]
    out = apply_retention(_pts(spark, sf_dir), policy, NOW)
    out = mutate._with_key(out)
    return out.select("series_key", "ts", F.round("dval", 6).alias("dval"))


@query(
    "agg_sliding_sum",
    oracle=f"""
WITH {P_CTE},
t AS (SELECT name, epoch_us(ts) AS t, dval FROM p),
wins AS (
  SELECT name, dval,
         unnest(generate_series(
           CAST(floor(t / 1800000000) AS BIGINT) * 1800000000 - 1800000000,
           CAST(floor(t / 1800000000) AS BIGINT) * 1800000000,
           1800000000)) AS g
  FROM t
)
SELECT name, make_timestamp(g) AS ts, round(sum(dval), 6) AS value
FROM wins GROUP BY 1, 2
""",
)
def agg_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 over SLIDING windows (1 h window / 30 min slide): each sample
    lands in window/slide = 2 epoch-aligned windows — the
    smoothed-dashboard form the tumbling-only reference lacks. Spark's
    built-in F.window replicates rows into their windows before one
    map-side-partial aggregation; the oracle replays the window set as
    a generate_series per sample."""
    from open_instrument_spark.operators.aggregate import (
        aggregate_by_name_sliding,
    )

    out = aggregate_by_name_sliding(
        _pts(spark, sf_dir), "sum", 3_600_000, 1_800_000
    )
    return out.select("name", "ts", F.round("value", 6).alias("value"))


@query(
    "agg_histogram",
    oracle=f"""
WITH {P_CTE}
SELECT name, {_bucket_sql(3_600_000)} AS ts,
       CAST(floor(dval / 5.0) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY 1, 2, 3
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per (name, hour): bucket =
    floor(dval/5) — the latency-histogram aggregation shape, one
    groupBy with the bucket as a key extension (north-star A-family
    extension; floor semantics so negatives land in negative
    buckets)."""
    from open_instrument_spark.operators.aggregate import histogram_by_name

    return histogram_by_name(_pts(spark, sf_dir), 5.0, 3_600_000)


@query(
    "agg_topk_series",
    oracle=f"""
WITH {P_CTE},
s AS (
  SELECT name, series_key, {_bucket_sql(86_400_000)} AS ts,
         round(sum(dval), 6) AS value
  FROM p GROUP BY 1, 2, 3
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY name, ts ORDER BY value DESC, series_key ASC) AS rank
  FROM s
)
SELECT name, ts, series_key, value, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 3
""",
)
def agg_topk_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``topk(3, ...)`` per (name, day): which series dominate
    each metric — rank pinned cross-engine by comparing the ROUNDED
    window sum with the series_key tiebreak
    (operators/trend.py::topk_series). North-star O-family
    extension."""
    from open_instrument_spark.operators.trend import topk_series

    return topk_series(_pts(spark, sf_dir), k=3, interval_ms=86_400_000)


@query(
    "mutate_offset_compare",
    oracle=f"""
WITH {P_CTE},
c AS (
  SELECT name, {_bucket_sql(3_600_000)} AS ts, round(sum(dval), 6) AS value
  FROM p GROUP BY 1, 2
)
SELECT c.name, c.ts, c.value, p2.value AS value_prev,
       round(c.value / p2.value, 6) AS wow_ratio
FROM c LEFT JOIN c p2
  ON p2.name = c.name AND p2.ts + INTERVAL 7 DAY = c.ts
""",
)
def mutate_offset_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``offset 7d`` comparison: hourly sums per name joined
    against themselves one week earlier (week-over-week seasonal
    panel); windows with no counterpart keep NULLs — absent history is
    the signal (operators/trend.py::offset_compare). North-star
    M-family extension."""
    from open_instrument_spark.operators.trend import offset_compare

    return offset_compare(_pts(spark, sf_dir),
                          offset_ms=604_800_000, interval_ms=3_600_000)


@query(
    "list_stale_series",
    oracle=f"""
WITH {P_CTE},
g AS (
  SELECT name, series_key, max(ts) AS last_ts
  FROM p GROUP BY 1, 2
)
SELECT name, series_key, last_ts,
       epoch_us(TIMESTAMP '{NOW}') - epoch_us(last_ts) AS age_us,
       (epoch_us(TIMESTAMP '{NOW}') - epoch_us(last_ts))
         > 259200000000 AS stale
FROM g
""",
)
def list_stale_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-series detection — the inverse of List's max_age filter:
    every series with its age at the pinned NOW, flagged stale past
    3 days (the "which series went silent" on-call query; PromQL
    absent/staleness shape — the reference only DROPS stale series,
    server/store.cc:342-379). Integer-microsecond ages so the compare
    is exact; both verdicts exercised at sf0.01 (188/750 stale).
    North-star S11 extension (operators/select.py::stale_series)."""
    from open_instrument_spark.operators.select import stale_series

    return stale_series(_pts(spark, sf_dir), NOW, max_age_ms=259_200_000)


@query(
    "select_absent",
    oracle=f"""
WITH {P_CTE},
c AS (
  SELECT
    count(DISTINCT CASE WHEN name = '/events/click'
                        THEN series_key END) AS n0,
    count(DISTINCT CASE WHEN name = '/events/purchase' AND k IS NOT NULL
                        THEN series_key END) AS n1,
    count(DISTINCT CASE WHEN name LIKE '/events/%'
                        THEN series_key END) AS n2,
    count(DISTINCT CASE WHEN name = '/events/doesnotexist'
                        THEN series_key END) AS n3
  FROM p
)
SELECT '/events/click' AS selector, CAST(n0 AS INTEGER) AS n_series,
       n0 = 0 AS absent FROM c
UNION ALL SELECT '/events/purchase{{k=*}}', CAST(n1 AS INTEGER), n1 = 0 FROM c
UNION ALL SELECT '/events/*', CAST(n2 AS INTEGER), n2 = 0 FROM c
UNION ALL SELECT '/events/doesnotexist', CAST(n3 AS INTEGER), n3 = 0 FROM c
""",
)
def select_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``absent()`` (late r12): one row per selector — exact
    name, label-present, trailing-* glob, and a selector matching
    NOTHING (the absent alert fires) — with its matched-series count
    (operators/select.py::absent_selectors). All four selectors ride
    ONE conditional-count aggregation pass; the matcher grammar (F1,
    F2, F4) and the absent verdicts replay under the hash gate."""
    from open_instrument_spark.operators.select import absent_selectors

    return absent_selectors(_pts(spark, sf_dir), [
        "/events/click",
        "/events/purchase{k=*}",
        "/events/*",
        "/events/doesnotexist",
    ])


@query(
    "select_absent_over_time",
    oracle=f"""
WITH {P_CTE},
spine AS (
  SELECT gs.bucket_us FROM generate_series(
    CAST(epoch_us(TIMESTAMP '2024-01-10 00:00:00') AS BIGINT),
    CAST(epoch_us(TIMESTAMP '2024-01-12 00:00:00') AS BIGINT) - 1,
    3600000000) gs(bucket_us)
),
c AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
         count(*) AS n
  FROM p
  WHERE name = '/events/signup'
    AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
  GROUP BY 1
)
SELECT make_timestamp(spine.bucket_us) AS window_start,
       coalesce(c.n, 0) AS n_samples,
       coalesce(c.n, 0) = 0 AS absent
FROM spine LEFT JOIN c USING (bucket_us)
""",
)
def select_absent_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``absent_over_time`` over a grid (r13;
    operators/select.py::absent_over_time): for each hourly bucket of
    a 2-day range, did the selector match any sample — absent()'s
    windowed sibling ("WHEN did the metric go dark"). Buckets with no
    samples only exist because of the in-plan time spine (one
    sequence-explode row, broadcast-restored like absent_selectors'
    zero counts); the selector + range push to the scan and the
    per-bucket counts map-side-combine. At ~2.8 events/hour the gate
    range exercises both verdicts."""
    from open_instrument_spark.operators.select import absent_over_time

    return absent_over_time(
        _pts(spark, sf_dir), "/events/signup",
        "2024-01-10 00:00:00", "2024-01-12 00:00:00", window_s=3600)


_LES_SQL = "[5.0, 10.0, 25.0, 50.0, 100.0, 250.0]"


@query(
    "agg_histogram_quantile",
    oracle=f"""
WITH {P_CTE},
b AS (
  SELECT name, {_bucket_sql(86_400_000)} AS ts,
         len(list_filter({_LES_SQL}, le -> le < dval)) AS idx
  FROM p
),
counts AS (SELECT name, ts, idx, count(*) AS n FROM b GROUP BY 1, 2, 3),
grid AS (
  SELECT DISTINCT c.name, c.ts, i.idx
  FROM counts c CROSS JOIN (SELECT unnest(range(7)) AS idx) i
),
cumt AS (
  SELECT g.name, g.ts, g.idx,
         list_extract({_LES_SQL} || ['infinity'::DOUBLE], g.idx + 1) AS le,
         sum(coalesce(c.n, 0)) OVER (
           PARTITION BY g.name, g.ts ORDER BY g.idx) AS cum
  FROM grid g LEFT JOIN counts c
    ON c.name = g.name AND c.ts = g.ts AND c.idx = g.idx
),
ann AS (
  SELECT name, ts, idx, le, cum,
         lag(cum, 1, 0) OVER w AS prev_cum,
         lag(le) OVER w AS prev_le,
         max(cum) OVER (PARTITION BY name, ts) AS total,
         max(CASE WHEN le != 'infinity'::DOUBLE THEN le END)
           OVER (PARTITION BY name, ts) AS max_finite_le
  FROM cumt WINDOW w AS (PARTITION BY name, ts ORDER BY idx)
),
cr AS (
  SELECT *, row_number() OVER (PARTITION BY name, ts ORDER BY idx) AS rn
  FROM ann WHERE cum >= 0.9 * total AND total > 0
)
SELECT name, ts,
       round(CASE WHEN le = 'infinity'::DOUBLE THEN max_finite_le
             ELSE coalesce(prev_le, 0.0)
                  + (le - coalesce(prev_le, 0.0))
                    * (0.9 * total - prev_cum) / (cum - prev_cum)
             END, 6) AS q90
FROM cr WHERE rn = 1
""",
)
def agg_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``histogram_quantile(0.9, ...)`` over per-(name, day)
    cumulative le-bucket tables built from raw points — the
    latency-SLO query, answered from a fixed-size distribution summary
    (|groups| × 7 rows) instead of raw data. Bucket assignment is a
    higher-order filter over the literal le array (no explode of the
    raw points); the crossing pick + interpolation replicate
    promql/quantile.go bucketQuantile exactly, so the whole estimator
    replays in SQL (operators/histogram.py). North-star A-family
    extension."""
    from open_instrument_spark.operators.histogram import (
        histogram_buckets,
        histogram_quantile,
    )

    buckets = histogram_buckets(_pts(spark, sf_dir))
    return histogram_quantile(buckets, q=0.9)


@query(
    "agg_distinct_series",
    oracle=f"""
WITH {P_CTE}
SELECT name, {_bucket_sql(86_400_000)} AS ts,
       CAST(count(DISTINCT series_key) AS BIGINT) AS n_series
FROM p GROUP BY 1, 2
""",
)
def agg_distinct_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-(name, day) active-series cardinality — the
    capacity-planning query every TSDB dashboard runs (north-star
    A-family extension). The exact form is the oracled correctness
    anchor for the HLL sketch twin below."""
    pts = mutate._with_key(_pts(spark, sf_dir))
    return (
        pts.groupBy(
            "name", F.window("ts", "1 day").start.alias("ts")
        )
        .agg(F.count_distinct("series_key").alias("n_series"))
    )


@query("agg_distinct_series_hll")
def agg_distinct_series_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for the query above: HyperLogLog++ per-(name,
    day) series cardinality (`approx_count_distinct`, rsd 2%). The
    sketch is MERGEABLE — partial aggregation happens map-side and a
    day×name cell costs a fixed-size register array no matter how many
    points it holds, where exact count_distinct must shuffle every
    distinct key. Estimator output is engine-specific → rows-only;
    the ≤5%-of-exact error bound is pytest-asserted
    (test_oracle_parity.py)."""
    pts = mutate._with_key(_pts(spark, sf_dir))
    return (
        pts.groupBy(
            "name", F.window("ts", "1 day").start.alias("ts")
        )
        .agg(
            F.approx_count_distinct("series_key", rsd=0.02).alias("n_series")
        )
    )


@query(
    "retention_report",
    oracle=f"""
WITH {P_CTE},
aged AS (
  SELECT *, (epoch(TIMESTAMP '{NOW}') - epoch(ts)) * 1000 AS age FROM p
),
pol AS (
  SELECT *, CASE WHEN name LIKE '/events/error%' THEN 0
                 WHEN name LIKE '/events/scroll%' THEN 1
                 WHEN age <= {_D7} THEN 2
                 WHEN age >= {_D7} AND age <= {_D21} THEN 3
                 ELSE -1 END AS pol
  FROM aged
)
SELECT pol AS policy_idx,
       CASE pol WHEN 0 THEN 'keep' WHEN 1 THEN 'drop'
                WHEN 2 THEN 'keep' WHEN 3 THEN 'downsample'
                ELSE 'default_drop' END AS action,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(count(DISTINCT series_key) AS BIGINT) AS n_series
FROM pol GROUP BY 1, 2
""",
)
def retention_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 DRY-RUN audit: per first-match policy band (incl. the -1
    default-DROP), sample + series counts and the action — what an
    operator inspects before a 100 TB rewrite. Built on the SAME
    policy_index expression the live job evaluates, so report and
    rewrite cannot disagree; the oracle replays the first-match CASE.
    Policy: error* kept forever, scroll* dropped explicitly, the rest
    raw ≤7 d / daily-mean 7-21 d / default-dropped beyond."""
    from open_instrument_spark.operators.retention import (
        PolicyItem,
        retention_report as _report,
    )

    policy = [
        PolicyItem(("/events/error*",), keep=True),
        PolicyItem(("/events/scroll*",), keep=False),
        PolicyItem(("/events/*",), keep=True, max_age="7d"),
        PolicyItem(("/events/*",), keep=True, min_age="7d", max_age="21d",
                   mutations=(("mean", "1d"),)),
    ]
    return _report(_pts(spark, sf_dir), policy, NOW)


@query(
    "rle_encode",
    oracle=f"""
WITH {P_CTE},
chg AS (
  SELECT series_key, ts, dval,
         CASE WHEN dval IS NOT DISTINCT FROM lag(dval) OVER w THEN 0 ELSE 1 END AS c
  FROM p WINDOW w AS (PARTITION BY series_key ORDER BY ts)
),
rid AS (
  SELECT *, sum(c) OVER (PARTITION BY series_key ORDER BY ts) AS run FROM chg
)
SELECT series_key, min(ts) AS ts, max(ts) AS end_ts, max(dval) AS dval,
       count(*) AS run_len
FROM rid GROUP BY series_key, run
""",
)
def rle_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 RLE: collapse per-series runs of equal values into
    (ts, end_ts, value) records (server/disk_datastore.cc:91-110)."""
    from open_instrument_spark.operators.rle import rle_encode as _rle

    out = _rle(_pts(spark, sf_dir))
    return out.select("series_key", "ts", "end_ts", "dval", "run_len")


@query(
    "rle_encode_chunked",
    oracle=f"""
WITH {P_CTE},
chg AS (
  SELECT series_key, ts, dval,
         CASE WHEN dval IS NOT DISTINCT FROM lag(dval) OVER w THEN 0 ELSE 1 END AS c
  FROM p WINDOW w AS (PARTITION BY series_key ORDER BY ts)
),
rid AS (
  SELECT *, sum(c) OVER (PARTITION BY series_key ORDER BY ts) AS run FROM chg
)
SELECT series_key, min(ts) AS ts, max(ts) AS end_ts, max(dval) AS dval,
       count(*) AS run_len
FROM rid GROUP BY series_key, run
""",
)
def rle_encode_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 RLE via the bounded-task two-phase plan (encode within
    time-chunks, merge runs across boundaries). Same oracle as
    rle_encode — the exact-match gate proves the chunked algorithm
    identical to the single-window one."""
    from open_instrument_spark.operators.rle import rle_encode as _rle

    out = _rle(_pts(spark, sf_dir), chunk="1d")
    return out.select("series_key", "ts", "end_ts", "dval", "run_len")


@query(
    "ingest_validate",
    oracle=f"""
WITH dirty AS (
  SELECT CASE WHEN event_id % 97 = 0 THEN 'bad name'
              ELSE '/events/' || event_type END AS name,
         CAST(user_id AS VARCHAR) AS user_id,
         CASE WHEN event_id % 89 = 0 THEN ts + INTERVAL 10 YEAR ELSE ts END AS ts,
         value AS dval
  FROM events
)
SELECT name || '{{user_id=' || user_id || '}}' AS series_key, ts, dval
FROM dirty
WHERE regexp_matches(name, '^/\\S+$') AND length(name) >= 2
  AND ts <= TIMESTAMP '{NOW}' + INTERVAL 1 SECOND
""",
)
def ingest_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+S4 ingest validation on a deliberately dirtied stream: bad
    variable names and far-future timestamps are rejected
    (server/store.cc:414-417,435-438)."""
    from open_instrument_spark.sources.ingest import validate

    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    dirty = ev.select(
        F.when(F.col("event_id") % 97 == 0, F.lit("bad name"))
        .otherwise(F.concat(F.lit("/events/"), F.col("event_type")))
        .alias("name"),
        F.create_map(F.lit("user_id"), F.col("user_id").cast("string")).alias("labels"),
        F.when(F.col("event_id") % 89 == 0, F.col("ts") + F.expr("INTERVAL 10 YEARS"))
        .otherwise(F.col("ts"))
        .alias("ts"),
        F.col("value").alias("dval"),
        F.lit(None).cast("string").alias("sval"),
    )
    out = mutate._with_key(validate(dirty, now=NOW))
    return out.select("series_key", "ts", "dval")


@query(
    "ingest_hostname_default",
    oracle=f"""
WITH {P_CTE}
SELECT name || '{{hostname=h' || CAST(CAST(user_id AS BIGINT) % 3 AS VARCHAR) || ',' ||
       CASE WHEN k IS NOT NULL THEN 'k=' || k || ',' ELSE '' END ||
       'user_id=' || user_id || '}}' AS series_key,
       ts, dval
FROM p
""",
)
def ingest_hostname_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 hostname label defaulting (server/store.cc:405-409): absent
    hostname label is filled from the source address (emulated as
    h<user_id%3>)."""
    from open_instrument_spark.sources.ingest import default_hostname

    from open_instrument_spark.model import label_value

    pts = _pts(spark, sf_dir)
    host = F.concat(F.lit("h"), (label_value(pts, "user_id").cast("long") % 3).cast("string"))
    out = default_hostname(pts, host)
    from open_instrument_spark.model import series_key as _sk

    return out.select(_sk().alias("series_key"), "ts", "dval")


@query(
    "ingest_dedup",
    oracle=f"""
WITH {P_CTE}
SELECT DISTINCT series_key, ts, dval FROM (
  SELECT series_key, ts, dval FROM p
  UNION ALL
  SELECT series_key, ts, dval FROM p
)
""",
)
def ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/§2.8 exactly-once dedup: replaying the same batch twice (the
    reference's WAL double-append hazard) yields each (series, ts)
    sample once."""
    from open_instrument_spark.sources.ingest import dedup

    pts = _pts(spark, sf_dir)
    replayed = pts.unionByName(pts)
    out = mutate._with_key(dedup(replayed))
    return out.select("series_key", "ts", "dval")


@query(
    "ingest_validate_strict",
    oracle=f"""
WITH dirty AS (
  SELECT CASE WHEN event_id % 61 = 0 THEN '/events/bad:' || event_type
              ELSE '/events/' || event_type END AS name,
         CASE WHEN event_id % 53 = 0 THEN 'bad key' ELSE 'user_id' END AS lkey,
         CAST(user_id AS VARCHAR) AS lval,
         ts, value AS dval
  FROM events
)
SELECT name || '{{' || lkey || '=' || lval || '}}' AS series_key, ts, dval
FROM dirty
WHERE NOT (regexp_matches(name, '^/\\S+$') AND length(name) >= 2
  AND ts <= TIMESTAMP '{NOW}' + INTERVAL 1 SECOND
  AND regexp_matches(name, '^/[A-Za-z0-9._\\-/*,]+$')
  AND regexp_matches(lkey, '^[A-Za-z0-9._\\-/*]+$'))
""",
)
def ingest_validate_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 strict-charset mode, returning the DEAD-LETTER side: names
    containing chars outside the declared charset (lib/variable.h:28-29
    — ':' passes the runtime ``^/\\S+$`` check but not strict mode) and
    label keys outside theirs (variable.h:30-31 — embedded space) are
    rejected by ``rejected(strict=True)``."""
    from open_instrument_spark.sources.ingest import rejected

    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    dirty = ev.select(
        F.when(
            F.col("event_id") % 61 == 0,
            F.concat(F.lit("/events/bad:"), F.col("event_type")),
        )
        .otherwise(F.concat(F.lit("/events/"), F.col("event_type")))
        .alias("name"),
        F.create_map(
            F.when(F.col("event_id") % 53 == 0, F.lit("bad key")).otherwise(
                F.lit("user_id")
            ),
            F.col("user_id").cast("string"),
        ).alias("labels"),
        F.col("ts"),
        F.col("value").alias("dval"),
        F.lit(None).cast("string").alias("sval"),
    )
    out = mutate._with_key(rejected(dirty, now=NOW, strict=True))
    return out.select("series_key", "ts", "dval")


# DuckDB twin of export_scrape.canonical_variable's quoting: quote when
# any non-value char (variable.cc:71-77) or trim-unstable, escaping
# , " \ with backslash.
def _quote_label_sql(col: str) -> str:
    return (
        f"CASE WHEN regexp_matches({col}, '[^a-zA-Z0-9_. */-]') "
        f"OR {col} != trim({col}) "
        f"THEN '\"' || regexp_replace({col}, '([,\\x22\\\\])', '\\\\\\1', 'g') || '\"' "
        f"ELSE {col} END"
    )


@query(
    "export_render",
    oracle=f"""
WITH {P_CTE},
v AS (
  SELECT name || '{{' ||
           CASE WHEN k IS NOT NULL AND k != ''
                THEN 'k=' || {_quote_label_sql('k')} || ',' ELSE '' END ||
           'user_id=' || {_quote_label_sql('user_id')} || '}}' AS var,
         ts, printf('%.6f', dval) AS val
  FROM p
)
SELECT var || chr(9) || string_agg(val, chr(9) ORDER BY ts, val) AS line
FROM v GROUP BY var
""",
)
def export_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 inverse: render points back to the /export text page —
    ``variable<TAB>value...`` per stream, canonical quoting
    (exported_vars.cc:63-86 ExportToString, variable.cc:47-105
    ToString/QuoteValue). %.6f value format pins a cross-engine float
    rendering; round-trip with the scrape parser is property-tested in
    test_export_scrape.py."""
    from open_instrument_spark.sources.export_scrape import render_export

    return render_export(_pts(spark, sf_dir), value_format="%.6f")




@query(
    "mutate_predict_linear",
    oracle=f"""
WITH {P_CTE},
g AS (
  SELECT series_key,
         count(*) AS n_samples,
         covar_pop(epoch(ts), dval) AS cxy,
         var_pop(epoch(ts)) AS vx,
         avg(epoch(ts)) AS ax,
         avg(dval) AS ay,
         max(epoch(ts)) AS mx
  FROM p GROUP BY series_key
)
SELECT series_key, n_samples,
       round(cxy / vx * 3600.0, 6) AS deriv_per_hour,
       round(ay + cxy / vx * (mx + 3600.0 - ax), 6) AS predict_1h
FROM g WHERE vx > 0
""",
)
def mutate_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series least-squares derivative + 1 h extrapolation (the
    PromQL ``deriv`` / ``predict_linear`` pair over a Get selection —
    disk-full-in-N-hours style capacity alerts). Single groupBy of
    shift-invariant moments (covar_pop/var_pop — no centering pass
    needed); series without two distinct timestamps are dropped.
    North-star TSDB extension (operators/trend.py)."""
    from open_instrument_spark.operators.trend import predict_linear

    return predict_linear(_pts(spark, sf_dir), horizon_s=3600.0)


@query(
    "mutate_counter_resets",
    oracle=f"""
WITH {P_CTE},
s AS (
  SELECT series_key, dval, lag(dval) OVER w AS pv
  FROM p WINDOW w AS (PARTITION BY series_key ORDER BY ts, dval)
)
SELECT series_key, count(*) AS n_samples,
       CAST(sum(CASE WHEN dval < pv THEN 1 ELSE 0 END) AS BIGINT) AS resets,
       CAST(sum(CASE WHEN pv IS NOT NULL AND dval != pv THEN 1 ELSE 0 END)
            AS BIGINT) AS changes
FROM s GROUP BY series_key
""",
)
def mutate_counter_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series counter health: PromQL-shaped ``resets`` (value
    decreased — the precondition RATE's monotonic-counter contract
    cares about, D1) and ``changes`` counts plus sample count. One
    lag window + reusing-the-same-exchange groupBy; integer outputs
    compared exactly. North-star TSDB extension
    (operators/trend.py)."""
    from open_instrument_spark.operators.trend import counter_stats

    return counter_stats(_pts(spark, sf_dir))


_DAY_WIN = ("make_timestamp(CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT)"
            " * 86400000 * 1000)")


@query(
    "mutate_increase",
    oracle=f"""
WITH {P_CTE},
b AS (
  SELECT series_key, {_DAY_WIN} AS win, ts, dval FROM p
),
s AS (
  SELECT series_key, win,
         CASE WHEN pv IS NULL THEN 0
              WHEN dval >= pv THEN dval - pv
              ELSE dval END AS step
  FROM (
    SELECT *, lag(dval) OVER (
      PARTITION BY series_key, win ORDER BY ts, dval) AS pv
    FROM b)
)
SELECT series_key, win AS ts, count(*) AS n_samples,
       round(sum(step), 6) AS increase
FROM s GROUP BY 1, 2
""",
)
def mutate_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``increase``-shaped reset-corrected counter growth per
    (series, day): growth steps sum, a reset contributes the restarted
    value (operators/trend.py::increase; non-extrapolated — declared
    divergence, DIVERGENCES.md D17). One exchange (lag window +
    groupBy share the clustering). North-star TSDB extension."""
    from open_instrument_spark.operators.trend import increase

    return increase(_pts(spark, sf_dir), interval_ms=86_400_000)


@query(
    "mutate_irate",
    oracle=f"""
WITH {P_CTE},
r AS (
  SELECT series_key, ts, dval,
         row_number() OVER w AS rn,
         lead(dval) OVER w AS pv,
         lead(ts) OVER w AS pt
  FROM p WINDOW w AS (PARTITION BY series_key ORDER BY ts DESC, dval DESC)
)
SELECT series_key, ts,
       round((CASE WHEN dval >= pv THEN dval - pv ELSE dval END)
             / (epoch(ts) - epoch(pt)), 6) AS irate_per_sec
FROM r WHERE rn = 1 AND pv IS NOT NULL AND epoch(ts) > epoch(pt)
""",
)
def mutate_irate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``irate``: instantaneous per-second rate from each
    series' last two samples, reset-aware (operators/trend.py::irate).
    Complements RATE (M1): irate answers "what is it doing RIGHT NOW"
    where rate smooths the whole range. Single window exchange."""
    from open_instrument_spark.operators.trend import irate

    return irate(_pts(spark, sf_dir))


@query(
    "mutate_idelta",
    oracle=f"""
WITH {P_CTE},
r AS (
  SELECT series_key, ts, dval,
         row_number() OVER w AS rn,
         lead(dval) OVER w AS pv,
         lead(ts) OVER w AS pt
  FROM p WINDOW w AS (PARTITION BY series_key ORDER BY ts DESC, dval DESC)
)
SELECT series_key, ts, round(dval - pv, 6) AS idelta
FROM r WHERE rn = 1 AND pv IS NOT NULL AND epoch(ts) > epoch(pt)
""",
)
def mutate_idelta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``idelta``: signed last-pair difference per series —
    irate's GAUGE sibling (no reset correction, no per-second
    normalization; promql/functions.go funcIdelta). Completes the
    instantaneous trio (irate / idelta / predict_linear's deriv).
    Single window exchange (operators/trend.py::idelta)."""
    from open_instrument_spark.operators.trend import idelta

    return idelta(_pts(spark, sf_dir))


@query(
    "agg_quantile_over_time",
    oracle=f"""
WITH {P_CTE},
b AS (
  SELECT series_key, {_DAY_WIN} AS ts, dval FROM p
)
SELECT series_key, ts, count(*) AS n_samples,
       round(quantile_cont(dval, 0.95), 6) AS q95
FROM b GROUP BY 1, 2
""",
)
def agg_quantile_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``quantile_over_time(0.95, ...[1d])``: per-SERIES exact
    interpolated daily p95 (operators/trend.py::quantile_over_time) —
    the per-series latency panel, vs agg_p95_by_name's cross-series
    percentile. Spark ``percentile`` ≡ DuckDB ``quantile_cont``
    (sorted[(n-1)q] linear interpolation), rounded 6 dp. One
    aggregation exchange."""
    from open_instrument_spark.operators.trend import quantile_over_time

    return quantile_over_time(_pts(spark, sf_dir), q=0.95,
                              interval_ms=86_400_000)


@query(
    "select_label_replace",
    oracle=f"""
WITH {P_CTE},
m AS (
  SELECT name || '{{cohort=c' || substr(user_id, 1, 1) || ',' ||
         CASE WHEN k IS NOT NULL THEN 'k=' || k || ',' ELSE '' END ||
         'user_id=' || user_id || '}}' AS series_key,
         dval
  FROM p
)
SELECT series_key, count(*) AS n, round(sum(dval), 6) AS total
FROM m GROUP BY 1
""",
)
def select_label_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``label_replace`` (operators/labels.py): derive a
    ``cohort`` label from the first digit of user_id via an ANCHORED
    capture-group regex, then group on the CANONICAL serialization of
    the rewritten labels — the oracle rebuilds the expected key string
    (sorted keys: cohort < k < user_id) so the map rewrite AND the
    canonical grammar both sit under the hash gate. Map-expression
    rewrite: no Python, no extra shuffle."""
    from open_instrument_spark.model import series_key
    from open_instrument_spark.operators.labels import label_replace

    pts = label_replace(_pts(spark, sf_dir).drop("series_key"),
                        "cohort", "c$1", "user_id", r"(\d)\d*")
    return (
        pts.select(series_key().alias("series_key"), "dval")
        .groupBy("series_key")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("dval"), 6).alias("total"))
    )


@query(
    "select_label_join",
    oracle=f"""
WITH {P_CTE},
m AS (
  SELECT name || '{{' ||
         CASE WHEN k IS NOT NULL THEN 'k=' || k || ',' ELSE '' END ||
         'uk=' || user_id || '-' || coalesce(k, '') || ',' ||
         'user_id=' || user_id || '}}' AS series_key,
         dval
  FROM p
)
SELECT series_key, count(*) AS n, round(sum(dval), 6) AS total
FROM m GROUP BY 1
""",
)
def select_label_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``label_join`` (operators/labels.py): ``uk`` =
    user_id-k with the absent sparse ``k`` joining as '' (Go
    strings.Join semantics — trailing separator kept), grouped on the
    canonical serialization (sorted keys: k < uk < user_id)."""
    from open_instrument_spark.model import series_key
    from open_instrument_spark.operators.labels import label_join

    pts = label_join(_pts(spark, sf_dir).drop("series_key"),
                     "uk", "-", "user_id", "k")
    return (
        pts.select(series_key().alias("series_key"), "dval")
        .groupBy("series_key")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("dval"), 6).alias("total"))
    )


_SLO_BUDGET = 1.0 - 0.95   # one shared double, repr'd into the oracle


@query(
    "alert_slo_burn",
    oracle=f"""
WITH {P_CTE},
s AS (
  SELECT make_timestamp(CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT)
                        * 86400000 * 1000) AS ts,
         sum(dval) AS traffic,
         sum(CASE WHEN name = '/events/purchase' THEN dval ELSE 0 END)
           / sum(dval) / {_SLO_BUDGET!r} AS burn
  FROM p GROUP BY 1),
l AS (
  SELECT make_timestamp(CAST(floor(epoch_ms(ts) / 604800000) AS BIGINT)
                        * 604800000 * 1000) AS lts,
         sum(CASE WHEN name = '/events/purchase' THEN dval ELSE 0 END)
           / sum(dval) / {_SLO_BUDGET!r} AS burn_long_raw
  FROM p GROUP BY 1)
SELECT s.ts, round(s.traffic, 6) AS traffic,
       round(s.burn, 6) AS burn_short,
       round(l.burn_long_raw, 6) AS burn_long,
       (s.burn > 1.0 AND l.burn_long_raw > 1.0) AS page
FROM s JOIN l
  ON l.lts = make_timestamp(CAST(floor(epoch_ms(s.ts) / 604800000)
                                 AS BIGINT) * 604800000 * 1000)
""",
)
def alert_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO burn-rate page (SRE workbook ch. 5;
    plans/alerts.py::slo_burn_rate): purchase-share of daily traffic
    as the "bad" fraction against a 95% SLO, paged only when BOTH the
    1-day and the tiling 7-day burn exceed 1× budget. The smoothing
    budget double is shared verbatim between engines (repr'd literal);
    page compares unrounded burns (quality_pass precedent)."""
    from open_instrument_spark.plans.alerts import slo_burn_rate

    return slo_burn_rate(
        _pts(spark, sf_dir), F.col("name") == "/events/purchase",
        slo=0.95, short_ms=86_400_000, long_ms=604_800_000, factor=1.0,
    )


@query(
    "agg_mad_outliers",
    oracle=f"""
WITH {P_CTE},
b AS (
  SELECT name, {_DAY_WIN} AS ts, dval FROM p
  WHERE dval IS NOT NULL AND NOT isnan(dval)
),
w1 AS (
  SELECT name, ts, dval,
         quantile_cont(dval, 0.5) OVER (PARTITION BY name, ts) AS med
  FROM b
),
w2 AS (
  SELECT name, ts, dval, med, abs(dval - med) AS ad,
         quantile_cont(abs(dval - med), 0.5)
           OVER (PARTITION BY name, ts) AS mad
  FROM w1
)
SELECT name, ts, CAST(count(*) AS BIGINT) AS n_samples,
       round(max(med), 6) AS med, round(max(mad), 6) AS mad,
       CAST(sum(CASE WHEN mad > 0 AND 0.6745 * ad / mad > 3.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM w2 GROUP BY 1, 2
""",
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier sweep via the modified z-score (Iglewicz &
    Hoaglin 1993): per (metric name, day), med/MAD across all series
    and the count of samples with 0.6745·|x−med|/MAD > 3.5 — the
    anomaly pass whose baseline the outliers themselves cannot drag
    (vs mutate_zscore's mean/σ). Cross-series grouping because the
    synthetic series are sparse (≤3 samples/series/day); the operator
    defaults to per-series (operators/trend.py::mad_outliers).
    Parity: Spark percentile ≡ DuckDB quantile_cont for BOTH nested
    medians; the unrounded decision ratio's nearest approach to the
    3.5 boundary at sf0.01 is 1.39e-3 — twelve orders above any
    re-association drift — so the count cannot flip cross-engine.
    One exchange serves both percentile windows AND the closing
    same-key aggregation."""
    from open_instrument_spark.operators.trend import mad_outliers

    return mad_outliers(_pts(spark, sf_dir), by=("name",))


@query(
    "agg_count_values",
    oracle=f"""
WITH {P_CTE}
SELECT name, {_DAY_WIN} AS ts,
       CAST(floor(dval) AS BIGINT) AS value,
       count(*) AS n
FROM p WHERE dval IS NOT NULL AND NOT isnan(dval)
GROUP BY 1, 2, 3
""",
)
def agg_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``count_values`` per (name, day): sample counts per
    floor-bucketed integer value (floor, not round — samples land
    exactly on .5 here and round's half-way rule differs across
    engines; operators/trend.py::count_values). One map-side-combinable
    aggregation exchange."""
    from open_instrument_spark.operators.trend import count_values

    return count_values(_pts(spark, sf_dir))


@query(
    "mutate_over_time_family",
    oracle=f"""
WITH {P_CTE},
b AS (
  SELECT series_key, {_DAY_WIN} AS ts, ts AS sts, dval FROM p
),
l AS (
  SELECT series_key, ts, dval AS last_ot,
         row_number() OVER (PARTITION BY series_key, ts
                            ORDER BY sts DESC, dval DESC) AS rn
  FROM b
),
g AS (
  SELECT series_key, ts,
         round(avg(dval), 6) AS avg_ot,
         min(dval) AS min_ot,
         max(dval) AS max_ot,
         round(sum(dval), 6) AS sum_ot,
         count(*) AS count_ot,
         CAST(1.0 AS DOUBLE) AS present_ot
  FROM b GROUP BY 1, 2
)
SELECT g.series_key, g.ts, g.avg_ot, g.min_ot, g.max_ot, g.sum_ot,
       g.count_ot, l.last_ot, g.present_ot
FROM g JOIN l ON g.series_key = l.series_key AND g.ts = l.ts AND l.rn = 1
""",
)
def mutate_over_time_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PromQL ``*_over_time`` range-aggregation family
    (avg/min/max/sum/count/last/present per series per 1-day window)
    in ONE aggregation exchange — last_over_time is the (ts, dval)
    struct max (argmax-without-rank; the oracle replays it as a
    row_number QUALIFY with the same ts-then-dval tie order).
    Completes the range-vector surface next to agg_quantile_over_time
    (operators/trend.py::range_aggregations)."""
    from open_instrument_spark.operators.trend import range_aggregations

    return range_aggregations(_pts(spark, sf_dir), interval_ms=86_400_000)


@query(
    "mutate_scalar_math_family",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, ts, dval,
       abs(dval) AS absv,
       ceil(dval) AS ceilv,
       floor(dval) AS floorv,
       sqrt(dval) AS sqrtv,
       round(CASE WHEN dval > 0 THEN ln(dval)
                  WHEN dval = 0 THEN CAST('-infinity' AS DOUBLE)
                  ELSE CAST('nan' AS DOUBLE) END, 6) AS lnv,
       round(CASE WHEN dval > 0 THEN log2(dval)
                  WHEN dval = 0 THEN CAST('-infinity' AS DOUBLE)
                  ELSE CAST('nan' AS DOUBLE) END, 6) AS log2v,
       round(CASE WHEN dval > 0 THEN log10(dval)
                  WHEN dval = 0 THEN CAST('-infinity' AS DOUBLE)
                  ELSE CAST('nan' AS DOUBLE) END, 6) AS log10v,
       CAST(sign(dval) AS DOUBLE) AS sgnv,
       floor(dval / CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE))
         * CAST(0.5 AS DOUBLE) AS roundv,
       greatest(least(dval, CAST(300.0 AS DOUBLE)), CAST(50.0 AS DOUBLE))
         AS clampv,
       greatest(dval, CAST(100.0 AS DOUBLE)) AS clampminv,
       least(dval, CAST(200.0 AS DOUBLE)) AS clampmaxv,
       round(sin(dval), 6) AS sinv,
       round(cos(dval), 6) AS cosv,
       round(tan(dval), 6) AS tanv,
       round(atan(dval), 6) AS atanv,
       round(CAST(1.0 AS DOUBLE)
             - CAST(2.0 AS DOUBLE) / (exp(CAST(2.0 AS DOUBLE) * dval)
                                      + CAST(1.0 AS DOUBLE)), 6) AS tanhv,
       round(degrees(dval), 6) AS degv,
       round(radians(dval), 6) AS radv
FROM p
""",
)
def mutate_scalar_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PromQL instant-vector MATH function family (r14 —
    operators/trend.py::scalar_math_family / scalar_map): abs / ceil /
    floor / sqrt / ln / log2 / log10 / sgn / round(to=0.5) / clamp /
    clamp_min / clamp_max plus the trig members whose range keeps a
    1-ulp libm divergence under the 6-dp grid (sin / cos / tan / atan /
    tanh / deg / rad), NINETEEN functions under ONE hash in one narrow
    projection (no shuffle — Catalyst fuses the whole family into the
    scan stage). The oracle replays each (DuckDB 1.0 has no hyperbolic
    functions, so tanh replays as 1 − 2/(e^{2x}+1) — overflow-safe at
    both ends, equal to libm tanh at 1e-16 before the shared 6-dp
    round),
    including the PromQL log-branch rewrite (ln(0) = -Inf, ln(<0) =
    NaN — Spark's builtin log yields NULL for both and is rewritten;
    the corpus is strictly positive so the gate exercises the finite
    branch, the IEEE branches are pinned by pytest). Only the three
    log columns are rounded (1-ulp libm divergence at |v| ≈ 1e0 sits
    1e10 below the 6-dp grid); every other member is exact integer /
    IEEE-determined arithmetic on both engines. ``exp`` is in the
    operator but deliberately NOT in the hash gate: on this corpus
    exp(490) ≈ 1e212, where a 1-ulp divergence is ~1e196 — no decimal
    rounding can absorb it — so it is pinned by pytest against numpy
    instead; sinh/cosh overflow the same way and asin/acos/asinh/
    acosh/atanh leave the real domain on this corpus (NaN columns
    carry no signal), so the whole inverse/hyperbolic tail is
    pytest-pinned with them."""
    from open_instrument_spark.operators.trend import scalar_math_family

    out = scalar_math_family(_pts(spark, sf_dir), {
        "absv": "abs",
        "ceilv": "ceil",
        "floorv": "floor",
        "sqrtv": "sqrt",
        "lnv": "ln",
        "log2v": "log2",
        "log10v": "log10",
        "sgnv": "sgn",
        "roundv": ("round", {"to": 0.5}),
        "clampv": ("clamp", {"lo": 50.0, "hi": 300.0}),
        "clampminv": ("clamp_min", {"lo": 100.0}),
        "clampmaxv": ("clamp_max", {"hi": 200.0}),
        "sinv": "sin",
        "cosv": "cos",
        "tanv": "tan",
        "atanv": "atan",
        "tanhv": "tanh",
        "degv": "deg",
        "radv": "rad",
    })
    return out.select(
        "series_key", "ts", "dval",
        "absv", "ceilv", "floorv", "sqrtv",
        F.round("lnv", 6).alias("lnv"),
        F.round("log2v", 6).alias("log2v"),
        F.round("log10v", 6).alias("log10v"),
        "sgnv", "roundv", "clampv", "clampminv", "clampmaxv",
        F.round("sinv", 6).alias("sinv"),
        F.round("cosv", 6).alias("cosv"),
        F.round("tanv", 6).alias("tanv"),
        F.round("atanv", 6).alias("atanv"),
        F.round("tanhv", 6).alias("tanhv"),
        F.round("degv", 6).alias("degv"),
        F.round("radv", 6).alias("radv"),
    )


@query(
    "mutate_calendar_family",
    oracle=f"""
WITH {P_CTE}
SELECT series_key, ts, dval,
       year(ts) AS year,
       month(ts) AS month,
       day(ts) AS day_of_month,
       dayofweek(ts) AS day_of_week,
       dayofyear(ts) AS day_of_year,
       hour(ts) AS hour,
       minute(ts) AS minute,
       day(last_day(ts)) AS days_in_month
FROM p
""",
)
def mutate_calendar_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PromQL CALENDAR function family evaluated on each sample's
    own timestamp (r14 — operators/trend.py::calendar_components):
    year / month / day_of_month / day_of_week / day_of_year / hour /
    minute / days_in_month, eight components under one hash in one
    narrow projection. Pure integer calendar math on the UTC-pinned
    session, so the gate is exact — DuckDB's dayofweek is already
    PromQL's 0=Sunday convention, Spark's 1=Sunday is shifted inside
    the operator."""
    from open_instrument_spark.operators.trend import calendar_components

    return calendar_components(_pts(spark, sf_dir))

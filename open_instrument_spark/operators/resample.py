"""Grid resampling with linear interpolation (SURVEY.md §2.3 M4/M7).

Two reference kernels exist:

- **M4, C++ ``UniformTimeSeries``** (lib/counter.cc:18-64): grid anchored
  at ``ts0 - ts0 % interval``; for each grid point g (starting at
  base+interval — the first input point is never emitted, counter.cc:21-29)
  output the linear interpolation between the inputs straddling g
  (counter.cc:45-55), or the input value exactly when an input lands on g
  (counter.cc:35-41); long gaps fill every intervening grid point from the
  same straddling pair. Because each output depends only on one
  consecutive input pair, this is expressible as PURE Spark SQL:
  lag-window → sequence() → explode — fully JVM-side, distributed,
  no Python. Validated bit-exact against the golden vector in
  lib/counter_test.cc:26-78.

- **M7, Go ``Interpolate``** (mutations/mutations.go:90-137): same grid,
  but inputs that do not cross the next pending boundary are SKIPPED
  (the straddling pair is (last boundary-crossing input, current input),
  not the adjacent pair — an artifact of the single-pass channel loop).
  Sequential state per series ⇒ Arrow-batched grouped-map kernel.
  Validated against mutations_test.go:59-77. (The reference would emit a
  duplicate when an input lands exactly on a pending boundary
  (mutations.go:117-128 emits via both the fill loop and the passthrough);
  we emit once — flagged divergence.)

- **M5 anchored Mean** (mutations.go:10-49): buckets anchored at the
  FIRST timestamp of each bucket, flushed when ``ts - first >
  duration``, stamped at the LAST input ts of the bucket, final partial
  bucket emitted. Golden: mutations_test.go:19-57.
- **M6 anchored Min/Max** (mutations.go:139-191): DIFFERENT bucketing
  from Mean in the reference — flush on ``ts >= anchor + duration``,
  output stamped at the TRIGGERING sample's ts (which is excluded from
  the flushed bucket and re-anchors the next one), and the final
  partial bucket is never emitted. See _minmax_anchored_kernel.
  Data-dependent anchoring ⇒ grouped-map kernel for all three; the
  engine's declared aligned-window variants live in mutate.py.

``max_gap_interpolate`` (lib/openinstrument.proto:45-52): proto semantics
say gaps longer than N·interval are left unfilled; BOTH reference code
paths ignore the field and fill everything. We implement the proto
semantics as an optional cap (None = reference behavior).

Domain precondition: grid resamples assume NON-NEGATIVE epoch
timestamps (ts ≥ 1970). The reference's own grid math uses C/Go
truncated ``%``/``/`` (counter.cc:21, mutations.go:103), which for
negative epochs anchors the grid at the CEILING multiple — Spark/Java
``%`` reproduces that exactly, but Python/numpy floor-``%`` (the
kernels) does not, and the cell-crossing acceptance equivalence the SQL
plan is derived from breaks below zero. Metric timestamps are
epoch-positive by construction (collectors stamp at scrape time), so we
pin the real domain with a hypothesis equivalence test
(test_interpolate_sql_equals_kernel_randomized) rather than chase
reference-faithful pre-1970 behavior all three ways.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_instrument_spark.functions.durations import parse_duration_ms
from open_instrument_spark.model import epoch_seconds
from open_instrument_spark.operators.mutate import SERIES_KEY_COL, _with_key

_US = 1_000  # ms → µs


def _chunked_lag_state(pts: DataFrame, chunk) -> DataFrame:
    """Bounded-task (lag, series-min) state for grid resampling — the
    resample twin of ``mutate._pairwise_chunked``.

    Adds ``_pt``/``_pv`` (previous sample's epoch-µs/value) and ``_ts0``
    (series' first epoch-µs, the grid anchor) WITHOUT any whole-series
    window: the lag runs within (series, time-chunk); each chunk's first
    row takes its predecessor from the previous non-empty chunk's tail,
    and ``_ts0`` is a min over the chunk-cardinality tail table. Task
    size is bounded by points-per-chunk at any series length. Requires a
    ``_t`` epoch-µs column."""
    chunk_us = parse_duration_ms(chunk) * _US
    pts = pts.withColumn("_c", F.floor(F.col("_t") / F.lit(chunk_us)))
    wc = Window.partitionBy(SERIES_KEY_COL, "_c").orderBy("_t")
    df = (
        pts.withColumn("_pt0", F.lag("_t").over(wc))
        .withColumn("_pv0", F.lag("dval").over(wc))
    )
    tails = pts.groupBy(SERIES_KEY_COL, "_c").agg(
        F.max_by(
            F.struct(F.col("dval").alias("v"), F.col("_t").alias("t")), "_t"
        ).alias("_tail"),
        F.min("_t").alias("_cmin"),
    )
    wprev = Window.partitionBy(SERIES_KEY_COL).orderBy("_c")
    state = tails.select(
        SERIES_KEY_COL,
        "_c",
        F.lag("_tail").over(wprev).alias("_ptail"),
        F.min("_cmin").over(Window.partitionBy(SERIES_KEY_COL)).alias("_ts0"),
    )
    df = df.join(state, [SERIES_KEY_COL, "_c"], "left")
    use_tail = F.col("_pt0").isNull()
    return (
        df.withColumn(
            "_pt", F.when(use_tail, F.col("_ptail.t")).otherwise(F.col("_pt0"))
        )
        .withColumn(
            "_pv", F.when(use_tail, F.col("_ptail.v")).otherwise(F.col("_pv0"))
        )
        .drop("_pt0", "_pv0", "_ptail", "_c")
    )


def uniform_average(points: DataFrame, interval, max_gap_interpolate: int | None = None,
                    chunk=None) -> DataFrame:
    """M4 AVERAGE resample (C++ UniformTimeSeries) as pure DataFrame ops.

    Output: one row per series per grid point in
    (base+interval .. last input ts], where base = ts0 - ts0 % interval.
    All grid arithmetic in epoch-µs longs (the reference uses ms; µs is
    its lossless refinement for our µs-precision timestamps).

    Scale note: ``Window.partitionBy(series_key)`` places a whole series
    in one task. ``chunk`` (duration, e.g. "1d") switches to the bounded
    two-phase plan (:func:`_chunked_lag_state` — lag within (series,
    chunk) + previous-chunk-tail handoff; the grid anchor comes from the
    chunk-tail table) with IDENTICAL results: each output row depends
    only on one consecutive input pair plus the series' first timestamp.
    """
    interval_us = parse_duration_ms(interval) * _US
    pts = _with_key(points)
    t_us = (epoch_seconds("ts") * 1_000_000).cast("long")
    pts = pts.withColumn("_t", t_us)

    i = F.lit(interval_us)
    base = (F.col("_ts0") - F.col("_ts0") % i).alias("base")

    if chunk is None:
        w = Window.partitionBy(SERIES_KEY_COL).orderBy("_t")
        wall = Window.partitionBy(SERIES_KEY_COL)
        df = (
            pts.withColumn("_pt", F.lag("_t").over(w))
            .withColumn("_pv", F.lag("dval").over(w))
            .withColumn("_ts0", F.min("_t").over(wall))
        )
    else:
        df = _chunked_lag_state(pts, chunk)
    df = (
        df.filter(F.col("_pt").isNotNull() & (F.col("_t") > F.col("_pt")))
        .withColumn("_base", base)
        # smallest grid point > prev ts (grid ≡ base mod interval)
        .withColumn("_g_lo", F.col("_pt") + (i - (F.col("_pt") - F.col("_base")) % i))
        # largest grid point <= cur ts
        .withColumn("_g_hi", F.col("_t") - (F.col("_t") - F.col("_base")) % i)
    )
    if max_gap_interpolate is not None:
        # proto semantics: leave long gaps unfilled — but an input landing
        # exactly on a grid point still passes through.
        gap_ok = (F.col("_t") - F.col("_pt")) <= F.lit(max_gap_interpolate) * i
        exact_hit = F.col("_g_hi") == F.col("_t")
        df = df.withColumn(
            "_g_lo",
            F.when(gap_ok, F.col("_g_lo")).otherwise(
                # collapse the fill range: exact hit only, else empty range
                F.when(exact_hit, F.col("_g_hi")).otherwise(F.col("_g_hi") + i)
            ),
        )
    out = (
        df.filter(F.col("_g_lo") <= F.col("_g_hi"))
        .withColumn("_g", F.explode(F.sequence("_g_lo", "_g_hi", i)))
        .withColumn(
            "dval",
            F.when(F.col("_g") == F.col("_t"), F.col("dval")).otherwise(
                (F.col("dval") - F.col("_pv"))
                / (F.col("_t") - F.col("_pt")).cast("double")
                * (F.col("_g") - F.col("_pt")).cast("double")
                + F.col("_pv")
            ),
        )
        .withColumn("ts", F.timestamp_micros(F.col("_g")))
        .select("name", "labels", "ts", "dval",
                F.lit(None).cast("string").alias("sval"), SERIES_KEY_COL)
    )
    return out


# ---------------------------------------------------------------------------
# numpy kernels (pure functions — golden-tested without Spark)
# ---------------------------------------------------------------------------

def uniform_series_kernel(ts: np.ndarray, vals: np.ndarray, interval: int
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Reference-exact C++ UniformTimeSeries (lib/counter.cc:18-64).
    ts, interval in the same integer unit (reference: ms)."""
    out_t, out_v = [], []
    if len(ts) == 0:
        return np.array(out_t, dtype=np.int64), np.array(out_v)
    base = ts[0] - ts[0] % interval
    n_out = 1
    last_t, last_v = ts[0], vals[0]
    for t, v in zip(ts[1:], vals[1:]):
        while True:
            nxt = base + interval * n_out
            if t == nxt:
                out_t.append(t)
                out_v.append(v)
                n_out += 1
                break
            if t < nxt:
                break
            while t > nxt:
                newv = (v - last_v) / (t - last_t) * (nxt - last_t) + last_v
                out_t.append(nxt)
                out_v.append(newv)
                n_out += 1
                nxt = base + interval * n_out
        last_t, last_v = t, v
    return np.array(out_t, dtype=np.int64), np.array(out_v)


def interpolate_kernel(ts: np.ndarray, vals: np.ndarray, interval: int,
                       max_gap: int | None = None
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Reference-exact Go Interpolate (mutations/mutations.go:90-137),
    minus its duplicate-emit on exact boundary hits (see module doc).

    ``max_gap`` adds the proto's ``max_gap_interpolate`` semantics
    (lib/openinstrument.proto:45-52, ignored by both reference code
    paths): a gap between accepted inputs longer than max_gap·interval
    is left unfilled — except a real input landing exactly ON a grid
    point, which still passes through (it is a real value, not a fill;
    same carve-out as uniform_average's). Emission arithmetic matches
    the SQL plan bit-for-bit (prev_v + rate at pct == 1)."""
    out_t, out_v = [], []
    if len(ts) == 0:
        return np.array(out_t, dtype=np.int64), np.array(out_v)
    if ts[0] % interval == 0:
        out_t.append(ts[0])
        out_v.append(vals[0])
        prev_t, prev_v = ts[0], vals[0]
    else:
        prev_t, prev_v = ts[0] // interval * interval, vals[0]
    pending = prev_t + interval
    for t, v in zip(ts[1:], vals[1:]):
        if t < pending:
            continue  # non-crossing inputs are skipped (mutations.go:112)
        rate = v - prev_v
        if max_gap is not None and t - prev_t > max_gap * interval:
            if t % interval == 0:  # exact grid hit passes through
                out_t.append(t)
                out_v.append(prev_v + rate)
            pending = t - t % interval + interval
        else:
            while pending <= t:
                pct = (pending - prev_t) / (t - prev_t)
                out_t.append(pending)
                out_v.append(prev_v + rate * pct)
                pending += interval
        if prev_t < t:
            prev_t, prev_v = t, v  # single emit even on exact boundary
    return np.array(out_t, dtype=np.int64), np.array(out_v)


def mean_anchored_kernel(ts: np.ndarray, vals: np.ndarray, duration: int
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Reference-exact Go Mean (mutations/mutations.go:10-49): buckets
    anchored at first-in-bucket ts, flushed when ts-first > duration,
    stamped at last included ts."""
    out_t, out_v = [], []
    if len(ts) == 0:
        return np.array(out_t, dtype=np.int64), np.array(out_v)
    first = ts[0]
    s = 0.0
    n = 0
    last = ts[0]
    for t, v in zip(ts, vals):
        if t - first > duration and n > 0:
            out_t.append(last)
            out_v.append(s / n)
            first, s, n = t, 0.0, 0
        s += v
        n += 1
        last = t
    if n:
        out_t.append(last)
        out_v.append(s / n)
    return np.array(out_t, dtype=np.int64), np.array(out_v)


def _minmax_anchored_kernel(ts, vals, duration, fn):
    """Go Min/Max (mutations.go:139-191). NOT the same bucketing as
    Mean — three deliberate reference behaviors, each visible in the Go
    loop: (1) flush when ``t >= anchor + duration`` (Mean uses strict
    ``>``); (2) the output is stamped at the TRIGGERING sample's
    timestamp, and that sample is excluded from the flushed bucket —
    it re-anchors and seeds the next bucket; (3) the final partial
    bucket is never emitted (Go flushes only on arrival of a
    triggering sample, and there is no post-loop flush like Mean's).
    """
    out_t, out_v = [], []
    if len(ts) == 0:
        return np.array(out_t, dtype=np.int64), np.array(out_v)
    anchor = ts[0]
    acc = vals[0]
    for t, v in zip(ts[1:], vals[1:]):
        if t >= anchor + duration:
            out_t.append(t)
            out_v.append(acc)
            anchor, acc = t, v
        else:
            acc = fn(acc, v)
    return np.array(out_t, dtype=np.int64), np.array(out_v)


def ewma_kernel(ts, vals, duration, alpha: float = 0.25):
    """Exponentially weighted moving average: y₀ = x₀,
    yᵢ = α·xᵢ + (1-α)·yᵢ₋₁ — the classic smoothing mutation monitoring
    UIs apply before display (not in the reference; north-star TSDB
    extension). ``duration`` is unused (kernel-contract placeholder).
    With α chosen binary-exact (default 1/4) every step is the same two
    multiplies + add in any IEEE engine, so the recursive-CTE oracle
    matches BIT-EXACTLY — no rounding needed."""
    out = np.empty(len(vals), dtype=np.float64)
    y = 0.0
    beta = 1.0 - alpha
    for i, x in enumerate(vals):
        y = x if i == 0 else alpha * x + beta * y
        out[i] = y
    return np.asarray(ts, dtype=np.int64), out


def holt_kernel(ts, vals, duration, alpha: float = 0.25, beta: float = 0.5):
    """Holt linear (double exponential) smoothing per series — the
    level+trend forecaster one step up from EWMA (Holt 1957, public):

      l₀ = x₀, b₀ = 0
      lᵢ = α·xᵢ + (1-α)·(lᵢ₋₁ + bᵢ₋₁)
      bᵢ = β·(lᵢ - lᵢ₋₁) + (1-β)·bᵢ₋₁

    Output per point is the ONE-STEP FORECAST lᵢ + bᵢ (the value the
    model predicts for the next sample — the quantity monitoring
    anomaly alerts compare against). Not in the reference; north-star
    TSDB extension. With α=1/4, β=1/2 binary-exact every step is the
    same IEEE multiplies + adds in any engine, so the recursive-CTE
    oracle matches BIT-EXACTLY (the ewma_kernel precedent).
    ``duration`` is unused (kernel-contract placeholder)."""
    out = np.empty(len(vals), dtype=np.float64)
    l = b = 0.0
    for i, x in enumerate(vals):
        if i == 0:
            l, b = x, 0.0
        else:
            lp = l
            l = alpha * x + (1.0 - alpha) * (l + b)
            b = beta * (l - lp) + (1.0 - beta) * b
        out[i] = l + b
    return np.asarray(ts, dtype=np.int64), out


def holt_winters_kernel(ts, vals, duration, alpha: float = 0.25,
                        beta: float = 0.5, gamma: float = 0.25,
                        period: int = 24):
    """Holt-Winters ADDITIVE seasonal smoothing per series — the
    seasonal rung above Holt (Winters 1960, public): level + trend +
    a ``period``-slot seasonal component updated cyclically,

      l₀ = x₀, b₀ = 0, s = [0]·period            (zero seasonal init)
      lᵢ = α·(xᵢ - s[i mod p]) + (1-α)·(lᵢ₋₁ + bᵢ₋₁)
      bᵢ = β·(lᵢ - lᵢ₋₁) + (1-β)·bᵢ₋₁
      s[i mod p] ← γ·(xᵢ - lᵢ) + (1-γ)·s[i mod p]

    Output per point is the ONE-STEP FORECAST lᵢ + bᵢ + s[(i+1) mod p]
    (next step's seasonal slot, read AFTER this step's update — it was
    written p-1 steps ago, or is still the 0 init inside the first
    season). The zero-init convention (vs. a first-season average
    warm-up) keeps every step pure IEEE multiply/add so, with
    binary-exact α=1/4, β=1/2, γ=1/4, the recursive-CTE oracle —
    which carries the seasonal slots as a LIST column — matches
    BIT-EXACTLY (the ewma/holt precedent, one more rung up).
    Not in the reference; north-star TSDB extension. ``duration``
    unused (kernel-contract placeholder)."""
    out = np.empty(len(vals), dtype=np.float64)
    sl = [0.0] * period
    l = b = 0.0
    for i, x in enumerate(vals):
        ph = i % period
        if i == 0:
            l, b = x, 0.0
        else:
            sp = sl[ph]
            lp = l
            l = alpha * (x - sp) + (1.0 - alpha) * (l + b)
            b = beta * (l - lp) + (1.0 - beta) * b
            sl[ph] = gamma * (x - l) + (1.0 - gamma) * sp
        out[i] = l + b + sl[(i + 1) % period]
    return np.asarray(ts, dtype=np.int64), out


def cusum_kernel(ts, vals, duration, slack: float = 0.0):
    """One-sided (positive) CUSUM change detector per series (Page
    1954, public) — the sequential drift alarm one rung up from
    thresholding a z-score:

      c₀ = 0,  cᵢ = max(0, cᵢ₋₁ + (xᵢ - x₀ - slack))

    with the series' FIRST value as the reference level (the
    "in-control" mean a fresh monitor observes) and ``slack`` the
    allowance k. The statistic accumulates only sustained upward
    drift; a single spike decays the next step. All ops are one IEEE
    subtract/add/max per step, so with a binary-exact slack the
    recursive-CTE oracle matches BIT-EXACTLY (the ewma precedent).
    The ``+ 0.0`` on emit normalizes a signed zero so engines cannot
    disagree on -0.0 vs 0.0. Not in the reference; north-star TSDB
    extension. ``duration`` unused (kernel-contract placeholder)."""
    out = np.empty(len(vals), dtype=np.float64)
    target = float(vals[0]) + slack
    c = 0.0
    for i, x in enumerate(vals):
        c = max(0.0, c + (float(x) - target))
        out[i] = c + 0.0
    return np.asarray(ts, dtype=np.int64), out


def min_anchored_kernel(ts, vals, duration):
    return _minmax_anchored_kernel(ts, vals, duration, min)


def max_anchored_kernel(ts, vals, duration):
    return _minmax_anchored_kernel(ts, vals, duration, max)


# ---------------------------------------------------------------------------
# grouped-map wrappers (Arrow-batched; one group = one series)
# ---------------------------------------------------------------------------

_OUT_SCHEMA = "series_key string, ts timestamp, dval double"

_KERNELS = {
    "ewma": ewma_kernel,
    "holt": holt_kernel,
    "holt_winters": holt_winters_kernel,
    "cusum": cusum_kernel,
    "interpolate": interpolate_kernel,
    "mean_anchored": mean_anchored_kernel,
    "min_anchored": min_anchored_kernel,
    "max_anchored": max_anchored_kernel,
    "uniform_average": uniform_series_kernel,
}


def apply_kernel(points: DataFrame, kind: str, interval,
                 n_buckets: int | None = None,
                 restore_labels: bool = True,
                 kernel_kwargs: dict | None = None) -> DataFrame:
    """Run a per-series kernel via applyInPandas. Grid math in epoch-µs.

    Scale note: grouping directly on series_key makes one Arrow batch per
    series — with metric-fleet cardinalities (10³-10⁶ series of modest
    size) the per-group Python/pandas overhead dominates the kernel. We
    group on a HASH BUCKET of the key instead (default 4× parallelism)
    and loop over the bucket's series inside one pandas batch: same
    results, per-batch overhead amortized over many series. A giant
    series still occupies a single bucket — no worse than the per-series
    grouping it replaces.
    """
    kernel = _KERNELS[kind]
    if kernel_kwargs:
        import functools

        kernel = functools.partial(kernel, **kernel_kwargs)
    interval_us = parse_duration_ms(interval) * _US
    keyed = _with_key(points)
    pts = keyed.select(
        SERIES_KEY_COL, (epoch_seconds("ts") * 1_000_000).cast("long").alias("_t"), "dval"
    )
    if n_buckets is None:
        # Scale buckets with the DATA, not just core count: per-bucket
        # pandas memory ≈ input_size / n_buckets, so pinning buckets to
        # 4×parallelism alone would grow per-task memory linearly with
        # input. One bucket per ~128 MB keeps a batch around one split's
        # volume; the core-count floor keeps small inputs parallel.
        # Catalyst's optimized-plan size estimate is the right probe: it
        # reflects partition pruning / pushed filters (inputFiles() does
        # not), works on any filesystem (a local getsize probe does not),
        # and costs no per-file I/O (rdd.getNumPartitions would pay ~1 s
        # of plan conversion). Unknown stats come back astronomically
        # large — treat anything over 1 PiB as unknown.
        sc = points.sparkSession.sparkContext
        n_buckets = sc.defaultParallelism * 4
        try:
            size = int(
                points._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            if 0 < size < (1 << 50):
                n_buckets = max(n_buckets, -(-size // (128 << 20)))
        except Exception:
            pass
    pts = pts.withColumn(
        "_b", F.pmod(F.xxhash64(SERIES_KEY_COL), F.lit(n_buckets))
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # Accumulate raw numpy per series; build ONE DataFrame per batch
        # (per-series DataFrame/to_datetime construction dominates
        # otherwise — it is pandas-object overhead, not kernel time).
        keys: list[np.ndarray] = []
        t_parts: list[np.ndarray] = []
        v_parts: list[np.ndarray] = []
        # one batch-wide sort; groupby preserves intra-group row order,
        # so each group arrives ts-sorted (vs one small sort per series).
        # dval is a tie-break so equal-ts points walk in the same order
        # as the streaming *_state twins and the recursive-CTE oracles
        # (same pin aggregate_anchored carries).
        pdf = pdf.sort_values(["series_key", "_t", "dval"])
        for sk, g in pdf.groupby("series_key", sort=False):
            out_t, out_v = kernel(
                g["_t"].to_numpy(np.int64), g["dval"].to_numpy(np.float64), interval_us
            )
            if len(out_t):
                keys.append(np.full(len(out_t), sk, dtype=object))
                t_parts.append(out_t)
                v_parts.append(np.asarray(out_v, dtype=np.float64))
        if not t_parts:
            return pd.DataFrame(
                {"series_key": pd.Series([], dtype=str),
                 "ts": pd.Series([], dtype="datetime64[ns]"),
                 "dval": pd.Series([], dtype=float)}
            )
        return pd.DataFrame(
            {
                "series_key": np.concatenate(keys),
                "ts": pd.to_datetime(np.concatenate(t_parts), unit="us"),
                "dval": np.concatenate(v_parts),
            }
        )

    # Explicit repartition-by-num, NOT a bare groupBy shuffle: AQE
    # coalesces shuffle partitions by BYTES, and a per-series kernel
    # stage is Python-compute-bound at ~KB/row — at sf0.1 the 128-bucket
    # exchange is ~4 MB so AQE was coalescing it to 3 tasks, serializing
    # the whole kernel onto 3 cores (and letting any host contention
    # land on a 3-wide straggler stage — the r8 bench-tail cause). A
    # user-specified partition count is exempt from AQE coalescing, and
    # hash(_b) partitioning satisfies the groupBy's clustering
    # requirement so no second exchange is added (plan-asserted).
    out = (
        pts.repartition(n_buckets, "_b")
        .groupBy("_b")
        .applyInPandas(run, _OUT_SCHEMA)
    )
    return _restore_points_schema(out, keyed, restore_labels)


def _restore_points_schema(out: DataFrame, keyed: DataFrame,
                           restore_labels: bool) -> DataFrame:
    """Restore the full points schema so resamples compose with every
    other operator (retention bands, pipeline chaining into _bucketed,
    ...). name comes EXACTLY from the canonical key (prefix before '{');
    labels come from a series-cardinality dim joined back on the key —
    nulling them instead would silently merge distinct series on any
    later series_key recomputation (e.g. a retention rewrite).
    restore_labels=False skips the dim join for consumers that project
    labels away (the join is correctness-critical when output is
    WRITTEN BACK as points, e.g. retention bands — see test
    test_kernel_retention_preserves_series_identity)."""
    if restore_labels:
        dim = keyed.select(SERIES_KEY_COL, "labels").dropDuplicates([SERIES_KEY_COL])
        out = out.join(dim, SERIES_KEY_COL, "left")
    else:
        out = out.withColumn("labels", F.lit(None).cast("map<string,string>"))
    return out.select(
        F.regexp_extract(SERIES_KEY_COL, r"^([^{]*)", 1).alias("name"),
        "labels",
        "ts",
        "dval",
        F.lit(None).cast("string").alias("sval"),
        SERIES_KEY_COL,
    )


def _interpolate_sql(points: DataFrame, interval, chunk=None,
                     max_gap_interpolate: int | None = None,
                     restore_labels: bool = True) -> DataFrame:
    """M7 Go Interpolate (mutations/mutations.go:90-137) as PURE Spark
    SQL — no Python on the data path.

    Derivation (why the single-pass channel loop is expressible
    declaratively): the kernel's state after any prefix is (prev_t,
    prev_v) of the last ACCEPTED input, with pending = the smallest grid
    point (grid = absolute multiples of interval) > prev_t. An input is
    accepted iff it reaches pending, i.e. iff its grid CELL
    (cell(t) = t - t % interval) exceeds the previous input's cell —
    every input between two accepted ones shares the accepted one's
    cell, so acceptance is a pure lag condition. The interpolation pair
    for an accepted input is therefore (first input of the previous
    input's cell) — except when that cell is the series' FIRST cell,
    where the kernel anchors at (ts0 - ts0 % interval, vals0)
    (mutations.go:99-105). Emitted grid points for an accepted input t:
    (prev cell .. cell(t)], value = prev_v + (v - prev_v) *
    ((g - prev_t) / (t - prev_t)) — bit-identical IEEE ops to the
    kernel. An on-grid FIRST input additionally passes through
    (mutations.go:100-102).

    Plan (r5 window form — measured 2.4× over the former join form at
    sf0.1, row-identical): the first-of-cell pair rides along as a
    ``min(struct(_t, dval))`` window over (series, cell) — the lag of
    that struct IS the previous cell's first input, because the
    immediately preceding row always belongs to the previous cell — so
    the per-row state needs one (series, cell) window + one per-series
    lag window instead of two aggregates joined back (two exchanges vs
    five plan nodes; the second window reuses the first's partitioning
    where Catalyst allows). With ``chunk`` set, the lag runs per
    (series, chunk) with a tail-struct handoff (bounded tasks) and the
    anchor cell comes from a series-cardinality aggregate join instead
    of an unbounded window, preserving the bounded-task guarantee.
    Validated row-identical to interpolate_kernel (golden vectors +
    whole-table equivalence tests)."""
    interval_us = parse_duration_ms(interval) * _US
    i = F.lit(interval_us)
    keyed = _with_key(points)
    pts_base = (
        keyed.withColumn("_t", (epoch_seconds("ts") * 1_000_000).cast("long"))
        .withColumn("_cell", F.col("_t") - F.col("_t") % i)
    )
    # first input (t, dval) of the row's OWN cell; its lag over the
    # series order = first input of the PREVIOUS row's cell — exactly
    # the interpolation predecessor the kernel tracks. min(struct) is
    # ordered by _t first (deterministic even on duplicate timestamps).
    wcell = Window.partitionBy(SERIES_KEY_COL, "_cell")
    pts = pts_base.withColumn(
        "_f", F.min(F.struct(F.col("_t"), F.col("dval"))).over(wcell)
    )
    if chunk is None:
        w = Window.partitionBy(SERIES_KEY_COL).orderBy("_t")
        df = (
            pts.withColumn("_pcell", F.lag("_cell").over(w))
            .withColumn("_pf", F.lag("_f").over(w))
            .withColumn(
                "_c0", F.min("_cell").over(Window.partitionBy(SERIES_KEY_COL))
            )
        )
    else:
        chunk_us = parse_duration_ms(chunk) * _US
        pts_c = pts.withColumn("_c", F.floor(F.col("_t") / F.lit(chunk_us)))
        wc = Window.partitionBy(SERIES_KEY_COL, "_c").orderBy("_t")
        df = pts_c.withColumn(
            "_p0", F.lag(F.struct(F.col("_cell"), F.col("_f"))).over(wc)
        )
        tails = pts_c.groupBy(SERIES_KEY_COL, "_c").agg(
            F.max_by(F.struct(F.col("_cell"), F.col("_f")), "_t").alias("_tp")
        )
        wprev = Window.partitionBy(SERIES_KEY_COL).orderBy("_c")
        state = tails.select(
            SERIES_KEY_COL, "_c", F.lag("_tp").over(wprev).alias("_ptp")
        )
        anchors = pts_base.groupBy(SERIES_KEY_COL).agg(F.min("_cell").alias("_c0"))
        df = (
            df.join(state, [SERIES_KEY_COL, "_c"], "left")
            .withColumn("_p", F.coalesce("_p0", "_ptp"))
            .withColumn("_pcell", F.col("_p._cell"))
            .withColumn("_pf", F.col("_p._f"))
            .join(anchors, SERIES_KEY_COL)
        )

    accepted = (
        df.filter(F.col("_pcell").isNotNull() & (F.col("_cell") > F.col("_pcell")))
        .withColumn(
            "_pt",
            F.when(F.col("_pcell") == F.col("_c0"), F.col("_pcell")).otherwise(
                F.col("_pf._t")
            ),
        )
        .withColumn("_pv", F.col("_pf.dval"))
    )
    if max_gap_interpolate is not None:
        # proto max_gap_interpolate (lib/openinstrument.proto:45-52):
        # a gap between accepted inputs longer than N·interval is left
        # unfilled — but an accepted input landing exactly ON a grid
        # point still passes through (real value, not a fill; the
        # formula at _g == _t degenerates to prev_v + rate, matching
        # interpolate_kernel bit-for-bit).
        gap_ok = (F.col("_t") - F.col("_pt")) <= F.lit(max_gap_interpolate) * i
        exact_hit = F.col("_cell") == F.col("_t")
        accepted = accepted.withColumn(
            "_g_lo",
            F.when(gap_ok, F.col("_pcell") + i).otherwise(
                F.when(exact_hit, F.col("_cell")).otherwise(F.col("_cell") + i)
            ),
        ).filter(F.col("_g_lo") <= F.col("_cell"))
    else:
        accepted = accepted.withColumn("_g_lo", F.col("_pcell") + i)
    accepted = (
        accepted
        .withColumn("_g", F.explode(F.sequence("_g_lo", "_cell", i)))
        .select(
            SERIES_KEY_COL,
            F.timestamp_micros(F.col("_g")).alias("ts"),
            (
                F.col("_pv")
                + (F.col("dval") - F.col("_pv"))
                * (
                    (F.col("_g") - F.col("_pt")).cast("double")
                    / (F.col("_t") - F.col("_pt")).cast("double")
                )
            ).alias("dval"),
        )
    )
    # on-grid first input passes through (mutations.go:100-102) — derived
    # from a series-cardinality min_by over the PRE-WINDOW projection,
    # NOT by reusing the window subtree (which the union would duplicate
    # into a second full pass)
    first_rows = pts_base.groupBy(SERIES_KEY_COL).agg(
        F.min_by(
            F.struct(F.col("ts"), F.col("dval"), F.col("_t")), "_t"
        ).alias("_fr")
    )
    passthrough = first_rows.filter(F.col("_fr._t") % i == 0).select(
        SERIES_KEY_COL,
        F.col("_fr.ts").alias("ts"),
        F.col("_fr.dval").alias("dval"),
    )
    out = passthrough.unionByName(accepted)
    return _restore_points_schema(out, keyed, restore_labels)


def interpolate(points: DataFrame, interval, chunk=None, impl: str = "sql",
                max_gap_interpolate: int | None = None, **kw) -> DataFrame:
    """M7 NONE+sample_frequency (Go Interpolate).

    Default ``impl="sql"`` runs the pure-SQL plan (:func:`_interpolate_sql`
    — distributed, codegen'd, ``chunk``-boundable); ``impl="kernel"``
    keeps the reference-shaped Arrow grouped-map kernel (golden-tested,
    used as the equivalence cross-check). ``max_gap_interpolate`` caps
    gap filling per the proto semantics (lib/openinstrument.proto:45-52)
    on BOTH impls — the reference's own code paths ignore the field."""
    if impl == "kernel":
        if chunk is not None:
            raise ValueError("chunk= requires impl='sql'")
        return apply_kernel(
            points, "interpolate", interval,
            kernel_kwargs=(
                {"max_gap": max_gap_interpolate}
                if max_gap_interpolate is not None else None
            ),
            **kw,
        )
    return _interpolate_sql(
        points, interval, chunk=chunk,
        max_gap_interpolate=max_gap_interpolate, **kw
    )


def mean_anchored(points: DataFrame, interval, **kw) -> DataFrame:
    """M5 reference-anchored Mean (golden-parity variant)."""
    return apply_kernel(points, "mean_anchored", interval, **kw)


def min_anchored(points: DataFrame, interval, **kw) -> DataFrame:
    """M6 reference-anchored Min (mutations/mutations.go:139-164)."""
    return apply_kernel(points, "min_anchored", interval, **kw)


def max_anchored(points: DataFrame, interval, **kw) -> DataFrame:
    """M6 reference-anchored Max (mutations/mutations.go:166-191)."""
    return apply_kernel(points, "max_anchored", interval, **kw)


def ewma(points: DataFrame, alpha: float = 0.25, **kw) -> DataFrame:
    """EWMA smoothing per series (see ewma_kernel); α defaults to a
    binary-exact 1/4 so results are engine-bit-exact."""
    return apply_kernel(points, "ewma", "1s", kernel_kwargs={"alpha": alpha}, **kw)


def holt(points: DataFrame, alpha: float = 0.25, beta: float = 0.5,
         **kw) -> DataFrame:
    """Holt level+trend one-step forecast per series (see holt_kernel);
    binary-exact α=1/4, β=1/2 defaults keep it engine-bit-exact."""
    return apply_kernel(points, "holt", "1s",
                        kernel_kwargs={"alpha": alpha, "beta": beta}, **kw)


def cusum(points: DataFrame, slack: float = 0.0, **kw) -> DataFrame:
    """One-sided positive CUSUM drift statistic per series (see
    cusum_kernel); binary-exact slack keeps it engine-bit-exact."""
    return apply_kernel(points, "cusum", "1s",
                        kernel_kwargs={"slack": slack}, **kw)


def holt_winters(points: DataFrame, alpha: float = 0.25, beta: float = 0.5,
                 gamma: float = 0.25, period: int = 24, **kw) -> DataFrame:
    """Holt-Winters additive seasonal one-step forecast per series (see
    holt_winters_kernel); binary-exact α=1/4, β=1/2, γ=1/4 defaults
    keep it engine-bit-exact; ``period`` in samples."""
    return apply_kernel(points, "holt_winters", "1s",
                        kernel_kwargs={"alpha": alpha, "beta": beta,
                                       "gamma": gamma, "period": period},
                        **kw)

"""Skew-shaped scale probe: measure the guarded operator forms UNDER the
skew they exist for, not just under uniform growth (judge r5 "Next
round" #2; the reference's own block-split exists for hot key ranges,
datastore/datastore.go:354-428).

Two adversarial shapes:

- **Tier A — hot series**: the sf0.1 events table multiplied 10×
  (~1 M points), then HALF of all points remapped onto ONE series.
  Per-series window operators (rate, RLE, M4 uniform resample) run
  plain (whole series in one task) vs with their ``chunk=`` bounded
  two-phase twins (row-identical by construction, oracle-proven). The
  chunked forms should stay flat where the plain forms serialize on the
  single hot task.

- **Tier B — boilerplate shingle**: every document gets the same
  boilerplate sentence appended, so a handful of shingles appear in ALL
  docs. ``ngram_jaccard_pairs`` runs with the default
  ``max_bucket=1000`` candidate guard vs ``max_bucket=None``: unguarded,
  each universal shingle contributes C(N,2) candidate pairs — the
  quadratic blowup the guard caps.

Reports wall seconds per variant plus the process-tree peak-RSS
watermark after each (VmHWM is monotonic; deltas attribute growth to
the variant that caused it), and the same load-evidence fields as
bench.py. One JSON line.

Usage: python tools/skew_probe.py [sf_dir]
       SPARK_GRAFT_SKEW_MULT=10 SPARK_GRAFT_SKEW_DOCS=3000 override.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from open_instrument_spark.model import events_to_points
from open_instrument_spark.operators import mutate
from open_instrument_spark.operators.dedup import ngram_jaccard_pairs
from open_instrument_spark.operators.resample import uniform_average
from open_instrument_spark.operators.rle import rle_encode
from open_instrument_spark.session import get_spark, prepare
from open_instrument_spark.sources.tables import load_tables
from scale_probe import multiplied, peak_rss_mb


def hot_series_points(ev):
    """Half of all points (deterministic xxhash64 parity of (ts, dval) —
    event_id doesn't survive events_to_points) collapsed onto one
    series: the 50%-hot-key shape."""
    pts = events_to_points(ev)
    hot = F.col("_hot")
    return (
        pts.withColumn("_hot", F.pmod(F.xxhash64("ts", "dval"), F.lit(2)) == 0)
        .withColumn("name", F.when(hot, F.lit("/events/hot")).otherwise(F.col("name")))
        .withColumn(
            "labels",
            F.when(hot, F.create_map(F.lit("user_id"), F.lit("0")))
            .otherwise(F.col("labels")),
        )
        .drop("_hot")
    )


def main() -> None:
    from bench import _load_evidence  # repo root on sys.path (line 38)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(os.environ.get("SPARK_GRAFT_SKEW_MULT", "10"))
    n_docs = int(os.environ.get("SPARK_GRAFT_SKEW_DOCS", "3000"))
    load_before = _load_evidence()
    spark = get_spark("skew-probe")
    prepare(spark)

    def run(df) -> float:
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        return round(time.monotonic() - t0, 2)

    ev = load_tables(spark, sf_dir).table("events")
    pts = hot_series_points(multiplied(ev, mult))
    docs = load_tables(spark, sf_dir).table("documents").limit(n_docs)
    boiler = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" this document is provided as is without warranty of any"
                  " kind either express or implied including fitness"),
        ),
    )

    tier_a = {
        "rate_plain": lambda: mutate.rate(pts),
        "rate_chunked": lambda: mutate.rate(pts, chunk="6h"),
        "rle_plain": lambda: rle_encode(pts),
        "rle_chunked": lambda: rle_encode(pts, chunk="6h"),
        "uniform_plain": lambda: uniform_average(pts, "5m"),
        "uniform_chunked": lambda: uniform_average(pts, "5m", chunk="6h"),
    }
    tier_b = {
        "jaccard_guarded": lambda: ngram_jaccard_pairs(
            boiler, threshold=0.8, max_bucket=1000, log_dropped=False
        ),
        "jaccard_unguarded": lambda: ngram_jaccard_pairs(
            boiler, threshold=0.8, max_bucket=None
        ),
    }

    # warm codegen/Arrow/file-listing with cheap same-shape plans
    run(mutate.rate(events_to_points(ev)))
    run(ngram_jaccard_pairs(docs.limit(50), max_bucket=1000, log_dropped=False))

    report: dict[str, dict] = {}
    for tier, ops in (("hot_series", tier_a), ("boilerplate_shingle", tier_b)):
        report[tier] = {}
        for name, thunk in ops.items():
            wall = run(thunk())
            report[tier][name] = {"wall_s": wall, "peak_rss_mb": peak_rss_mb()}

    load_after = _load_evidence()
    ncpu = load_after["cpus"]
    contended = (
        load_before["competing_spark_pids"] > 0
        or load_after["competing_spark_pids"] > 0
        or (ncpu > 0 and load_before["loadavg"][1] > 0.25 * ncpu)
    )
    print(json.dumps({
        "sf": sf_dir, "events_mult": mult, "n_docs": n_docs,
        "hot_fraction": 0.5, "tiers": report,
        "load_before": load_before, "load_after": load_after,
        "contended": contended,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

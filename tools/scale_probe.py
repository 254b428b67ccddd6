"""Scale-linearity probe: time key operators on 1x and 10x the sf0.1
events table (100 k rows; 10x = union of shifted copies with disjoint
user ids — same skew profile, 1 M rows) and report the runtime ratio. A ratio well under 10 means local
runtime is overhead-dominated and the data path has headroom; a ratio
near or above 10 flags an operator whose plan degrades super-linearly.

Usage: python tools/scale_probe.py [sf_dir]   # one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from open_instrument_spark.model import events_to_points
from open_instrument_spark.operators import aggregate as agg
from open_instrument_spark.operators import mutate
from open_instrument_spark.operators.rle import rle_encode
from open_instrument_spark.operators.temporal import as_of_join
from open_instrument_spark.session import get_spark, prepare
from open_instrument_spark.sources.tables import load_tables

MULT = 10


def multiplied(ev, k: int):
    out = ev
    for i in range(1, k):
        out = out.unionByName(
            ev.select(
                (F.col("event_id") + i * 10_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + i * 10_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    return out


def operators(ev):
    pts = events_to_points(ev)
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return {
        "flagship_rate_sum": agg.aggregate_by_name(mutate.rate(pts), "sum", 300_000),
        "rate_chunked": mutate.rate(pts, chunk="1d"),
        "mean_resample": mutate.mean_resample(pts, "1h", carry_labels=False),
        "rle_encode": rle_encode(pts),
        "asof_join": as_of_join(purch, views, on=["user_id"]),
    }


def multiplied_emb(emb, k: int):
    """k× embeddings via ROTATED copies (dims cycled per copy): rotations
    of random vectors are ~orthogonal to their originals, so copies add
    corpus mass without planting artificial near-dup pairs — output
    density stays realistic and the probe measures candidate-generation
    scaling, not a quadratic output explosion."""
    base = emb.select("vec_id", "embedding")
    out = base
    for i in range(1, k):
        rot = F.concat(
            F.slice(F.col("embedding"), i + 1, 64 - i),
            F.slice(F.col("embedding"), 1, i),
        )
        out = out.unionByName(
            base.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                rot.alias("embedding"),
            )
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    emb = load_tables(spark, sf_dir).table("embeddings")

    from open_instrument_spark.operators.similarity import near_dup_pairs_lsh

    def run(df) -> float:
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        return time.monotonic() - t0

    # warm every operator (codegen, Arrow/pandas init, file listing) so
    # the measured x1 runs aren't cold while x10 runs are warm
    for df in operators(ev).values():
        run(df)
    run(near_dup_pairs_lsh(emb, threshold=0.4))

    report = {}
    for label, k in (("x1", 1), ("x10", MULT)):
        big = multiplied(ev, k)
        for name, df in operators(big).items():
            report.setdefault(name, {})[label] = round(run(df), 2)
        # auto plane count rises with N, keeping bucket occupancy (and so
        # candidate volume per vector) bounded — the probe times the
        # whole pipeline including the sizing count()
        report.setdefault("near_dup_lsh", {})[label] = round(
            run(near_dup_pairs_lsh(multiplied_emb(emb, k), threshold=0.4)), 2
        )
    for name, r in report.items():
        r["ratio"] = round(r["x10"] / max(r["x1"], 1e-9), 2)
    print(json.dumps({"sf": sf_dir, "mult": MULT, "operators": report}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Measure the two bucket-assignment engines for the le-histogram build
(judge r9 "Next round" #4): the literal-grid codegen sum-of-whens vs the
interpreted higher-order ``size(filter(...))`` form, at sf0.1 events ×1
and ×100 (100 k → 10 M raw points — the build scan is the one stage
that touches every row at 100 TB). Winner becomes the default engine in
``operators/histogram.py::bucket_index``; the loser stays available as
``engine="hof"`` with the measured numbers in the docstring.

Usage: python tools/hist_engine_bench.py [sf_dir]   # one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_instrument_spark.model import events_to_points
from open_instrument_spark.operators.histogram import histogram_bucket_counts
from open_instrument_spark.session import get_spark, prepare
from tools.scale_probe import multiplied


def main() -> None:
    from open_instrument_spark.sources.tables import load_tables

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("hist-engine-bench")
    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")

    def run(df) -> float:
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        return time.monotonic() - t0

    report: dict[str, dict[str, float]] = {}
    for engine in ("codegen", "hof"):
        # warm (codegen compile, file listing) before timing either tier
        run(histogram_bucket_counts(events_to_points(ev), engine=engine))
        for k in (1, 100):
            pts = events_to_points(multiplied(ev, k))
            # alternate-engine warm ran already; median of 3 passes
            walls = sorted(
                run(histogram_bucket_counts(pts, engine=engine))
                for _ in range(3)
            )
            report.setdefault(engine, {})[f"x{k}"] = round(walls[1], 2)
    print(json.dumps({"sf": sf_dir, "build_median_of_3": report}))
    spark.stop()


if __name__ == "__main__":
    main()

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"name", "ts", "sum_rate"}


def test_queries_have_matching_oracles():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 1


def test_percentile_agg_extension(spark):
    """"p<q>" aggregation strings: p50 must equal median (same
    interpolated percentile), arbitrary quantiles parse, bad ones raise."""
    import pytest
    from pyspark.sql import functions as F

    from open_instrument_spark.operators import aggregate as agg_ops

    df = spark.createDataFrame(
        [("m", 1.0), ("m", 2.0), ("m", 10.0), ("m", 11.5)], "name string, dval double"
    )
    p50 = df.groupBy("name").agg(agg_ops._agg_expr("p50")).collect()[0]["value"]
    med = df.groupBy("name").agg(agg_ops._agg_expr("median")).collect()[0]["value"]
    assert p50 == med == 6.0
    p999 = df.groupBy("name").agg(agg_ops._agg_expr("p99.9")).collect()[0]["value"]
    assert 11.4 < p999 <= 11.5
    for bad in ("p0", "p101", "p", "px", "quantile"):
        with pytest.raises(ValueError):
            agg_ops._agg_expr(bad)


def test_sliding_window_degenerates_to_tumbling(spark):
    """window == slide must reproduce the tumbling A7 aggregation
    exactly, and a non-multiple window is a contracted error."""
    from open_instrument_spark.model import events_to_points
    from open_instrument_spark.operators.aggregate import (
        aggregate_by_name,
        aggregate_by_name_sliding,
    )
    from open_instrument_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    pts = events_to_points(load_tables(spark, SF_SMOKE).table("events"))
    tumb = {(r["name"], r["ts"], round(r["value"], 9))
            for r in aggregate_by_name(pts, "sum", 3_600_000).collect()}
    slide = {(r["name"], r["ts"], round(r["value"], 9))
             for r in aggregate_by_name_sliding(
                 pts, "sum", 3_600_000, 3_600_000).collect()}
    assert tumb == slide and len(tumb) > 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple"):
        aggregate_by_name_sliding(pts, "sum", 3_600_000, 2_400_000)
    from open_instrument_spark.operators.aggregate import histogram_by_name

    with _pytest.raises(ValueError, match="bucket_width"):
        histogram_by_name(pts, 0.0)

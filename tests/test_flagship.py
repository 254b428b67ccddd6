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

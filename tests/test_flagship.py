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

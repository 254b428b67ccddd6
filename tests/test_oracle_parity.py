"""Local DuckDB-oracle replay for the oracled queries demoted past the
driver's 50-entry correctness window (registry._PAST_WINDOW_ORACLED).

Same gate the driver applies — run the Spark query and the DuckDB oracle
on identical parquet, sort columns by name, sort rows, compare values —
so demotion out of the driver window loses no rigor; it only moves the
replay from the driver to pytest.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from open_instrument_spark import registry
from tests.conftest import SF_ORACLE, SF_SMOKE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.execute("SET TimeZone='UTC'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, dtype-normalized frame."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


@pytest.mark.parametrize("name", registry._PAST_WINDOW_ORACLED)
def test_demoted_query_matches_duckdb_oracle(spark, name):
    got = canon(registry.QUERIES[name](spark, SF_SMOKE).toPandas())
    want = canon(run_oracle(registry.ORACLES[name], SF_SMOKE))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs oracle {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9)


def test_hll_distinct_series_within_error_bound(spark):
    """agg_distinct_series_hll (rows-only) must track the exact oracled
    twin within 5% on every (name, day) cell at sf0.01 — the HLL++
    rsd=2% configuration leaves comfortable margin."""
    from open_instrument_spark import registry

    exact = {
        (r["name"], r["ts"]): r["n_series"]
        for r in registry.QUERIES["agg_distinct_series"](
            spark, SF_ORACLE
        ).collect()
    }
    approx = {
        (r["name"], r["ts"]): r["n_series"]
        for r in registry.QUERIES["agg_distinct_series_hll"](
            spark, SF_ORACLE
        ).collect()
    }
    assert exact.keys() == approx.keys()
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, n, approx[k])

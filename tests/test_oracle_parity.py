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
from pyspark.sql import functions as F
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


def test_approx_p95_rank_guarantee(spark):
    """agg_p95_approx_by_name (rows-only GK sketch, accuracy 10^4):
    the sketch returns an ELEMENT of each cell whose rank is within
    epsilon*n of the 0.95 target — the sketch's actual contract (the
    interpolating exact twin can sit between elements, so a value-delta
    bound is the wrong assertion on small hourly cells)."""
    import math
    from collections import defaultdict

    from open_instrument_spark import registry
    from open_instrument_spark.queries.tsdb import _pts

    cells = defaultdict(list)
    pts = _pts(spark, SF_ORACLE).select(
        "name", F.date_trunc("hour", "ts").alias("h"), "dval"
    )
    for r in pts.collect():
        cells[(r["name"], r["h"])].append(r["dval"])
    approx = {
        (r["name"], r["ts"]): r["value"]
        for r in registry.QUERIES["agg_p95_approx_by_name"](
            spark, SF_ORACLE
        ).collect()
    }
    assert set(approx) == set(cells)
    for k, vals in cells.items():
        vals.sort()
        n = len(vals)
        assert approx[k] in vals, k          # an element, not interpolated
        rank = vals.index(approx[k]) + 1
        target = 0.95 * n
        # Two-sided GK epsilon contract: a sketch returning each cell's
        # max would satisfy the lower bound alone.
        assert rank >= math.floor(target) - max(1, 0.001 * n), (k, rank, n)
        assert rank <= math.ceil(target) + max(1, 0.001 * n), (k, rank, n)

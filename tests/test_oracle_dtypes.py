"""Registry-wide oracle output-dtype audit (judge r13 "Next round" #2).

r13's one red driver row (`embed_label_propagation`) was caused not by
wrong values but by oracle TYPING: DuckDB's ``sum(BIGINT)`` returns
HUGEINT, which pandas materializes as float64, while the Spark side
emits int64 — equal values, dtype-divergent driver hash. The repo's
convention (explicit ``CAST(... AS BIGINT)`` / ``AS DOUBLE`` on every
aggregate) guarded against this by eyeball only; this module makes it
mechanical:

- every registered oracle is bound through DuckDB ``DESCRIBE`` and no
  HUGEINT / UHUGEINT / DECIMAL / unsigned-int column may survive to the
  output projection (those types all round-trip through pandas as a
  DIFFERENT kind than their Spark counterpart);
- the detector itself is pinned by a seeded negative (an un-cast
  ``sum(BIGINT)``) so the audit can't silently rot;
- ``tools/check_oracle.py``'s compare() is pinned to FLAG an
  int-vs-float column-kind mismatch instead of silently casting through
  float (the exact masking that let the r13 red row past the local
  gate).

DESCRIBE binds without executing, so the full 171-oracle sweep costs
milliseconds — it runs against the sf0.001 views purely for schema
resolution.
"""

from __future__ import annotations

import re

import duckdb
import numpy as np
import pandas as pd
import pytest

from open_instrument_spark import registry
from tests.conftest import SF_SMOKE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Types whose pandas materialization diverges in KIND from the int64 /
# float64 a Spark query emits: HUGEINT/UHUGEINT -> float64 or object,
# DECIMAL -> float64-via-decimal (width-dependent), unsigned ints ->
# uint64 (hashes differently from int64).
FORBIDDEN = re.compile(
    r"HUGEINT|UHUGEINT|DECIMAL|UTINYINT|USMALLINT|UINTEGER|UBIGINT"
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("SET TimeZone='UTC'")
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield c
    c.close()


def forbidden_columns(con, sql: str) -> list[tuple[str, str]]:
    """(column, duckdb_type) pairs in the query's output schema whose
    type would materialize with a non-Spark pandas kind."""
    rows = con.execute("DESCRIBE " + sql).fetchall()
    return [(r[0], r[1]) for r in rows if FORBIDDEN.search(r[1])]


def test_no_oracle_emits_kind_divergent_types(con):
    offenders = {}
    for name, sql in registry.ORACLES.items():
        hits = forbidden_columns(con, sql)
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "Oracles emitting HUGEINT/DECIMAL/unsigned columns (cast them "
        f"to BIGINT/DOUBLE in the projection): {offenders}"
    )


def test_audit_catches_seeded_uncast_sum(con):
    # The exact shape that produced r13's red row: sum over a BIGINT
    # expression with no cast -> HUGEINT output.
    hits = forbidden_columns(
        con,
        "SELECT o_custkey, sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS w "
        "FROM orders GROUP BY o_custkey",
    )
    assert hits == [("w", "HUGEINT")]
    # And the repo convention fixes it:
    assert forbidden_columns(
        con,
        "SELECT o_custkey, CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)) "
        "AS BIGINT) AS w FROM orders GROUP BY o_custkey",
    ) == []


def test_check_oracle_compare_flags_kind_mismatch():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    sdf = pd.DataFrame({"k": [1, 2], "v": np.array([10, 20], dtype=np.int64)})
    odf = pd.DataFrame({"k": [1, 2], "v": np.array([10.0, 20.0])})
    problems = mod.compare("seeded", sdf, odf)
    assert any("DTYPE KIND MISMATCH" in p for p in problems), problems
    # Equal values AND equal kinds stay clean.
    assert mod.compare("clean", sdf, sdf.copy()) == []

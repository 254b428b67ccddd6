"""Local replica of the driver's correctness gate.

Runs every registry query on Spark at a given sf dir, runs its DuckDB
oracle on the same parquet files, and compares row count, schema shape,
and order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_instrument_spark.session import get_spark
from open_instrument_spark.sources.tables import TABLE_NAMES
import __spark_entry__ as entrymod


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True)


def _dtype_kind(dt: np.dtype) -> str:
    """Collapse a numpy dtype to the kind the driver's hash cares
    about: int vs float vs bool vs datetime vs object. Width (int32 vs
    int64) is forgiven — pandas materializes both sides at 64-bit —
    but a kind flip (int vs float) changes the hashed bytes."""
    if np.issubdtype(dt, np.bool_):
        return "bool"
    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.floating):
        return "float"
    if np.issubdtype(dt, np.datetime64):
        return "datetime"
    return "object"


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count spark={len(sdf)} oracle={len(odf)}")
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        problems.append(f"columns spark={scols} oracle={ocols}")
        return problems
    if problems:
        return problems
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        # The driver's value hash is dtype-sensitive: an int64 Spark
        # column vs a float64 oracle column hash-mismatches even when
        # every value is equal (r13's embed_label_propagation red row —
        # DuckDB sum(BIGINT) -> HUGEINT -> pandas float64). Flag kind
        # divergence loudly instead of silently casting through float.
        skind = _dtype_kind(sv.dtype)
        okind = _dtype_kind(ov.dtype)
        if skind != okind:
            problems.append(
                f"col {c}: DTYPE KIND MISMATCH spark={sv.dtype} ({skind}) "
                f"oracle={ov.dtype} ({okind}) — driver hash would fail even "
                f"on equal values; cast the oracle (or Spark) side"
            )
            continue
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            sv2 = sv.astype(float)
            ov2 = ov.astype(float)
            both_nan = np.isnan(sv2) & np.isnan(ov2)
            exact = (sv2 == ov2) | both_nan
            if not exact.all():
                close = np.isclose(sv2, ov2, rtol=1e-9, atol=1e-12, equal_nan=True)
                n_bad = int((~exact).sum())
                if close.all():
                    problems.append(f"col {c}: {n_bad} values CLOSE but not exact (hash would fail)")
                else:
                    idx = int(np.argmax(~close))
                    problems.append(
                        f"col {c}: {int((~close).sum())} values differ, e.g. "
                        f"spark={sv2[idx]!r} oracle={ov2[idx]!r}"
                    )
        else:
            eq = (pd.Series(sv).astype(str) == pd.Series(ov).astype(str))
            if not eq.all():
                idx = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"col {c}: {int((~eq).sum())} values differ, e.g. "
                    f"spark={sv[idx]!r} oracle={ov[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # Driver-faithful mode: a bare default session — queries must
        # self-normalize via prepare(), exactly as under the real driver.
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark("check_oracle")
    con = duck_connect(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    failed = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check), rows={len(sdf)} "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"OK   {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} ok")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

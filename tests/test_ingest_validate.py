"""Batch ingest validation (S3/S4) — strict-charset mode.

The reference DECLARES a charset (lib/variable.h:22-33: name chars
``a-zA-Z0-9._-/*,``, label-key chars ``a-zA-Z0-9._-/*``, values any
UTF-8 except NUL) that is looser-enforced at runtime (store.cc:414-417
only checks ``^/\\S+$``). ``validate(strict=True)`` opts into the
declared rules; these tests pin which rows land on which side and that
validate/rejected remain an exact partition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_instrument_spark.sources.ingest import rejected, validate

NOW = "2024-01-31 00:00:00"


def _points(spark, rows):
    return spark.createDataFrame(
        rows, "name string, labels map<string,string>, ts timestamp, dval double, sval string"
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-30 00:00:00")))


CASES = [
    # (name, labels, runtime_ok, strict_ok)
    ("/ok/name", {"k": "v"}, True, True),
    ("/ok/name", None, True, True),  # null labels: key/value checks vacuous
    ("/with,comma.x-y_z/*", {"a.b-c/d*": "anything at all"}, True, True),
    ("/colon:name", {"k": "v"}, True, False),  # ':' outside declared name chars
    ("/ok", {"bad key": "v"}, True, False),  # space outside label-key chars
    ("/ok", {"k": "nul\x00byte"}, True, False),  # NUL forbidden in values
    ("/ok", {"k": None}, True, True),  # null value: not a NUL byte
    ("bad name", {"k": "v"}, False, False),  # fails runtime check already
    ("/", {"k": "v"}, False, False),  # len<2 fails both
]


def test_strict_accepts_declared_charset_and_rejects_outside(spark):
    df = _points(spark, [(n, l, None, 1.0, None) for n, l, _, _ in CASES])
    kept = {r["name"] + "|" + str(sorted((r["labels"] or {}).items()))
            for r in validate(df, now=NOW, strict=True).collect()}
    want = {n + "|" + str(sorted((l or {}).items()))
            for n, l, _, ok in CASES if ok}
    assert kept == want


def test_strict_validate_and_rejected_partition_exactly(spark):
    df = _points(spark, [(n, l, None, 1.0, None) for n, l, _, _ in CASES])
    n_all = df.count()
    n_ok = validate(df, now=NOW, strict=True).count()
    n_bad = rejected(df, now=NOW, strict=True).count()
    assert n_ok + n_bad == n_all


def test_strict_is_superset_of_runtime_rejections(spark):
    df = _points(spark, [(n, l, None, 1.0, None) for n, l, _, _ in CASES])
    runtime_kept = validate(df, now=NOW).count()
    strict_kept = validate(df, now=NOW, strict=True).count()
    assert strict_kept <= runtime_kept
    assert runtime_kept == sum(1 for _, _, ok, _ in CASES if ok)
    assert strict_kept == sum(1 for *_, ok in CASES if ok)

"""Count-min sketch (operators/sketch.py): overestimate guarantee,
error bound, mergeability-by-addition, and the bounded-table property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_instrument_spark.operators.sketch import cms_estimate, cms_table
from open_instrument_spark.sources.tables import load_tables
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def pts(spark):
    ev = load_tables(spark, SF_ORACLE).table("events")
    return ev.select(
        F.concat(F.lit("/events/"), F.col("event_type")).alias("name"),
        F.col("user_id").cast("string").alias("v"),
    )


def test_cms_overestimates_within_bound(spark, pts):
    """est >= exact ALWAYS (the deterministic half of the CMS
    contract); the error side is per-query probabilistic — the
    textbook guarantee is P(err > (e/w)·N) <= e^-d per query, so a
    blanket (2/w)·N assertion over ~200 probes is simply wrong theory.
    With the fixed seeded hashes the error profile on this corpus IS
    deterministic; measured: worst overflow 2.07·N/w, 1 of 195 probes
    above 2·N/w. Pinned with headroom: none above 4·N/w, >=95%% within
    2·N/w."""
    probes = [str(i) for i in range(1, 40)]
    tab = cms_table(pts, "name", "v")
    est = {(r["name"], r["value"]): r["est"]
           for r in cms_estimate(tab, "name", probes).collect()}
    exact = {(r["name"], r["v"]): r["n"]
             for r in pts.groupBy("name", "v").agg(
                 F.count(F.lit(1)).alias("n")).collect()}
    n_per_name = {r["name"]: r["n"] for r in pts.groupBy("name").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    overflows = []
    for (name, v), e in est.items():
        true = exact.get((name, v), 0)
        assert e >= true, (name, v, e, true)
        overflows.append((e - true) * 256 / n_per_name[name])
    assert len(overflows) == len(n_per_name) * len(probes)
    assert max(overflows) <= 4.0, max(overflows)
    within = sum(1 for o in overflows if o <= 2.0)
    assert within >= 0.95 * len(overflows), (within, len(overflows))


def test_cms_table_is_bounded_and_mergeable(spark, pts):
    """The state contract: at most d*w rows per name however large the
    input; and the sketch of a union is the bucketwise SUM of the
    sketches (mergeability — what makes it a sketch, not a cache)."""
    tab = cms_table(pts, "name", "v")
    per_name = tab.groupBy("name").agg(F.count(F.lit(1)).alias("rows")).collect()
    assert all(r["rows"] <= 3 * 256 for r in per_name)

    half1 = pts.filter(F.crc32("v") % 2 == 0)
    half2 = pts.filter(F.crc32("v") % 2 == 1)
    merged = (
        cms_table(half1, "name", "v")
        .unionByName(cms_table(half2, "name", "v"))
        .groupBy("name", "d", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    a = {tuple(r) for r in tab.collect()}
    b = {tuple(r) for r in merged.collect()}
    assert a == b


def test_cms_table_streaming_equals_batch(spark, tmp_path):
    """The sketch build is a plain explode + groupBy-count, so it runs
    UNCHANGED as a streaming aggregation (complete mode) — the
    closed-stream bucket table must equal the batch build over the
    same rows. This is what 'mergeable by addition' buys: Spark's
    streaming state IS the sketch."""
    import os

    rows1 = [("/m", str(i % 7)) for i in range(40)]
    rows2 = [("/m", str(i % 5)) for i in range(25)] + [("/n", "3")] * 6
    schema = "name string, v string"

    src = str(tmp_path / "cms_src")
    dest = str(tmp_path / "cms_out")
    os.makedirs(src, exist_ok=True)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        tab = cms_table(stream, "name", "v", d=2, w=32)

        def sink(batch, _epoch):
            batch.write.mode("overwrite").parquet(dest)

        q = (
            tab.writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cms_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for rows in (rows1, rows2):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
        run_once()

    got = {tuple(r) for r in spark.read.parquet(dest).collect()}
    want = {tuple(r) for r in cms_table(
        spark.createDataFrame(rows1 + rows2, schema), "name", "v",
        d=2, w=32).collect()}
    assert got == want and len(got) > 0

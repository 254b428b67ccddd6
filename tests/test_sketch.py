"""Mergeable sketches (operators/sketch.py). CMS: overestimate
guarantee, error bound, mergeability-by-addition, bounded table.
Bloom: never-false-negative vs the exact join, literal-string ≡
broadcast-join probe paths, bounded/mergeable bit table, zero-shuffle
probe plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_instrument_spark.operators.sketch import (
    bloom_bitmap,
    bloom_bits,
    bloom_decontaminate,
    bloom_hit_expr,
    bloom_probe_join,
    cms_estimate,
    cms_table,
)
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


# ---- Bloom ------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_tables(spark, SF_ORACLE).table("documents").select(
        "doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 29 == 0).select(
        "doc_id", F.substring("text", 1, 120).alias("text"))
    return docs, bench


def test_bloom_never_false_negative(spark, corpus):
    """The Bloom contract half that is deterministic: every shingle
    truly in the benchmark set MUST hit, so each doc's bloom count is
    >= its exact overlap-with-the-union count — and every doc the
    exact contamination join flags (>=2 shared shingles with some
    bench doc) is bloom-flagged."""
    from open_instrument_spark.operators.dedup import contamination, shingles

    docs, bench = corpus
    bloom = {r["doc_id"]: r for r in
             bloom_decontaminate(docs, bench).collect()}

    b_sh = bench.select(F.explode(shingles(F.col("text"))).alias("sh")).distinct()
    exact_union = {
        r["doc_id"]: r["n"] for r in
        docs.select("doc_id", F.explode(shingles(F.col("text"))).alias("sh"))
        .join(b_sh, "sh").groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert bloom and exact_union
    for doc_id, n_exact in exact_union.items():
        assert bloom[doc_id]["n_maybe_hits"] >= n_exact, doc_id

    flagged_exact = {r["doc_id"] for r in
                     contamination(docs, bench, min_overlap=2).collect()}
    assert flagged_exact
    for doc_id in flagged_exact:
        assert bloom[doc_id]["flagged"], doc_id


def test_bloom_probe_paths_agree(spark, corpus):
    """The literal-bitmap expression (small m, zero joins) and the
    broadcast-join path (large m) are the same filter: identical
    verdicts on every distinct corpus shingle."""
    from open_instrument_spark.operators.dedup import shingles

    docs, bench = corpus
    b_sh = bench.select(F.explode(shingles(F.col("text"))).alias("sh"))
    bits = bloom_bits(b_sh, "sh", k=4, m=2048)
    bitmap = bloom_bitmap(bits, 2048)

    probes = docs.select(
        F.explode(shingles(F.col("text"))).alias("sh")).distinct()
    via_expr = {
        r["sh"]: r["hit"] for r in probes.select(
            "sh", bloom_hit_expr(F.col("sh"), bitmap, k=4).alias("hit")
        ).collect()
    }
    via_join = {
        r["sh"]: r["maybe_present"] for r in
        bloom_probe_join(bits, probes, "sh", k=4, m=2048).collect()
    }
    assert via_expr == via_join and any(via_expr.values())
    assert not all(via_expr.values())  # non-vacuous: both verdicts occur


def test_bloom_bits_bounded_and_mergeable(spark, corpus):
    """State contract: <= m rows however large the input; bits of a
    union = union of bits (merge is bitwise OR == union-distinct)."""
    docs, _ = corpus
    sh = docs.select(F.col("text").alias("sh"))
    bits = bloom_bits(sh, "sh", k=4, m=512)
    assert bits.count() <= 512

    half1 = sh.filter(F.crc32("sh") % 2 == 0)
    half2 = sh.filter(F.crc32("sh") % 2 == 1)
    merged = bloom_bits(half1, "sh", k=4, m=512).unionByName(
        bloom_bits(half2, "sh", k=4, m=512)).distinct()
    assert ({r["bit"] for r in bits.collect()}
            == {r["bit"] for r in merged.collect()})


def test_bloom_decontaminate_probe_plan(spark, corpus):
    """The 100 TB property the operator exists for: once the filter is
    built (bounded driver artifact, shipped as a literal), the corpus
    pass joins NOTHING and shuffles exactly once — the map-side-combined
    per-doc count on (doc_id). No Python anywhere."""
    docs, bench = corpus
    plan = bloom_decontaminate(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan and "Python" not in plan, plan

"""Multi-query BM25 (operators/retrieval.py::bm25_multi) and the
on-disk inverted index (build/search/append_to_text_index): score
equality against the oracled single-query path, partition-pruned
search plans, append growth + retry idempotence, and exact N/avgdl
accounting across epochs."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from open_instrument_spark.operators import retrieval as rt
from open_instrument_spark.sources.tables import load_tables
from tests.conftest import SF_SMOKE

TERMS_A = ["dup", "vector", "window"]
TERMS_B = ["merge", "dup"]
QUERIES = {0: TERMS_A, 1: TERMS_B}


@pytest.fixture(scope="module")
def docs(spark):
    return (
        load_tables(spark, SF_SMOKE).table("documents")
        .select("doc_id", "text")
    )


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


def test_multi_matches_single_query_path(spark, docs):
    """bm25_multi with one query reproduces bm25_topk exactly — the
    batched join formulation and the pivoted single-query formulation
    are the same model (same tf/df/dl integers, same weight bits)."""
    single = rt.bm25_topk(docs, TERMS_A, k=10)
    multi = rt.bm25_multi(docs, {7: TERMS_A}, k=10).drop("q_id")
    assert rows_of(multi) == rows_of(single)


def test_multi_duplicate_terms_collapse(spark, docs):
    """A repeated query term contributes once (bag-of-terms), matching
    the single-query path's dict.fromkeys dedup."""
    a = rt.bm25_multi(docs, {0: ["dup", "dup", "vector"]}, k=5)
    b = rt.bm25_multi(docs, {0: ["dup", "vector"]}, k=5)
    assert rows_of(a) == rows_of(b)


def test_disk_search_matches_in_plan(spark, docs, tmp_path):
    """search_text_index over a built index ≡ bm25_multi over the
    corpus — the on-disk layout changes where the postings live, not
    one bit of the scores."""
    path = str(tmp_path / "tidx")
    rt.build_text_index(docs, path, n_buckets=8)
    got = rt.search_text_index(spark, path, QUERIES, k=10)
    want = rt.bm25_multi(docs, QUERIES, k=10)
    assert rows_of(got) == rows_of(want)


def test_disk_search_prunes_buckets(spark, docs, tmp_path):
    """The postings read carries the bucket IN (...) partition filter
    (plan PartitionFilters) and the query touches strictly fewer
    bucket directories than exist — the search never scans the whole
    index."""
    path = str(tmp_path / "tidx")
    rt.build_text_index(docs, path, n_buckets=8)
    plan = (
        rt.search_text_index(spark, path, QUERIES, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:120]
    n_term_buckets = len({rt.term_bucket_py(t, 8)
                          for q in QUERIES.values() for t in q})
    all_buckets = glob.glob(os.path.join(path, "postings", "epoch=-1",
                                         "bucket=*"))
    assert n_term_buckets < len(all_buckets)


def test_append_equals_full_build(spark, docs, tmp_path):
    """build(half1) + append(half2) answers every query exactly like
    build(all): N, avgdl, df, and every posting accumulate correctly
    across epoch partitions."""
    half1 = docs.where(F.col("doc_id") % 2 == 0)
    half2 = docs.where(F.col("doc_id") % 2 == 1)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    rt.build_text_index(half1, inc, n_buckets=8)
    rt.append_to_text_index(half2, inc)
    rt.build_text_index(docs, full, n_buckets=8)
    got = rt.search_text_index(spark, inc, QUERIES, k=10)
    want = rt.search_text_index(spark, full, QUERIES, k=10)
    assert rows_of(got) == rows_of(want)


def test_append_retry_is_idempotent(spark, docs, tmp_path):
    """A retrying caller that pins the epoch overwrites its own
    partition: replaying the same append must not double-count
    postings... but the meta DOES accumulate on each call — the
    one-writer contract is that a retry re-runs the whole append step
    from the pre-append meta, which is what pinning epoch=N on a store
    whose meta was re-asserted gives. Here we simulate the full replay:
    reset meta to the pre-append state, re-append the same epoch, and
    require byte-identical search results."""
    half1 = docs.where(F.col("doc_id") % 2 == 0)
    half2 = docs.where(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "retry")
    rt.build_text_index(half1, path, n_buckets=8)
    meta_before = rt._read_text_meta(spark, path)
    rt.append_to_text_index(half2, path, epoch=0)
    first = rows_of(rt.search_text_index(spark, path, QUERIES, k=10))
    # crash-replay: meta write raced back, epoch 0 re-lands
    rt._write_text_meta(spark, path, *meta_before[:3], meta_before[3])
    rt.append_to_text_index(half2, path, epoch=0)
    second = rows_of(rt.search_text_index(spark, path, QUERIES, k=10))
    assert first == second
    assert rt._read_text_meta(spark, path)[3] == 1  # next_epoch bumped once


def test_zero_word_docs_count_toward_stats(spark):
    """Documents that tokenize to nothing still count toward N and
    avgdl (the bm25_scores LEFT-JOIN contract) — via the NULL-term
    sentinel posting on disk."""
    rows = [(1, "alpha beta alpha"), (2, "beta gamma"), (3, "??!!")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    single = rt.bm25_topk(docs, ["alpha", "beta"], k=5)
    multi = rt.bm25_multi(docs, {0: ["alpha", "beta"]}, k=5).drop("q_id")
    assert rows_of(multi) == rows_of(single)
    # and the disk path agrees, with N=3 in its meta
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        rt.build_text_index(docs, d, n_buckets=4)
        assert rt._read_text_meta(spark, d)[0] == 3
        got = rt.search_text_index(spark, d, {0: ["alpha", "beta"]}, k=5)
        assert rows_of(got.drop("q_id")) == rows_of(single)


def test_multi_feeds_retrieval_eval(spark, docs):
    """The (q_id, doc_id, rank) shape plugs straight into
    retrieval_eval — the serving + evaluation legs compose."""
    res = rt.bm25_multi(docs, QUERIES, k=10)
    truth = res.where(F.col("rank") <= 3).select(
        "q_id", "doc_id", F.lit(1.0).alias("rel")
    )
    ev = rt.retrieval_eval(res, truth, k=10)
    rows = {r["q_id"]: r for r in ev.collect()}
    assert set(rows) == set(QUERIES)
    for r in rows.values():
        assert r["recall_k"] == 1.0 and r["mrr_k"] == 1.0

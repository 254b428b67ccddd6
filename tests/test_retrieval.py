"""BM25 + reciprocal-rank-fusion unit tests (operators/retrieval.py):
hand-computed scores on a tiny corpus, fusion membership accounting,
and the rounded-key rank pinning."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from open_instrument_spark.operators.retrieval import bm25_scores, bm25_topk, rrf_fuse

K1, B = 1.2, 0.75


def _bm25_ref(tf: int, dl: int, df: int, n: int, avgdl: float) -> float:
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (K1 + 1.0)) / (tf + K1 * ((1.0 - B) + B * (dl / avgdl)))


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "dog mouse"),
            (3, "bird"),
            (4, ""),  # empty doc still counts toward N / avgdl
        ],
        ["doc_id", "text"],
    )


def test_bm25_hand_computed(tiny):
    got = {
        r["doc_id"]: r
        for r in bm25_scores(tiny, ["cat", "mouse"], k1=K1, b=B).collect()
    }
    n, avgdl = 4, (3 + 2 + 1 + 0) / 4.0
    # doc 3 (no query term) and doc 4 (empty) emit no row
    assert set(got) == {1, 2}
    assert got[1]["dl"] == 3 and got[1]["n_hit_terms"] == 1
    assert got[1]["score"] == pytest.approx(
        round(_bm25_ref(2, 3, 1, n, avgdl), 6), abs=1e-9
    )
    assert got[2]["score"] == pytest.approx(
        round(_bm25_ref(1, 2, 1, n, avgdl), 6), abs=1e-9
    )


def test_bm25_multi_term_sums_and_df(tiny):
    got = {
        r["doc_id"]: r
        for r in bm25_scores(tiny, ["dog", "bird"], k1=K1, b=B).collect()
    }
    n, avgdl = 4, 1.5
    # "dog" appears in docs 1 and 2 → df=2; "bird" only in doc 3 → df=1
    assert got[1]["score"] == pytest.approx(
        round(_bm25_ref(1, 3, 2, n, avgdl), 6), abs=1e-9
    )
    assert got[3]["n_hit_terms"] == 1
    assert got[3]["score"] == pytest.approx(
        round(_bm25_ref(1, 1, 1, n, avgdl), 6), abs=1e-9
    )


def test_bm25_topk_rank_deterministic(tiny):
    rows = bm25_topk(tiny, ["dog"], k=2, k1=K1, b=B).collect()
    # both matching docs have tf=1, df=2; shorter doc scores higher
    assert [r["doc_id"] for r in rows] == [2, 1]
    assert [r["rank"] for r in rows] == [1, 2]


def test_rrf_fuse_membership_and_scores(spark):
    lex = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], ["doc_id", "rank"])
    dense = spark.createDataFrame([(20, 1), (40, 2)], ["doc_id", "rank"])
    rows = {r["doc_id"]: r for r in rrf_fuse([lex, dense], k_rrf=60, topk=10).collect()}
    assert rows[20]["in_lists"] == 2
    assert rows[20]["rrf"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-9
    )
    assert rows[10]["in_lists"] == 1
    assert rows[10]["rrf"] == pytest.approx(round(1 / 61, 6), abs=1e-9)
    assert rows[40]["rrf"] == pytest.approx(round(1 / 62, 6), abs=1e-9)
    # doc in both lists outranks any single-list doc here
    assert rows[20]["rank"] == 1


def test_rrf_fuse_tie_breaks_on_doc_id(spark):
    a = spark.createDataFrame([(5, 1), (3, 2)], ["doc_id", "rank"])
    b = spark.createDataFrame([(3, 1), (5, 2)], ["doc_id", "rank"])
    rows = rrf_fuse([a, b], k_rrf=60, topk=2).collect()
    # symmetric scores → doc_id ascending
    assert [r["doc_id"] for r in rows] == [3, 5]
    assert rows[0]["rrf"] == rows[1]["rrf"]


def test_retrieval_eval_hand_checked(spark):
    """TREC metrics on a hand-built case: perfect retrieval scores
    (1, 1, 1); a partial list with the first relevant hit at rank 2
    scores recall 2/3, MRR 0.5, hand-computed nDCG; a query whose
    results miss every relevant doc scores zeros (LEFT join keeps it);
    a query absent from results scores zeros too."""
    import math

    from open_instrument_spark.operators.retrieval import retrieval_eval

    results = spark.createDataFrame(
        # q1: perfect (rel docs 10, 11, 12 in ideal order)
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
        # q2: irrelevant doc first, two of three rel docs retrieved,
        # best one (rel 3) at rank 2, rel 1 at rank 3
        + [(2, 99, 1), (2, 20, 2), (2, 22, 3)]
        # q3: all misses
        + [(3, 99, 1), (3, 98, 2)],
        "q_id long, doc_id long, rank int",
    )
    truth = spark.createDataFrame(
        [(1, 10, 3.0), (1, 11, 2.0), (1, 12, 1.0),
         (2, 20, 3.0), (2, 21, 2.0), (2, 22, 1.0),
         (3, 30, 1.0),
         (4, 40, 1.0)],   # q4 has no results rows at all
        "q_id long, doc_id long, rel double",
    )
    got = {r["q_id"]: r for r in retrieval_eval(results, truth, k=10).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1]["recall_k"], got[1]["mrr_k"], got[1]["ndcg_k"]) == (
        1.0, 1.0, 1.0)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) \
        + (2**1 - 1) / math.log2(4)
    dcg2 = (2**3 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    r2 = got[2]
    assert r2["n_rel"] == 3 and r2["recall_k"] == round(2 / 3, 6)
    assert r2["mrr_k"] == 0.5
    assert r2["ndcg_k"] == round(dcg2 / idcg, 6)
    for q in (3, 4):
        assert (got[q]["recall_k"], got[q]["mrr_k"], got[q]["ndcg_k"]) == (
            0.0, 0.0, 0.0), q


def test_retrieval_eval_rank_cut(spark):
    """Hits beyond k do not count: a relevant doc at rank k+1
    contributes to none of the three metrics."""
    from open_instrument_spark.operators.retrieval import retrieval_eval

    results = spark.createDataFrame(
        [(1, 99, 1), (1, 10, 2)], "q_id long, doc_id long, rank int")
    truth = spark.createDataFrame(
        [(1, 10, 1.0)], "q_id long, doc_id long, rel double")
    got = retrieval_eval(results, truth, k=1).first()
    assert (got["recall_k"], got["mrr_k"], got["ndcg_k"]) == (0.0, 0.0, 0.0)

"""Lexical (BM25) retrieval and hybrid rank fusion — the search side
of a training-data / RAG pipeline: score documents against a term
query with Okapi BM25, and fuse independent rankings (lexical +
embedding) with reciprocal-rank fusion (RRF, Cormack et al. 2009).

Not present in the reference system (numeric/string metric samples
only) — §2.9 north-star extensions riding the same engine, next to
tf-idf (operators/lm.py) and cosine retrieval (similarity.py).

Like lm_score, the "model" is corpus count statistics, so the ENTIRE
pipeline — document frequencies, length normalization, fusion — is
aggregation + bounded joins and replays in ANSI SQL under the driver
hash gate (registry ``text_bm25_topk`` / ``retrieval_hybrid_rrf``).

100 TB shape (bm25_scores): ONE tokenize/explode corpus pass folded
map-side into per-doc (length, per-query-term tf) rows — the explode
never shuffles raw tokens, only the |Q|+1-column per-doc aggregate.
Everything downstream is bounded: the df table is ≤|Q| rows and the
corpus stats are 1 row (both broadcast; both live INSIDE the plan —
never a driver artifact), the unpivot is a scan-project, and top-k is
a distributed TakeOrderedAndProject. No all-pairs, no collect.

rrf_fuse joins k bounded top-N rank lists full-outer on doc id — each
input is already ≤N rows, so the fusion cost is independent of corpus
size; at scale the expensive part is producing the input rankings,
which BM25 (above) and cosine_topk (similarity.py) each do in one
corpus pass.

Float parity: per-term BM25 weights are bit-identical cross-engine
(exact integer counts → one division chain with identical literal
bits via repr()); only the Σ over ≤|Q| terms re-associates, handled by
the standard round-6 + rounded-key rank pinning (ranks are computed
over the ROUNDED score so float jitter cannot flip an order).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_instrument_spark.operators.text import words


def bm25_scores(docs: DataFrame, query_terms: list[str],
                k1: float = 1.2, b: float = 0.75,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Okapi BM25 score of every document against a bag-of-terms query.

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))      (Lucene form)

    with tf the term count in d, dl the document word length, avgdl /
    N corpus-wide, df the number of documents containing t. Documents
    matching no query term emit no row (their score is 0).

    Output: (doc_id, dl, n_hit_terms, score) — score rounded 6 (the
    Σ_t re-associates; every per-term weight is bit-exact).

    Plan: one tokenize/explode scan → per-doc pivoted aggregate
    (count + |Q| conditional sums, map-side partial), completed to
    all-docs by a left join so empty documents still count toward N
    and avgdl; df/stats are tiny broadcast aggregates of THAT frame,
    so the raw corpus is scanned exactly once.
    """
    terms = list(dict.fromkeys(query_terms))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("t"),
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("t") == term, 1).otherwise(0)).alias(f"_tf{i}")
            for i, term in enumerate(terms)
        ],
    )
    # complete over the corpus: docs with zero words carry dl=0 and
    # still count toward N / avgdl (matches the oracle's LEFT JOIN)
    per_doc = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .fillna(0, subset=["dl"] + [f"_tf{i}" for i in range(len(terms))])
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    pairs = ", ".join(
        f"'{t}', _tf{i}" for i, t in enumerate(terms)
    )
    unpiv = per_doc.selectExpr(
        "doc_id", "dl", f"stack({len(terms)}, {pairs}) AS (term, tf)"
    ).where(F.col("tf") > 0)
    dfreq = unpiv.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    w_t = (
        idf * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl")))
        )
    )
    return (
        unpiv.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id", "dl")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_hit_terms"),
            F.round(F.sum(w_t), 6).alias("score"),
        )
        .select("doc_id", "dl", "n_hit_terms", "score")
    )


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k documents by BM25 — rank pinned on the ROUNDED score with
    doc_id tie-break so the order is reproducible cross-engine. The
    top-k is a distributed TakeOrderedAndProject (never a global
    single-partition window over all matches); the row_number window
    then runs over just the k winners.

    Output: (doc_id, dl, n_hit_terms, rank, score)."""
    scored = bm25_scores(docs, query_terms, k1=k1, b=b,
                         text_col=text_col, id_col=id_col)
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.partitionBy().orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "dl", "n_hit_terms", "rank", "score"
    )


def rrf_fuse(rankings: list[DataFrame], k_rrf: int = 60, topk: int = 10,
             id_col: str = "doc_id", rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion of k independent rankings (Cormack,
    Clarke & Büttcher 2009): score(d) = Σ_lists 1/(k_rrf + rank_i(d)),
    lists not containing d contribute 0. The standard hybrid-search
    combiner (lexical + dense ranks) — rank-only, so no per-list score
    calibration is needed.

    Each input frame carries (id_col, rank_col) for ONE ranking and is
    expected to be a bounded top-N list; fusion is a chain of
    full-outer equi-joins over those bounded lists, so its cost is
    independent of corpus size. Contributions are summed in list
    order (fixed association → bit-stable), rounded 6, and the output
    rank is pinned on the rounded score with id tie-break.

    Output: (doc_id, in_lists, rank, rrf) — in_lists = how many input
    rankings contained the doc."""
    parts = [
        r.select(
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(rank_col).cast("double")))
            .alias(f"_c{i}"),
        )
        for i, r in enumerate(rankings)
    ]
    fused = reduce(lambda a, b: a.join(b, "doc_id", "full_outer"), parts)
    contrib = [F.coalesce(F.col(f"_c{i}"), F.lit(0.0)) for i in range(len(parts))]
    score = reduce(lambda a, b: a + b, contrib)
    in_lists = reduce(
        lambda a, b: a + b,
        [F.when(F.col(f"_c{i}").isNotNull(), 1).otherwise(0) for i in range(len(parts))],
    )
    scored = fused.select(
        "doc_id",
        in_lists.cast("int").alias("in_lists"),
        F.round(score, 6).alias("rrf"),
    )
    top = scored.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(topk)
    w = Window.partitionBy().orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "in_lists", "rank", "rrf"
    )


def retrieval_eval(results: DataFrame, truth: DataFrame,
                   k: int = 10) -> DataFrame:
    """IR quality metrics per query — the evaluation leg every
    retrieval deployment runs next to its serving path (TREC
    conventions; public): recall@k, MRR@k, nDCG@k.

    ``results``: (q_id, doc_id, rank) ranked lists from any retriever
    in this module / the ANN family. ``truth``: (q_id, doc_id, rel)
    graded relevance, rel > 0 relevant.

      recall@k = |retrieved@k ∩ relevant| / |relevant|
      MRR@k    = 1 / rank of the first relevant hit (0 if none)
      DCG@k    = Σ_hits (2^rel − 1) / log2(rank + 1), nDCG = DCG/IDCG,
                 IDCG from the truth's best-possible ordering (rel
                 desc, top k)

    Spark shape: both sides are post-retrieval small-per-query lists —
    one equi-join on (q_id, doc_id) + two groupBys; at corpus scale the
    cost is |queries|·k rows regardless of corpus size. All float
    outputs rounded 6 (re-associated sums); 2^rel is integer-exact,
    log2 parity holds at the rounding (the F.pow/ln precedent).

    Output: (q_id, n_rel, recall_k, mrr_k, ndcg_k), one row per truth
    query WITH AT LEAST ONE rel > 0 judgment (a scored query with no
    results row scores 0 across the board). Queries whose judgments
    are all rel <= 0 have no relevant set — recall's denominator and
    IDCG are undefined — so they are excluded from the output rather
    than scored as 0."""
    res = results.filter(F.col("rank") <= k).select(
        "q_id", "doc_id", F.col("rank").cast("int").alias("rank")
    )
    rel = truth.filter(F.col("rel") > 0).select(
        "q_id", "doc_id", F.col("rel").cast("double").alias("rel")
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(F.col("rank") + 1.0)
    hits = (
        res.join(rel, ["q_id", "doc_id"])
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit"),
            F.min("rank").alias("first_hit"),
            F.sum(gain).alias("dcg"),
        )
    )
    w_ideal = Window.partitionBy("q_id").orderBy(
        F.col("rel").desc(), F.col("doc_id")
    )
    ideal = (
        rel.withColumn("rank", F.row_number().over(w_ideal))
        .filter(F.col("rank") <= k)
        .groupBy("q_id")
        .agg(F.sum(gain).alias("idcg"))
    )
    per_q = rel.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_rel"))
    return (
        per_q.join(ideal, "q_id")
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            "n_rel",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_rel"), 6
            ).alias("recall_k"),
            F.round(
                F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)), 6
            ).alias("mrr_k"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), 6
            ).alias("ndcg_k"),
        )
    )

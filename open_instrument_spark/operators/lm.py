"""Corpus-trained bigram language-model scoring — the statistical
quality signal a training-data pipeline runs after the cheap shape
heuristics (text.quality_score) and before expensive model-based
filters: documents whose word sequences are unlikely under the
corpus's own bigram statistics are boilerplate, gibberish, or
wrong-language leakage.

Everything here is aggregation + joins, so UNLIKE most trained models
the ENTIRE pipeline — training included — replays in ANSI SQL and sits
under the driver's value-hash gate (registry ``text_lm_score``):

  score(d) = mean over bigrams (w1,w2) of d of
             ln( (c(w1,w2) + α) / (c(w1) + α·V) )

with c(...) the corpus counts, V the corpus vocabulary size, α
add-alpha smoothing. The model "parameters" ARE the count tables.

100 TB shape: one corpus pass builds the count tables (map-side
partial aggregation); scoring joins each document's bigrams against
them — plain equi-joins that scale with corpus size, no all-pairs
anywhere. At web-scale vocabulary the count tables are the one
unbounded intermediate, so ``lm_score`` takes ``max_vocab`` /
``max_bigrams`` caps: each table is truncated to its top-K rows
(count desc, word asc — a distributed TakeOrderedAndProject, the
same guard pattern as ngram_jaccard's max_bucket), dropped words /
bigrams fall back to OOV count 0, and the smoothing vocabulary V
becomes the TRUNCATED table size — the model a capped trainer would
actually ship. Deterministic, hence still oracle-replayable (the
``text_lm_score_topk`` registry twin hash-gates the guard engaged).

Reference scope note: the reference has no text pipeline — north-star
extension (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_instrument_spark.operators.text import words


def _doc_bigrams(toks_frame: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per bigram occurrence, from a
    pre-tokenized (doc_id, _toks: array<string>) frame."""
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("w1"),
                F.element_at(toks, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return toks_frame.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", "g.w1", "g.w2"
    )


def tfidf_top_terms(docs: DataFrame, text_col: str = "text",
                    k: int = 5) -> DataFrame:
    """Per-document top-k terms by smoothed tf-idf — the keyword /
    topic-signal pass of a corpus pipeline (and the classic sanity
    check that a cleaning run didn't destroy topical structure).

      tfidf(t, d) = (count of t in d) · ln((N + 1) / (df(t) + 1))

    with df the number of documents containing t and N the corpus
    size. One corpus pass for document frequencies (distinct per doc →
    count — map-side partial), an equi-join back, and a per-doc top-k
    window with deterministic (score desc, term asc) ordering. Output:
    (doc_id, term, rank, tfidf) rounded to 6 — fully SQL-replayable,
    like lm_score. Documents with no words emit no rows."""
    from pyspark.sql import Window

    tf = (
        docs.select("doc_id", F.explode(words(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()  # one scalar action, bounded
    w = Window.partitionBy("doc_id").orderBy(
        F.col("_s").desc(), F.col("term").asc()
    )
    return (
        tf.join(df_t, "term")
        .withColumn(
            "_s",
            F.col("tf") * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "rank", F.round("_s", 6).alias("tfidf"))
    )


def lm_score(docs: DataFrame, text_col: str = "text", alpha: float = 0.5,
             max_vocab: int | None = None,
             max_bigrams: int | None = None,
             cache_tokens: bool = True,
             train: DataFrame | None = None) -> DataFrame:
    """Per-document mean bigram log-likelihood under the corpus's own
    add-α bigram model. Output: (doc_id, n_bigrams, avg_logp) — docs
    with fewer than two words carry n_bigrams=0 and NULL avg_logp.
    ``avg_logp`` rounded to 6 (ln sums re-associate across engines).

    ``max_vocab`` / ``max_bigrams`` engage the web-scale guard: the
    unigram / bigram count tables are truncated to their top-K rows
    (count desc, then word asc for a deterministic tie-break — Catalyst
    plans the sort+limit as a distributed TakeOrderedAndProject, no
    single-task global sort), out-of-table words and bigrams score with
    OOV count 0, and V becomes the truncated vocabulary size. The
    capped tables are ≤K rows by construction, so the scoring joins
    broadcast them — the guard bounds BOTH the model size and the join
    build side no matter how large the corpus grows.

    ``cache_tokens`` (default on): the tokenized corpus is consumed
    four times (bigram counts, unigram counts, the V action, the
    scoring join side); a lazy ``localCheckpoint`` materializes the
    (doc_id, tokens) frame once on first action and every later pass
    reads it back — one corpus tokenization instead of four, at the
    price of an executor-local token copy (≈ input-sized) and the
    standard checkpoint trade that an executor loss mid-query fails
    the job instead of recomputing (same as connected_components;
    flip off to trade recompute for zero storage).

    ``train``: fit the count tables on a DIFFERENT corpus (same
    (doc_id, text_col) shape) and score ``docs`` under it — the
    cross-domain scoring Moore-Lewis selection needs. Out-of-model
    words/bigrams score with count 0 (the same OOV left-join path the
    capped tables use) and V is the TRAIN vocabulary size. Default
    (None) keeps the self-scored semantics byte-identical."""
    toks_frame = docs.select("doc_id", words(F.col(text_col)).alias("_toks"))
    if cache_tokens:
        toks_frame = toks_frame.localCheckpoint(eager=False)
    if train is not None:
        train_toks = train.select(
            "doc_id", words(F.col(text_col)).alias("_toks")
        )
        if cache_tokens:
            train_toks = train_toks.localCheckpoint(eager=False)
    else:
        train_toks = None
    return _lm_score_from_toks(docs.select("doc_id"), toks_frame,
                               train_toks, alpha, max_vocab, max_bigrams)


def _lm_score_from_toks(ids: DataFrame, toks_frame: DataFrame,
                        train_toks: DataFrame | None, alpha: float,
                        max_vocab: int | None,
                        max_bigrams: int | None) -> DataFrame:
    """:func:`lm_score`'s post-tokenization core, factored out so
    callers that score the same corpus under several models
    (:func:`moore_lewis_select`) tokenize it ONCE. ``train_toks=None``
    = self-trained (inner scoring joins); a distinct train frame takes
    the OOV left-join path."""
    cross = train_toks is not None
    if train_toks is None:
        train_toks = toks_frame
    bg = _doc_bigrams(toks_frame)
    # the count tables are consumed twice (vocab size + joins) but are
    # small relative to the corpus; Spark's scan reuse handles the
    # double traversal of the exploded frame
    bg_counts = (
        _doc_bigrams(train_toks) if cross else bg
    ).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = (
        train_toks.select(F.explode("_toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    if max_bigrams is not None:
        bg_counts = bg_counts.orderBy(
            F.col("c12").desc(), "w1", "w2"
        ).limit(max_bigrams)
    if max_vocab is not None:
        uni = uni.orderBy(F.col("c1").desc(), "w1").limit(max_vocab)
    # r14 optimization (guide §7.2, duplicated subtrees): the unigram
    # table is consumed twice — the vocabulary size and the scoring
    # join — so the checkpoint makes both consumers read one
    # materialization. The frame is vocabulary-sized — the model table
    # the plan already materializes for the join build.
    uni = uni.localCheckpoint(eager=False)
    # (truncated) vocabulary size, IN-PLAN (r14, guide §5 driver): the
    # previous v = uni.count() was a BLOCKING driver action per
    # invocation whose job ran the tokenize→explode→count chain ahead
    # of the main query; a broadcast ONE-ROW count of the same
    # checkpointed table (the SQ-stats crossJoin pattern — the build
    # side is provably a single aggregate row) folds it into the
    # scoring job. α·V arithmetic is unchanged: one IEEE double
    # multiply either way.
    vfr = uni.agg(F.count(F.lit(1)).cast("double").alias("_v"))
    # join type: untruncated SELF-trained tables cover every key, so
    # INNER ≡ LEFT there — keep inner (Catalyst reorders/codegens it
    # better); capped or cross-trained tables genuinely miss keys and
    # need the OOV left join.
    oov_bg = max_bigrams is not None or cross
    oov_uni = max_vocab is not None or cross
    scored = (
        bg.join(
            F.broadcast(bg_counts) if max_bigrams is not None else bg_counts,
            ["w1", "w2"],
            "left" if oov_bg else "inner",
        )
        .join(
            F.broadcast(uni) if max_vocab is not None else uni,
            "w1",
            "left" if oov_uni else "inner",
        )
        .crossJoin(F.broadcast(vfr))
        .withColumn(
            "_logp",
            F.log(
                (F.coalesce("c12", F.lit(0)) + F.lit(alpha))
                / (F.coalesce("c1", F.lit(0)) + F.lit(alpha) * F.col("_v"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("_logp"), 6).alias("avg_logp"),
        )
    )
    return (
        ids.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("int").alias("n_bigrams"),
            "avg_logp",
        )
    )


def ccnet_buckets(docs: DataFrame, head_frac: float = 1 / 3,
                  middle_frac: float = 1 / 3, text_col: str = "text",
                  **lm_kwargs) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359; public): score every document under the corpus
    LM (:func:`lm_score` — CCNet uses a reference LM; the corpus's own
    model is the self-supervised variant), then split the corpus into
    ``head`` / ``middle`` / ``tail`` quality buckets at score
    percentiles — the standard crawl-filtering stage where ``tail``
    (worst-scoring) is dropped or down-weighted in the training
    mixture.

    Convention: HIGHER ``avg_logp`` = more in-distribution = head
    (CCNet phrases it as LOWER perplexity — same ordering). Docs the
    model cannot judge (<2 words → NULL score) land in ``tail``.

    Spark shape: the two percentile thresholds are a ONE-ROW aggregate
    cross-joined back (broadcast) — never a global-sort or
    single-partition window; the whole pipeline (model fit included)
    stays aggregation + bounded joins, so it replays in SQL under the
    hash gate like text_lm_score. Threshold comparisons use the
    ROUNDED (6 dp) scores on both engines; a doc landing exactly ON an
    interpolated threshold is measure-zero (the MAD margin
    convention).

    Output: (doc_id, n_bigrams, avg_logp, bucket, keep) — keep is the
    CCNet head+middle retention rule."""
    # r14 optimization (guide §7.2, duplicated subtrees): the
    # percentile-threshold aggregate below is a broadcast side, so the
    # ENTIRE scoring pipeline — both count-table fits included —
    # executed twice (once in the broadcast-build job, once in the main
    # query; the before-plan carries two full parquet-scan subtrees).
    # The checkpoint is doc-sized (three narrow columns per doc).
    scored = lm_score(docs, text_col=text_col,
                      **lm_kwargs).localCheckpoint(eager=False)
    q_head = 1.0 - head_frac
    q_mid = 1.0 - head_frac - middle_frac
    th = scored.agg(
        F.percentile(F.col("avg_logp"), F.lit(q_head)).alias("_t_head"),
        F.percentile(F.col("avg_logp"), F.lit(q_mid)).alias("_t_mid"),
    )
    bucket = (
        F.when(F.col("avg_logp").isNull(), F.lit("tail"))
        .when(F.col("avg_logp") >= F.col("_t_head"), F.lit("head"))
        .when(F.col("avg_logp") >= F.col("_t_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.crossJoin(F.broadcast(th))
        .select(
            "doc_id", "n_bigrams", "avg_logp", bucket.alias("bucket"),
            (bucket != "tail").alias("keep"),
        )
    )


def moore_lewis_select(docs: DataFrame, target_pred, n: int,
                       text_col: str = "text",
                       alpha: float = 0.5) -> DataFrame:
    """Moore-Lewis cross-entropy-difference data selection (Moore &
    Lewis 2010, "Intelligent Selection of Language Model Training
    Data"; the method behind CCNet/XLM-style domain filtering): score
    every document under an IN-DOMAIN bigram LM (fit on the
    ``target_pred`` slice, OOV-smoothed) and under the full-corpus
    model, rank by the log-likelihood difference, and keep the top
    ``n`` — documents that look like the target domain AND unlike the
    generic corpus.

    Output: (doc_id, n_bigrams, logp_in, logp_out, ml_score, selected)
    for EVERY input doc; docs with no bigrams carry NULL scores and are
    never selected. ``ml_score = round(logp_in − logp_out, 6)`` is
    computed from the two 6-dp-rounded components so the ranking
    replays bit-identically in SQL.

    100 TB shape: the corpus is TOKENIZED ONCE (a shared lazy
    localCheckpoint feeds both model fits and the scoring pass — the
    in-domain count tables come from filtering the tokenized frame to
    the target slice, never a re-tokenize), and BOTH models score in
    ONE pass over the bigram frame (r14, guide §2.3/§7.2: the r13
    shape ran two independent scoring pipelines — two corpus-sized
    (w1, w2) shuffles, two unigram joins, two per-doc aggregates, then
    a doc_id join to zip them; the merged pass joins the out-model
    tables inner and the in-model tables left onto the SAME bigram
    rows and folds both log-likelihood means in a single per-doc
    aggregate — the 0-ReusedExchange plan's 10 SortMergeJoins drop to
    ~half, and the corpus-sized frame crosses the network once). The
    top-n cut is a distributed sort+limit (TakeOrderedAndProject —
    per-partition top-n then a driver merge of n·partitions rows, NO
    single-task global sort), and the n-row selection broadcasts back
    onto the scored frame. With the web-scale guard needs, pass the
    capped tables through lm_score the same way text_lm_score_topk
    does."""
    toks = docs.select(
        "doc_id", words(F.col(text_col)).alias("_toks")
    ).localCheckpoint(eager=False)
    ids = docs.select("doc_id")
    # BOTH count tables from ONE conditional aggregation each (r14 —
    # the same pass-merge the scorer got earlier this round): a
    # per-doc target tag rides the tokenized rows, the out-model count
    # is count(*) and the in-model count is sum(tag) of the SAME
    # grouped rows — integer-identical to the former separate fits on
    # the filtered slice, with the in-model's OOV-smoothing zeros now
    # arriving as literal 0 counts instead of left-join NULLs. Kills
    # the second bigram aggregation, the second unigram aggregation
    # and two of the four scoring joins.
    tag = docs.select(
        "doc_id", F.when(target_pred, 1).otherwise(0).alias("_t"))
    bg = _doc_bigrams(toks)
    bg_tab = (
        bg.join(tag, "doc_id")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("_c12o"), F.sum("_t").alias("_c12i"))
    )
    uni_tab = (
        toks.join(tag, "doc_id")
        .select("_t", F.explode("_toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("_c1o"), F.sum("_t").alias("_c1i"))
    ).localCheckpoint(eager=False)
    # the two vocabulary sizes, IN-PLAN (the _lm_score_from_toks
    # pattern): ONE broadcast one-row aggregate of the checkpointed
    # unigram table — _vo = all keys, _vi = keys the target slice
    # actually carries (the exact row count of the former in_uni)
    vfr = uni_tab.agg(
        F.count(F.lit(1)).cast("double").alias("_vo"),
        F.sum((F.col("_c1i") > 0).cast("int")).cast("double").alias("_vi"),
    )
    logp_out = F.log(
        (F.col("_c12o") + F.lit(alpha))
        / (F.col("_c1o") + F.lit(alpha) * F.col("_vo"))
    )
    logp_in = F.log(
        (F.coalesce("_c12i", F.lit(0)) + F.lit(alpha))
        / (F.coalesce("_c1i", F.lit(0)) + F.lit(alpha) * F.col("_vi"))
    )
    per_doc = (
        bg.join(bg_tab, ["w1", "w2"], "inner")
        .join(uni_tab, "w1", "inner")
        .crossJoin(F.broadcast(vfr))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp_out), 6).alias("logp_out"),
            F.round(F.avg(logp_in), 6).alias("logp_in"),
        )
    )
    scored = (
        ids.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("int").alias("n_bigrams"),
            "logp_out", "logp_in",
        )
        .withColumn(
            "ml_score",
            F.round(F.col("logp_in") - F.col("logp_out"), 6),
        )
        # the top-n broadcast side below and the final output BOTH hang
        # off this frame — un-checkpointed, the whole scoring pipeline
        # would execute twice (once inside the broadcast-build job,
        # once in the main query). The checkpoint is doc-sized (one
        # row per doc, five narrow columns), never token-sized.
        .localCheckpoint(eager=False)
    )
    sel = (
        scored.filter(F.col("ml_score").isNotNull())
        .orderBy(F.col("ml_score").desc(), "doc_id")
        .limit(n)
        .select("doc_id", F.lit(True).alias("_sel"))
    )
    return (
        scored.join(F.broadcast(sel), "doc_id", "left")
        .select(
            "doc_id",
            "n_bigrams",
            "logp_in",
            "logp_out",
            "ml_score",
            F.coalesce("_sel", F.lit(False)).alias("selected"),
        )
    )


def hash_classifier_score(docs: DataFrame, weights: list[float],
                          bias: float, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Hashed-feature linear quality classifier (the fastText-style
    shape: hash tokens into B buckets, mean-pool the bucket weights,
    sigmoid) — the APPLY side of a learned quality filter, with the
    trained weights passed in as plain floats. With seeded weights the
    whole apply path is SQL-replayable (registry
    ``text_quality_classifier`` — the seeded-parameter precedent);
    swapping in real trained weights changes nothing structurally.

    Bucket = the first two md5 nibbles of each normalized token
    (integer-exact in any engine), so B must be ≤256; weight lookup is
    a literal-array element_at — no join, no Python. One explode + one
    doc-id aggregation: linear, two exchanges max.

    Output: (doc_id, n_toks, score rounded 6dp, quality_pass) —
    ``quality_pass`` is the unrounded z > 0 decision (sigmoid > 0.5).
    """
    from open_instrument_spark.operators.text import words

    B = len(weights)
    if B > 256:
        raise ValueError("hash_classifier_score supports at most 256 buckets")
    wl = F.array(*[F.lit(float(w)) for w in weights])
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("t"),
    )
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 2), 16, 10).cast("int") % B
    )
    scored = (
        tok.select("doc_id", F.element_at(wl, bucket + 1).alias("w"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_toks"), F.avg("w").alias("mw"))
    )
    z = F.lit(float(bias)) + F.col("mw")
    return scored.select(
        "doc_id",
        "n_toks",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
        (z > 0).alias("quality_pass"),
    )


def _dsir_bucket_counts(docs: DataFrame, text_col: str, id_col: str,
                        n_buckets: int) -> DataFrame:
    """(doc_id, is_target, b, c) — per-doc hashed n-gram bucket counts.
    Features are the normalized word unigrams PLUS consecutive bigrams
    (the DSIR paper's hashed n-gram featurization), bucketed by the
    first two md5 nibbles (integer-exact cross-engine, B ≤ 256 — the
    hash_classifier_score idiom). ``is_target`` rides the explode so
    no join against the exploded frame is ever needed; both of
    dsir_resample's consumers aggregate THIS frame, so Spark reuses
    one (doc_id, is_target, b) exchange for the whole pipeline (the
    first r10 bench measured the naive two-tokenize form at 12.7 s —
    this shape re-benched at roughly half that)."""
    if n_buckets > 256:
        raise ValueError("dsir supports at most 256 buckets")
    # r14 (guide §1.2 per-task work): materialize the token array as a
    # COLUMN before the bigram transform. Inlined as an expression, the
    # element_at(toks, i) calls inside the transform lambda re-evaluated
    # the whole lower→regexp_replace→split→filter tokenize chain per
    # bigram index — O(|text|·n_tokens) per doc (the r14b plan capture
    # shows the chain repeated six times inside one Generate). As a
    # projected column it evaluates once per doc; features identical.
    tokd = docs.select(
        F.col(id_col).alias("doc_id"),
        "is_target",
        words(F.col(text_col)).alias("_toks"),
    )
    toks = F.col("_toks")
    # Spark's sequence(1, 0) yields descending [1, 0] (DuckDB's
    # generate_series(1, 0) is empty), so a <2-word doc would evaluate
    # element_at(toks, 0) and throw — guard like _doc_bigrams above.
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(F.element_at(toks, i), F.lit(" "),
                               F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feat = tokd.select(
        "doc_id",
        "is_target",
        F.explode(F.concat(toks, bigrams)).alias("t"),
    )
    b = F.conv(F.substring(F.md5("t"), 1, 2), 16, 10).cast("int") % n_buckets
    return (
        feat.select("doc_id", "is_target", b.alias("b"))
        .groupBy("doc_id", "is_target", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_resample(docs: DataFrame, target_pred, n: int,
                  n_buckets: int = 256, text_col: str = "text",
                  id_col: str = "doc_id", salt: str = "dsir1") -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): choose raw-corpus examples that look like the
    TARGET distribution. Hashed n-gram bag models are fit on both
    sides; each raw doc gets log importance weight
    ``Σ_b c_b · (ln p̂_b − ln q̂_b)`` (add-1 smoothed over the bucket
    grid), and the paper's Gumbel top-k draws the sample without
    replacement: priority = logw + Gumbel(u), u the doc's md5 uniform
    (the weighted_sample determinism trick; priority rounded 6 dp so
    the RANK — not just the value — is pinned cross-engine).

    Unlike most trained selectors the whole pipeline — model fitting
    included — is aggregation + bounded joins, so it replays in ANSI
    SQL under the driver hash gate (the text_lm_score precedent): the
    λ table is 2·B aggregate rows living INSIDE the plan (broadcast
    join), never a driver artifact.

    100 TB shape: ONE tokenize/explode pass folded to per-doc bucket
    counts (map-side partial agg); both the λ build (sums that frame
    to B rows) and the scoring branch aggregate the SAME
    (doc_id, is_target, b) exchange, which Spark reuses — so the raw
    text is scanned once. No all-pairs, no collect. ``target_pred``
    is a boolean Column marking target-distribution rows (e.g.
    ``F.col("source") == "src16"``); only raw (non-target) docs are
    scored and sampled.

    Output: top-``n`` raw docs as (doc_id, n_feats, logw, priority,
    sample_rank).
    """
    B = n_buckets
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("__text"),
                       target_pred.alias("is_target"))
    counts = _dsir_bucket_counts(base, "__text", "doc_id", B)
    # λ_b = ln p̂_b − ln q̂_b over the full bucket grid (absent buckets
    # smooth to 1/(tot+B)); totals via a window over the 2·B-row
    # aggregate, then pivot target/raw sides by conditional sum.
    side_counts = counts.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0)).alias("cp"),
        F.sum(F.when(~F.col("is_target"), F.col("c")).otherwise(0)).alias("cq"),
    )
    grid = docs.sparkSession.range(B).select(F.col("id").cast("int").alias("b"))
    lam = (
        grid.join(side_counts, "b", "left")
        .select("b", F.coalesce("cp", F.lit(0)).alias("cp"),
                F.coalesce("cq", F.lit(0)).alias("cq"))
        .select(
            "b",
            (F.log((F.col("cp") + 1.0)
                   / (F.sum(F.col("cp") + 1.0).over(Window.partitionBy())))
             - F.log((F.col("cq") + 1.0)
                     / (F.sum(F.col("cq") + 1.0).over(Window.partitionBy()))))
            .alias("lam"),
        )
    )
    per_doc = (
        counts.where(~F.col("is_target"))
        .join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_feats"),
             F.sum(F.col("c") * F.col("lam")).alias("logw_raw"))
    )
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"),
                                          F.col("doc_id").cast("string"))),
                           1, 8), 16, 10).cast("long") + 1.0
    ) / F.lit(4294967296.0)
    gumbel = -F.log(-F.log(u))
    pri = F.round(F.col("logw_raw") + gumbel, 6)
    scored = per_doc.select(
        "doc_id",
        F.col("n_feats").cast("long").alias("n_feats"),
        F.round("logw_raw", 6).alias("logw"),
        pri.alias("priority"),
    )
    # top-n via distributed TakeOrderedAndProject (never a global
    # single-partition rank over all raw docs); the row_number window
    # then runs over just the n winners.
    top = scored.orderBy(F.col("priority").desc(), F.col("doc_id").asc()) \
                .limit(n)
    w = Window.partitionBy().orderBy(F.col("priority").desc(),
                                     F.col("doc_id").asc())
    return top.withColumn("sample_rank", F.row_number().over(w))

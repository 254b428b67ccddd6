"""Corpus management operators for training-data pipelines (§2.9
extension family): deterministic splitting and sequence packing.

Not in the reference system — these are the two operations every
LLM-data pipeline needs between dedup and tokenization:

- ``hash_split``: stable train/val/test assignment by hashing a document
  id. Deterministic across runs, engines and cluster sizes (md5 is
  portable — the DuckDB oracle computes the identical assignment), and
  stable under corpus growth: adding documents never reassigns existing
  ones (the property random splits lack).
- ``pack_greedy``: contiguous sequence packing — assign documents, in a
  deterministic order, to consecutive bins of ~``budget`` tokens by
  cumulative token count. One window pass; the standard approximation of
  first-fit packing (a bin may overflow by less than one document, and
  no reordering is attempted — exact bin-packing is NP-hard and needs
  sequential state).

Both are pure Column expressions: scan-project (+ one sort for packing),
no Python, no shuffle beyond the packing sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


DEFAULT_WEIGHTS = {"train": 0.90, "val": 0.05, "test": 0.05}


def _hex_threshold(fraction: float) -> str:
    """32-hex-char string t such that P(md5_hex < t) = fraction for a
    uniform hash. Comparing lowercase hex strings lexicographically is
    engine-portable (Spark and DuckDB md5 both emit lowercase hex)."""
    return format(int(fraction * 16**32), "032x")


def cumulative_thresholds(weights: dict[str, float]) -> dict[str, str]:
    """Upper hex threshold per split name (last split's is implicit).

    THE single source of the boundary values: split_column and any oracle
    SQL must both take thresholds from here — cumulative float sums are
    not associative (0.90+0.05 != 0.95 exactly), so independently
    re-deriving a boundary can disagree in the last bit.

    A cumulative prefix that reaches 1.0 (e.g. {'train': 1.0, 'val': 0})
    is clamped to "g": _hex_threshold(1.0) would be a 33-char string that
    sorts BELOW most 32-char md5 hashes lexicographically (same guard as
    stratified_sample_frac._keep), while "g" sorts above every lowercase
    hex string in both Spark and DuckDB, making the condition always-true.
    """
    out = {}
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        out[name] = "g" if cum >= 1.0 else _hex_threshold(cum)
    return out


def split_column(id_col: Column, weights: dict[str, float]) -> Column:
    """Split-name column from cumulative md5 thresholds over ``weights``
    (must sum to ~1; order of dict entries fixes the hash ranges)."""
    h = F.md5(id_col.cast("string"))
    expr = None
    names = list(weights)
    for name, threshold in cumulative_thresholds(weights).items():
        cond = h < threshold
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(names[-1])


def hash_split(docs: DataFrame, id_col: str = "doc_id",
               weights: dict[str, float] | None = None) -> DataFrame:
    """Assign each row a stable split label (default 90/5/5)."""
    weights = weights or DEFAULT_WEIGHTS
    return docs.withColumn("split", split_column(F.col(id_col), weights))


def _sample_hash(group_col: Column, id_col: Column) -> Column:
    """Per-(group, id) uniform hash in hex — md5 so DuckDB replays it.
    Salting the id with the group makes each group's sample independent:
    a document kept in one stratum's 10% is not thereby privileged when
    the same id appears under another stratum."""
    return F.md5(F.concat_ws(":", group_col.cast("string"), id_col.cast("string")))


def stratified_sample_frac(
    docs: DataFrame,
    group_col: str,
    fractions: dict[str, float] | float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling by hash threshold — the
    100 TB path (pure scan-project filter: no shuffle, no count pass,
    no state). ``fractions`` is one float for all strata or a dict of
    group value → keep-fraction (groups absent from the dict are
    dropped). Membership is stable under corpus growth: adding rows
    never changes existing rows' keep/drop decision.
    """
    g, h = F.col(group_col), _sample_hash(F.col(group_col), F.col(id_col))

    def _keep(frac: float) -> Column:
        # frac >= 1 must short-circuit: _hex_threshold(1.0) is a 33-char
        # string that sorts BELOW most 32-char hashes lexicographically.
        return F.lit(True) if frac >= 1.0 else h < _hex_threshold(frac)

    if isinstance(fractions, dict):
        keep = F.lit(False)
        for name, frac in fractions.items():
            keep = F.when((g == name) & _keep(frac), True).otherwise(keep)
    else:
        keep = _keep(fractions)
    return docs.where(keep)


def stratified_sample_quota(
    docs: DataFrame, group_col: str, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by
    deterministic hash rank (row_number over the per-group md5 order,
    id as tiebreak). Adds ``sample_rank`` (1-based within the stratum).

    One shuffle on the group key; each stratum's rank sort is one task,
    so per-task size ≈ stratum size. For strata too large to sort in one
    task, pre-thin with :func:`stratified_sample_frac` at a generous
    multiple of the quota (e.g. 4n/|stratum|) and rank the survivors —
    the composition keeps the exact-n guarantee with overwhelming
    probability while bounding the sort.
    """
    h = _sample_hash(F.col(group_col), F.col(id_col))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )


def weighted_sample(docs: DataFrame, weight_col: str, n: int,
                    group_col: str | None = None, id_col: str = "doc_id",
                    seed: str = "ws1") -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis & Spirakis
    2006 A-Res (public): each row draws a deterministic uniform
    u ∈ (0, 1] from md5(seed:id) and competes with key u^(1/w); the
    top-n keys are the sample, giving inclusion probability ∝ weight.
    The quality/size-weighted corpus subsample recipe ("sample docs
    proportional to quality score") with the same growth-stability as
    the hash split: adding documents never changes existing rows'
    keys.

    Ranking uses the monotone-equivalent ln(u)/w (larger = better; no
    pow), ROUNDED to 9 dp with the id as tiebreak, so the order —
    not just the output values — is pinned cross-engine (ln differs
    from DuckDB's by ≤1 ulp; a 1-ulp wobble never crosses a 9-dp
    boundary except on measure-zero inputs, the repo's standard
    rounding contract). One rank exchange per group; a GLOBAL top-n
    (group_col=None) funnels through a single-task sort, so at corpus
    scale either group first or pre-thin with stratified_sample_frac
    at a generous multiple of n (the stratified_sample_quota
    composition — same exact-n guarantee, bounded sort). Weights must
    be > 0; non-positive weights raise at execution. Output: input
    columns + ``priority`` (the rounded ln(u)/w key) +
    ``sample_rank`` (1-based within the group).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.lit(":"),
                               F.col(id_col).cast("string"))), 1, 8),
            16, 10,
        ).cast("double") + 1.0
    ) / F.lit(float(2 ** 32))
    w = F.col(weight_col).cast("double")
    pri = F.round(F.log(u) / w, 9)
    keys = [group_col] if group_col else []
    win = (Window.partitionBy(*keys) if keys else Window.partitionBy()) \
        .orderBy(F.col("priority").desc(), F.col(id_col).asc())
    return (
        docs.withColumn(
            "priority",
            F.when(w > 0, pri).otherwise(
                F.raise_error(F.concat(
                    F.lit("weighted_sample: non-positive weight for id "),
                    F.col(id_col).cast("string")))),
        )
        .withColumn("sample_rank", F.row_number().over(win))
        .where(F.col("sample_rank") <= n)
    )


def pack_greedy(docs: DataFrame, token_col: str, budget: int,
                order_col: str = "doc_id") -> DataFrame:
    """Assign a ``bin`` id by cumulative token count in ``order_col``
    order: bin = floor(exclusive-prefix-sum / budget). Documents stay
    contiguous; each bin holds ≥1 document and overflows ``budget`` by
    at most one document's tokens.

    Scale note: the window is UNPARTITIONED (a global packing order), so
    the prefix sum runs on a single task — the ORACLE/verification form.
    The scale path is :func:`pack_greedy_partitioned`, which packs within
    a coarse partition key in parallel.
    """
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    prior = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return docs.withColumn(
        "bin", F.floor(prior / F.lit(budget)).cast("long")
    )


def pack_greedy_partitioned(docs: DataFrame, token_col: str, budget: int,
                            partition_col: str | Column,
                            order_col: str = "doc_id") -> DataFrame:
    """Sequence packing at scale: the greedy prefix-sum packing of
    :func:`pack_greedy`, run independently within each value of
    ``partition_col`` (e.g. split, date bucket, or a hash of the id).

    One shuffle on the partition key; every partition's prefix sum is its
    own task, so the single-task global window disappears. Bin identity
    is the DETERMINISTIC pair (partition value, local bin) — emitted as
    ``bin_part`` and ``bin`` columns — so ids are stable across runs and
    cluster sizes. Packing quality within a partition is identical to the
    global form; only bins straddling partition boundaries differ (at
    most one under-filled bin per partition value).

    Partition-key choice bounds the task, not correctness: pick keys
    whose per-key token mass fits one task comfortably (a date bucket at
    100 TB; never a constant).
    """
    pcol = F.col(partition_col) if isinstance(partition_col, str) else partition_col
    tagged = docs.withColumn("bin_part", pcol)
    w = (
        Window.partitionBy("bin_part")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return tagged.withColumn("bin", F.floor(prior / F.lit(budget)).cast("long"))


# ---------------------------------------------------------------------------
# Source-level quality aggregation (the C4/RefinedWeb "domain filter")
# ---------------------------------------------------------------------------

def source_stats(docs: DataFrame, text_col: str = "text",
                 source_col: str = "source",
                 lang_col: str = "lang") -> DataFrame:
    """Per-source corpus health: the aggregation a web-scale cleaning
    pipeline runs to decide which SOURCES (domains, crawls, feeds) to
    keep before touching individual documents — C4 and RefinedWeb both
    filter at this granularity first because a bad source predicts bad
    documents far more cheaply than per-document scoring alone.

    Output per source: ``n_docs``, ``avg_chars``, ``avg_quality``
    (mean of the per-doc composite heuristic, text.quality_score),
    ``en_frac`` (declared-language share), and ``dup_frac`` — the share
    of the source's documents whose FINGERPRINT (text.fingerprint: min
    md5 over word 3-grams, a deterministic 1-perm MinHash) collides
    with any other document corpus-wide; near-duplicate mass is the
    classic boilerplate/mirror signal.

    Scale shape: one map pass computes per-doc features, one shuffle
    counts fingerprints, one shuffle aggregates by source — output is
    |sources| rows, always broadcastable to the filter below."""
    from open_instrument_spark.operators.text import fingerprint, quality_score

    per = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.length(text_col).alias("n_chars"),
        F.round(quality_score(F.col(text_col)), 6).alias("q"),
        fingerprint(F.col(text_col)).alias("fp"),
    )
    # Corpus-wide fingerprint multiplicity as a COUNT WINDOW over fp
    # (r14 optimization, guide §2.4): the former groupBy(fp) + join(fp)
    # referenced ``per`` from two branches, so the fingerprint pass —
    # md5 over every word 3-gram, the dominant per-doc cost — executed
    # once per branch (two parquet scans in the plan). The window keeps
    # one pipeline (one scan, one Exchange on fp) and counts the same
    # partition the join's build side aggregated — ``c`` is identical
    # per non-null fp. Null-text semantics (advisor r14, deliberate):
    # fingerprint(NULL) is NULL, and the NULL partition groups
    # together, so null-text docs now COUNT toward n_docs/avg_chars and
    # read as corpus-wide duplicates of each other when >=2 exist —
    # the old inner join excluded them from the report entirely. A
    # source shipping null bodies SHOULD look unhealthy on the dup_frac
    # health bar; driver corpora carry no null text, so the oracle gate
    # sees no difference.
    joined = per.withColumn(
        "c", F.count(F.lit(1)).over(Window.partitionBy("fp")))
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg("q"), 6).alias("avg_quality"),
        F.round(
            F.avg((F.col("lang") == "en").cast("double")), 6
        ).alias("en_frac"),
        F.round(
            F.avg((F.col("c") > 1).cast("double")), 6
        ).alias("dup_frac"),
    )


def source_filter(docs: DataFrame, min_quality: float = 0.78,
                  max_dup_frac: float = 0.5, text_col: str = "text",
                  source_col: str = "source",
                  lang_col: str = "lang") -> DataFrame:
    """Keep only documents from sources that pass the health bar
    (avg_quality ≥ ``min_quality`` AND dup_frac ≤ ``max_dup_frac``).
    The stats frame is |sources| rows → broadcast join; the corpus is
    scanned, never shuffled, for the filter itself."""
    keep = source_stats(docs, text_col, source_col, lang_col).filter(
        (F.col("avg_quality") >= min_quality)
        & (F.col("dup_frac") <= max_dup_frac)
    ).select("source")
    return docs.join(
        F.broadcast(keep),
        docs[source_col] == keep["source"],
    ).drop(keep["source"])


def mixture_by_tokens(docs: DataFrame, group_col: str,
                      budgets: dict[str, int], text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Token-budgeted data-mixture sampling (the DoReMi / Pile-style
    "N tokens from each domain" recipe): within each group, walk
    documents in the deterministic per-group md5 order and keep them
    while the running token total BEFORE the document is under that
    group's budget — so the budget-crossing document is included and
    every budget is met (or the group exhausted) deterministically.
    Groups absent from ``budgets`` are dropped.

    Token count is the whitespace count (`size(split(text, ' '))` — the
    text_stats convention). Output adds (n_tokens, tokens_before).

    One shuffle on the group key, same as stratified_sample_quota, and
    the same pre-thin composition bounds per-task sort size when a
    domain is monstrous: stratified_sample_frac at a generous multiple
    of budget/avg_doc_tokens first, then this walk over the survivors.
    """
    h = _sample_hash(F.col(group_col), F.col(id_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = F.size(F.split(F.col(text_col), " "))
    budget = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )[F.col(group_col)]
    return (
        docs.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
        )
        .where(F.col("tokens_before") < budget)
    )


def mixture_by_temperature(docs: DataFrame, group_col: str, alpha: float,
                           total_tokens: int, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Temperature-based mixture sampling (the multilingual-LM
    α-sampling recipe — mC4/XLM-R: sample share ∝ n_s^α, α<1 upweights
    small sources): per-group token budgets are DERIVED from the
    corpus, b_s = total · n_s^α / Σ_t n_t^α, then the same
    deterministic budget walk as :func:`mixture_by_tokens` keeps each
    group's md5-ordered prefix through the budget-crossing document.

    The budget table stays IN-PLAN (|groups| aggregate rows +
    all-groups normalizer window, broadcast-joined back — the DSIR λ
    pattern), so the whole pipeline — budget derivation included —
    replays in SQL under the hash gate. The keep decision compares the
    integer ``tokens_before`` against the UNROUNDED double budget
    (fractional powers differ across engines only in the last ulp,
    which flips a comparison against an integer essentially never —
    the slo page / quality_pass precedent); the reported ``budget``
    column is rounded 6 dp.

    Output: docs columns + (n_tokens, tokens_before, budget).
    """
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    sized = docs.withColumn("n_tokens", n_tok)
    share = F.pow(F.col("gtok").cast("double"), float(alpha))
    wall = Window.partitionBy()
    budgets = (
        sized.groupBy(group_col)
        .agg(F.sum("n_tokens").alias("gtok"))
        .select(
            group_col,
            (F.lit(float(total_tokens)) * share
             / F.sum(share).over(wall)).alias("_budget"),
        )
    )
    h = _sample_hash(F.col(group_col), F.col(id_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        sized.join(F.broadcast(budgets), group_col)
        .withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
        )
        .where(F.col("tokens_before") < F.col("_budget"))
        .withColumn("budget", F.round("_budget", 6))
        .drop("_budget")
    )


def chunk_documents(docs: DataFrame, width: int = 64, stride: int = 48,
                    text_col: str = "text", id_col: str = "doc_id",
                    ) -> DataFrame:
    """Retrieval-style chunking: overlapping ``width``-token windows at
    ``stride`` (the RAG/embedding prep pass). Every non-empty document
    emits ≥1 chunk; the final chunk is the natural short tail. Output:
    (doc_id, chunk_start 1-based, chunk_tokens, chunk_md5) — the md5
    stands in for the chunk text so results stay hashable and small
    while still pinning the exact chunk bytes cross-engine.

    Map-only: explode over a per-row stride sequence, no shuffle at all
    (plan-asserted) — at 100 TB this runs at scan speed and feeds the
    embedding UDF stage directly.
    """
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.size(toks).alias("n"),
    )
    chunk = F.slice("toks", F.col("chunk_start"), width)
    return (
        base.where(F.col("n") >= 1)
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(1), F.col("n"), F.lit(stride))
            ).alias("chunk_start"),
        )
        # stride tails that start past the end of a PREVIOUS full
        # window would duplicate coverage; sequence(1, n, stride)
        # already stops at n so every start is in-range.
        .select(
            "doc_id",
            "chunk_start",
            F.size(chunk).cast("long").alias("chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )


def leakage_safe_split(docs: DataFrame, pairs: DataFrame,
                       weights: dict[str, float] | None = None,
                       id_col: str = "doc_id",
                       a: str = "a_id", b: str = "b_id") -> DataFrame:
    """Cluster-aware train/val/test split: every near-dup CLUSTER lands
    whole in one split. A plain per-doc hash split leaks — a test doc's
    near-duplicate in train inflates eval scores (the decontamination
    literature's in-corpus case: Lee et al. 2021 §6.2 observe ~triple
    the validation perplexity improvement on seen-in-train dups; public)
    — so the split KEY must be the dedup group, not the doc.

    ``pairs`` is any pair-producing dedup stage's output (n-gram
    Jaccard, MinHash-LSH verify, SemDeDup). Group id = the connected
    component's min doc_id (singletons: the doc itself), hashed with
    the same md5-threshold grammar as :func:`hash_split` — on a
    duplicate-free corpus this REDUCES to hash_split exactly, and
    adding documents never reassigns existing groups.

    100 TB shape: connected components run on the EDGE list (pairs-
    scale, not corpus-scale; O(log diameter) pointer-jumping rounds);
    the corpus pays one left join against the component table (dup-
    involved docs only — typically a few % of the corpus, broadcastable
    at real dup rates) and a scan-project split expression. No corpus
    self-join, no global sort. Output: docs + (group_id, split)."""
    from open_instrument_spark.operators.dedup import connected_components

    weights = weights or DEFAULT_WEIGHTS
    comp = connected_components(pairs, a=a, b=b).withColumnRenamed(
        "doc_id", id_col).withColumnRenamed("cluster_id", "_cluster")
    out = docs.join(comp, on=id_col, how="left")
    group = F.coalesce(F.col("_cluster"), F.col(id_col))
    return (
        out.withColumn("group_id", group)
        .withColumn("split", split_column(F.col("group_id"), weights))
        .drop("_cluster")
    )


# ---------------------------------------------------------------------------
# Distribution drift between corpus slices (PSI)
# ---------------------------------------------------------------------------

def _len_bin(n_chars: Column, edges: tuple[int, ...]) -> Column:
    """Label of the first edge > n_chars ('<=E'), else '>Emax' — a
    CASE chain over literal edges, identical grammar cross-engine."""
    expr = F.lit(f">{edges[-1]}")
    for e in reversed(edges):
        expr = F.when(n_chars <= e, F.lit(f"<={e}")).otherwise(expr)
    return expr


def drift_psi(ref: DataFrame, cur: DataFrame,
              len_edges: tuple[int, ...] = (100, 200, 300, 400, 500),
              text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """Population Stability Index between a REFERENCE corpus slice and
    a CURRENT slice over two feature distributions — document length
    (binned at literal edges) and language — the drift monitor every
    recurring training-data pipeline runs before trusting a new crawl
    against the mix the model was tuned on (PSI is the standard
    industry drift score; > 0.1 investigate / > 0.25 act):

        PSI(feature) = Σ_bins (p_b − q_b) · ln(p_b / q_b)

    with p/q the add-half-smoothed bin shares (c_b + 0.5)/(n + 0.5·B),
    B the number of bins observed for that feature across BOTH slices
    (smoothing keeps bins observed on only one side finite and makes
    PSI symmetric-safe at any corpus size).

    Spark shape: one scan per slice → per-(feature, bin) counts
    (explode of a 2-struct array, map-side combinable, ≤ B·2 rows out)
    → full-outer join on the BOUNDED bin table → window totals per
    feature. The corpus is never joined or shuffled row-wise; cost is
    two aggregation passes however large the slices.

    Output: (feature, bin, n_ref, n_cur, p_ref, p_cur, psi_term,
    psi_total) — one row per observed bin, psi_total repeated per
    feature (rounded 6; the only re-associating sum)."""
    def feat_counts(df: DataFrame, name: str) -> DataFrame:
        n_chars = F.length(F.col(text_col))
        pairs = F.array(
            F.struct(F.lit("len").alias("feature"),
                     _len_bin(n_chars, len_edges).alias("bin")),
            F.struct(F.lit("lang").alias("feature"),
                     F.coalesce(F.col(lang_col), F.lit("und")).alias("bin")),
        )
        return (
            df.select(F.explode(pairs).alias("fb"))
            .select("fb.feature", "fb.bin")
            .groupBy("feature", "bin")
            .agg(F.count(F.lit(1)).alias(name))
        )
    r = feat_counts(ref, "n_ref")
    c = feat_counts(cur, "n_cur")
    joined = (
        r.join(c, ["feature", "bin"], "full_outer")
        .select(
            "feature", "bin",
            F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        )
    )
    wf = Window.partitionBy("feature")
    tot = joined.select(
        "feature", "bin", "n_ref", "n_cur",
        F.sum("n_ref").over(wf).alias("_tr"),
        F.sum("n_cur").over(wf).alias("_tc"),
        F.count(F.lit(1)).over(wf).alias("_b"),
    )
    p = (F.col("n_ref") + F.lit(0.5)) / (F.col("_tr") + F.lit(0.5) * F.col("_b"))
    q = (F.col("n_cur") + F.lit(0.5)) / (F.col("_tc") + F.lit(0.5) * F.col("_b"))
    terms = tot.select(
        "feature", "bin", "n_ref", "n_cur",
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("p_cur"),
        ((p - q) * F.log(p / q)).alias("_t"),
    )
    return (
        terms.select(
            "feature", "bin", "n_ref", "n_cur", "p_ref", "p_cur",
            F.round(F.col("_t"), 6).alias("psi_term"),
            F.round(F.sum("_t").over(Window.partitionBy("feature")), 6)
            .alias("psi_total"),
        )
    )

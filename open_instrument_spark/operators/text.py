"""Text-analysis operators for large-scale training-data pipelines.

Not present in the reference system (which stores only numeric/string
metric samples) — these are the §2.9 north-star extensions riding the
same engine: language-ID (stopword-hit heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + a BPE-ish
regex), and document fingerprinting (min-hash over word k-grams).

Everything here is a pure Column expression (JVM-side, whole-stage
codegen): at 100 TB these run as a single scan-project with no shuffle
and no Python. The normalization/tokenization pipeline is deliberately
expressible in ANSI SQL so DuckDB can oracle every step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish token regex: word runs or single non-space punctuation
TOKEN_RE = r"\w+|[^\w\s]"

# Small public stopword lists for the language-ID heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "auf"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"),
    "es": ("el", "los", "se", "del", "las", "por", "con", "para", "una", "su"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")


def let(col: Column, fn) -> Column:
    """Bind ``col`` to a lambda variable and build the result with ``fn``.

    Higher-order-function lambda bodies are interpreted per element with
    NO common-subexpression elimination, so referencing an expensive
    expression (e.g. regex tokenization) inside a ``transform`` lambda
    re-evaluates it per element — O(n²) per row. Routing it through a
    single-element ``transform`` evaluates it exactly once per row.
    """
    return F.get(F.transform(F.array(col), fn), 0)


def normalized(text: Column) -> Column:
    """lower → strip non-letters → squeeze; the shared tokenizer base."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z ]", " "))


def words(text: Column) -> Column:
    """Whitespace word tokens of the normalized text (no empties)."""
    return F.filter(F.split(normalized(text), r"\s+"), lambda t: t != "")


def n_tokens_bpe(text: Column) -> Column:
    """BPE-ish token count on the RAW text: word runs + punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0))


def stopword_hits_toks(toks: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def stopword_hits(text: Column, lang: str) -> Column:
    return stopword_hits_toks(words(text), lang)


def lang_id_toks(toks: Column) -> Column:
    """Heuristic language ID: argmax of stopword hits, priority order on
    ties (en > de > fr > es), 'und' when nothing matches."""
    scores = {lg: stopword_hits_toks(toks, lg) for lg in LANG_PRIORITY}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lg in reversed(LANG_PRIORITY):
        expr = F.when((scores[lg] == best) & (best > 0), lg).otherwise(expr)
    return expr


def lang_id(text: Column) -> Column:
    return lang_id_toks(words(text))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio_toks(toks: Column, lang: str = "en") -> Column:
    n = F.size(toks)
    return F.when(
        n > 0, stopword_hits_toks(toks, lang).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return stopword_ratio_toks(words(text), lang)


def quality_score_toks(toks: Column, praw: Column) -> Column:
    """Composite quality heuristic in [0,1]: enough words, sane word
    length, some stopwords, little punctuation — the standard cheap
    pre-filter shape for LLM corpus cleaning. ``praw`` = punct_ratio."""
    nw = F.size(toks).cast("double")
    mean_wlen = F.when(
        nw > 0,
        F.aggregate(toks, F.lit(0).cast("double"), lambda acc, w: acc + F.length(w))
        / nw,
    ).otherwise(F.lit(0.0))
    len_term = F.least(F.lit(1.0), nw / F.lit(50.0))
    wlen_term = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_term = F.least(F.lit(1.0), stopword_ratio_toks(toks) * F.lit(5.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), praw * F.lit(4.0))
    return (
        len_term * 0.4 + wlen_term * 0.2 + stop_term * 0.2 + punct_term * 0.2
    )


def quality_score(text: Column) -> Column:
    return let(words(text), lambda toks: quality_score_toks(toks, punct_ratio(text)))


def fingerprint_toks(toks: Column, text: Column, k: int = 3) -> Column:
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    return F.when(n >= k, F.array_min(grams)).otherwise(F.md5(normalized(text)))


def fingerprint(text: Column, k: int = 3) -> Column:
    """Document fingerprint: lexicographic min of md5 over word k-grams
    (a deterministic min-hash; short docs fall back to the whole text).
    """
    return let(words(text), lambda toks: fingerprint_toks(toks, text, k))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stat sheet in two chained projections.

    Stage 1 materializes the token array (and the raw-text regex counts)
    exactly once per row; stage 2 derives every stat from those columns.
    Catalyst keeps the stage-1 Project separate (multi-referenced,
    non-cheap aliases are not inlined by CollapseProject), so the regex
    tokenization runs once instead of once per stat — still a single
    scan-project pipeline, no shuffle, at any scale.
    """
    t = F.col(text_col)
    staged = docs.select(
        "doc_id",
        t.alias("_text"),
        words(t).alias("_toks"),
        n_tokens_bpe(t).alias("_ntok"),
        punct_ratio(t).alias("_praw"),
    )
    toks, raw, praw = F.col("_toks"), F.col("_text"), F.col("_praw")
    return staged.select(
        "doc_id",
        F.length(raw).alias("n_chars"),
        F.size(toks).alias("n_words"),
        F.col("_ntok").alias("n_tokens"),
        F.round(praw, 6).alias("punct_ratio"),
        F.round(stopword_ratio_toks(toks), 6).alias("stopword_ratio"),
        F.round(quality_score_toks(toks, praw), 6).alias("quality"),
        lang_id_toks(toks).alias("lang_pred"),
        fingerprint_toks(toks, raw).alias("fingerprint"),
    )


# ---- repetition signals (Gopher-style quality filters) ---------------------

# Bullet/ellipsis line shapes from the Gopher corpus-quality rules
# (Rae et al. 2021, §A.1.1): lines are trimmed before testing.
BULLET_LINE_RE = r"^[-*•]"
ELLIPSIS_LINE_RE = r"(\.\.\.|…)$"
SYMBOL_RE = r"#|\.\.\.|…"


def doc_lines(text: Column) -> Column:
    """Trimmed, non-empty lines of the raw text."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )


def _frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
        F.lit(0.0)
    )


def _run_stats(arr: Column) -> Column:
    """Multiplicity stats of an array in O(n log n): sort, then one
    aggregate pass over equal-value runs. Returns a struct with
    ``best`` (max multiplicity), ``bestc`` (max multiplicity ×
    element length — the char mass of the most repeated element) and
    ``dupc`` (total char mass of elements occurring more than once).

    Replaces the naive per-element count(filter(...)) form, which is
    O(n²) per ROW — at 512 words that is ~260k interpreted lambda
    evaluations per document, the difference between a scan-project
    and a hot spot at corpus scale. Values are identical, so the
    DuckDB oracles (which keep the O(n²) spelling for clarity) are
    unaffected.
    """
    z = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("bestc"),
        F.lit(0).cast("long").alias("dupc"),
    )

    def step(a, x):
        run = F.when(x == a.prev, a.run + 1).otherwise(F.lit(1))
        # chars newly attributable to duplicates: the 2nd copy of a
        # value retro-counts the 1st, later copies count themselves
        dup_add = (
            F.when(run == 2, F.length(x) * 2)
            .when(run > 2, F.length(x))
            .otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(a.best, run).alias("best"),
            F.greatest(a.bestc, run * F.length(x)).alias("bestc"),
            (a.dupc + dup_add).alias("dupc"),
        )

    return F.aggregate(F.array_sort(arr), z, step)


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int = 512,
    max_lines: int = 256,
) -> DataFrame:
    """Gopher-style repetition / document-shape quality signals.

    Per document: duplicate-line fraction (by line count and by
    character mass), most-common-word-2-gram fraction (by slot count and
    by character mass), symbol-to-word ratio (#/ellipsis), and the
    fractions of lines that are bullets or end in an ellipsis — the
    standard cheap repetition filters an LLM corpus pipeline applies
    between scrubbing and dedup.

    Pure Column expressions (scan-project, zero Python, no shuffle). The
    duplicate and 2-gram signals compare elements pairwise inside a row,
    so per-row cost is O(max_words² + max_lines²): both arrays are
    truncated (first ``max_words`` words / ``max_lines`` lines) to bound
    the cost per row regardless of document length — at 100 TB a single
    pathological 1 GB document must not own a task. Truncation is part
    of the operator contract and mirrored by the DuckDB oracle.
    """
    t = F.col(text_col)
    staged = docs.select(
        "doc_id",
        t.alias("_text"),
        F.slice(doc_lines(t), 1, max_lines).alias("_lines"),
        F.slice(words(t), 1, max_words).alias("_toks"),
    )
    lines, toks, raw = F.col("_lines"), F.col("_toks"), F.col("_text")
    n_words = F.size(toks)
    line_chars = F.aggregate(lines, F.lit(0).cast("long"), lambda a, l: a + F.length(l))
    grams = F.when(
        n_words >= 2,
        F.transform(
            F.sequence(F.lit(0), n_words - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged2 = staged.select(
        "doc_id", raw, lines, toks, grams.alias("_grams"),
        _run_stats(lines).alias("_lruns"),
        line_chars.alias("_line_chars"),
    )
    g = F.col("_grams")
    gram_chars = F.aggregate(g, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    staged3 = staged2.select(
        "doc_id", F.col("_text"), F.col("_lines"), F.col("_toks"), g,
        F.col("_lruns"), F.col("_line_chars"),
        _run_stats(g).alias("_gruns"), gram_chars.alias("_gram_chars"),
    )
    n_lines2 = F.size(F.col("_lines"))
    return staged3.select(
        "doc_id",
        n_lines2.alias("n_lines"),
        F.round(
            _frac(n_lines2 - F.size(F.array_distinct(F.col("_lines"))), n_lines2), 6
        ).alias("dup_line_frac"),
        F.round(_frac(F.col("_lruns.dupc"), F.col("_line_chars")), 6).alias(
            "dup_line_char_frac"
        ),
        F.round(
            _frac(F.col("_gruns.best"), F.size(F.col("_grams"))), 6
        ).alias("top_2gram_frac"),
        F.round(
            _frac(F.col("_gruns.bestc"), F.col("_gram_chars")), 6
        ).alias("top_2gram_char_frac"),
        F.round(
            _frac(
                F.size(F.regexp_extract_all(F.col("_text"), F.lit(SYMBOL_RE), 0)),
                F.size(F.col("_toks")),
            ),
            6,
        ).alias("symbol_word_ratio"),
        F.round(
            _frac(
                F.size(F.filter(F.col("_lines"), lambda l: l.rlike(BULLET_LINE_RE))),
                n_lines2,
            ),
            6,
        ).alias("bullet_line_frac"),
        F.round(
            _frac(
                F.size(F.filter(F.col("_lines"), lambda l: l.rlike(ELLIPSIS_LINE_RE))),
                n_lines2,
            ),
            6,
        ).alias("ellipsis_line_frac"),
    )


# ---- scrubbing (corpus-prep cleanup) ---------------------------------------

# Portable across Java regex (Spark) and RE2 (DuckDB): no backrefs, no
# lookaround, \x escapes and shorthand classes only.
URL_RE = r"https?://\S+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def scrub(docs: DataFrame, text_col: str = "text",
          url_token: str = "", email_token: str = "") -> DataFrame:
    """Corpus-prep scrubbing: strip (or tokenize) URLs and emails, drop
    control characters, collapse whitespace — the standard cleanup pass
    before dedup/quality filtering in a training-data pipeline.

    Pure scan-project (four regexp passes, zero Python, no shuffle).
    Counting order is part of the contract: ``n_urls`` on the raw text,
    ``n_emails`` AFTER url removal (an address inside a URL query string
    counts once, as a URL). Output adds (n_urls, n_emails, clean_text).
    """
    raw = F.col(text_col)
    n_urls = F.size(F.regexp_extract_all(raw, F.lit(URL_RE), 0))
    t1 = F.regexp_replace(raw, URL_RE, url_token)
    n_emails = F.size(F.regexp_extract_all(t1, F.lit(EMAIL_RE), 0))
    t2 = F.regexp_replace(t1, EMAIL_RE, email_token)
    t3 = F.regexp_replace(t2, CTRL_RE, " ")
    clean = F.trim(F.regexp_replace(t3, r"\s+", " "))
    return (
        docs.withColumn("n_urls", n_urls)
        .withColumn("n_emails", n_emails)
        .withColumn("clean_text", clean)
    )


# ---- PII detection / redaction ----------------------------------------------

PHONE_RE = r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{2,4}"
IPV4_RE = (r"\b((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}"
           r"(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\b")
CARD_RE = r"\b\d{13,19}\b"


def luhn_valid(s: Column) -> Column:
    """Luhn checksum over a digit string — pure JVM HOFs (reverse +
    indexed transform + aggregate), no UDF. The mod-10 test every
    payment-card number passes; its false-positive rate on random
    digit runs is 10%, which is why card DETECTION counts candidates
    and valid numbers separately."""
    rev = F.reverse(F.filter(F.split(s, ""), lambda c: c != F.lit("")))
    terms = F.transform(
        rev,
        lambda d, i: F.when(
            i % 2 == 1,
            F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9)
            .otherwise(d.cast("int") * 2),
        ).otherwise(d.cast("int")),
    )
    return F.aggregate(terms, F.lit(0), lambda a, x: a + x) % 10 == 0


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction — the corpus-prep pass after
    :func:`scrub`: emails, IPv4 addresses, payment-card-shaped digit
    runs (Luhn-verified for the VALID count; ALL candidates redacted —
    redaction is deliberately conservative), international-ish phone
    numbers. Stage order is part of the contract, narrowest shape
    first so one span is counted once: email → ipv4 → card → phone
    (a 16-digit card run would otherwise satisfy the phone pattern;
    replacement tokens contain no digits so later stages can never
    re-match an earlier redaction).

    Pure scan-project: four regexp count+replace passes plus the Luhn
    HOF — zero Python, zero shuffle, runs at scan speed at 100 TB.
    Output adds (n_emails, n_ipv4, n_card_candidates, n_cards_valid,
    n_phones, pii_text) with every count int.
    """
    t0 = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t0, F.lit(EMAIL_RE), 0))
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    n_ipv4 = F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), 0))
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP4>")
    cards = F.regexp_extract_all(t2, F.lit(CARD_RE), 0)
    n_cards_valid = F.size(F.filter(cards, luhn_valid))
    t3 = F.regexp_replace(t2, CARD_RE, "<CARD>")
    n_phones = F.size(F.regexp_extract_all(t3, F.lit(PHONE_RE), 0))
    t4 = F.regexp_replace(t3, PHONE_RE, "<PHONE>")
    return (
        docs.withColumn("n_emails", n_emails)
        .withColumn("n_ipv4", n_ipv4)
        .withColumn("n_card_candidates", F.size(cards))
        .withColumn("n_cards_valid", n_cards_valid)
        .withColumn("n_phones", n_phones)
        .withColumn("pii_text", t4)
    )

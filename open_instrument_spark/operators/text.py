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


def normalized(text: Column) -> Column:
    """lower → strip non-letters → squeeze; the shared tokenizer base."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z ]", " "))


def words(text: Column) -> Column:
    """Whitespace word tokens of the normalized text (no empties)."""
    return F.filter(F.split(normalized(text), r"\s+"), lambda t: t != "")


def n_tokens_bpe(text: Column) -> Column:
    """BPE-ish token count on the RAW text: word runs + punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(words(text), lambda t: F.array_contains(sw, t)))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of stopword hits, priority order on
    ties (en > de > fr > es), 'und' when nothing matches."""
    scores = {lg: stopword_hits(text, lg) for lg in LANG_PRIORITY}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lg in reversed(LANG_PRIORITY):
        expr = F.when((scores[lg] == best) & (best > 0), lg).otherwise(expr)
    return expr


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n = F.size(words(text))
    return F.when(
        n > 0, stopword_hits(text, lang).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: enough words, sane word
    length, some stopwords, little punctuation — the standard cheap
    pre-filter shape for LLM corpus cleaning."""
    nw = F.size(words(text)).cast("double")
    mean_wlen = F.when(
        nw > 0,
        F.aggregate(words(text), F.lit(0).cast("double"), lambda acc, w: acc + F.length(w))
        / nw,
    ).otherwise(F.lit(0.0))
    len_term = F.least(F.lit(1.0), nw / F.lit(50.0))
    wlen_term = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_term = F.least(F.lit(1.0), stopword_ratio(text) * F.lit(5.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(text) * F.lit(4.0))
    return (
        len_term * 0.4 + wlen_term * 0.2 + stop_term * 0.2 + punct_term * 0.2
    )


def fingerprint(text: Column, k: int = 3) -> Column:
    """Document fingerprint: lexicographic min of md5 over word k-grams
    (a deterministic min-hash; short docs fall back to the whole text).
    """
    toks = words(text)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    return F.when(n >= k, F.array_min(grams)).otherwise(F.md5(normalized(text)))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document stat sheet."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        F.size(words(t)).alias("n_words"),
        n_tokens_bpe(t).alias("n_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )

"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All native column expressions (JVM-side, codegen), designed so the
same arithmetic is expressible in ANSI-ish SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny public-knowledge English stopword set (n-gram heuristic)
EN_STOPWORDS = [
    "the", "a", "and", "of", "to", "in", "is", "it", "you", "that",
    "was", "for", "on", "are", "with", "as",
]

# BPE-ish token regex: letter runs, digit runs, single punctuation
TOKEN_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """whitespace tokenization of trimmed text."""
    return F.split(F.trim(col), r"\s+")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """whitespace token count + BPE-ish regex token count."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_ws_tokens": F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
                F.size(tokens(t))
            ),
            "n_bpe_tokens": F.size(F.regexp_extract_all(t, F.lit(TOKEN_RX), F.lit(0))),
        }
    )


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda x: x.isin(EN_STOPWORDS)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def lang_id(df: DataFrame, text_col: str = "text", threshold: float = 0.08) -> DataFrame:
    """n-gram/stopword heuristic language ID: 'en' when the English
    stopword ratio clears the threshold, else 'unknown'."""
    ratio = stopword_ratio(F.col(text_col))
    return df.withColumns(
        {
            "en_stopword_ratio": F.round(ratio, 6),
            "lang_pred": F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("unknown")),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality features + score in [0,1]:
    length band, punctuation ratio, stopword ratio, mean word length.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0)))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(
        F.lit(0.0)
    )
    toks = tokens(t)
    n_tok = F.size(toks)
    mean_wlen = F.when(
        n_tok > 0,
        (F.length(F.trim(t)) - (n_tok - 1)).cast("double") / n_tok.cast("double"),
    ).otherwise(F.lit(0.0))
    sw = stopword_ratio(t)
    len_band = F.when((n_chars >= 50) & (n_chars <= 5000), F.lit(1.0)).otherwise(F.lit(0.25))
    score = (
        len_band * 0.4
        + F.when(punct_ratio < 0.2, F.lit(1.0)).otherwise(F.lit(0.0)) * 0.2
        + F.least(sw * F.lit(5.0), F.lit(1.0)) * 0.2
        + F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
        * 0.2
    )
    return df.withColumns(
        {
            "n_chars_q": n_chars.cast("long"),
            "punct_ratio": F.round(punct_ratio, 6),
            "stopword_ratio": F.round(sw, 6),
            "mean_word_len": F.round(mean_wlen, 6),
            "quality": F.round(score, 6),
        }
    )


# PII patterns (order matters: cards before generic digit runs).
# Pure-regex heuristics — the standard first-pass scrub in training-data
# pipelines (biased toward OVER-redaction: e.g. four 4-digit numbers in
# a row are indistinguishable from a card without a Luhn check); all
# codegen regexp_replace, no UDFs, RE2-compatible (no lookaround) so
# the DuckDB oracle runs the same expressions.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # start AND end on a digit at word boundaries: never eats the
    # trailing separator, never tail-matches a longer digit run
    (r"\b\d(?:[ -]?\d){12,15}\b", "<CARD>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # two alternatives so the digits always start at a boundary
    # (\b before '+' cannot match after a space)
    (r"\+\d{1,3}[ -]?\(?\d{2,4}\)?[ -]?\d{3,4}[ -]?\d{3,4}\b"
     r"|\b\d{1,3}[ -]?\(?\d{2,4}\)?[ -]?\d{3,4}[ -]?\d{3,4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text", target: str | None = None) -> DataFrame:
    """Replace emails / card-like digit runs / IPv4s / phone-like numbers
    with typed placeholders, and count the matches per row
    (`n_redactions`, counted on the INPUT text — pre-existing literal
    placeholder strings in a document never inflate it) so a pipeline
    can route heavily-redacted documents for review."""
    out_col = target or text_col
    red = F.col(text_col)
    n = F.lit(0)
    for rx, token in PII_PATTERNS:
        # count THIS pattern on the text state before its replace: an
        # entity consumed by an earlier pattern is never counted twice,
        # and pre-existing literal placeholders are never counted at all
        n = n + F.size(F.regexp_extract_all(red, F.lit(rx), F.lit(0)))
        red = F.regexp_replace(red, rx, token)
    return df.withColumn("n_redactions", n).withColumn(out_col, red)


def fingerprint(df: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Document fingerprint: minimum md5 over word n-gram shingles
    (rolling-hash style winnowing, engine-portable via md5).
    Short docs (< n words) fall back to md5 of the whole text.
    """
    toks = tokens(F.col(text_col))
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    fp = F.when(
        F.size(toks) >= n,
        F.array_min(F.transform(shingles, F.md5)),
    ).otherwise(F.md5(F.col(text_col)))
    return df.withColumn("fingerprint", fp)

"""Text-analysis operators for a large-scale training-data pipeline:
language-ID, quality scoring, token counting, document fingerprinting.

All hot-path expressions are JVM-side ``pyspark.sql.functions`` (whole
stage codegen; no Python) so they survive a 100-TB scan: one pass over
the text column, no shuffle, fully pushdown-friendly. Each transform is
mirrorable 1:1 in ANSI SQL, which is how the driver's DuckDB oracle
validates them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------- token stats
# BPE-ish pre-tokenizer: letter runs | single digits | single punctuation
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
WS_RE = r"\s+"


def n_chars(text: Column) -> Column:
    return F.length(text)


def n_tokens_ws(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, WS_RE)))


def n_tokens_bpe(text: Column) -> Column:
    """BPE-ish token count via the pre-tokenizer regex."""
    return F.regexp_count(text, F.lit(BPE_RE))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_chars", n_chars(t).cast("long"))
        .withColumn("n_tokens", n_tokens_ws(t).cast("long"))
        .withColumn("n_tokens_bpe", n_tokens_bpe(t).cast("long"))
    )


# ---------------------------------------------------------- quality scoring
def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / stopword ratios — the standard
    cheap quality heuristics of web-text pipelines. Ratios are rounded
    to 6 decimals so distributed re-computation is hash-stable."""
    t = F.col(text_col)
    n = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^.!?,;:]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    spaces = F.length(F.regexp_replace(t, r"[^ ]", ""))
    stop = F.regexp_count(F.lower(t), F.lit(r"\b(the|and|of|to|in|is|a)\b"))
    toks = n_tokens_ws(t)
    return (
        df.withColumn("n_chars", n.cast("long"))
        .withColumn("punct_ratio", F.round(punct / F.nullif(n, F.lit(0)), 6))
        .withColumn("digit_ratio", F.round(digits / F.nullif(n, F.lit(0)), 6))
        .withColumn("space_ratio", F.round(spaces / F.nullif(n, F.lit(0)), 6))
        .withColumn(
            "stopword_ratio", F.round(stop / F.nullif(toks.cast("double"), F.lit(0.0)), 6)
        )
        .withColumn(
            "mean_word_len",
            F.round((n - spaces) / F.nullif(toks.cast("double"), F.lit(0.0)), 6),
        )
    )


# ----------------------------------------------------------------- lang id
# tiny deterministic stopword tables per language (n-gram heuristic)
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|is|of|you|that|with)\b",
    "fr": r"\b(le|la|les|et|est|une|des|que)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein)\b",
    "nl": r"\b(de|het|een|en|van|niet|dat)\b",
    "es": r"\b(el|la|los|y|es|una|que|de)\b",
}


def lang_scores(text: Column) -> list[Column]:
    low = F.lower(text)
    return [
        F.regexp_count(low, F.lit(rx)).alias(f"score_{lang}")
        for lang, rx in LANG_MARKERS.items()
    ]


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Argmax of stopword hit counts; 'und' when all scores are 0.
    Ties break by the fixed language order (deterministic)."""
    low = F.lower(F.col(text_col))
    scores = {lang: F.regexp_count(low, F.lit(rx)) for lang, rx in LANG_MARKERS.items()}
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in fixed order; strict > keeps earlier language on ties
    for lang, s in scores.items():
        take = s > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return df.withColumn(out_col, best)


# ------------------------------------------------------------- fingerprint
def normalize_text(text: Column) -> Column:
    """Canonical form for near-identity hashing: lowercase, collapse
    whitespace runs, strip."""
    return F.trim(F.regexp_replace(F.lower(text), WS_RE, " "))


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Content fingerprint: md5 of normalized text (md5 exists in both
    Spark and DuckDB so the oracle can reproduce it bit-for-bit)."""
    return df.withColumn(out_col, F.md5(normalize_text(F.col(text_col))))

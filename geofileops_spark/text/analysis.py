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


# ----------------------------------------------------- repetition filters
def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1,
    twin of the reference-era web-text curation stage): duplicate-line
    and duplicate-word fractions plus line-shape stats, for dropping
    boilerplate-heavy / template-spam pages.

    Pure JVM array expressions (split / array_distinct / transform): one
    projection, no shuffle, no Python — survives a 100-TB scan. Every
    expression has an exact DuckDB list-function mirror for the oracle.
    Empty-string lines/words (leading, trailing, double separators) are
    filtered on both sides so the two engines count identically."""
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: x != F.lit(""))
    words = F.filter(F.split(t, WS_RE), lambda x: x != F.lit(""))
    n_lines = F.size(lines)
    n_words = F.size(words)
    dup_lines = n_lines - F.size(F.array_distinct(lines))
    dup_words = n_words - F.size(F.array_distinct(words))
    frac = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6
    )
    return (
        df.withColumn("n_lines", n_lines.cast("long"))
        .withColumn("dup_line_frac", frac(dup_lines, n_lines))
        .withColumn("dup_word_frac", frac(dup_words, n_words))
        .withColumn(
            "max_line_len",
            F.coalesce(
                F.array_max(F.transform(lines, lambda x: F.length(x))),
                F.lit(0),
            ).cast("long"),
        )
    )


# -------------------------------------------------- Gopher quality rules
# Small fixed stopword set from Rae et al. 2021 §A1.1 ("the usual English
# stop words"): a document must contain >= 2 distinct entries to pass.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021 §A1.1) — the
    standard composite pre-training filter: word-count bounds, mean word
    length bounds, symbol-to-word ratio (# and ellipses), bullet-line and
    ellipsis-line fractions, alphabetic-word fraction, and a minimum
    distinct-stopword requirement. Emits every intermediate stat plus the
    final ``keep`` verdict so pipelines can audit WHY a page was dropped.

    Pure JVM array/regexp expressions in one projection — no shuffle, no
    Python; survives a 100-TB scan and each expression has an exact
    DuckDB mirror for the oracle. Ratios round to 6 decimals so
    distributed re-computation is hash-stable."""
    t = F.col(text_col)
    words = F.filter(F.split(t, WS_RE), lambda x: x != F.lit(""))
    lines = F.filter(F.split(t, "\n"), lambda x: x != F.lit(""))
    n_words = F.size(words)
    n_lines = F.size(lines)
    # mean word length over non-whitespace chars (punctuation counts,
    # matching the whitespace tokenizer above)
    word_chars = F.length(F.regexp_replace(t, r"\s", ""))
    mean_wl = F.round(
        word_chars / F.nullif(n_words.cast("double"), F.lit(0.0)), 6
    )
    n_symbols = F.regexp_count(t, F.lit("#")) + F.regexp_count(
        t, F.lit(r"\.\.\.")
    )
    symbol_ratio = F.round(
        n_symbols / F.nullif(n_words.cast("double"), F.lit(0.0)), 6
    )
    frac = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num / den.cast("double")).otherwise(F.lit(0.0)), 6
    )
    bullet_frac = frac(
        F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]"))), n_lines
    )
    ellipsis_frac = frac(
        F.size(F.filter(lines, lambda x: x.rlike(r"\.\.\.\s*$"))), n_lines
    )
    alpha_frac = frac(
        F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))), n_words
    )
    low = F.lower(t)
    n_stop = sum(
        F.when(low.rlike(rf"\b{w}\b"), F.lit(1)).otherwise(F.lit(0))
        for w in GOPHER_STOPWORDS
    )
    out = (
        df.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", mean_wl)
        .withColumn("symbol_ratio", symbol_ratio)
        .withColumn("bullet_frac", bullet_frac)
        .withColumn("ellipsis_frac", ellipsis_frac)
        .withColumn("alpha_word_frac", alpha_frac)
        .withColumn("n_stopwords", n_stop.cast("long"))
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("n_stopwords") >= min_stopwords)
    )
    return out.withColumn("keep", keep)


# ----------------------------------------------------- C4 line-level clean
def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style line-level cleanup (Raffel et al. 2020 §2.2) — the other
    canonical pre-training rule set next to :func:`gopher_quality`:

    - keep only lines that end in terminal punctuation (``.!?"``),
      contain at least ``min_words_per_line`` words, and do not mention
      ``javascript`` (case-insensitive);
    - rebuild ``clean_text`` from the kept lines (newline-joined);
    - page-level ``keep``: the cleaned text has at least
      ``min_sentences`` sentence terminators, and the ORIGINAL text
      contains neither ``lorem ipsum`` nor a ``{`` (code/template page).

    Emits ``n_lines_kept`` / ``n_sentences`` alongside the verdict so a
    pipeline can audit the drop reason. Pure JVM array/regexp
    expressions in one projection — no shuffle, no Python; every
    expression has an exact DuckDB list-function mirror for the oracle.
    """
    t = F.col(text_col)
    lines = F.transform(F.split(t, "\n"), lambda x: F.trim(x))
    kept = F.filter(
        lines,
        lambda x: x.rlike(r'[.!?"]$')
        & (
            F.size(F.filter(F.split(x, WS_RE), lambda w: w != F.lit("")))
            >= F.lit(min_words_per_line)
        )
        & ~F.lower(x).contains("javascript"),
    )
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]"))
    keep = (
        (n_sent >= F.lit(min_sentences))
        & ~F.lower(t).contains("lorem ipsum")
        & ~t.contains("{")
    )
    return (
        df.withColumn("clean_text", clean)
        .withColumn("n_lines_kept", F.size(kept).cast("long"))
        .withColumn("n_sentences", n_sent.cast("long"))
        .withColumn("keep", keep)
    )


# ------------------------------------------------------------ PII scrubbing
# Dialect-portable patterns: no lookaround, no backrefs — valid and
# IDENTICAL under Java regex (Spark) and RE2 (DuckDB), so the oracle
# reproduces the redaction bit-for-bit.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d() -]{6,}\d"  # international form: +CC then >=8 chars


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Replace emails / IPv4 addresses / international phone numbers with
    typed placeholder tokens, and count each kind (counted BEFORE
    redaction). Order matters: emails first (their local part can look
    phone-ish), then IPs (all-digit, must go before the phone pass),
    then phones (anchored on a leading '+' so they can never re-match a
    placeholder). Single projection, pure JVM regex — no shuffle."""
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(EMAIL_RE)).cast("long"))
        .withColumn("n_ips", F.regexp_count(t, F.lit(IPV4_RE)).cast("long"))
        .withColumn("n_phones", F.regexp_count(t, F.lit(PHONE_RE)).cast("long"))
        .withColumn(out_col, red)
    )


# -------------------------------------------------------- URL canonical host
# scheme://(www.)?HOST — host stops at path/query/fragment/port. Plain
# capture group + non-capturing prefix: same semantics in Java and RE2.
URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:www\.)?([^/?#:]+)"


def url_host(url: Column) -> Column:
    """Canonical lowercase registrable host of a URL ('' for non-URLs):
    strips scheme, a leading www., port, path, query and fragment."""
    return F.lower(F.regexp_extract(url, URL_HOST_RE, 1))


def host_rollup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host document rollup (docs per domain + char volume) — the
    standard first aggregation of a crawl-curation pipeline. One
    partial-aggregated shuffle on the host key; host cardinality is
    bounded by the registrable-domain space, far below row count, so the
    exchange is small and AQE coalesces it."""
    return (
        df.withColumn("host", url_host(F.col(url_col)))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length(F.col("text"))).cast("long").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------- doc chunking
def chunk_documents(
    df: DataFrame,
    chunk_chars: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size character windows with
    ``overlap`` shared chars between consecutive chunks — the standard
    embedding / training-sequence prep step. A doc of length L yields
    ``max(1, ceil((L - overlap) / stride))`` chunks (stride =
    chunk_chars - overlap); the final chunk may be shorter, empty docs
    yield one empty chunk, so no text is ever dropped.

    Pure JVM: sequence() + explode + substring — no Python, no shuffle;
    chunk fan-out multiplies rows ~L/stride so partition sizing is the
    input's, scaled by a known constant. DuckDB mirror:
    ``unnest(range(0, n))`` + ``substr``."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    ln = F.length(F.col(text_col))
    n = F.greatest(
        F.lit(1), F.floor((ln - overlap + stride - 1) / stride).cast("long")
    )
    out = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0).cast("long"), n - 1)).alias("chunk_id"),
        F.col(text_col),
    )
    return out.select(
        id_col,
        "chunk_id",
        F.substring(
            F.col(text_col),
            (F.col("chunk_id") * stride + 1).cast("int"),
            chunk_chars,
        ).alias("chunk_text"),
    )


# ------------------------------------------------------- URL canonical dedup
# tracking params dropped during canonicalization (lowercased compare)
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "ref_src")


def canonical_url(url: Column) -> Column:
    """Canonical form for URL-level dedup: lowercase scheme+host with a
    leading ``www.`` and any port stripped, path without a trailing
    slash, tracking query parameters removed (query otherwise kept,
    parameter order preserved), fragment dropped. Non-URLs canonicalize
    to ''. Pure JVM regexp — identical under Java regex and RE2."""
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:www\.)?([^/?#:]+)", 1)
    )
    # path = between the host (incl. optional :port) and ? or #
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != F.lit(""))
        & ~F.lower(kv).startswith("utm_")
        & ~F.lower(kv).startswith("fbclid")
        & ~F.lower(kv).startswith("gclid")
        & ~F.lower(kv).startswith("msclkid")
        & ~F.lower(kv).startswith("ref_src"),
    )
    q = F.array_join(kept, "&")
    return F.when(host == "", F.lit("")).otherwise(
        F.concat(
            host, path, F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
        )
    )


def dedup_url(
    df: DataFrame,
    url_col: str = "url",
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep ONE row per canonical URL — the crawl-level dedup that runs
    before any content dedup (recrawls, tracking-param and www/fragment
    variants of one page). Winner = lowest ``order_col`` (a crawl
    timestamp or stable id). One shuffle on the canonical key; the
    window keeps k rows per key so no key ever materializes its whole
    group."""
    from pyspark.sql import Window

    tagged = df.withColumn("_curl", canonical_url(F.col(url_col)))
    w = Window.partitionBy("_curl").orderBy(F.col(order_col).asc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# -------------------------------------------- LM cross-entropy scoring
def lm_cross_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.1,
) -> DataFrame:
    """CCNet-style language-model quality score, self-trained: an add-k
    smoothed bigram LM is estimated from the corpus itself, and every
    document is scored by its mean bigram cross-entropy (bits/bigram) —
    boilerplate and gibberish score high, fluent prose scores low.
    (CCNet scores against a pre-trained KenLM; with no external model
    allowed, training on the scored corpus is the standard substitute
    and ranks documents identically in expectation.)

    Returns (id_col, n_bigrams, xent) with ``xent`` rounded to 6
    decimals for hash-stable re-computation; documents with fewer than
    2 tokens are dropped (no bigram evidence).

    Plan shape (100-TB safe, zero Python): tokens come from one JVM
    ``split`` per row; bigrams are built map-side with
    ``transform(sequence(...))`` — no per-doc window, no positional
    shuffle. Then exactly three shuffles: bigram-count aggregation,
    context-count aggregation (reuses the bigram counts, not the
    corpus), and the score join back to per-doc bigram occurrences,
    which Spark plans as a sort-merge join keyed on the bigram.
    Reference analogue: the reference has no LM scoring; this extends
    the quality family (gopher_quality, quality_stats) that mirrors
    its attribute-derivation ops (geofileops ``update_column``,
    fileops.py:1169ff) to pipeline-grade curation.
    """
    from .. import cache as _cache

    toks = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), x -> x <> '')"
    )
    bi = (
        df.select(F.col(id_col), toks.alias("_t"))
        .where(F.size("_t") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_t) - 1),"
                    " i -> struct(_t[i-1] as prev, _t[i] as tok))"
                )
            ).alias("_bi"),
        )
        .select(id_col, F.col("_bi.prev").alias("prev"), F.col("_bi.tok").alias("tok"))
    )
    # the bigram stream is read three times (vocab scalar, counts,
    # score join) — persist it so the corpus tokenizes once
    bi = _cache.track(bi.persist())
    bi_counts = bi.groupBy("prev", "tok").agg(F.count("*").alias("c_bi"))
    ctx_counts = bi_counts.groupBy("prev").agg(F.sum("c_bi").alias("c_ctx"))
    # vocabulary size INSIDE the plan (1-row aggregate, broadcast cross
    # join) instead of an eager distinct().count() at construction time:
    # building the returned DataFrame no longer triggers a full
    # tokenize+shuffle job, keeping the op as lazy as the rest of the
    # operator surface. The smoothing arithmetic is unchanged — the
    # count cast to double is the same value the literal carried.
    vocab = (
        bi.select("tok")
        .union(bi.select("prev"))
        .distinct()
        .agg(F.count("*").cast("double").alias("_vocab_n"))
    )
    logp = (
        bi_counts.join(ctx_counts, "prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            "prev",
            "tok",
            (
                F.log2(
                    (F.col("c_bi") + F.lit(k))
                    / (F.col("c_ctx") + F.lit(k) * F.col("_vocab_n"))
                )
            ).alias("_lp"),
        )
    )
    return (
        bi.join(logp, ["prev", "tok"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.avg("_lp"), 6).alias("xent"),
        )
    )

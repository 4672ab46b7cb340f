"""Corpus-level keyword extraction: TF-IDF top-k terms per document.

The one text operator in this package whose semantics are genuinely
corpus-global (inverse document frequency needs the whole corpus), so
its plan shape matters at 100 TB:

- tokenize + per-(doc, term) counts: one shuffle, partial-aggregated
  map-side (``groupBy(count)``), keyed on (doc_id, term);
- document frequency: a second partial-aggregated shuffle keyed on term
  over the ALREADY per-doc-deduped (doc, term) pairs — never the raw
  token stream, so hot terms carry at most one row per document;
- tf x df join: sort-merge on term over two aggregated inputs (both
  bounded by docs x distinct-terms-per-doc); AQE splits a skewed hot
  term if one appears;
- top-k: one window per doc_id, which co-partitions with the tf
  aggregate's (doc_id, term) hash partitioning's prefix — Catalyst
  reuses the exchange where possible.

No Python anywhere; every expression mirrors 1:1 into DuckDB SQL for
the oracle. Scores are rounded to 1e-6 and shipped as integer ppm so
cross-engine ranking is tie-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# letters-only tokenizer: lowercase, split on non-letter runs. Identical
# under Java regex and DuckDB RE2 (no classes beyond [a-z]).
TOKEN_SPLIT_RE = "[^a-z]+"


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF.

    score = tf * ln((N + 1) / (df + 1)) with N = corpus document count;
    ties break by term ascending (deterministic across engines). Terms
    shorter than ``min_len`` letters are dropped before counting.

    Returns (id_col, term, tf, term_df, score_ppm, rank) — score_ppm is
    round(score, 6) * 1e6 as BIGINT so the DuckDB oracle hash-matches.
    """
    n_docs = df.count()  # scalar action; one column-pruned scan
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda x: F.length(x) >= min_len,
    )
    terms = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    docfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("term_df")
    )
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("term_df") + 1.0))
    scored = tf.join(docfreq, "term").withColumn(
        "score_ppm",
        F.round(F.round(F.col("tf") * idf, 6) * 1_000_000).cast("long"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_ppm").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "term_df", "score_ppm", "rank")
    )

"""Corpus-curation operators for training-data pipelines: exact
stratified sampling, segment-level exact dedup, and benchmark
contamination flagging.

These complement the document-level dedup family (``ml/dedup.py``) with
the remaining primitives a 100-TB pretraining pipeline runs before
tokenization:

- ``stratified_sample``: exact per-(lang, source, ...) quotas with a
  deterministic spread hash — reproducible across runs and engines,
  unlike ``DataFrame.sampleBy`` (Bernoulli, approximate counts). The
  plan is the scalable two-phase selection: a coarse histogram of hash
  buckets picks each stratum's threshold bucket map-side, and only the
  boundary bucket's rows (|stratum| / 2^16 of the data) ever hit a sort.
  No stratum is ever funneled through a single reducer, which is what a
  naive ``row_number() OVER (PARTITION BY stratum)`` would do.
- ``segment_dedup``: the C4/RefinedWeb primitive — drop exact duplicate
  SEGMENTS (fixed token windows) across the whole corpus, keeping the
  first occurrence by (doc_id, position), and reassemble the surviving
  text per document. One shuffle on the segment key + one groupBy doc.
- ``contamination_flag``: count distinct word n-grams shared with an
  eval/benchmark set (the standard train/test overlap audit). The eval
  gram set is tiny relative to the corpus -> broadcast hash join; each
  doc is scored map-side and only (doc, hits) aggregates shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import normalize_text

WS_RE = r"\s+"

# multiplicative spread hash (Knuth 2654435761 = 2^32/phi, odd) over a
# 31-bit range: uniform, deterministic, and expressible in ANSI SQL so
# an external engine reproduces the exact same sample
_SPREAD_MULT = 2654435761
_SPREAD_MOD = 1 << 31


def spread_hash(id_col) -> F.Column:
    """Deterministic pseudo-uniform rank key in [0, 2^31).

    The id is reduced mod 2^31 BEFORE the multiply so the 64-bit product
    never exceeds (2^31-1)*2654435761 < 2^63 — no silent wrap (non-ANSI)
    or overflow error (ANSI mode) for large ids, and an external ANSI-SQL
    engine (which may promote to a wider integer) reproduces the exact
    same value.  Injectivity holds for ids below 2^31 (odd multiplier);
    above that the pre-mod folds ids 2^31 apart onto the same key, which
    is acceptable for sampling (ties broken by id downstream).
    """
    return F.pmod(
        F.pmod(F.col(id_col), F.lit(_SPREAD_MOD)) * F.lit(_SPREAD_MULT),
        F.lit(_SPREAD_MOD),
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    quota: int,
    id_col: str = "doc_id",
    bucket_bits: int = 16,
) -> DataFrame:
    """Exactly ``min(quota, |stratum|)`` rows per stratum, chosen as the
    quota smallest ``spread_hash(id)`` (ties impossible: ids are unique
    and the multiplier is odd, so the hash is injective mod 2^31 for ids
    below 2^31; (hash, id) ordering breaks any residual ties).

    Scalable exact selection, no per-stratum global sort:

    1. histogram pass: count rows per (stratum, hash >> (31-bucket_bits))
       — a map-side-combined aggregate over at most |strata| * 2^bits
       small keys;
    2. driver-side cumulative sum picks each stratum's threshold bucket
       (bounded collect: |strata| * 2^bucket_bits rows, ~65k per
       stratum — planning metadata, not data);
    3. rows in buckets strictly below the threshold pass unconditionally;
       only the single boundary bucket per stratum (expected
       |stratum|/2^bits rows) is ranked, with a window whose partitions
       are those slivers — never a whole stratum.
    """
    h = spread_hash(id_col).alias("_h")
    bucket = F.shiftright(F.col("_h"), 31 - bucket_bits).alias("_b")
    tagged = df.withColumn("_h", h).withColumn("_b", bucket)

    hist = (
        tagged.groupBy(*strata_cols, "_b")
        .agg(F.count("*").alias("_n"))
        .collect()
    )
    # cumulative per stratum: find the bucket where the quota falls
    by_stratum: dict[tuple, list[tuple[int, int]]] = {}
    for r in hist:
        key = tuple(r[c] for c in strata_cols)
        by_stratum.setdefault(key, []).append((r["_b"], r["_n"]))
    rules = []  # (stratum..., below_bucket, boundary_bucket, take_in_boundary)
    for key, buckets in by_stratum.items():
        buckets.sort()
        need = quota
        boundary, take = None, 0
        below = 0
        for b, n in buckets:
            if need <= 0:
                break
            if n < need:
                need -= n
                below = b + 1
            else:
                boundary, take = b, need
                need = 0
                break
        if boundary is None:  # stratum smaller than quota: take everything
            below, boundary, take = (buckets[-1][0] + 1 if buckets else 0), -1, 0
        rules.append((*key, below, boundary, take))

    spark = df.sparkSession
    rule_cols = [*strata_cols, "_below", "_boundary", "_take"]
    rules_df = spark.createDataFrame(rules, rule_cols)
    joined = tagged.join(F.broadcast(rules_df), on=strata_cols, how="inner")
    pass_below = F.col("_b") < F.col("_below")
    in_boundary = F.col("_b") == F.col("_boundary")
    cand = joined.where(pass_below | in_boundary)
    # rank ONLY the boundary slivers; partition key includes the bucket so
    # the window never sees more than one bucket's worth of one stratum
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols, "_b").orderBy("_h", id_col)
    ranked = cand.withColumn(
        "_rk", F.when(in_boundary, F.row_number().over(w)).otherwise(F.lit(0))
    )
    out = ranked.where(pass_below | (F.col("_rk") <= F.col("_take")))
    return out.drop("_h", "_b", "_below", "_boundary", "_take", "_rk")


def _segments(df: DataFrame, width: int, text_col: str, id_col: str) -> DataFrame:
    """(id, seg_idx, seg): fixed ``width``-token windows, stride width;
    the final short window is kept (a real pipeline dedups it too)."""
    toks = F.split(normalize_text(F.col(text_col)), WS_RE)
    n_segs = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_segs - 1, F.lit(0)))
    segs = F.transform(
        idx, lambda i: F.struct(
            i.alias("seg_idx"),
            F.array_join(F.slice(toks, i * width + 1, width), " ").alias("seg"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(segs).alias("s"))
        .select("id", F.col("s.seg_idx").alias("seg_idx"), F.col("s.seg").alias("seg"))
        .where(F.col("seg") != "")
    )


def segment_dedup(
    df: DataFrame,
    width: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide exact segment dedup: every ``width``-token window that
    appeared earlier (by (doc_id, seg_idx)) in ANY document is removed,
    and the survivors are reassembled in order per document.

    Returns (id_col, n_segs, n_kept, text_dedup). One shuffle on the
    segment content key (xxhash64 pre-key keeps the exchange narrow; the
    window still orders on the full segment so hash collisions cannot
    merge distinct segments), then one groupBy(id).
    """
    from pyspark.sql import Window

    segs = _segments(df, width, text_col, id_col)
    w = Window.partitionBy(F.xxhash64("seg"), "seg").orderBy("id", "seg_idx")
    kept = segs.withColumn("_rn", F.row_number().over(w))
    per_doc = (
        kept.groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").alias("n_segs"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_rn") == 1,
                                F.struct(F.col("seg_idx"), F.col("seg")),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("text_dedup"),
        )
    )
    return per_doc


def contamination_flag(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/eval overlap audit: per training doc, the number of its
    DISTINCT word ``n``-grams that occur anywhere in ``eval_df``; rows
    with ``hits >= min_hits`` are flagged ``contaminated``.

    The eval gram set is deduped and broadcast (eval suites are MBs, the
    corpus is TBs), so scoring is a map-side hash join + partial count;
    only (doc, hits) pairs shuffle.
    """
    from .dedup import word_ngrams

    eval_grams = word_ngrams(eval_df, n, text_col, id_col).select("gram").distinct()
    doc_grams = word_ngrams(df, n, text_col, id_col)
    hits = (
        doc_grams.join(F.broadcast(eval_grams), on="gram", how="inner")
        .groupBy(F.col("id").alias(id_col))
        .agg(F.count("*").alias("hits"))
    )
    ids = df.select(F.col(id_col))
    out = ids.join(hits, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
    )
    return out.withColumn("contaminated", F.col("hits") >= F.lit(min_hits))


def pack_sequences(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """Greedy concat-and-chunk sequence packing: documents laid
    end-to-end on one token tape in ``order_col`` order; training bin
    ``k`` covers tape offsets ``[k*budget, (k+1)*budget)``. Emits each
    document's whitespace-token count, start offset, the bin holding its
    first token, and whether it crosses a bin boundary (i.e. would be
    split at tokenization) — the standard context-window packing step
    between curation and tokenization.

    Scale plan: a global ``SUM() OVER (ORDER BY ...)`` would move the
    whole corpus through ONE reducer. Instead the running offset is
    two-phase: (1) per-bucket token totals (``order_col`` div
    ``bucket_width``) — a tiny aggregate, |docs|/bucket_width rows —
    prefix-summed in one bounded window; (2) a within-bucket cumulative
    window partitioned by bucket, parallel across buckets. Identical
    arithmetic to the single-window form (which is what the DuckDB
    oracle runs). ``order_col`` must be integral and unique — the
    shard/sequence ids a pretraining pipeline already carries.
    """
    from ..text.analysis import n_tokens_ws

    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.col(order_col).alias("_ord"),
        n_tokens_ws(F.col(text_col)).cast("long").alias("n_tokens"),
    ).withColumn("_bucket", F.floor(F.col("_ord") / F.lit(bucket_width)))
    # phase 1: bucket totals -> exclusive prefix per bucket (the window
    # runs over |docs|/bucket_width rows — bounded, single partition OK)
    bucket_prefix = (
        toks.groupBy("_bucket")
        .agg(F.sum("n_tokens").alias("_btoks"))
        .withColumn(
            "_boff",
            F.coalesce(
                F.sum("_btoks").over(
                    Window.orderBy("_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_btoks")
    )
    # phase 2: within-bucket exclusive cumsum, parallel across buckets
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        toks.join(F.broadcast(bucket_prefix), on="_bucket")
        .withColumn(
            "start_offset",
            (F.col("_boff") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))).cast(
                "long"
            ),
        )
        .withColumn("bin_id", F.floor(F.col("start_offset") / F.lit(budget)))
        .withColumn(
            "crosses",
            F.when(
                F.col("n_tokens") > 0,
                F.floor(
                    (F.col("start_offset") + F.col("n_tokens") - 1) / F.lit(budget)
                )
                != F.col("bin_id"),
            ).otherwise(F.lit(False)),
        )
    )
    return out.select(id_col, "n_tokens", "start_offset", "bin_id", "crosses")


def curate_corpus(
    df: DataFrame,
    strata_cols: list[str] | None = None,
    quota: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.2,
) -> DataFrame:
    """The composed crawl-curation pipeline, end to end: exact content
    dedup (keep lowest id per normalized-text hash) → cheap quality
    gate (token-count window + punctuation-ratio cap) → exact
    stratified sampling to ``quota`` rows per stratum. Mirrors the
    curation order of real pretraining pipelines (dedup before quality
    so near-identical recrawls can't vote, quality before sampling so
    quotas are filled with keepable documents).

    Each stage is one of this module's / text.analysis's primitives, so
    the whole pipeline is pure JVM: one shuffle for the dedup window,
    zero for the gate (narrow filters), and the bounded two-phase
    bucket selection of :func:`stratified_sample`. At 100 TB nothing
    here collects more than the |strata|·2^bits histogram.

    Returns (id_col, *strata_cols, n_tokens) for the surviving rows.
    """
    from ..text.analysis import n_tokens_ws, quality_stats
    from .dedup import dedup_exact

    strata = list(strata_cols) if strata_cols else ["lang"]
    deduped = dedup_exact(df, text_col=text_col, id_col=id_col)
    scored = quality_stats(deduped, text_col=text_col).withColumn(
        "n_tokens", n_tokens_ws(F.col(text_col)).cast("long")
    )
    gated = scored.where(
        F.col("n_tokens").between(min_tokens, max_tokens)
        & (F.coalesce(F.col("punct_ratio"), F.lit(0.0)) <= max_punct_ratio)
    )
    picked = stratified_sample(gated, strata, quota, id_col=id_col)
    # reuse the n_tokens computed for the gate instead of re-deriving it
    # from text (same expression, same value — one less pass over the
    # text bytes in the output projection)
    return picked.select(id_col, *strata, "n_tokens")

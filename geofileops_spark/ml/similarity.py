"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the baseline. Queries are
  broadcast (small side), the corpus streams; the dot product is a
  JVM-side ``F.zip_with`` + ``F.aggregate`` (no Python in the hot path);
  ranking is a window per query.
- ``lsh_topk``: the scale path — sign-random-projection (SRP) buckets:
  ``h`` fixed pseudo-random hyperplanes (deterministic from the seed, no
  stored model), each vector keyed by its sign-bit bucket; only same-
  bucket (plus optional multi-probe) pairs are scored. At 100 TB this
  turns the quadratic scan into a bucket-equi join.
- ``ivf_topk``: IVF-style two-stage: k-means-free variant using SRP
  bucket centroids as the coarse quantizer (nprobe buckets per query).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, rank, neighbor_id, cosine).
    Queries broadcast; corpus never shuffles until the final per-query
    window (partitioned by query id — k rows per query survive)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    pairs = q.crossJoin(c)
    if not include_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine", _dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv")))
    ).drop("_qv", "_cv")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _srp_udf(dim: int, nbits: int, seed: int):
    """Sign-random-projection bucket id. Hyperplanes are regenerated
    deterministically from (dim, nbits, seed) in every task — nothing to
    broadcast, nothing to store."""

    @pandas_udf(LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((dim, nbits))
        out = np.zeros(len(vecs), dtype=np.int64)
        mat = np.zeros((len(vecs), dim))
        ok = np.zeros(len(vecs), dtype=bool)
        for i, v in enumerate(vecs):
            if v is not None and len(v) == dim:
                mat[i] = np.asarray(v, dtype=np.float64)
                ok[i] = True
        bits = (mat @ planes) > 0
        vals = (bits * (1 << np.arange(nbits, dtype=np.int64))).sum(axis=1)
        out[ok] = vals[ok]
        out[~ok] = -1
        return pd.Series(out)

    return _bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nbits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k: score only same-SRP-bucket pairs.
    Recall < 1 by design; the exactness knob is ``nbits`` (fewer bits →
    bigger buckets → higher recall, more work)."""
    dim = len(corpus.select(vec_col).first()[0])
    bucket = _srp_udf(dim, nbits, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_bucket", bucket(F.col("_qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).withColumn("_bucket", bucket(F.col("_cv")))
    pairs = F.broadcast(q).join(c, "_bucket")
    if not include_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine",
        _dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))),
    ).drop("_qv", "_cv", "_bucket")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _train_centroids(corpus: DataFrame, vec_col: str, n_centroids: int,
                     seed: int, sample: int = 4096, iters: int = 8) -> np.ndarray:
    """Deterministic mini-kmeans on a driver-side sample — the coarse
    quantizer of a classic IVF index. At 100 TB the sample is a bounded
    collect (the index 'training' step); assignment stays distributed."""
    rows = corpus.select(vec_col).limit(sample).collect()
    mat = np.asarray([r[0] for r in rows if r[0] is not None], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for k in range(len(cent)):
            members = mat[assign == k]
            if len(members):
                cent[k] = members.mean(axis=0)
    return cent


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """IVF-style approximate top-k: corpus rows are bucketed by nearest
    coarse centroid; each query scores only its ``nprobe`` nearest
    centroids' buckets. The scale path when SRP buckets are too blunt:
    recall is tunable via nprobe, work is ~nprobe/n_centroids of exact."""
    cent = _train_centroids(corpus, vec_col, n_centroids, seed)

    def _assign_udf(top: int):
        @pandas_udf("array<int>")
        def _assign(vecs: pd.Series) -> pd.Series:
            out = []
            for v in vecs:
                if v is None:
                    out.append(None)
                    continue
                d = ((cent - np.asarray(v, dtype=np.float64)) ** 2).sum(axis=1)
                out.append([int(i) for i in np.argsort(d)[:top]])
            return pd.Series(out)

        return _assign

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).withColumn("_bucket", F.element_at(_assign_udf(1)(F.col("_cv")), 1))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_bucket", F.explode(_assign_udf(nprobe)(F.col("_qv"))))
    pairs = F.broadcast(q).join(c, "_bucket")
    if not include_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine",
        _dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))),
    ).drop("_qv", "_cv", "_bucket")
    scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )

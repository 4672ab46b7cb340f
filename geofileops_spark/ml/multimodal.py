"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark side — schema, batching, partition sizing, UDF signatures —
is real and tested; the codec kernels are deterministic fakes behind
``FAKE_DECODE`` (the container has no image/audio libraries). Swapping
in PIL/av later changes ONE function per modality, not the plan shape.

Design points for 100 TB of media:
- media bytes ride in their own column so column pruning keeps them out
  of every query that doesn't decode (parquet reads skip the blob pages);
- decode runs via ``mapInPandas`` so one task streams Arrow batches and
  the decoded features never materialize as a driver-side object;
- batch size is bounded by bytes not rows: callers repartition by
  ``n_bytes`` ranges first (``repartition_by_bytes``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image/audio/video
        StructField("media", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

FAKE_DECODE = True  # no codec libs in this container


def _fake_image_meta(buf: bytes) -> tuple[int, int]:
    """Deterministic fake header parse: width/height derived from the
    first 8 bytes. Replace with PIL.Image.open when available."""
    if len(buf) < 8:
        return (0, 0)
    w = 16 + (int.from_bytes(buf[0:4], "little") % 1024)
    h = 16 + (int.from_bytes(buf[4:8], "little") % 1024)
    return (w, h)


def _fake_features(buf: bytes, dim: int) -> np.ndarray:
    """Deterministic fake embedding: byte-histogram folded to ``dim``
    and L2-normalized. Replace with a real encoder."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    folded = hist.reshape(dim, 256 // dim).sum(axis=1) if 256 % dim == 0 else hist[:dim]
    n = np.linalg.norm(folded)
    return (folded / n if n > 0 else folded).astype(np.float32)


def decode_images(df: DataFrame, media_col: str = "media", dim: int = 32) -> DataFrame:
    """media binary -> (width, height, features array<float>).

    Plumbing is real (mapInPandas over Arrow batches, schema append);
    the decode kernel is the deterministic fake above.
    """
    if not FAKE_DECODE:  # pragma: no cover
        raise NotImplementedError("real image decoding requires PIL; not in container")

    out_schema = StructType(
        df.schema.fields
        + [
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def _decode(batches):
        for pdf in batches:
            widths, heights, feats = [], [], []
            for b in pdf[media_col]:
                if b is None:
                    widths.append(None)
                    heights.append(None)
                    feats.append(None)
                    continue
                buf = bytes(b)
                w, h = _fake_image_meta(buf)
                widths.append(w)
                heights.append(h)
                feats.append(_fake_features(buf, dim).tolist())
            pdf = pdf.copy()
            pdf["width"] = pd.array(widths, dtype="Int32")
            pdf["height"] = pd.array(heights, dtype="Int32")
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def frame_sample(df: DataFrame, media_col: str = "media", every_n: int = 10) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame with a
    frame index — the explode shape of a real frame sampler. Frame bytes
    are deterministic slices of the source blob (fake kernel)."""
    if not FAKE_DECODE:  # pragma: no cover
        raise NotImplementedError(
            "real video frame sampling requires av/ffmpeg; not in container"
        )
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != media_col]
        + [StructField("frame_idx", IntegerType()), StructField("frame", BinaryType())]
    )

    def _sample(batches):
        for pdf in batches:
            keep = pdf[media_col].notna().to_numpy()
            pdf = pdf[keep].reset_index(drop=True)
            lens = pdf[media_col].map(len).to_numpy(dtype=np.int64)
            n_frames = np.maximum(1, lens // 256)
            counts = (n_frames + every_n - 1) // every_n  # sampled per row
            # vectorized explode: repeat row indices, per-frame offsets
            rep = np.repeat(np.arange(len(pdf)), counts)
            starts = np.repeat(
                np.concatenate([[0], np.cumsum(counts)])[:-1], counts
            )
            fidx = (np.arange(len(rep)) - starts) * every_n
            out = pdf.drop(columns=[media_col]).iloc[rep].reset_index(drop=True)
            blobs = pdf[media_col].to_numpy()
            out["frame_idx"] = pd.array(fidx, dtype="Int32")
            out["frame"] = [
                bytes(blobs[r])[i * 256 : (i + 1) * 256]
                for r, i in zip(rep.tolist(), fidx.tolist())
            ]
            yield out

    return df.mapInPandas(_sample, schema=out_schema)


def repartition_by_bytes(df: DataFrame, target_bytes: int = 64 << 20,
                         bytes_col: str = "n_bytes") -> DataFrame:
    """Repartition so each task decodes ~target_bytes of media: partition
    count from the byte sum, spread by hash. At 100 TB this is the knob
    that keeps decode tasks uniform regardless of blob-size skew."""
    total = df.agg(F.sum(bytes_col)).collect()[0][0] or 0
    n = max(1, int(total // target_bytes) + 1)
    return df.repartition(n)


def synth_media(spark, n_rows: int, media_type: str = "image") -> DataFrame:
    """Deterministic fake media table for tests/benchmarks. The blob is
    ``sha256(media_id)`` hex repeated (2 + media_id % 8) times as UTF-8
    bytes — trivially reproducible in any engine, so the decode outputs
    (header parse + byte histogram) are oracle-checkable in plain SQL."""
    base = spark.range(n_rows).withColumnRenamed("id", "media_id")
    blob = F.sha2(F.col("media_id").cast("string"), 256).cast("binary")
    # repeat the hash to a pseudo-blob of a deterministic size
    body = F.repeat(F.sha2(F.col("media_id").cast("string"), 256), 1 + (F.col("media_id") % 8).cast("int"))
    df = base.withColumn("media", F.concat(blob, body.cast("binary")))
    return (
        df.withColumn("media_type", F.lit(media_type))
        .withColumn("n_bytes", F.octet_length("media").cast("long"))
        .select("media_id", "media_type", "media", "n_bytes")
    )

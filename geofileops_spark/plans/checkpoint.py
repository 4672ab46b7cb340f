"""Checkpoint / lineage / resume layer (north rule: "every partition
emits lineage + row-count metrics to a checkpoint table enabling resume
without recompute").

Model
-----
A *stage* is a named, deterministic ``DataFrame -> DataFrame`` transform
over an input table. Work is split into ``n_buckets`` deterministic
buckets (``pmod(xxhash64(key), n))`` — the unit of commit and of resume.
For each bucket the runner:

1. checks the checkpoint table for a committed record with the same
   ``(stage, bucket, input_fingerprint)``;
2. computes + appends only the missing buckets' output (one Spark job
   over ALL missing buckets — resume is an anti-join, not a driver loop);
3. appends one lineage row per bucket: stage, bucket, input fingerprint,
   row counts in/out, wall time, commit timestamp.

Restart-safety: output rows carry their bucket id; a crashed run leaves
orphan output rows for uncommitted buckets, and ``run_stage`` deletes
them (bucket-predicate overwrite) before recomputing, so the output is
exactly-once per committed bucket. The reference's analogue is the
per-batch partial .gpkg + append merge (``_geoops_sql.py:856-932``);
Spark's dynamic partition overwrite replaces the file dance.

The checkpoint "table" is a parquet directory (Iceberg would give ACID
appends; parquet + bucket-directory layout is the sandbox stand-in —
each bucket's data lives in its own ``bucket=N`` directory, so a bucket
recompute is an idempotent directory overwrite).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_gfo_bucket"


def with_bucket(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    """Deterministic bucket id from a stable key column."""
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    )


def input_fingerprint(df: DataFrame, key_col: str) -> DataFrame:
    """Per-bucket content fingerprint: count + sum of WHOLE-ROW hashes
    (every column, not just the key), so a bucket whose row values change
    while its key set stays identical is still detected as dirty.
    Order-insensitive, computed in one aggregation."""
    cols = [c for c in df.columns if c != BUCKET_COL]
    # fold hashes to 32 bits before summing: ANSI mode (Spark 4 default)
    # would overflow a sum of full 64-bit hashes
    h32 = F.xxhash64(*[F.col(c) for c in cols]).bitwiseAND(F.lit(0x7FFFFFFF))
    return df.groupBy(BUCKET_COL).agg(
        F.count("*").alias("rows_in"),
        F.sum(h32).alias("fp"),
    )


def _clear_buckets(out_path: str, bucket_ids) -> None:
    """Remove ``bucket=N`` directories for buckets about to be rewritten
    (local-filesystem stand-in for a predicate overwrite)."""
    import shutil
    from pathlib import Path

    root = Path(out_path.removeprefix("file://"))
    if not root.exists():
        return
    for b in bucket_ids:
        d = root / f"bucket={b}"
        if d.exists():
            shutil.rmtree(d)


def _read_checkpoints(spark: SparkSession, ckpt_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(ckpt_path)
    except Exception:  # noqa: BLE001 - first run: no table yet
        return None


def committed_buckets(
    spark: SparkSession, ckpt_path: str, stage: str
) -> DataFrame | None:
    ck = _read_checkpoints(spark, ckpt_path)
    if ck is None:
        return None
    return (
        ck.where(F.col("stage") == stage)
        .select(F.col("bucket").alias(BUCKET_COL), "fp", "rows_in")
        .dropDuplicates([BUCKET_COL])
    )


def run_stage(
    spark: SparkSession,
    stage: str,
    input_df: DataFrame,
    transform,
    out_path: str,
    ckpt_path: str,
    key_col: str = "url",
    n_buckets: int = 32,
) -> dict:
    """Run ``transform`` over the missing buckets only; returns a summary
    dict. Safe to re-run after a crash or with appended input: buckets
    whose (count, fingerprint) still match their committed record are
    skipped; changed or new buckets are recomputed and overwritten."""
    bucketed = with_bucket(input_df, key_col, n_buckets)
    fps = input_fingerprint(bucketed, key_col)

    done = committed_buckets(spark, ckpt_path, stage)
    if done is not None:
        # a bucket is skippable only if BOTH id and fingerprint match
        todo_fps = fps.join(
            done.withColumnRenamed("fp", "_done_fp").withColumnRenamed(
                "rows_in", "_done_rows"
            ),
            on=BUCKET_COL,
            how="left",
        ).where(
            F.col("_done_fp").isNull()
            | (F.col("_done_fp") != F.col("fp"))
            | (F.col("_done_rows") != F.col("rows_in"))
        ).select(BUCKET_COL, "rows_in", "fp")
    else:
        todo_fps = fps

    todo = [
        (r[BUCKET_COL], r["rows_in"], r["fp"]) for r in todo_fps.collect()
    ]
    summary = {
        "stage": stage,
        "n_buckets": n_buckets,
        "recomputed": len(todo),
        "skipped": n_buckets - len(todo),
    }
    if not todo:
        return summary

    todo_ids = [t[0] for t in todo]
    t0 = time.time()
    work = bucketed.where(F.col(BUCKET_COL).isin(todo_ids))
    result = transform(work)
    if BUCKET_COL not in result.columns:
        raise ValueError(
            "transform must preserve the bucket column "
            f"{BUCKET_COL!r} so output stays resumable"
        )
    # idempotent per-bucket overwrite via partitioned layout. Dynamic
    # overwrite only replaces partitions PRESENT in the result, so a
    # recomputed bucket that now emits 0 rows would keep its stale
    # bucket=N directory — explicitly clear every todo bucket first
    # (the parquet stand-in for Iceberg's replaceWhere predicate).
    _clear_buckets(out_path, todo_ids)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    result.withColumn("bucket", F.col(BUCKET_COL)).drop(BUCKET_COL).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(out_path)
    wall = time.time() - t0

    # per-bucket lineage rows (rows_out counted from the written data so
    # the metric reflects what is actually committed)
    out_counts = {
        r["bucket"]: r["n"]
        for r in spark.read.parquet(out_path)
        .where(F.col("bucket").isin(todo_ids))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    now = time.time()
    records = [
        {
            "stage": stage,
            "bucket": int(b),
            "fp": int(fp),
            "rows_in": int(rows_in),
            "rows_out": int(out_counts.get(b, 0)),
            "wall_sec": float(wall),
            "committed_at": float(now),
        }
        for b, rows_in, fp in todo
    ]
    spark.createDataFrame(records).write.mode("append").parquet(ckpt_path)
    summary["rows_out"] = sum(out_counts.values())
    return summary


def stage_metrics(spark: SparkSession, ckpt_path: str) -> DataFrame:
    """The lineage/metrics table, one row per committed (stage, bucket)."""
    ck = _read_checkpoints(spark, ckpt_path)
    if ck is None:
        raise FileNotFoundError(f"no checkpoint table at {ckpt_path}")
    return ck

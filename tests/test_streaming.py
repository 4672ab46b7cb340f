"""Structured Streaming pipeline: streaming result == batch result on the
same input; resume from checkpoint processes only new files."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from geofileops_spark.sources.pages import synth_pages, synth_zones
from geofileops_spark.streaming import pipeline as SP


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="gfo_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def batch_equivalent(spark, path):
    pages = spark.read.parquet(path)
    pts = SP.extract_points_streaming(pages)
    zones = synth_zones(spark).withColumnRenamed("fid", "zone_fid")
    from geofileops_spark.operators.join import join_points_in_polygons

    joined = join_points_in_polygons(pts, zones, "lon", "lat", "zone_fid")
    return (
        joined.groupBy(F.window("warc_ts", "1 hour").alias("win"), "zone_fid")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("win.start").alias("window_start"), "zone_fid", "n_pages")
    )


def test_streaming_matches_batch(spark, tdir):
    inp = f"{tdir}/in"
    synth_pages(spark, 4000, partitions=4).write.parquet(inp)
    stream = SP.stream_pages(spark, inp)
    result = SP.streaming_zone_counts(stream, synth_zones(spark))
    q = SP.run_available_now(result, f"{tdir}/ckpt", query_name="t1", output_mode="complete")
    got = {
        (r["window_start"], r["zone_fid"]): r["n_pages"]
        for r in spark.sql("select * from t1").collect()
    }
    exp = {
        (r["window_start"], r["zone_fid"]): r["n_pages"]
        for r in batch_equivalent(spark, inp).collect()
    }
    assert got == exp and len(got) > 0
    q.stop()


def test_streaming_resume_processes_only_new_files(spark, tdir):
    inp = f"{tdir}/in"
    ckpt = f"{tdir}/ckpt"
    synth_pages(spark, 2000, partitions=2).write.mode("append").parquet(inp)
    stream = SP.stream_pages(spark, inp)
    result = SP.streaming_zone_counts(stream, synth_zones(spark))
    q1 = SP.run_available_now(result, ckpt, query_name="t2a", output_mode="complete")
    n1 = spark.sql("select sum(n_pages) from t2a").collect()[0][0]
    q1.stop()

    # drop more files, restart from the same checkpoint
    synth_pages(spark, 3000, partitions=2).write.mode("append").parquet(inp)
    stream2 = SP.stream_pages(spark, inp)
    result2 = SP.streaming_zone_counts(stream2, synth_zones(spark))
    q2 = SP.run_available_now(result2, ckpt, query_name="t2b", output_mode="complete")
    rows2 = spark.sql("select sum(n_pages) from t2b").collect()[0][0]
    q2.stop()
    # complete mode re-emits full state: after resume the totals cover
    # BOTH drops (state restored from checkpoint + only new files read)
    assert n1 is not None and n1 > 0
    assert rows2 is not None and rows2 > n1


def test_streaming_dedup_out_of_order_correction(spark, tdir):
    """Out-of-order replay: the true (smallest warc_ts) winner arrives in
    a LATER micro-batch; update-mode must emit a correction so the last
    emitted row per key equals the batch keep-first winner."""
    import glob
    import os

    stream_dir = f"{tdir}/in"
    os.makedirs(stream_dir)
    rows_by_drop = [
        # drop 0 (arrives first): the LATE copies
        [("https://a/2", "2020-01-01 02:00:00", "k1"),
         ("https://b/2", "2020-01-01 02:00:00", "k2")],
        # drop 1 (arrives second): the true event-time winners
        [("https://a/1", "2020-01-01 01:00:00", "k1"),
         ("https://b/3", "2020-01-01 03:00:00", "k2")],  # NOT a winner
    ]
    t0 = 1_600_000_000
    for i, rows in enumerate(rows_by_drop):
        df = spark.createDataFrame(rows, "url string, ts string, fp string").select(
            "url", F.to_timestamp("ts").alias("warc_ts"), "fp"
        )
        tmp = f"{tdir}/tmp{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = f"{stream_dir}/drop_{i}.parquet"
        shutil.move(part, dst)
        os.utime(dst, times=(t0 + i, t0 + i))

    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, fp string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    dd = SP.streaming_dedup_first(stream, key_col="fp")
    q = SP.run_available_now(dd, f"{tdir}/ckpt", query_name="t3", output_mode="update")
    got = spark.sql("select * from t3").collect()
    q.stop()
    # k1: initial emit https://a/2 then correction https://a/1 (2 rows);
    # k2: https://b/2 only (the later arrival has a LARGER key: suppressed)
    by_key: dict = {}
    for r in got:
        by_key.setdefault(r["fp"], []).append(r["url"])
    assert by_key["k1"] == ["https://a/2", "https://a/1"]
    assert by_key["k2"] == ["https://b/2"]

"""Structured Streaming over the pages table.

The reference is batch-only (SURVEY.md §2.10); this module adds the
streaming shape a continuously-crawled pages table needs: a file-source
stream of page batches -> the SAME vectorized extract + broadcast PIP
operators used in batch (they are deterministic narrow transforms, so
they compose with streaming) -> watermarked windowed rollups per zone.

Late data: ``watermark`` bounds state; a page arriving later than the
watermark behind the max ``warc_ts`` is dropped from its window — the
standard Spark contract. Checkpointing uses Spark's own streaming
checkpoint (offsets + state); the batch-side lineage table
(plans/checkpoint.py) covers batch jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.pages import PAGES_SCHEMA, extract_points


def stream_pages(spark: SparkSession, input_dir: str, max_files: int = 16) -> DataFrame:
    """File-source stream of pages parquet drops."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def streaming_zone_counts(
    pages: DataFrame,
    zones: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """pages stream -> geotag extract -> PIP vs zones -> windowed counts.

    Output: (window, zone_fid, n_pages) in update mode semantics.
    """
    from ..operators.join import join_points_in_polygons

    pts = extract_points_streaming(pages)
    zones = zones.withColumnRenamed("fid", "zone_fid") if "fid" in zones.columns else zones
    joined = join_points_in_polygons(
        pts, zones, x_col="lon", y_col="lat", poly_id_col="zone_fid"
    )
    return (
        joined.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "zone_fid")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            "zone_fid",
            "n_pages",
        )
    )


def extract_points_streaming(pages: DataFrame) -> DataFrame:
    """Streaming variant of extract_points: keeps the event-time column
    (warc_ts) for watermarking; pure narrow JVM ops."""
    from ..sources.pages import GEO_RE

    return (
        pages.select("url", "warc_ts", "text")
        .withColumn("_lat", F.regexp_extract("text", GEO_RE, 1))
        .withColumn("_lon", F.regexp_extract("text", GEO_RE, 2))
        .where((F.col("_lat") != "") & (F.col("_lon") != ""))
        .withColumn("lat", F.col("_lat").cast("double"))
        .withColumn("lon", F.col("_lon").cast("double"))
        .select("url", "warc_ts", "lon", "lat")
    )


def streaming_dedup_first(
    docs: DataFrame,
    key_col: str = "fp",
    order_cols: tuple = ("warc_ts", "url"),
) -> DataFrame:
    """Stateful exactly-once novelty filter over a document stream: the
    FIRST row seen per ``key_col`` (content fingerprint) is emitted, every
    later duplicate is suppressed across micro-batches.

    The batch twin is ``ml.dedup.dedup_exact`` (keep-first window); this
    is its continuous shape — the crawl-ingest dedup a training-data
    pipeline runs on the live feed. Implementation:
    ``applyInPandasWithState`` grouped on the fingerprint, state = one
    boolean "already emitted" per key, update-mode output. State is one
    byte per distinct document, partitioned by the shuffle on ``key_col``
    — at cluster scale the state store shards with the key space, and
    RocksDB-backed state keeps memory bounded.

    Out-of-order streams converge too: the state stores the WINNING
    ``order_cols`` key (not just an "emitted" bit), and when a later
    micro-batch delivers a row with a strictly smaller order key the new
    winner is emitted as a correction — update output mode explicitly
    allows re-emitting a key. On an in-order replay (availableNow file
    backfill — file source processes drops in mtime order) no correction
    ever fires and exactly one row per key is emitted; on a live
    out-of-order stream the LAST emitted row per key equals the batch
    keep-first twin's winner once the stream quiesces, instead of
    silently diverging. Downstream sinks must upsert on ``key_col``
    (standard update-mode contract).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import StructField, StructType

    out_schema = docs.schema
    # state = the current winner's order key, typed from the input schema
    state_schema = StructType(
        [StructField(c, docs.schema[c].dataType, True) for c in order_cols]
    )
    ocols = list(order_cols)

    def _keep_first(key, pdfs, state: GroupState):
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ocols, kind="mergesort")
            head = pdf.iloc[[0]]
            if best is None or tuple(head.iloc[0][ocols]) < tuple(
                best.iloc[0][ocols]
            ):
                best = head
        if best is None:
            return
        new_key = tuple(best.iloc[0][c] for c in ocols)
        if state.exists:
            old_key = tuple(state.get)
            # pandas Timestamps compare against the datetimes that come
            # back from the state store; normalize via to_pydatetime
            new_cmp = tuple(
                v.to_pydatetime() if hasattr(v, "to_pydatetime") else v
                for v in new_key
            )
            if not (new_cmp < old_key):
                return  # current winner still stands: suppress duplicate
        state.update(new_key)
        yield best

    return docs.groupBy(key_col).applyInPandasWithState(
        _keep_first,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    result: DataFrame,
    checkpoint_dir: str,
    query_name: str = "gfo_stream",
    output_mode: str = "append",
    timeout_sec: int = 120,
):
    """Drain everything currently available into an in-memory sink and
    return the sink's contents (test/dev harness; production would
    ``writeStream.toTable`` with the same checkpoint)."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q

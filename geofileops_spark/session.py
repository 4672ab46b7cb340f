"""SparkSession factory with scale-oriented defaults.

Single place where engine-relevant Spark conf lives, so tests, bench.py
and the driver entry all run the same way. Designed for a multi-executor
cluster (AQE on, skew-join handling on, Arrow batching for the geometry
UDFs); tested on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geofileops_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing + skew-join splitting — the Spark-native
        # replacement for the reference's hand-tuned batch sizing
        # (geofileops _geoops_sql.py:4518-4597)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # geometry rows are CPU-heavy per byte: coalesce to ~8MB partitions
        # (the 64MB default starves Python-UDF stages of parallelism)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # scan splits sized for CPU-heavy UDF pipelines over the modest
        # sandbox files; on a real 100TB table with 128MB+ row groups the
        # defaults (128m/4m) are appropriate instead
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "2m")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for all pandas UDFs (vectorized geometry kernels)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        # generous broadcast threshold: zone/dim layers are small
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # shuffle/spill on tmpfs: the sandbox's overlayfs makes shuffle-file
        # creation syscall-bound; real clusters use fast local SSDs instead
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        # explicit worker reuse: without it every job forks fresh pandas-UDF
        # workers whose post-fork GC copy-on-writes ~100MB each — at 32
        # cores that's a kernel-time storm that INVERTS scaling
        .config("spark.python.worker.reuse", "true")
        .config("spark.python.worker.idleTimeoutSeconds", "120")
        # unix domain sockets for JVM<->Python data: measurably lower
        # syscall cost than loopback TCP in this sandbox
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

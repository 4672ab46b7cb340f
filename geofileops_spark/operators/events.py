"""Event-stream batch operators: gap-based sessionization + rollups.

Not in the reference (geofileops is spatial-only); these cover the
`events` table the same way the text/ml modules cover `documents` —
standard building blocks of a web-scale pipeline, expressed as pure
window/agg plans (no UDFs, fully ANSI-mirrorable for the oracle gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(ts_col: str):
    """Microseconds since epoch (exact integer — second-granularity casts
    truncate sub-second parts and shift gap/duration results)."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign a per-user session index: a new session starts when the gap
    to the previous event exceeds ``gap_seconds``. One window over
    (user, ts) — Spark's segment-tree window aggregation; at scale the
    shuffle is one exchange on user_col."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = _epoch_us(ts_col) - F.lag(_epoch_us(ts_col)).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup: event count, duration, value sum."""
    s = sessionize(df, gap_seconds, user_col, ts_col)
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        (
            F.max(_epoch_us(ts_col)) - F.min(_epoch_us(ts_col))
        ).alias("duration_us"),
        F.sum("value").alias("value_sum"),
    )

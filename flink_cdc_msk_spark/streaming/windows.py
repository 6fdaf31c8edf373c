"""Streaming stateful operators (SURVEY.md Part B streaming row).

The reference runs watermark-free processing-time pipelines
(``WatermarkStrategy.noWatermarks()``, MySQLCDC2AWSMSK.scala:93) — these
operators are the capability-closure additions: event-time windows with
late-data handling, session windows, and streaming dedup, all on Spark's
built-in state store (RocksDB provider config in session.py for spill-aware
state at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts; late data beyond the watermark
    is dropped (state per (window, keys) is bounded → safe unbounded run)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n",
            "total_value",
        )
    )


def sessionized(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows with an inactivity gap — built-in ``session_window``
    (dynamic, state merges adjacent sessions; no custom
    applyInPandasWithState needed, SURVEY.md §7 hard-parts note)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup on key columns. With a watermark the per-key
    state expires (dropDuplicatesWithinWatermark) — mandatory at scale,
    otherwise state grows without bound."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )

"""Event-time windowed aggregation (SURVEY.md §2.9 extension surface).

Tumbling / sliding / session windows with watermarks over an event
stream. The same builders work on batch DataFrames (F.window /
F.session_window are batch-compatible), which is how the oracle
validates them; the streaming tests drive them through
``readStream`` + memory sink.

Watermark note: ``withWatermark`` bounds state — without it a windowed
streaming aggregation keeps every window open forever, which at 100 TB
of stream history is an OOM, not a feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "10 minutes",
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows; count + sum(value)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    group = [F.window(ts_col, duration).alias("w")] + [F.col(k) for k in (keys or [])]
    return df.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


def sliding(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows advancing by ``slide``; each event lands in
    duration/slide windows."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    group = [F.window(ts_col, duration, slide).alias("w")] + [
        F.col(k) for k in (keys or [])
    ]
    return df.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


def session(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    group = [F.session_window(ts_col, gap).alias("w")] + [
        F.col(k) for k in (keys or [])
    ]
    return df.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )

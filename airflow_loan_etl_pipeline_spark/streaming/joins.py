"""Stream-stream joins and streaming deduplication (SURVEY.md §2.9
extensions; the reference's pipeline is batch-only, but its micro-batch
file stream — drive_auto_compress_email.py:85-111 — is exactly the shape
these operators serve once two live feeds must be correlated).

Both operators are state-store backed: watermarks bound how long a row
waits for a match (or how long a dedup key is remembered), which is what
keeps state finite on an unbounded stream — the 100 TB/day design point
is "state proportional to the watermark window, not to history".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Correlate two event streams on a key within a time interval:
    right row must land in [left_ts, left_ts + within].

    Spark plans this as a streaming symmetric hash join; the watermarks
    + the two-sided time bound let it EVICT state once no future match
    is possible. Without the interval condition a stream-stream inner
    join would buffer both streams forever.

    Works identically on batch frames (plain range-condition join) —
    handy for differential tests.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").select(
        lw[key].alias(key),
        lw[left_ts].alias(left_ts),
        rw[right_ts].alias(right_ts),
    )


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication: keep the first row per key, where
    "remembered" duplicates are bounded by the watermark —
    ``dropDuplicatesWithinWatermark`` ages dedup state out once a key's
    event time falls behind the watermark, so state is O(keys per
    window) instead of O(keys ever seen). This is the streaming
    counterpart of operators/dedup.py::exact_dedup for continuous
    training-data ingestion (batch frames fall back to plain
    dropDuplicates)."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)

"""Composed incremental telemetry pipeline: landed event files →
AvailableNow micro-batches → per-batch mergeable OHLC partials →
exactly-merged persistent bar state.

The production stage order mirrors the reference's poll → process →
persist chain (/root/reference/airflow/dags/
drive_auto_compress_email.py:161-339) rebuilt on Structured Streaming:
the checkpoint is the file ledger (ST2), each micro-batch folds into
the state table through the DECOMPOSABLE OHLC merge
(operators/timeseries.py ohlc_partial/merge_ohlc) — so a batch
boundary slicing through an hour bucket still yields bit-exact bars,
and history buckets are never recomputed from raw events. At 100 TB
the state table is |keys| x |buckets| rows (bounded), the only
corpus-sized work is each batch's own partial aggregation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from airflow_loan_etl_pipeline_spark.operators.timeseries import (
    finalize_ohlc,
    merge_ohlc,
    ohlc_partial,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)


def _has_state(state_dir: str) -> bool:
    return os.path.isdir(state_dir) and any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    )


def run_telemetry_pipeline(
    spark: SparkSession,
    landing_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    timeout_s: int = 300,
) -> None:
    """Drain all landed CSV event files (AvailableNow) into the OHLC
    state table. Safe to re-run as new files land: the checkpoint
    skips already-ingested files; the merge is associative, so any
    batch slicing is equivalent to one big batch."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        part = ohlc_partial(batch_df)
        if _has_state(state_dir):
            merged = merge_ohlc(spark.read.parquet(state_dir), part)
        else:
            merged = part
        # materialize BEFORE the overwrite so the plan never reads the
        # directory it is replacing mid-write
        merged.cache().count()
        merged.write.mode("overwrite").parquet(state_dir)
        merged.unpersist()

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("header", True)
        .csv(landing_dir)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def read_bars(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read edge: the finalized OHLC bar table."""
    return finalize_ohlc(spark.read.parquet(state_dir))

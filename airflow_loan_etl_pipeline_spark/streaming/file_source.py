"""Incremental file ingestion (SURVEY.md §2.9 ST1-ST6).

The reference hand-rolls a micro-batch file stream: a per-minute cron
poll, a persisted JSON ledger of processed file IDs, and a 60-second
minimum file age so in-flight uploads aren't consumed
(/root/reference/airflow/dags/drive_auto_compress_email.py:582, :85-111,
:71, :227-236). Those are exactly the semantics of Spark Structured
Streaming's file source, so the idiomatic rebuild is:

- **Streaming mode** (`stream_csv_dir`): `readStream` + checkpoint. The
  checkpointed seen-files log IS the ledger (ST2); `Trigger.AvailableNow`
  IS the cron poll that drains everything then stops (ST1);
  `maxFileAge` / modifiedAfter options handle the settle window (ST3).
- **Batch-incremental mode** (`incremental_batch`): for engines that
  poll with plain batch jobs, a parquet ledger table + broadcast
  left_anti join reproduces exactly-once file semantics (F3/J1), and a
  mod-time predicate reproduces the settle window (F4).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_loan_etl_pipeline_spark.operators.joins import ledger_anti_join

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.StringType()),
        T.StructField("processed_at", T.TimestampType()),
    ]
)


def stream_csv_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """ST1/ST2: streaming scan of a CSV landing directory. Pair with
    ``.writeStream.option("checkpointLocation", ...)`` — the checkpoint
    replaces the reference's JSON ledger."""
    reader = spark.readStream.schema(schema).option("header", True)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(path)


def settled_files(
    spark: SparkSession,
    input_dir: str,
    suffix: str = ".csv",
    prefix: str = "",
    min_age_seconds: float = 60.0,
    now: float | None = None,
) -> DataFrame:
    """F2/F4: list landing files passing the name predicate and the
    settle-age gate (reference MIN_FILE_AGE_SECONDS,
    drive_auto_compress_email.py:71, :227-236). Listing is driver-side
    (it's directory metadata, not data)."""
    now = time.time() if now is None else now
    rows = []
    if os.path.isdir(input_dir):
        for name in sorted(os.listdir(input_dir)):
            if not (name.startswith(prefix) and name.endswith(suffix)):
                continue
            full = os.path.join(input_dir, name)
            mtime = os.path.getmtime(full)
            if now - mtime >= min_age_seconds:
                rows.append((name, full, float(mtime)))
    return spark.createDataFrame(
        rows, "file_id string, path string, mtime double"
    )


def load_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    """ST2 ledger table (parquet). Empty frame when absent."""
    if os.path.exists(ledger_path):
        return spark.read.parquet(ledger_path)
    return spark.createDataFrame([], LEDGER_SCHEMA)


def new_files(candidates: DataFrame, ledger: DataFrame) -> DataFrame:
    """F3/J1: anti-join candidates against the ledger (broadcast — the
    ledger is file metadata, tiny relative to data)."""
    return ledger_anti_join(candidates, ledger.select("file_id"), key="file_id")


def update_ledger(
    spark: SparkSession, ledger_path: str, processed: DataFrame
) -> None:
    """Merge newly processed file ids into the ledger (idempotent)."""
    existing = load_ledger(spark, ledger_path)
    merged = (
        existing.select("file_id")
        .unionByName(processed.select("file_id"))
        .distinct()
        .withColumn("processed_at", F.current_timestamp())
    )
    # Two-phase write: parquet overwrite of the path we are reading from
    # would clobber the source mid-scan. The tmp copy is deleted after
    # the final write lands — a crash in between leaves the previous
    # ledger intact plus a stale .tmp the next update overwrites.
    import shutil

    tmp = ledger_path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(ledger_path)
    shutil.rmtree(tmp, ignore_errors=True)


def incremental_batch(
    spark: SparkSession,
    input_dir: str,
    ledger_path: str,
    schema: T.StructType,
    prefix: str = "",
    min_age_seconds: float = 0.0,
) -> tuple[DataFrame | None, DataFrame]:
    """One exactly-once micro-batch over a landing directory.

    Returns ``(data, processed_files)`` where ``data`` is the union of
    the not-yet-processed, settled files (None if none). Caller commits
    the batch by passing ``processed_files`` to :func:`update_ledger`
    AFTER its sinks succeed — same commit ordering as the reference
    (process first, persist ledger last,
    drive_auto_compress_email.py:312, :336).
    """
    cands = settled_files(
        spark, input_dir, prefix=prefix, min_age_seconds=min_age_seconds
    )
    ledger = load_ledger(spark, ledger_path)
    fresh = new_files(cands, ledger)
    paths = [r["path"] for r in fresh.select("path").collect()]
    if not paths:
        return None, fresh
    data = (
        spark.read.schema(schema)
        .option("header", True)
        .csv(paths)
        .withColumn("_source_file", F.input_file_name())
    )
    return data, fresh

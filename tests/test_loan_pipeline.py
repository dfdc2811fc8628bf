"""End-to-end reference-parity pipeline over a synthesized loan CSV
fixture (FIXTURES.md §1): multi-file glob union (SET1) → mode imputation
(A1/A2) → date split (D1-D3) → grouped agg (A3) → parquet sinks (K1/K2)
→ top-k report (T3/K6/K7)."""

from __future__ import annotations

import os

from airflow_loan_etl_pipeline_spark import schemas
from airflow_loan_etl_pipeline_spark.plans.loan_etl import (
    clean_and_aggregate,
    latest_aggregates_summary,
)
from airflow_loan_etl_pipeline_spark.plans.report import (
    human_bytes,
    render_html_report,
)
from airflow_loan_etl_pipeline_spark.sources.io import read_csv_dir, write_parquet

HEADER = (
    "loan_id,customer_id,created_at,amount,interest_rate,tenure_months,"
    "status,product_type,branch,credit_score_band"
)

FILE_A = [
    "LN1,CU1,2024-03-01 10:00:00,1000.0,5.5,12,ACTIVE,PERSONAL,North,GOOD",
    "LN2,CU1,2024-03-02 11:30:00,2000.0,6.0,24,ACTIVE,HOME,North,GOOD",
    "LN3,CU2,2024-03-03 09:15:00,,7.0,36,CLOSED,PERSONAL,South,FAIR",
    "LN4,CU3,2024-03-04 14:45:00,4000.0,5.5,12,,PERSONAL,North,GOOD",
]
FILE_B = [
    "LN5,CU2,2024-03-05 16:20:00,5000.0,,60,ACTIVE,AUTO,South,POOR",
    "LN6,CU4,,6000.0,8.0,12,ACTIVE,PERSONAL,,EXCELLENT",
]


def _land(tmp_path) -> str:
    d = str(tmp_path / "raw")
    os.makedirs(d)
    for name, rows in (("loan_a.csv", FILE_A), ("loan_b.csv", FILE_B)):
        with open(os.path.join(d, name), "w") as f:
            f.write(HEADER + "\n" + "\n".join(rows) + "\n")
    return d


def test_loan_etl_end_to_end(spark, tmp_path):
    raw = _land(tmp_path)
    df = read_csv_dir(spark, raw + "/*.csv", schema=schemas.LOAN)
    assert df.count() == 6  # SET1: both files unioned by the glob

    cleaned, aggs = clean_and_aggregate(
        df,
        group_cols=["status", "product_type", "branch"],
        amount_col="amount",
        date_col="created_at",
    )
    rows = {r["loan_id"]: r for r in cleaned.collect()}
    # A2: nulls imputed with column modes
    assert rows["LN3"]["amount"] == 1000.0  # mode amount (tie -> min value)
    assert rows["LN4"]["status"] == "ACTIVE"
    assert rows["LN6"]["branch"] == "North"
    # D1-D3: date split on parseable timestamps; null created_at -> nulls
    assert str(rows["LN1"]["created_date"]) == "2024-03-01"
    assert rows["LN1"]["created_time"] == "10:00:00"
    # LN6's created_at was imputed with the mode timestamp string, so it
    # parses; the raw-null case is covered when imputation is scoped off.
    agg_rows = aggs.collect()
    assert sum(r["loan_count"] for r in agg_rows) == 6
    assert all(r["status"] is not None for r in agg_rows)

    # K1/K2 sinks + re-read
    out = str(tmp_path / "out")
    write_parquet(aggs, out + "/aggregates")
    reread = spark.read.parquet(out + "/aggregates")
    assert reread.count() == len(agg_rows)

    # T3/K6/K7 report edge
    top = latest_aggregates_summary(reread, limit=3)
    assert len(top) <= 3
    assert top[0]["loan_count"] == max(r["loan_count"] for r in agg_rows)
    html = render_html_report(
        [{"file": "loan_a.csv", "ratio": 0.4, "size": human_bytes(2048)}], top
    )
    assert "<table>" in html and "2.0 KB" in html


def test_date_split_absent_column_is_noop(spark):
    df = spark.createDataFrame([("x",)], "a string")
    from airflow_loan_etl_pipeline_spark.operators.dates import split_datetime

    assert split_datetime(df, source_col="created_at").columns == ["a"]


def test_legacy_parser_divergence_documented(spark, tmp_path):
    """VERDICT r1 item 10 — the asserted divergence list. The CSV path
    pins one timestampFormat (io.py) where the reference's global
    LEGACY parser policy (loan_spark_etl.py:42) is fully lenient.
    Strict path: ONLY 'yyyy-MM-dd HH:mm:ss' parses; everything sloppier
    nulls out (PERMISSIVE). The explicit recovery path is
    dates.lenient_to_timestamp's format ladder, which accepts the
    common sloppy shapes LEGACY tolerated."""
    from pyspark.sql import types as T

    from airflow_loan_etl_pipeline_spark.operators.dates import (
        lenient_to_timestamp,
    )

    cases = {
        "iso": "2024-03-01 10:00:00",      # strict: parses
        "iso_t": "2024-03-01T10:00:00",    # strict: NULL, ladder: parses
        "date_only": "2024-03-01",         # strict: NULL, ladder: parses
        "slash_us": "3/7/2021",            # strict: NULL, ladder: parses
        "slash_2digit": "3/7/21",          # strict: NULL, ladder: parses
        "single_digit": "2021-3-7 5:4:3",  # strict: NULL, ladder: parses
        "frac": "2024-03-01 10:00:00.123", # strict: NULL, ladder: parses
        "garbage": "not a date",           # NULL on both (no silent junk)
    }
    p = tmp_path / "ts"
    p.mkdir()
    (p / "a.csv").write_text(
        "k,ts\n" + "".join(f"{k},{v}\n" for k, v in cases.items())
    )
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("ts", T.TimestampType())]
    )
    strict = {r.k: r.ts for r in read_csv_dir(spark, str(p), schema=schema).collect()}
    assert strict["iso"] is not None
    for k in ("iso_t", "date_only", "slash_us", "slash_2digit",
              "single_digit", "frac", "garbage"):
        assert strict[k] is None, k

    str_schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("ts", T.StringType())]
    )
    raw = read_csv_dir(spark, str(p), schema=str_schema)
    lenient = {
        r.k: r.parsed
        for r in raw.withColumn("parsed", lenient_to_timestamp("ts")).collect()
    }
    for k in cases:
        if k == "garbage":
            assert lenient[k] is None
        else:
            assert lenient[k] is not None, k
    assert str(lenient["single_digit"]) == "2021-03-07 05:04:03"
    assert str(lenient["slash_2digit"]).startswith("2021-03-07")


def test_read_csv_dir_quarantines_corrupt_rows(spark, tmp_path):
    """PERMISSIVE ingest: malformed cells null out, raw row preserved in
    _corrupt_record; clean rows parse normally."""
    from pyspark.sql import types as T

    from airflow_loan_etl_pipeline_spark.sources.io import read_csv_dir

    p = tmp_path / "in"
    p.mkdir()
    (p / "a.csv").write_text(
        "loan_id,amount\nL1,100.5\nL2,not_a_number\nL3,7.25\n"
    )
    schema = T.StructType(
        [
            T.StructField("loan_id", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    df = read_csv_dir(spark, str(p), schema=schema, keep_corrupt=True).cache()
    rows = {r["loan_id"]: r for r in df.collect()}
    assert rows["L1"]["amount"] == 100.5 and rows["L1"]["_corrupt_record"] is None
    assert rows["L2"]["amount"] is None
    assert rows["L2"]["_corrupt_record"] == "L2,not_a_number"
    assert rows["L3"]["amount"] == 7.25
    df.unpersist()


def test_send_html_report_over_loopback_smtp():
    """K7 delivery: real SMTP send against an in-process loopback
    server (reference sends via smtplib the same way,
    drive_auto_compress_email.py:510-514). Asserts the MIME envelope
    and the HTML body arrive intact."""
    import asyncore
    import threading
    import time as _time
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import smtpd

    from airflow_loan_etl_pipeline_spark.plans.report import send_html_report

    received = []

    class Sink(smtpd.SMTPServer):
        def process_message(self, peer, mailfrom, rcpttos, data, **kwargs):
            received.append((mailfrom, list(rcpttos), data))

    srv = Sink(("127.0.0.1", 0), None)
    port = srv.socket.getsockname()[1]
    t = threading.Thread(
        target=asyncore.loop, kwargs={"timeout": 0.1}, daemon=True
    )
    t.start()
    try:
        html = render_html_report(
            [{"file": "loan_a.csv", "ratio": 0.4}], [{"seg": "N", "n": 3}]
        )
        send_html_report(
            html, "loan ETL summary", "etl@example.com",
            ["ops@example.com"], host="127.0.0.1", port=port,
        )
        deadline = _time.time() + 10
        while not received and _time.time() < deadline:
            _time.sleep(0.05)
        assert received, "SMTP sink never received the message"
        mailfrom, rcpttos, data = received[0]
        assert mailfrom == "etl@example.com"
        assert rcpttos == ["ops@example.com"]
        body = data.decode("utf-8", errors="replace")
        assert "loan ETL summary" in body
        assert "loan_a.csv" in body
    finally:
        srv.close()


def test_json_roundtrip_with_quarantine(spark, tmp_path):
    import json as _json

    from airflow_loan_etl_pipeline_spark.sources import io as io_mod
    from pyspark.sql import types as T

    p = tmp_path / "j"
    p.mkdir()
    (p / "good.json").write_text(
        "\n".join(
            _json.dumps({"k": i, "v": f"r{i}"}) for i in range(5)
        )
    )
    (p / "bad.json").write_text('{"k": "notanint", "v": "x"}\n{broken\n')
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = io_mod.read_json_dir(
        spark, str(p), schema=schema, keep_corrupt=True
    )
    rows = df.collect()
    assert len(rows) == 7
    good = [r for r in rows if r.k is not None]
    assert len(good) == 5
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 2  # type-mismatch row + unparseable row

    out = tmp_path / "out_json"
    io_mod.write_json(df.drop("_corrupt_record"), str(out), compression="gzip")
    back = io_mod.read_json_dir(spark, str(out), schema=schema)
    assert back.count() == 7


def test_orc_roundtrip_partitioned(spark, tmp_path):
    from airflow_loan_etl_pipeline_spark.sources import io as io_mod

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "x")],
        "k long, v string, part string",
    )
    out = str(tmp_path / "orc")
    io_mod.write_orc(df, out, partition_by=["part"])
    back = io_mod.read_orc(spark, out)
    assert sorted((r.k, r.v, r.part) for r in back.collect()) == [
        (1, "a", "x"),
        (2, "b", "y"),
        (3, "c", "x"),
    ]
    import os

    assert os.path.isdir(os.path.join(out, "part=x"))


def test_payment_schedule_amortizes_to_zero(spark):
    """Closed-form balance must equal the recursive amortization: the
    final month's balance is 0.00 and each month's balance equals
    prev*(1+r) - payment (checked sequentially for one loan)."""
    from airflow_loan_etl_pipeline_spark.registry import (
        loan_payment_schedule,
    )

    rows = loan_payment_schedule(spark, "/root/testdata/sf0.001").collect()
    by_loan = {}
    for r in rows:
        by_loan.setdefault(r.loan_id, {})[r.month] = r
    # pick any loan; verify the recursion against the closed form
    loan_id, months = next(iter(by_loan.items()))
    n = max(months)
    assert months[n].balance == 0.0
    # recompute recursively from the fixture-derived terms
    import math

    principal = None
    r_m = (0.03 + (loan_id % 10) * 0.005) / 12.0
    pay = months[1].payment
    # back out the principal from month 1: b1 = P(1+r) - pay
    principal = (months[1].balance + pay) / (1 + r_m)
    bal = principal
    for m in range(1, n + 1):
        bal = bal * (1 + r_m) - pay
        # `pay` is the ROUNDED payment (±0.005); recursing with it
        # compounds that rounding: |drift| <= 0.005 * ((1+r)^m - 1)/r.
        bound = 0.005 * ((1 + r_m) ** m - 1) / r_m + 0.03
        assert math.isclose(months[m].balance, bal, abs_tol=bound), (m, bal)


def test_manifest_roundtrip_and_tamper_detection(spark, tmp_path):
    from airflow_loan_etl_pipeline_spark.sources.io import (
        verify_manifest,
        write_with_manifest,
    )

    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(50)], "k long, v string"
    )
    path = str(tmp_path / "release")
    m = write_with_manifest(df, path)
    assert m["n_rows"] == 50
    assert verify_manifest(spark, path) is True
    # tamper: overwrite with one row changed -> verification fails
    df2 = spark.createDataFrame(
        [(i, "X" if i == 7 else f"r{i}") for i in range(50)],
        "k long, v string",
    )
    df2.write.mode("overwrite").parquet(path)
    import json, os

    # restore the original manifest the overwrite wiped
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(m, fh)
    assert verify_manifest(spark, path) is False


def test_manifest_partitioned_pins_partition_column_types(spark, tmp_path):
    """With partition_by, the partition column round-trips through
    directory names; the schema-pinned read-back must keep the
    recorded checksum equal to the LOGICAL input's checksum (a date
    partition column would otherwise re-infer and re-hash)."""
    from airflow_loan_etl_pipeline_spark.operators.validate import (
        table_checksum,
    )
    from airflow_loan_etl_pipeline_spark.sources.io import (
        verify_manifest,
        write_with_manifest,
    )

    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(40)], "k long, v string"
    ).selectExpr("k", "v", "date_add(date'2024-01-01', cast(k % 3 as int)) AS d")
    path = str(tmp_path / "release_part")
    m = write_with_manifest(df, path, partition_by=["d"])
    assert m["n_rows"] == 40
    assert verify_manifest(spark, path) is True
    logical = table_checksum(df.select("k", "v", "d")).collect()[0]
    assert m["checksum"] == logical.checksum


def test_drive_pipeline_full_dag_equivalent(spark, tmp_path):
    """The whole reference DAG in one call (poll -> screen -> compress
    -> ETL -> report), plus the cron-idempotency contract: a second
    tick with no new files is a no-op before any data work, and a
    third tick with one new file processes ONLY it."""
    import gzip

    from airflow_loan_etl_pipeline_spark.plans.drive_pipeline import (
        run_drive_pipeline,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    work = str(tmp_path / "work")
    for name, rows in (("loan_a.csv", FILE_A), ("loan_b.csv", FILE_B)):
        (watch / name).write_text(HEADER + "\n" + "\n".join(rows) + "\n")
    (watch / "other.csv").write_text("x\n1\n")  # prefix-excluded
    (watch / "loan_x.json").write_text("{}")   # mime-excluded

    summaries, aggs, html = run_drive_pipeline(
        spark, str(watch), work, prefix="loan_"
    )
    assert sorted(s["filename"] for s in summaries) == [
        "loan_a.csv",
        "loan_b.csv",
    ]
    for s in summaries:
        assert s["original_size"] > 0 and s["compressed_size"] > 0
        assert 0 < s["ratio"]
        # executor-written gzip round-trips to the original bytes
        raw = (watch / s["filename"]).read_bytes()
        assert gzip.decompress(open(s["compressed_path"], "rb").read()) == raw
    assert sum(r["loan_count"] for r in aggs.collect()) == 6
    assert "<table>" in html and "loan_a.csv" in html

    # tick 2: nothing new -> early no-op
    summaries2, aggs2, html2 = run_drive_pipeline(
        spark, str(watch), work, prefix="loan_"
    )
    assert summaries2 == [] and aggs2 is None and html2 is None

    # tick 3: one new file -> only it is compressed; ETL sees all three
    (watch / "loan_c.csv").write_text(
        HEADER + "\nLN7,900.0,ACTIVE,personal,North,2024-03-05 09:00:00\n"
    )
    summaries3, aggs3, _ = run_drive_pipeline(
        spark, str(watch), work, prefix="loan_"
    )
    assert [s["filename"] for s in summaries3] == ["loan_c.csv"]
    assert sum(r["loan_count"] for r in aggs3.collect()) == 7


def test_airflow_dag_task_bodies_equivalent_to_single_plan(spark, tmp_path):
    """The Airflow binding's three task bodies (plans/airflow_dag.py —
    reference task_ids poll_and_process_drive_files / run_spark_etl /
    send_summary_email), driven in sequence WITHOUT Airflow, must
    produce the same aggregates and report as the engine's single-plan
    run_drive_pipeline, and keep the ledger idempotent across ticks."""
    from airflow_loan_etl_pipeline_spark.plans import airflow_dag as ad
    from airflow_loan_etl_pipeline_spark.plans.drive_pipeline import (
        run_drive_pipeline,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    for name, rows in (("loan_a.csv", FILE_A), ("loan_b.csv", FILE_B)):
        (watch / name).write_text(HEADER + "\n" + "\n".join(rows) + "\n")

    # task-split form
    work_t = str(tmp_path / "work_tasks")
    s1 = ad.poll_and_process_drive_files(spark, str(watch), work_t)
    assert sorted(s["filename"] for s in s1) == ["loan_a.csv", "loan_b.csv"]
    n = ad.run_spark_etl(spark, str(watch), work_t)
    assert n > 0
    html_t = ad.send_summary_email(spark, work_t)
    assert "<table>" in html_t and "loan_a.csv" in html_t

    # single-plan form on identical input
    work_s = str(tmp_path / "work_single")
    _s, aggs, html_s = run_drive_pipeline(spark, str(watch), work_s)
    task_aggs = spark.read.parquet(
        ad._work_paths(work_t)["aggregates"]
    )
    cols = sorted(task_aggs.columns)
    assert sorted(aggs.columns) == cols
    assert sorted(map(tuple, task_aggs.select(*cols).collect())) == sorted(
        map(tuple, aggs.select(*cols).collect())
    )
    # identical reports modulo the work-dir embedded in compressed
    # file paths
    assert html_t.replace(work_t, "WORK") == html_s.replace(work_s, "WORK")

    # tick 2: no new files -> task 1 returns [], ETL still idempotent
    assert ad.poll_and_process_drive_files(spark, str(watch), work_t) == []
    assert ad.run_spark_etl(spark, str(watch), work_t) == n


def test_airflow_dag_builder_gated_on_airflow(tmp_path):
    """build_dag needs Airflow only at call time: importing the module
    never does, and without Airflow installed the call raises the
    documented RuntimeError (skips if Airflow IS present — then the
    builder must return a DAG with the reference's task ids)."""
    import pytest

    from airflow_loan_etl_pipeline_spark.plans import airflow_dag as ad

    try:
        import airflow  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="apache-airflow"):
            ad.build_dag(str(tmp_path / "w"), str(tmp_path / "k"))
        return
    dag = ad.build_dag(str(tmp_path / "w"), str(tmp_path / "k"))
    assert dag.dag_id == "drive_auto_compress_email"
    assert {t.task_id for t in dag.tasks} == {
        "poll_and_process_drive_files", "run_spark_etl",
        "send_summary_email",
    }


def test_manifest_checksums_landed_files_not_plan(spark, tmp_path):
    """write_with_manifest must checksum what LANDED: a
    nondeterministic frame (unseeded rand) re-executed for the
    checksum would publish a manifest the snapshot can never verify."""
    from pyspark.sql import functions as F

    from airflow_loan_etl_pipeline_spark.sources.io import (
        verify_manifest,
        write_with_manifest,
    )

    df = spark.range(100).select(
        F.col("id"), F.rand().alias("noise")
    )
    path = str(tmp_path / "nondet")
    write_with_manifest(df, path)
    assert verify_manifest(spark, path) is True


def test_engine_parallelism_stock_vs_tuned_session():
    """Regression (ADVICE r6/r7): on a STOCK external session (no
    shuffle.partitions set) engine_parallelism must fall back to
    defaultParallelism — not widen every numbered repartition to
    Spark's legacy 200 — while an explicitly tuned width (even 200)
    still wins the max(). Runs in a subprocess so the suite's shared
    session is untouched."""
    import subprocess
    import sys

    code = """
from pyspark.sql import SparkSession
from airflow_loan_etl_pipeline_spark.session import engine_parallelism
spark = SparkSession.builder.master("local[4]").getOrCreate()
assert engine_parallelism(spark) == 4, engine_parallelism(spark)
spark.conf.set("spark.sql.shuffle.partitions", "200")
assert engine_parallelism(spark) == 200
spark.conf.set("spark.sql.shuffle.partitions", "2048")
assert engine_parallelism(spark) == 2048
# a numbered-repartition operator inherits the stock width: rebuild
spark.conf.unset("spark.sql.shuffle.partitions")
from airflow_loan_etl_pipeline_spark.operators.topk import global_rank
df = spark.range(100).selectExpr("id", "id % 7 AS v")
ranked = global_rank(df, order_cols=["v", "id"])
assert ranked.count() == 100
print("OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout

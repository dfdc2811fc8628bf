"""Custom Python DataSource connector (S4/S5): listing with pushed
prefix/MIME filters, page-sized partitions, chunked content read."""

from __future__ import annotations

import os


def _register(spark):
    from airflow_loan_etl_pipeline_spark.sources.drive_source import (
        FileListingDataSource,
    )

    spark.dataSource.register(FileListingDataSource)


def test_listing_filters_and_paginates(spark, tmp_path):
    _register(spark)
    d = tmp_path / "landing"
    d.mkdir()
    for i in range(7):
        (d / f"loan_{i}.csv").write_text(f"id\n{i}\n")
    (d / "loan_extra.json").write_text("{}")
    (d / "other.csv").write_text("id\n9\n")

    df = (
        spark.read.format("file_listing")
        .option("path", str(d))
        .option("prefix", "loan_")
        .option("mime", "text/csv")
        .option("page_size", "3")
        .load()
    )
    rows = df.collect()
    # prefix AND mime pushed down: other.csv and loan_extra.json excluded
    assert sorted(r.name for r in rows) == [f"loan_{i}.csv" for i in range(7)]
    assert all(r.mime == "text/csv" for r in rows)
    assert all(r.size > 0 and r.modified > 0 for r in rows)
    # pagination -> ceil(7/3) = 3 input partitions (parallel pages)
    assert df.rdd.getNumPartitions() == 3


def test_content_read_matches_bytes(spark, tmp_path):
    _register(spark)
    d = tmp_path / "payloads"
    d.mkdir()
    blob = os.urandom(4096) * 3  # multi-chunk-ish payload
    (d / "loan_a.bin").write_bytes(blob)

    df = (
        spark.read.format("file_listing")
        .option("path", str(d))
        .option("prefix", "loan_")
        .option("with_content", "true")
        .load()
    )
    row = df.collect()[0]
    assert bytes(row.content) == blob
    assert row.size == len(blob)


def test_empty_dir_yields_empty_frame(spark, tmp_path):
    _register(spark)
    d = tmp_path / "empty"
    d.mkdir()
    df = (
        spark.read.format("file_listing").option("path", str(d)).load()
    )
    assert df.count() == 0


def test_streaming_listing_exactly_once(spark, tmp_path):
    """The connector as a STREAMING source: the checkpoint's offset log
    is the processed-file ledger — file 1 is served once in run 1 and
    never again; run 2 serves only the newly-landed file."""
    import os as _os
    import time as _time

    _register(spark)
    d = tmp_path / "stream_landing"
    d.mkdir()
    ckpt = str(tmp_path / "ls_ckpt")
    got: list = []

    def run_once():
        stream = (
            spark.readStream.format("file_listing")
            .option("path", str(d))
            .option("prefix", "loan_")
            .load()
        )
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(lambda df, eid: got.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    f1 = d / "loan_a.csv"
    f1.write_text("id\n1\n")
    _os.utime(f1, (1000.0, 1000.0))
    run_once()
    assert [r.name for r in got] == ["loan_a.csv"]

    f2 = d / "loan_b.csv"
    f2.write_text("id\n2\n")
    _os.utime(f2, (2000.0, 2000.0))
    run_once()
    assert sorted(r.name for r in got) == ["loan_a.csv", "loan_b.csv"]
    assert len(got) == 2  # exactly once: loan_a not re-served

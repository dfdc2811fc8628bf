"""Stream-stream interval join and streaming dedup: results must match
the batch equivalents, and state must be watermark-bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.streaming.joins import (
    dedup_stream,
    interval_join,
)

L_SCHEMA = "user_id long, l_ts timestamp"
R_SCHEMA = "user_id long, r_ts timestamp"


def _write(spark, path, schema, rows):
    spark.createDataFrame(rows, schema.replace("timestamp", "string")).select(
        *[
            F.to_timestamp(c).alias(c) if c.endswith("ts") else F.col(c)
            for c in [f.split(" ")[0] for f in schema.split(", ")]
        ]
    ).coalesce(1).write.mode("append").parquet(path)


def test_interval_join_stream_matches_batch(spark, tmp_path):
    lpath, rpath = str(tmp_path / "l"), str(tmp_path / "r")
    lrows = [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:30:00")]
    rrows = [
        (1, "2024-01-01 00:05:00"),   # within 10m of user 1 -> match
        (1, "2024-01-01 00:20:00"),   # too late -> no match
        (2, "2024-01-01 00:29:00"),   # before left ts -> no match
        (2, "2024-01-01 00:35:00"),   # within -> match
    ]
    _write(spark, lpath, L_SCHEMA, lrows)
    _write(spark, rpath, R_SCHEMA, rrows)

    batch = interval_join(
        spark.read.parquet(lpath), spark.read.parquet(rpath)
    )
    expected = sorted(
        (r["user_id"], str(r["l_ts"]), str(r["r_ts"])) for r in batch.collect()
    )
    assert len(expected) == 2

    ls = spark.readStream.schema(L_SCHEMA).parquet(lpath)
    rs = spark.readStream.schema(R_SCHEMA).parquet(rpath)
    out = []
    q = (
        interval_join(ls, rs)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r["user_id"], str(r["l_ts"]), str(r["r_ts"])) for r in out)
    assert got == expected


def test_dedup_stream_drops_repeats_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "event_id long, ts timestamp"
    _write(spark, src, schema, [(1, "2024-01-01 00:00:01"),
                                (2, "2024-01-01 00:00:02"),
                                (1, "2024-01-01 00:00:03")])
    _write(spark, src, schema, [(2, "2024-01-01 00:00:04"),
                                (3, "2024-01-01 00:00:05")])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = []
    q = (
        dedup_stream(stream, ["event_id"])
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # one row per distinct event_id, duplicates dropped both within and
    # ACROSS micro-batches (state store carries keys between batches)
    assert sorted(r["event_id"] for r in out) == [1, 2, 3]

    # batch fallback = plain dropDuplicates
    batch = dedup_stream(spark.read.parquet(src), ["event_id"])
    assert batch.count() == 3

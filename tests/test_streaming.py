"""Streaming semantics (SURVEY.md §2.9): a real readStream → memory-sink
drive of the windowed aggregations, and the batch-incremental ledger."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_loan_etl_pipeline_spark.streaming.file_source import (
    incremental_batch,
    load_ledger,
    settled_files,
    update_ledger,
)
from airflow_loan_etl_pipeline_spark.streaming.windows import tumbling

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    """Drive the SAME window builder through a real streaming query
    (parquet file source → memory sink) and through batch; results must
    agree (Trigger.AvailableNow ≡ the reference's drain-everything poll).
    """
    src = str(tmp_path / "stream_src")
    rows = [
        ("2024-01-01 00:01:00", 1, 10.0),
        ("2024-01-01 00:04:00", 1, 5.0),
        ("2024-01-01 00:12:00", 2, 7.0),
        ("2024-01-01 00:25:00", 1, 3.0),
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "ts timestamp, user_id long, value double"
    ).parquet(src)
    agg = tumbling(stream, duration="10 minutes", watermark="1 minute")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["w"]["start"].minute, r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = {
        (r["w"]["start"].minute, r["n_events"], r["total_value"])
        for r in tumbling(spark.read.parquet(src), duration="10 minutes").collect()
    }
    assert got == batch == {(0, 2, 15.0), (10, 1, 7.0), (20, 1, 3.0)}


def _write_csv(path: str, rows: list[str], header: str = "loan_id,amount") -> None:
    with open(path, "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write(r + "\n")


def test_incremental_batch_ledger_exactly_once(spark, tmp_path):
    """ST2/F3: each file is consumed exactly once across polls; a second
    poll with no new files yields nothing; late files are picked up."""
    land = str(tmp_path / "landing")
    ledger = str(tmp_path / "ledger.parquet")
    os.makedirs(land)
    schema = T.StructType(
        [T.StructField("loan_id", T.StringType()), T.StructField("amount", T.DoubleType())]
    )
    _write_csv(f"{land}/loan_a.csv", ["L1,100.0", "L2,200.0"])

    data, fresh = incremental_batch(spark, land, ledger, schema, prefix="loan_")
    assert data is not None and data.count() == 2
    update_ledger(spark, ledger, fresh)

    # poll 2: nothing new
    data2, _ = incremental_batch(spark, land, ledger, schema, prefix="loan_")
    assert data2 is None

    # poll 3: one late file arrives; only it is read (multi-file union SET1
    # would apply if several arrived)
    _write_csv(f"{land}/loan_b.csv", ["L3,300.0"])
    data3, fresh3 = incremental_batch(spark, land, ledger, schema, prefix="loan_")
    assert data3 is not None and data3.count() == 1
    assert [r["file_id"] for r in fresh3.collect()] == ["loan_b.csv"]
    update_ledger(spark, ledger, fresh3)
    assert load_ledger(spark, ledger).count() == 2


def test_settle_age_gate(spark, tmp_path):
    """F4: files younger than the settle window are not offered."""
    land = str(tmp_path / "landing2")
    os.makedirs(land)
    _write_csv(f"{land}/loan_new.csv", ["L1,1.0"])
    now = time.time()
    assert settled_files(spark, land, prefix="loan_", min_age_seconds=3600, now=now).count() == 0
    assert settled_files(spark, land, prefix="loan_", min_age_seconds=0, now=now).count() == 1
    # name predicate (F2)
    _write_csv(f"{land}/other.csv", ["L9,9.0"])
    got = settled_files(spark, land, prefix="loan_", min_age_seconds=0, now=now)
    assert [r["file_id"] for r in got.collect()] == ["loan_new.csv"]


def test_streaming_cdc_upsert_sink(spark, tmp_path):
    """ST6 + merge: foreachBatch drives merge_upsert, turning a CDC
    file stream into an incrementally-maintained parquet table —
    exactly-once per batch via the checkpoint, last-writer-wins on the
    key within the table. The composition a 100 TB ingest pipeline
    runs continuously (stream in, upsert out), on plain parquet."""
    import os

    from airflow_loan_etl_pipeline_spark.sources.io import merge_upsert

    land = str(tmp_path / "cdc_in")
    ckpt = str(tmp_path / "cdc_ckpt")
    target = str(tmp_path / "cdc_tbl")
    os.makedirs(land)

    def run_available(spark):
        stream = (
            spark.readStream.schema("k int, v string")
            .option("header", True)
            .csv(land)
        )
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(
                lambda df, eid: merge_upsert(spark, target, df, ["k"])
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    with open(os.path.join(land, "b1.csv"), "w") as f:
        f.write("k,v\n1,a\n2,b\n")
    run_available(spark)
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: "a", 2: "b"}

    # second batch: update key 2, insert key 3; checkpoint replays only
    # the NEW file (exactly-once over the stream)
    with open(os.path.join(land, "b2.csv"), "w") as f:
        f.write("k,v\n2,B\n3,c\n")
    run_available(spark)
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_sla_monitoring_batch_and_streaming(spark, tmp_path):
    """Reference roadmap "Enhance alerts": batch sla_timer fires breach
    handlers and re-raises failures; QuerySLAListener watches every
    micro-batch trigger on the session event bus."""
    import os
    import time as _time

    import pytest

    from airflow_loan_etl_pipeline_spark.streaming.monitor import (
        QuerySLAListener,
        sla_timer,
    )

    # --- batch: breach fires, result stands
    breaches = []
    with sla_timer("slow_job", 0.0, on_breach=lambda n, s: breaches.append((n, s))):
        _time.sleep(0.01)
    assert breaches and breaches[0][0] == "slow_job"

    # --- batch: failure handler fires AND the exception propagates
    fails = []
    with pytest.raises(ValueError):
        with sla_timer("bad_job", 10, on_failure=lambda n, e: fails.append(n)):
            raise ValueError("boom")
    assert fails == ["bad_job"]

    # --- streaming: per-trigger watchdog (sla=0 -> every trigger breaches)
    listener = QuerySLAListener(0.0)
    spark.streams.addListener(listener)
    try:
        land = str(tmp_path / "sla_in")
        os.makedirs(land)
        with open(os.path.join(land, "a.csv"), "w") as f:
            f.write("k,v\n1,a\n")
        q = (
            spark.readStream.schema("k int, v string")
            .option("header", True)
            .csv(land)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, eid: df.count())
            .option("checkpointLocation", str(tmp_path / "sla_ckpt"))
            .queryName("sla_probe")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        deadline = _time.time() + 15
        while not listener.breaches and _time.time() < deadline:
            _time.sleep(0.2)
        assert listener.events, "listener saw no trigger progress"
        assert listener.breaches and listener.breaches[0][0] == "sla_probe"
        assert not listener.failures
    finally:
        spark.streams.removeListener(listener)


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics pinned: an event arriving AFTER the watermark
    has passed its window is DROPPED from the streaming aggregation —
    the bounded-state contract (without it every window stays open
    forever; at 100 TB of history that's an OOM, not a feature)."""
    import os

    from airflow_loan_etl_pipeline_spark.streaming.windows import tumbling

    land = str(tmp_path / "late_in")
    ckpt = str(tmp_path / "late_ckpt")
    os.makedirs(land)
    finalized: list = []

    def run_once():
        stream = (
            spark.readStream.schema("ts timestamp, user_id bigint, value double")
            .option("header", True)
            .csv(land)
        )
        agg = tumbling(stream, duration="10 minutes", watermark="10 minutes")
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, eid: finalized.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    with open(os.path.join(land, "b1.csv"), "w") as f:
        f.write("ts,user_id,value\n2024-01-01 10:05:00,1,1.0\n")
    run_once()  # watermark -> 09:55

    with open(os.path.join(land, "b2.csv"), "w") as f:
        f.write(
            "ts,user_id,value\n"
            "2024-01-01 11:00:00,1,4.0\n"   # advances watermark to 10:50
            "2024-01-01 09:30:00,1,100.0\n" # LATE: 09:30 < 09:55 watermark
        )
    run_once()

    with open(os.path.join(land, "b3.csv"), "w") as f:
        f.write("ts,user_id,value\n2024-01-01 12:00:00,1,1.0\n")
    run_once()  # watermark 11:50 finalizes the 10:00 and 11:00 windows

    by_start = {r.w.start.strftime("%H:%M"): r for r in finalized}
    assert "10:00" in by_start
    assert by_start["10:00"].total_value == 1.0  # late 100.0 was dropped
    assert "09:30" not in by_start and "09:00" not in by_start


def test_observed_metrics_ride_the_action(spark, sf_dir):
    """df.observe computes audit metrics inside the materializing action
    — no second pass over the data (the reference re-counted via
    separate XCom bookkeeping)."""
    from airflow_loan_etl_pipeline_spark.catalog import load_table
    from airflow_loan_etl_pipeline_spark.streaming.monitor import (
        with_quality_observation,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    observed, obs = with_quality_observation(ev, "ev_quality", "value")
    n = observed.count()
    got = obs.get
    assert got["n_rows"] == n
    assert got["n_nulls"] == 0
    assert abs(got["value_sum"]) > 0


def test_streaming_kmv_sketch_maintenance(spark, tmp_path):
    """Incremental KMV sketch maintenance: land documents in two
    micro-batches, merge each batch's sketch into persistent state via
    foreachBatch (kmv_merge), and the final state must equal the
    sketch computed over the whole corpus in one batch — the
    mergeability contract that makes bottom-k sketches streamable."""
    import os

    from airflow_loan_etl_pipeline_spark.operators.dedup import (
        kmv_merge,
        kmv_sketch,
    )

    land = tmp_path / "land"
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    land.mkdir()

    words = [f"w{i}" for i in range(120)]
    batch1 = [(1, " ".join(words[:60]), "a"), (2, " ".join(words[30:90]), "b")]
    batch2 = [(3, " ".join(words[60:120]), "a"), (4, " ".join(words[:30]), "b")]
    all_rows = batch1 + batch2

    def write_batch(rows, name):
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).coalesce(1).write.mode("append").option("header", True).csv(
            str(land)
        )

    def merge_into_state(batch_df, epoch_id):
        sk = kmv_sketch(batch_df, k=16)
        if os.path.isdir(state) and any(
            f.endswith(".parquet") for f in os.listdir(state)
        ):
            prev = spark.read.parquet(state)
            merged = kmv_merge(prev.unionByName(sk), k=16)
        else:
            merged = sk
        # overwrite-into-temp then swap is merge_upsert's job; for the
        # test a plain overwrite of the tiny state table is enough
        merged.cache().count()
        merged.write.mode("overwrite").parquet(state)

    def run_stream():
        stream = (
            spark.readStream.schema("doc_id long, text string, source string")
            .option("header", True)
            .csv(str(land))
        )
        q = (
            stream.writeStream.foreachBatch(merge_into_state)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    write_batch(batch1, "b1")
    run_stream()
    write_batch(batch2, "b2")
    run_stream()

    got = {
        (r.src, r.h) for r in spark.read.parquet(state).collect()
    }
    expected_df = kmv_sketch(
        spark.createDataFrame(
            all_rows, "doc_id long, text string, source string"
        ),
        k=16,
    )
    expected = {(r.src, r.h) for r in expected_df.collect()}
    assert got == expected


def test_telemetry_pipeline_incremental_equals_oneshot(spark, tmp_path):
    """The composed landing→stream→merge pipeline must produce
    bit-identical bars to a one-shot ohlc_bars over all events, even
    when the batch boundary slices through an hour bucket (the
    decomposability contract of ohlc_partial/merge_ohlc)."""
    from airflow_loan_etl_pipeline_spark.operators.timeseries import ohlc_bars
    from airflow_loan_etl_pipeline_spark.plans.telemetry_pipeline import (
        read_bars,
        run_telemetry_pipeline,
    )

    land = tmp_path / "land"
    land.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    rows = []
    eid = 0
    for h in range(3):
        for m in range(0, 60, 7):
            eid += 1
            rows.append(
                (eid, f"2024-01-01 {h:02d}:{m:02d}:00", 1, "m",
                 float((eid * 37) % 100), "")
            )
    schema = (
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    )

    def land_batch(batch_rows):
        df = (
            spark.createDataFrame(batch_rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .drop("props")
        )
        df.coalesce(1).write.mode("append").option("header", True).csv(
            str(land)
        )

    # split MID-hour: first 10 events, then the rest
    land_batch(rows[:10])
    run_telemetry_pipeline(spark, str(land), state, ckpt)
    land_batch(rows[10:])
    run_telemetry_pipeline(spark, str(land), state, ckpt)

    all_df = (
        spark.createDataFrame(rows, schema)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    expected = {
        (r.event_type, r.bar_ts): (
            r.open, r.high, r.low, r.close, r.n_events, r.volume
        )
        for r in ohlc_bars(all_df).collect()
    }
    got = {
        (r.event_type, r.bar_ts): (
            r.open, r.high, r.low, r.close, r.n_events, r.volume
        )
        for r in read_bars(spark, state).collect()
    }
    assert got == expected
    assert len(got) == 3  # three hour buckets


def test_telemetry_fold_is_idempotent_under_replay(spark, tmp_path):
    """foreachBatch is at-least-once: replaying the SAME epoch must be
    a no-op (epoch marker travels atomically with the state swap), and
    a later epoch must still apply."""
    from airflow_loan_etl_pipeline_spark.plans.telemetry_pipeline import (
        fold_batch,
        read_bars,
    )

    state = str(tmp_path / "state")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    )
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    b1 = spark.createDataFrame(
        [(1, t0, 1, "m", 5.0), (2, t0, 1, "m", 7.0)], schema
    )
    assert fold_batch(spark, b1, 0, state) is True
    first = sorted(read_bars(spark, state).collect())
    # replay of epoch 0 (same or stale data) must change nothing
    assert fold_batch(spark, b1, 0, state) is False
    assert sorted(read_bars(spark, state).collect()) == first
    assert read_bars(spark, state).collect()[0].n_events == 2
    # a NEW epoch still applies
    b2 = spark.createDataFrame([(3, t0, 1, "m", 100.0)], schema)
    assert fold_batch(spark, b2, 1, state) is True
    row = read_bars(spark, state).collect()[0]
    assert row.n_events == 3 and row.high == 100.0


def test_available_now_respects_max_files_per_trigger(spark, tmp_path):
    """Backpressure knob: maxFilesPerTrigger bounds each micro-batch to
    one landed file, so AvailableNow drains the backlog as several
    bounded batches instead of one unbounded gulp — the ingestion-
    control analogue of the reference's one-file-at-a-time loop
    (/root/reference/airflow/dags/drive_auto_compress_email.py:265)."""
    land = tmp_path / "land"
    land.mkdir()
    for i in range(4):
        (land / f"f{i}.csv").write_text("user_id,value\n" + f"{i},1.0\n")

    seen = []

    def count_batch(df, epoch_id):
        seen.append((epoch_id, df.count()))

    q = (
        spark.readStream.schema("user_id bigint, value double")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(land))
        .writeStream.foreachBatch(count_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(seen) == 4          # one batch per file
    assert sum(n for _, n in seen) == 4
    assert all(n == 1 for _, n in seen)


def test_streaming_neardup_admission_matches_sequential_replay(
    spark, tmp_path
):
    """Streaming near-dup admission capstone: micro-batches of
    documents screened against the standing corpus via MinHash band
    keys in a foreachBatch loop. Pins (a) cross-batch rejection — a
    near-dup of an ADMITTED doc is 'dup_of_corpus'; (b) within-batch
    clustering — one representative (min id) per dup cluster; (c) the
    state loop — the streaming run admits exactly the set a
    batch-sequential replay of admit_batch admits."""
    import shutil

    from airflow_loan_etl_pipeline_spark.streaming.admission import (
        admit_batch,
    )

    land = tmp_path / "land"
    land.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    decisions = str(tmp_path / "decisions")

    t_a = "alpha beta gamma delta epsilon zeta eta theta"
    t_b = "one two three four five six seven eight"
    t_c = "red green blue yellow purple orange pink white"
    t_d = "north south east west up down left right"
    batches = [
        [(1, t_a), (2, t_a), (3, t_b)],          # 2 dups 1 in-batch
        [(4, t_a), (5, t_c)],                    # 4 dup of corpus
        [(6, t_c), (7, t_c), (8, t_d)],          # 6,7 dups of corpus
    ]

    def write_batch(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").option("header", True).csv(str(land))

    def screen(batch_df, epoch_id):
        out = admit_batch(spark, batch_df, state, batch_tag=epoch_id)
        out.write.mode("append").parquet(decisions)

    def run_stream():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("header", True)
            .csv(str(land))
        )
        q = (
            stream.writeStream.foreachBatch(screen)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for rows in batches:
        write_batch(rows)
        run_stream()

    got = {
        r.doc_id: r.admission
        for r in spark.read.parquet(decisions).collect()
    }
    assert got == {
        1: "admitted",
        2: "dup_in_batch",
        3: "admitted",
        4: "dup_of_corpus",
        5: "admitted",
        6: "dup_of_corpus",
        7: "dup_of_corpus",
        8: "admitted",
    }

    # batch-sequential replay over a FRESH state dir admits the same set
    replay_state = str(tmp_path / "replay_state")
    shutil.rmtree(replay_state, ignore_errors=True)
    replay = {}
    for rows in batches:
        out = admit_batch(
            spark,
            spark.createDataFrame(rows, "doc_id long, text string"),
            replay_state,
        )
        replay.update({r.doc_id: r.admission for r in out.collect()})
    assert replay == got


def test_neardup_admission_idempotent_under_batch_redelivery(
    spark, tmp_path
):
    """foreachBatch retry semantics: if an epoch's state append landed
    but the checkpoint didn't commit, the engine REDELIVERS the batch.
    The replay must produce the identical decisions (not flag its own
    admitted docs as corpus dups) and must not duplicate state keys."""
    from airflow_loan_etl_pipeline_spark.streaming.admission import (
        admit_batch,
    )

    state = str(tmp_path / "state")
    t_a = "alpha beta gamma delta epsilon zeta eta theta"
    t_c = "red green blue yellow purple orange pink white"
    b1 = spark.createDataFrame([(1, t_a)], "doc_id long, text string")
    admit_batch(spark, b1, state, batch_tag=0).collect()

    b2 = spark.createDataFrame(
        [(4, t_a), (5, t_c)], "doc_id long, text string"
    )
    first = {
        r.doc_id: r.admission
        for r in admit_batch(spark, b2, state, batch_tag=1).collect()
    }
    assert first == {4: "dup_of_corpus", 5: "admitted"}
    # simulate redelivery of the SAME epoch after its append landed
    replay = {
        r.doc_id: r.admission
        for r in admit_batch(spark, b2, state, batch_tag=1).collect()
    }
    assert replay == first
    keys = spark.read.parquet(state)
    # no duplicated state rows from the retry
    assert keys.count() == keys.distinct().count()
    # doc 5's keys present exactly once (4 bands)
    assert keys.filter(keys.doc_id == 5).count() == 4


def test_streaming_per_batch_latency_budget(spark, tmp_path):
    """Round 10 (VERDICT r9 item 8): per-batch trigger→commit latency
    for the stateful capstones is a GATED artifact — bench.py records
    it per round, and this budget assertion catches an
    order-of-magnitude regression (an accidental full-history refold,
    a per-batch corpus rescan) at test time. Budgets are deliberately
    generous (test-scale batches run ~1-4 s; budget 30 s) so host
    noise cannot flake the gate while a 10x blowup still fails it."""
    from bench import _batch_latencies_ms
    from airflow_loan_etl_pipeline_spark.plans.telemetry_pipeline import (
        run_telemetry_pipeline,
    )
    from airflow_loan_etl_pipeline_spark.streaming.admission import (
        admit_batch,
    )

    land = tmp_path / "land"
    land.mkdir()
    rows = [
        (i, f"2024-01-01 {i % 24:02d}:{(i * 7) % 60:02d}:00", i % 5, "m",
         float(i % 97))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.repartition(4).write.mode("overwrite").option("header", True).csv(
        str(land)
    )
    q = run_telemetry_pipeline(
        spark, str(land), str(tmp_path / "state"), str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    lat = _batch_latencies_ms(q)
    assert len(lat) >= 2, "expected multiple micro-batches"
    assert max(lat) < 30_000, f"telemetry batch latency blew budget: {lat}"

    doc_land = tmp_path / "docs"
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{i} epsilon") for i in range(60)],
        "doc_id long, text string",
    )
    docs.repartition(4).write.mode("overwrite").parquet(str(doc_land))
    adm_state = str(tmp_path / "adm_state")
    qa = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(str(doc_land))
        .writeStream.foreachBatch(
            lambda b, eid: admit_batch(spark, b, adm_state, batch_tag=eid)
        )
        .option("checkpointLocation", str(tmp_path / "adm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    qa.awaitTermination(300)
    lat_a = _batch_latencies_ms(qa)
    assert len(lat_a) >= 2, "expected multiple admission micro-batches"
    assert max(lat_a) < 30_000, f"admission batch latency blew budget: {lat_a}"


def test_stateful_screen_matches_inmemory_on_replayed_state(spark, tmp_path):
    """Persisted-state admission (round 11, VERDICT r10 item 5): after
    admit_batch replays the standing corpus across TWO batches,
    screening a fresh batch against the PERSISTED admitted_keys table
    equals the in-memory batch variant given the same admitted docs'
    band keys — the parquet round-trip and the state contract add no
    drift."""
    from airflow_loan_etl_pipeline_spark.operators.dedup import (
        band_key_rows,
        minhash_signatures,
    )
    from airflow_loan_etl_pipeline_spark.streaming.admission import (
        admission_decisions,
        admit_batch,
    )

    state = str(tmp_path / "state")
    t_a = "alpha beta gamma delta epsilon zeta eta theta"
    t_b = "one two three four five six seven eight"
    t_c = "red green blue yellow purple orange pink white"
    standing_batches = [
        [(1, t_a), (2, t_a), (3, t_b)],  # admits 1, 3 (2 dup-in-batch)
        [(4, t_a), (5, t_c)],            # admits 5 (4 dup-of-corpus)
    ]
    admitted_ids = set()
    for i, rows in enumerate(standing_batches):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = admit_batch(spark, df, state, batch_tag=i)
        admitted_ids |= {
            r.doc_id for r in out.collect() if r.admission == "admitted"
        }
    assert admitted_ids == {1, 3, 5}

    fresh = spark.createDataFrame(
        [(10, t_a), (11, "totally novel words appear here nine ten"),
         (12, t_c)],
        "doc_id long, text string",
    )
    persisted = spark.read.parquet(state)
    via_state, _, _ = admission_decisions(fresh, persisted)
    got = {r.doc_id: r.admission for r in via_state.collect()}

    standing_docs = spark.createDataFrame(
        [r for rows in standing_batches for r in rows
         if r[0] in admitted_ids],
        "doc_id long, text string",
    )
    in_mem = band_key_rows(minhash_signatures(standing_docs), "doc_id")
    via_mem, _, _ = admission_decisions(fresh, in_mem)
    expect = {r.doc_id: r.admission for r in via_mem.collect()}
    assert got == expect
    assert got[10] == "dup_of_corpus" and got[12] == "dup_of_corpus"
    assert got[11] == "admitted"


def test_stateful_registry_entry_reuses_persisted_state(spark):
    """The registered dedup_incremental_neardup_stateful entry builds
    its state once per fixture and only READS it on later calls — the
    standing corpus is not re-signatured per run."""
    import os

    from airflow_loan_etl_pipeline_spark import registry
    from airflow_loan_etl_pipeline_spark.registry_text import (
        admission_state_dir,
    )

    sf = "/root/testdata/sf0.001"
    fn = registry.QUERIES["dedup_incremental_neardup_stateful"]
    first = {(r.doc_id, r.admission) for r in fn(spark, sf).collect()}
    state_dir = admission_state_dir(sf)
    assert os.path.isdir(state_dir)
    files_before = sorted(
        os.path.join(dp, f)
        for dp, _dn, fs in os.walk(state_dir) for f in fs
    )
    second = {(r.doc_id, r.admission) for r in fn(spark, sf).collect()}
    files_after = sorted(
        os.path.join(dp, f)
        for dp, _dn, fs in os.walk(state_dir) for f in fs
    )
    assert first == second
    assert files_before == files_after


def test_admission_batch_job_count_budget(spark, tmp_path):
    """Round 11 (VERDICT r10 item 7): per-batch admission cost, gated
    on the drift-immune metric — Spark JOB COUNT. The driver-bounded
    fast path (collected screens, union-find clustering, projection
    decisions) runs a steady-state batch in ~18 jobs where the
    distributed formulation took 49; wall-clock budgets flake under
    the measured 1.9-4.7x host drift, job counts do not."""
    from airflow_loan_etl_pipeline_spark.streaming.admission import (
        admit_batch,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{i} epsilon zeta") for i in range(80)]
        + [(1000, "alpha beta gamma delta tok3 epsilon zeta")],
        "doc_id long, text string",
    ).localCheckpoint()
    b1 = docs.filter(F.col("doc_id") % 2 == 0).localCheckpoint()
    b2 = docs.filter(F.col("doc_id") % 2 == 1).localCheckpoint()
    state = str(tmp_path / "state")
    sc = spark.sparkContext
    admit_batch(spark, b1, state, batch_tag=0)  # creates state
    sc.setJobGroup("adm_job_budget", "steady-state admission batch")
    try:
        out = admit_batch(spark, b2, state, batch_tag=1)
        decided = out.count()
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("adm_job_budget")
    assert decided == b2.count()
    assert len(jobs) <= 22, (
        f"admission batch ran {len(jobs)} Spark jobs (budget 22 — the "
        "driver-bounded fast path runs ~18-20; the distributed loop 49)"
    )


def test_admission_pin_skip_guard_is_structural(spark, tmp_path):
    """VERDICT r12 item 10 / ADVICE r12: the pin-skip is keyed off
    explicit plan-class checks on BOTH outputs, so a future edit cannot
    silently break exactly-once. A bare file scan — a LEAF, which the
    old `children().isEmpty()` guard would have waved through — must
    classify as unsafe, and the fast path's actual outputs must
    classify as safe."""
    from airflow_loan_etl_pipeline_spark.streaming import admission as A

    # a parquet read is a leaf but NOT a local relation
    pq = str(tmp_path / "scan")
    spark.range(3).write.parquet(pq)
    scan = spark.read.parquet(pq)
    assert not A._is_local_relation(scan)
    assert A._reads_any_files(scan)

    # driver-local frames classify as safe
    local = spark.createDataFrame([(1, "a")], "id long, s string")
    assert A._is_local_relation(local)
    assert not A._reads_any_files(local)
    assert not A._reads_any_files(spark.range(5).localCheckpoint())

    # the real fast-path outputs satisfy the skip invariant
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        "doc_id long, text string",
    )
    out, admitted_keys, _ = A.admission_decisions(batch, None)
    assert A._is_local_relation(out)
    assert not A._reads_any_files(admitted_keys)


def test_admission_fast_path_equals_distributed_fallback(spark, tmp_path):
    """The driver-bounded fast path and the distributed fallback are
    the SAME admission function: forcing the fallback (caps
    monkeypatched to 0) must produce identical decisions and identical
    admitted state keys on a batch that exercises all three outcomes
    (corpus dup, in-batch dup cluster, clean admit)."""
    from airflow_loan_etl_pipeline_spark.streaming import admission as A

    t_a = "alpha beta gamma delta epsilon zeta eta theta"
    t_b = "one two three four five six seven eight"
    t_c = "red green blue yellow purple orange pink white"
    standing_df = spark.createDataFrame(
        [(100, t_a)], "doc_id long, text string"
    )
    # standing keys as the state loop would persist them
    _dec, standing_keys, _ = A.admission_decisions(standing_df, None)
    standing_keys = standing_keys.localCheckpoint()
    batch = spark.createDataFrame(
        [(1, t_a), (2, t_b), (3, t_b), (4, t_c)],
        "doc_id long, text string",
    )

    def run():
        out, keys, _ = A.admission_decisions(batch, standing_keys)
        return (
            {r["doc_id"]: r["admission"] for r in out.collect()},
            {
                (r["band_id"], r["band_key"], r["doc_id"])
                for r in keys.collect()
            },
        )

    fast_dec, fast_keys = run()
    orig = (A.SCREEN_DRIVER_MAX, A.PAIRS_DRIVER_MAX)
    try:
        A.SCREEN_DRIVER_MAX = 0
        A.PAIRS_DRIVER_MAX = 0
        slow_dec, slow_keys = run()
    finally:
        A.SCREEN_DRIVER_MAX, A.PAIRS_DRIVER_MAX = orig

    assert fast_dec == slow_dec
    assert fast_keys == slow_keys
    assert fast_dec[1] == "dup_of_corpus"
    assert sorted(v for k, v in fast_dec.items() if k in (2, 3)) == [
        "admitted",
        "dup_in_batch",
    ]
    assert fast_dec[4] == "admitted"

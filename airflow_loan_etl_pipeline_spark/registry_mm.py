"""Registry entries: multimodal features, stateful-streaming totals, and
relational breadth (percentiles, date arithmetic, array functions,
full-outer / cross joins).

The multimodal entry drives the Arrow-batched ``mapInPandas`` pipeline
from operators/multimodal.py over real table data (documents text as the
binary payload — the decode stub is deterministic, so the byte-level
features are oracle-checkable in DuckDB). The stateful entry runs a real
Structured Streaming query (``applyInPandasWithState``) with
``Trigger.AvailableNow``: a single micro-batch over a static table makes
the running totals equal a plain GROUP BY, which gives the stateful
execution path a differential oracle.
"""

from __future__ import annotations

import itertools
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.catalog import load_table
from airflow_loan_etl_pipeline_spark.operators.multimodal import extract_features
from airflow_loan_etl_pipeline_spark.registry import query
from airflow_loan_etl_pipeline_spark.streaming.stateful import running_user_totals

# ---------------------------------------------------------------------------
# Multimodal plumbing over a real table (SURVEY.md §7 phase 4)
# ---------------------------------------------------------------------------

@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS asset_id,
           'image' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level asset features via the mapInPandas multimodal pipeline
    (documents text re-encoded as the opaque binary payload). One pass,
    no shuffle; payload column pruned after feature extraction so only
    the small feature rows survive the stage boundary."""
    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = extract_features(assets)
    return feats.select(
        "asset_id",
        "media_type",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "checksum",
    )


# ---------------------------------------------------------------------------
# Stateful streaming with a differential oracle (SURVEY.md §2.9 extension)
# ---------------------------------------------------------------------------

_MEM_NAMES = itertools.count()


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the events table, tolerant of BOTH fixture
    layouts: the driver fixtures ship events.parquet as a single FILE
    (the file source lists a directory, so stream sf_dir with a glob
    selecting just that file), while Spark-written derived datasets
    (the 10x/100x perf sets) ship it as a DIRECTORY of part files —
    stream that directory directly (a name filter on 'events.parquet'
    matches no part FILE and silently yields an empty stream).

    Layout is probed through Spark's Hadoop FileSystem API, not
    ``os.path.isdir``, so a remote ``sf_dir`` (s3a://, hdfs://) with a
    directory-shaped events table is detected correctly instead of
    silently falling into the file-glob branch and streaming empty."""
    events_path = sf_dir.rstrip("/") + "/events.parquet"
    reader = spark.readStream.schema("user_id bigint, value double")
    if _hadoop_isdir(spark, events_path):
        return reader.parquet(events_path)
    return reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)


def _hadoop_isdir(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists and is a directory, per the Hadoop
    FileSystem resolved for the path's scheme (file/s3a/hdfs alike).

    Falls back to ``os.path.isdir`` when the py4j gateway is absent
    (Spark Connect, vendor runtimes) — correct for local paths, which
    are the only kind such a fallback session can stream from anyway
    (same defensive pattern as session.engine_parallelism; ADVICE r8).
    """
    try:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(hconf)
        return bool(
            fs.exists(hpath) and fs.getFileStatus(hpath).isDirectory()
        )
    except Exception:
        import os

        return os.path.isdir(path)


@query(
    "stateful_running_totals",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals computed by the REAL streaming path
    (applyInPandasWithState + AvailableNow). Over a static source this
    is one micro-batch, so the final state equals a plain GROUP BY —
    which is exactly what the oracle asserts. Projection pushes only
    (user_id, value) through the stream, skipping the NANOS ts column.
    """
    from airflow_loan_etl_pipeline_spark.streaming import (
        stream_state_partitions,
    )

    name = f"rt_oracle_{next(_MEM_NAMES)}"
    stream = _events_stream(spark, sf_dir)
    with stream_state_partitions(spark, 8):
        q = (
            running_user_totals(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="rt_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(name).select(
        "user_id", "n_events", F.round("total_value", 2).alias("total_value")
    )


@query(
    "streaming_user_totals",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same running totals as stateful_running_totals, but via Spark's
    NATIVE streaming aggregation (JVM stateful HashAggregate + state
    store) instead of applyInPandasWithState. This is the right tool
    when the state is expressible as built-in aggregates: no per-key
    Arrow round-trip to Python (~10x faster for this shape); reserve
    the Pandas state path for state machines built-ins can't express.
    """
    from airflow_loan_etl_pipeline_spark.streaming import (
        stream_state_partitions,
    )

    name = f"st_native_{next(_MEM_NAMES)}"
    stream = _events_stream(spark, sf_dir)
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    # 8 state partitions: stateful ops disable AQE, so shuffle.partitions
    # becomes the state-store partition count — fixed cost per trigger
    # (measured ~2x wall going 32 -> 8 locally). Frozen per-checkpoint.
    with stream_state_partitions(spark, 8):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="st_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Relational breadth: percentiles, date arithmetic, arrays, outer/cross joins
# ---------------------------------------------------------------------------

@query(
    "lineitem_percentiles",
    oracle="""
    WITH g AS (
        SELECT l_returnflag,
               count(*) AS n_items,
               list_transform(
                   quantile_cont(round(l_extendedprice * 100),
                                 [0.25, 0.5, 0.75]),
                   x -> x / 100.0) AS qs
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_items, CAST(i - 1 AS BIGINT) AS quartile,
           qs[i] AS price_quartile
    FROM g, unnest(generate_series(1, 3)) AS u(i)
    """,
)
def lineitem_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group vs DuckDB
    `quantile_cont`, identical pos = p*(n-1) linear interpolation,
    computed by stats.exact_percentiles_by_value — the counting-sort
    shape: one map-side-combined reduction to a (group, cents)
    frequency table, then rank arithmetic over DISTINCT values only.
    Spark's exact `percentile` aggregate instead buffers every row of a
    group in one task's memory — the 100 TB straggler this avoids; the
    post-reduction frames here are bounded by the price DOMAIN, not the
    row count. Interpolating over integer CENTS keeps every
    intermediate exactly representable, so both engines produce
    bit-identical doubles. At 100 TB with a truly unbounded domain swap
    for `percentile_approx` (t-digest, mergeable partial aggregation;
    benchmarked via event_type_stats_approx). Gate shape is exploded to
    one row per (l_returnflag, quartile) — driver-safe scalar rows.
    ``n_items`` counts NON-NULL measure values (percentile semantics,
    matching DuckDB's count over the quantile input), not raw group
    rows — identical on TPC-H where l_extendedprice is NOT NULL, but
    the distinction matters if reused on nullable columns (ADVICE r4
    item 3)."""
    from airflow_loan_etl_pipeline_spark.operators.stats import (
        exact_percentiles_by_value,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).alias("cents"),
    )
    pct = exact_percentiles_by_value(
        li, "cents", (0.25, 0.5, 0.75), group_cols=("l_returnflag",)
    )
    return pct.select(
        "l_returnflag",
        F.col("n").alias("n_items"),
        F.posexplode(F.expr("transform(bs, x -> x / 100.0)")).alias(
            "quartile", "price_quartile"
        ),
    ).withColumn("quartile", F.col("quartile").cast("bigint"))


@query(
    "orders_date_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate::DATE AS od,
           year(o_orderdate) AS y,
           quarter(o_orderdate) AS qtr,
           weekofyear(o_orderdate) AS iso_week,
           datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since_95,
           (o_orderdate + INTERVAL 3 MONTH)::DATE AS plus_3m,
           date_trunc('month', o_orderdate)::DATE AS month_start,
           last_day(o_orderdate::DATE) AS month_end
    FROM orders
    """,
)
def orders_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function surface (SURVEY.md §2.8 D1-D4 extension): extract,
    diff, offset (month-end clamped on both engines), trunc, last_day.
    Pure projection — whole-stage codegen, no shuffle."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "od", F.to_date("o_orderdate")
    )
    return o.select(
        "o_orderkey",
        "od",
        F.year("od").alias("y"),
        F.quarter("od").alias("qtr"),
        F.weekofyear("od").alias("iso_week"),
        F.datediff("od", F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.add_months("od", 3).alias("plus_3m"),
        F.trunc("od", "month").alias("month_start"),
        F.last_day("od").alias("month_end"),
    )


@query(
    "embeddings_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(i - 1 AS BIGINT) AS pos,
           embedding[1:3][i] AS elem,
           embedding[-1] AS last_elem,
           list_min(embedding) AS min_elem
    FROM embeddings, unnest(generate_series(1, 3)) AS u(i)
    """,
)
def embeddings_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over ArrayType(Float): slice, negative
    element_at, min. Element passthrough (no float arithmetic) so the
    comparison is exact. Gate shape explodes the 3-element slice to
    one row per position — driver-safe scalar rows."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.posexplode(F.slice("embedding", 1, 3)).alias("pos", "elem"),
        F.element_at("embedding", -1).alias("last_elem"),
        F.array_min("embedding").alias("min_elem"),
    ).withColumn("pos", F.col("pos").cast("bigint"))


@query(
    "acctbal_full_outer",
    oracle="""
    WITH poor AS (
        SELECT c_nationkey AS nk, count(*) AS n_poor_cust
        FROM customer WHERE c_acctbal < -900 GROUP BY c_nationkey
    ), rich AS (
        SELECT s_nationkey AS nk, count(*) AS n_rich_supp
        FROM supplier WHERE s_acctbal > 9900 GROUP BY s_nationkey
    )
    SELECT coalesce(poor.nk, rich.nk) AS nation_key,
           n_poor_cust, n_rich_supp
    FROM poor FULL OUTER JOIN rich ON poor.nk = rich.nk
    """,
)
def acctbal_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two sparse per-nation aggregates (disjoint key
    sets force nulls on BOTH sides). Aggregate-before-join keeps the
    shuffle tiny: the join inputs are ≤ |nations| rows regardless of
    fact-table scale."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    poor = (
        cust.filter(F.col("c_acctbal") < -900)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_poor_cust"))
    )
    rich = (
        supp.filter(F.col("s_acctbal") > 9900)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_rich_supp"))
    )
    joined = poor.join(rich, on="nk", how="full_outer")
    # `on="nk"` coalesces the key for us in full-outer joins.
    return joined.select(
        F.col("nk").alias("nation_key"), "n_poor_cust", "n_rich_supp"
    )


@query(
    "region_cross_pairs",
    oracle="""
    SELECT a.r_name AS name_a, b.r_name AS name_b
    FROM region a CROSS JOIN region b
    WHERE a.r_name < b.r_name
    """,
)
def region_cross_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered region pairs via cross join (|R|² is tiny; Spark plans
    BroadcastNestedLoopJoin). The guard r_name < r_name' halves the
    square and removes self-pairs."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("name_a"))
    b = r.select(F.col("r_name").alias("name_b"))
    return a.crossJoin(b).filter(F.col("name_a") < F.col("name_b"))


@query(
    "user_value_ewma",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(list_reduce(list(value ORDER BY ts, value),
                             (acc, x) -> 0.3 * x + 0.7 * acc), 4) AS ewma
    FROM events
    GROUP BY user_id
    """,
)
def user_value_ewma_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (applyInPandas) surface: recursive per-user EWMA —
    each output depends on the previous OUTPUT, so no window frame can
    express it. The DuckDB oracle evaluates the identical left fold
    with list_reduce over the time-ordered value list; both engines run
    the same IEEE sequence, so round(…,4) matches exactly."""
    from airflow_loan_etl_pipeline_spark.operators.timeseries import (
        user_value_ewma,
    )

    ev = load_table(spark, sf_dir, "events")
    out = user_value_ewma(ev)
    return out.select("user_id", "n_events", F.round("ewma", 4).alias("ewma"))


@query(
    "events_props_variant_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(cast(json_extract_string(props, '$.k') AS int)) AS BIGINT) AS sum_k,
           max(cast(json_extract_string(props, '$.k') AS int)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def events_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's native VARIANT type:
    parse_json once into the binary-encoded open type, typed
    variant_get extraction, then aggregate — the at-scale JSON path
    (VARIANT avoids per-expression string re-parsing and is the
    shredding-ready storage answer; get_json_object re-parses the
    string for every extraction). Oracle uses DuckDB's JSON extraction
    over the same column."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.selectExpr(
        "event_type",
        "variant_get(parse_json(props), '$.k', 'int') AS k",
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


@query(
    "lineitem_equidepth_hist",
    oracle="""
    WITH c AS (SELECT round(l_extendedprice * 100) AS cents FROM lineitem),
    b AS (SELECT quantile_cont(cents,
              [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs FROM c)
    SELECT (CASE WHEN cents >= bs[1] THEN 1 ELSE 0 END)
         + (CASE WHEN cents >= bs[2] THEN 1 ELSE 0 END)
         + (CASE WHEN cents >= bs[3] THEN 1 ELSE 0 END)
         + (CASE WHEN cents >= bs[4] THEN 1 ELSE 0 END)
         + (CASE WHEN cents >= bs[5] THEN 1 ELSE 0 END)
         + (CASE WHEN cents >= bs[6] THEN 1 ELSE 0 END)
         + (CASE WHEN cents >= bs[7] THEN 1 ELSE 0 END)
         + (CASE WHEN cents >= bs[8] THEN 1 ELSE 0 END)
         + (CASE WHEN cents >= bs[9] THEN 1 ELSE 0 END) AS bucket,
           count(*) AS n_rows,
           min(cents) / 100.0 AS bucket_min,
           max(cents) / 100.0 AS bucket_max
    FROM c, b GROUP BY 1
    """,
)
def lineitem_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram the scale-correct way: exact
    interpolated boundary values from the hierarchical counting sort
    (stats._by_value_frames -- LAZY, no collect() at plan-construction
    time, no single-buffer exact `percentile`), and the per-bucket
    count/min/max assembled from the SAME two level frames
    (stats.equidepth_histogram): non-candidate blocks land whole in one
    bucket (provably -- a straddling block must hold the boundary's
    adjacent order statistics, which makes it a candidate), candidate
    blocks split per exact value. Exchange reuse shares the two
    column-pruned lineitem scans across the boundary and histogram
    branches, so the WHOLE query is two scans, zero sorts, zero
    collect()s. The naive `ntile(10) OVER (ORDER BY price)`
    formulation is a total sort through one partition at 100 TB.
    Interpolation runs over integer cents so boundaries are bit-exact
    across engines.
    """
    from airflow_loan_etl_pipeline_spark.operators.stats import (
        equidepth_histogram,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).alias("cents")
    )
    h = equidepth_histogram(li, "cents", tuple(i / 10 for i in range(1, 10)))
    return h.select(
        "bucket",
        "n_rows",
        (F.col("v_min") / F.lit(1e2)).alias("bucket_min"),
        (F.col("v_max") / F.lit(1e2)).alias("bucket_max"),
    )


def _blockhash_oracle() -> str:
    """Block-parity hash over the ASCII text (byte-identical to the
    UTF-8 payload Spark hashes), pairs by BRUTE-FORCE hamming — also
    re-proving the banded generator's pigeonhole losslessness."""
    terms = " + ".join(
        "(('0x' || substr(md5(substr(text, 1 + {b} * blk, blk)), 1, 1))::BIGINT"
        " % 2) * {w}".format(b=b, w=1 << b)
        for b in range(32)
    )
    return f"""
    WITH sized AS (SELECT doc_id,  text,
            greatest(cast(ceil(length(text) / 32) AS int), 1) AS blk
        FROM documents),
    h AS (SELECT doc_id, {terms} AS phash FROM sized)
    SELECT l.doc_id AS asset_a, r.doc_id AS asset_b,
           cast(bit_count(xor(l.phash, r.phash)) AS int) AS hamming
    FROM h l JOIN h r ON l.doc_id < r.doc_id
    WHERE bit_count(xor(l.phash, r.phash)) <= 3
    """


@query("asset_dup_pairs", oracle=_blockhash_oracle())
def asset_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset-level near-dup pairs over opaque binary payloads: codec-free
    block-parity hash (multimodal.block_hash) + the banded hamming join
    shared with SimHash. The oracle recomputes pairs by brute force, so
    this entry also certifies the banding is lossless."""
    from airflow_loan_etl_pipeline_spark.operators.dedup import hamming_pairs
    from airflow_loan_etl_pipeline_spark.operators.multimodal import block_hash

    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    sig = block_hash(assets)
    pairs = hamming_pairs(sig, id_col="asset_id", hash_col="phash")
    return pairs.select(
        F.col("doc_a").alias("asset_a"),
        F.col("doc_b").alias("asset_b"),
        "hamming",
    )


@query("lineitem_percentiles_approx")  # rows-only: t-digest != DuckDB's
def lineitem_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB quantile path the exact variant's docstring points
    at: percentile_approx (t-digest-style mergeable sketch — map-side
    partial sketches merge associatively, so the shuffle carries one
    sketch per group per partition instead of sorting values). No SQL
    oracle by design (sketch internals differ across engines); the
    driver records the weaker rows-only check, and the accuracy bound
    vs the exact interpolated percentiles is pinned by a unit test.
    Gate shape exploded to (l_returnflag, quartile) scalar rows."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.expr(
            "transform(approx_percentile(l_extendedprice,"
            " array(0.25D, 0.5D, 0.75D), 1000), x -> round(x, 2))"
        ).alias("price_quartiles_approx"),
    )
    return g.select(
        "l_returnflag",
        "n_items",
        F.posexplode("price_quartiles_approx").alias(
            "quartile", "price_quartile_approx"
        ),
    ).withColumn("quartile", F.col("quartile").cast("bigint"))


@query("audio_energy_windows")  # rows-only: no PCM16 decode in ANSI SQL
def audio_energy_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window RMS/peak energy over PCM16-interpreted payloads
    (documents text bytes as the deterministic fixture waveform) — the
    REAL numpy decode path of the audio leg; rows-only by design, DSP
    semantics pinned by the synthesized-sine unit test."""
    from airflow_loan_etl_pipeline_spark.operators.multimodal import (
        audio_energy_windows,
    )

    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("audio").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return audio_energy_windows(assets, window_samples=64)


@query(
    "lineitem_2d_density_grid",
    oracle="""
    WITH c AS (SELECT round(l_extendedprice * 100) AS pc,
                      CAST(l_quantity AS BIGINT) AS q
               FROM lineitem),
         bp AS (SELECT quantile_cont(pc, [0.25, 0.5, 0.75]) AS pbs,
                       quantile_cont(q, [0.25, 0.5, 0.75]) AS qbs
                FROM c)
    SELECT (CASE WHEN pc >= pbs[1] THEN 1 ELSE 0 END)
         + (CASE WHEN pc >= pbs[2] THEN 1 ELSE 0 END)
         + (CASE WHEN pc >= pbs[3] THEN 1 ELSE 0 END) AS price_band,
           (CASE WHEN q >= qbs[1] THEN 1 ELSE 0 END)
         + (CASE WHEN q >= qbs[2] THEN 1 ELSE 0 END)
         + (CASE WHEN q >= qbs[3] THEN 1 ELSE 0 END) AS qty_band,
           count(*) AS n_rows,
           round(min(pc) / 100.0, 2) AS band_price_min,
           round(max(pc) / 100.0, 2) AS band_price_max
    FROM c, bp GROUP BY 1, 2
    """,
)
def lineitem_2d_density_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D equi-depth density grid (price quartile x quantity
    quartile) -- the joint-distribution view behind z-order layout
    choices and the scatter-density dashboards. Same scale shape as the
    1-D equi-depth histogram: LAZY counting-sort boundary frames
    (stats.exact_percentiles_by_value -- no single-buffer exact
    percentile, no collect() at plan-construction time) broadcast onto
    the fact scan, codegen bucketing, a 16-cell count -- never an ntile
    sort. BOTH axes' boundary sets come from ONE melted
    (axis, value) frequency reduction -- exact_percentiles_by_value
    with group_cols=("_axis",) computes the price and quantity
    quartiles in a single scan + domain-bounded shuffle, pivoted to a
    one-row (pbs, qbs) broadcast -- so the whole query is two scans
    (melted boundary scan + joint bucketing scan), down from four
    independent ones.
    """
    from airflow_loan_etl_pipeline_spark.operators.stats import (
        exact_percentiles_by_value,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).alias("pc"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    probs = (0.25, 0.5, 0.75)
    melted = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("pc").alias("_axis"),
                    F.col("pc").cast("double").alias("v"),
                ),
                F.struct(
                    F.lit("q").alias("_axis"),
                    F.col("q").cast("double").alias("v"),
                ),
            )
        ).alias("s")
    ).select("s._axis", "s.v")
    both = exact_percentiles_by_value(
        melted, "v", probs, group_cols=("_axis",)
    )
    bp = both.groupBy().agg(
        F.max(F.when(F.col("_axis") == "pc", F.col("bs"))).alias("pbs"),
        F.max(F.when(F.col("_axis") == "q", F.col("bs"))).alias("qbs"),
    )
    pband = sum(
        (
            F.when(F.col("pc") >= F.element_at("pbs", i + 1), 1).otherwise(0)
            for i in range(3)
        ),
        F.lit(0),
    )
    qband = sum(
        (
            F.when(F.col("q") >= F.element_at("qbs", i + 1), 1).otherwise(0)
            for i in range(3)
        ),
        F.lit(0),
    )
    return (
        li.crossJoin(F.broadcast(bp))
        .select(pband.alias("price_band"), qband.alias("qty_band"), "pc")
        .groupBy("price_band", "qty_band")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("pc") / 100.0, 2).alias("band_price_min"),
            F.round(F.max("pc") / 100.0, 2).alias("band_price_max"),
        )
    )

"""Registry entries: windowed event-time analytics, pivot, statistical
aggregates, and the as-of join — validated in batch mode against the
oracle (the same window builders serve the streaming path,
streaming/windows.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.catalog import load_table
from airflow_loan_etl_pipeline_spark.operators.asof import (
    asof_join,
    asof_join_forward,
)
from airflow_loan_etl_pipeline_spark.registry import query
from airflow_loan_etl_pipeline_spark.streaming.windows import session, sliding


@query(
    "events_sliding_10m_5m",
    oracle="""
    SELECT bucket_start, event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM (
        SELECT cast(floor(epoch(ts) / 300) * 300 - 300 * k AS bigint) AS bucket_start,
               event_type, value, epoch(ts) AS e
        FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
    )
    WHERE e >= bucket_start AND e < bucket_start + 600
    GROUP BY 1, 2
    """,
)
def events_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min window, 5 min slide): each event lands in
    two windows. Oracle replicates via the offset-unnest identity."""
    ev = load_table(spark, sf_dir, "events")
    out = sliding(ev, duration="10 minutes", slide="5 minutes", keys=["event_type"])
    return out.select(
        F.col("w.start").cast("long").alias("bucket_start"),
        "event_type",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )


@query(
    "events_session_5m",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    islands AS (
        SELECT user_id, ts, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM ordered
    )
    SELECT user_id,
           epoch(min(ts)) AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM islands GROUP BY user_id, sid
    """,
)
def events_session_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute gap) per user. The oracle is the
    classic lag/gap-island formulation; F.session_window merges events
    strictly closer than the gap, hence ``>=`` in the oracle's break."""
    ev = load_table(spark, sf_dir, "events")
    out = session(ev, gap="5 minutes", keys=["user_id"])
    return out.select(
        "user_id",
        F.col("w.start").cast("double").alias("session_start"),
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )


@query(
    "orders_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
)
def orders_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (required at scale — without it
    Spark runs an extra distinct-scan to discover pivot values)."""
    piv = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("O", "F", "P")],
    )


@query(
    "event_type_stats",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           round(quantile_cont(value, 0.5), 2) AS median_value,
           round(avg(value), 2) AS mean_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY event_type
    """,
)
def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation + exact continuous percentile. (The 100 TB
    variants are approx_count_distinct / percentile_approx — kept as
    rows-only ops since sketches aren't oracle-reproducible.)"""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.percentile("value", F.lit(0.5)), 2).alias("median_value"),
        F.round(F.avg("value"), 2).alias("mean_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


@query("event_type_stats_approx")
def event_type_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based scale variants of event_type_stats (HLL + KLL).
    Rows-only check: sketch results are engine-specific by design."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("n_users_approx"),
        F.percentile_approx("value", 0.5).alias("median_value_approx"),
    )


@query(
    "events_asof_click_view",
    oracle="""
    WITH a AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    b AS (SELECT user_id, ts, max(value) AS bval FROM events
          WHERE event_type = 'view' GROUP BY user_id, ts)
    SELECT a.event_id,
           epoch(a.ts) AS click_ts,
           epoch(b.ts) AS view_ts,
           round(b.bval, 2) AS view_value
    FROM a ASOF JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)
def events_asof_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's most recent earlier
    view. Oracle is DuckDB's native ASOF JOIN; the right side is
    pre-deduped per (user, ts) so ties are deterministic."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("bval"))
    )
    out = asof_join(
        clicks, views, key_cols=["user_id"], left_ts="ts", right_ts="ts",
        right_value_cols=["bval"],
    )
    return out.select(
        "event_id",
        F.col("ts").cast("double").alias("click_ts"),
        F.col("asof_ts").cast("double").alias("view_ts"),
        F.round("asof_bval", 2).alias("view_value"),
    )


@query(
    "events_interval_join",
    oracle="""
    SELECT c.user_id,
           c.ts AS l_ts,
           v.ts AS r_ts
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON v.user_id = c.user_id
     AND v.ts >= c.ts
     AND v.ts <= c.ts + INTERVAL 2 HOUR
    """,
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch path of streaming/joins.interval_join (click→view within
    2 h, same user): identical operator code serves the stream-stream
    symmetric hash join and this range-condition batch join, so the
    oracle pins the semantics both run."""
    from airflow_loan_etl_pipeline_spark.streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("r_ts")
    )
    return interval_join(clicks, views, within="2 hours", watermark="4 hours")


@query(
    "events_asof_next_purchase",
    oracle="""
    WITH a AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    b AS (SELECT user_id, ts, max(value) AS bval FROM events
          WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT a.event_id,
           epoch(a.ts) AS click_ts,
           epoch(nx.ts) AS purchase_ts,
           round(nx.bval, 2) AS purchase_value
    FROM a JOIN LATERAL (
        SELECT b.ts, b.bval FROM b
        WHERE b.user_id = a.user_id AND b.ts >= a.ts
        ORDER BY b.ts ASC LIMIT 1
    ) nx ON true
    """,
)
def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click matched to the user's next (>=)
    purchase — next-event attribution via the mirrored union+window
    composition (one shuffle, no range expansion). Oracle is a LATERAL
    first-row lookup; right side pre-deduped per (user, ts)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("bval"))
    )
    out = asof_join_forward(
        clicks, purchases, key_cols=["user_id"], left_ts="ts", right_ts="ts",
        right_value_cols=["bval"],
    )
    return out.select(
        "event_id",
        F.col("ts").cast("double").alias("click_ts"),
        F.col("asof_ts").cast("double").alias("purchase_ts"),
        F.round("asof_bval", 2).alias("purchase_value"),
    )

"""Registry entries: additional relational breadth — HAVING, CASE
bucketing, string/array scalar functions, grouping sets, correlated
aggregates, range join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.catalog import load_table
from airflow_loan_etl_pipeline_spark.registry import query


@query(
    "orders_having",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS loan_count
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    HAVING count(*) >= 500
    """,
)
def orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("loan_count"))
        .filter(F.col("loan_count") >= 500)
    )


@query(
    "price_buckets",
    oracle="""
    SELECT cast(floor(o_totalprice / 50000) AS bigint) AS bucket,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders GROUP BY 1
    """,
)
def price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram bucketing via floor-division (M1-style arithmetic)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("bucket", F.floor(F.col("o_totalprice") / 50000))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query(
    "customer_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_mktsegment, 'A', '_') AS seg_repl,
           concat(c_mktsegment, '#', cast(c_nationkey AS varchar)) AS seg_tag,
           CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one
    FROM customer
    """,
)
def customer_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR1-style scalar string surface (upper/length/substr/replace/
    concat/LIKE) — all codegen'd natives."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_replace(F.col("c_mktsegment"), "A", "_").alias("seg_repl"),
        F.concat_ws("", F.col("c_mktsegment"), F.lit("#"),
                    F.col("c_nationkey").cast("string")).alias("seg_tag"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
    )


@query(
    "orders_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS loan_count,
           round(sum(o_totalprice), 2) AS total_amount
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL surface (Catalyst expands to
    one Expand + single aggregate — not three scans)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(1) AS loan_count,
               round(sum(o_totalprice), 2) AS total_amount
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "orders_above_customer_avg",
    oracle="""
    SELECT o.o_orderkey
    FROM orders o
    JOIN (SELECT o_custkey, avg(o_totalprice) AS avg_price
          FROM orders GROUP BY o_custkey) a
      ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > a.avg_price * 1.5
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate pattern (orders 50% above their customer's
    mean), decorrelated to groupBy + self-join — the shape Catalyst
    rewrites correlated scalar subqueries into anyway."""
    o = load_table(spark, sf_dir, "orders")
    avg = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.join(avg, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("avg_price") * 1.5)
        .select("o_orderkey")
    )


@query(
    "embedding_vector_stats",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_dot_product(v, v)), 6) AS l2_norm,
           round(list_aggregate(v, 'sum') / len(v), 6) AS mean_elem,
           round(list_aggregate(v, 'max'), 6) AS max_elem,
           len(v) AS dim
    FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings)
    """,
)
def embedding_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the embedding column: norms, moments
    — pure projections over ArrayType, no shuffle."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.expr("transform(embedding, x -> cast(x AS double))")
    )
    dot = (
        "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0.0 AS double), "
        "(acc, w) -> acc + w)"
    )
    return e.select(
        "vec_id",
        F.round(F.expr(f"sqrt({dot})"), 6).alias("l2_norm"),
        F.round(
            F.expr("aggregate(v, cast(0.0 AS double), (acc, x) -> acc + x)")
            / F.size("v"),
            6,
        ).alias("mean_elem"),
        F.round(F.array_max("v"), 6).alias("max_elem"),
        F.size("v").alias("dim"),
    )


@query(
    "events_range_join",
    oracle="""
    WITH ranges AS (
        SELECT * FROM (VALUES
            ('tiny',   0.0,   10.0),
            ('small', 10.0,   50.0),
            ('mid',   50.0,  200.0),
            ('large', 200.0, 1e9)
        ) AS t(tier, lo, hi)
    )
    SELECT r.tier, count(*) AS n_events, round(sum(e.value), 2) AS total_value
    FROM events e JOIN ranges r ON e.value >= r.lo AND e.value < r.hi
    GROUP BY r.tier
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join against a tier dimension. Small side broadcasts
    → BroadcastNestedLoopJoin with the band predicate; the 100 TB path
    for large range dims is bucketize-then-equi-join (see asof.py for
    the same reasoning applied to time)."""
    ev = load_table(spark, sf_dir, "events")
    ranges = ev.sparkSession.createDataFrame(
        [("tiny", 0.0, 10.0), ("small", 10.0, 50.0),
         ("mid", 50.0, 200.0), ("large", 200.0, 1e9)],
        "tier string, lo double, hi double",
    )
    joined = ev.join(
        F.broadcast(ranges),
        on=[F.col("value") >= F.col("lo"), F.col("value") < F.col("hi")],
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )

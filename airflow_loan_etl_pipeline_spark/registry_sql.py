"""Registry entries exercising the engine's SQL surface (spark.sql over
registered views) with TPC-H-shaped multi-join analytics, plus the
skew-salting pattern for hot aggregation keys.

The reference never exposes SQL (its one query is DataFrame-API,
/root/reference/airflow/include/loan_spark_etl.py:91-131), but the
engine's users get `spark.sql` for free once the catalog registers the
star-schema views — these entries pin that path and its Catalyst plans
(join reordering, broadcast selection, pushdown through views).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.catalog import load_table, register_views
from airflow_loan_etl_pipeline_spark.registry import query

_Q3 = """
SELECT o.o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderpriority
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

_Q5 = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
               AND s.s_nationkey = c.c_nationkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name ASC
"""

_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.09
  AND l_quantity < 25
"""


@query("q3_shipping_priority", oracle=_Q3)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape via spark.sql: selective dim filter → two fact
    joins → grouped revenue → top-k. Catalyst broadcasts the filtered
    customer side and plans TakeOrderedAndProject for the LIMIT; the
    o_orderdate/l_shipdate predicates push to the parquet scans."""
    register_views(spark, sf_dir)
    return spark.sql(_Q3)


@query("q5_local_supplier_volume", oracle=_Q5)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape via spark.sql: six-table snowflake join with a
    non-FK theta edge (supplier nation = customer nation). Region/nation
    broadcast; AQE reorders/demotes the remaining joins by runtime
    stats."""
    register_views(spark, sf_dir)
    return spark.sql(_Q5)


@query("q6_forecast_revenue", oracle=_Q6)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero shuffles beyond
    the single-row final agg — the canonical pushdown/codegen probe. At
    100 TB this is the query where partition pruning on a
    date-partitioned layout pays off most."""
    register_views(spark, sf_dir)
    return spark.sql(_Q6)


@query(
    "salted_event_type_counts",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def salted_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation: `event_type` has very few
    distinct values, so a single groupBy concentrates each key's entire
    volume into one reducer task. Phase 1 salts the key with a random
    shard (key, salt) — distributing each hot key across SALT tasks for
    the heavy partial fold; phase 2 merges the ≤ |keys|·SALT partials.
    Results are identical to the direct groupBy (the oracle); only the
    shuffle distribution changes. At 100 TB this is the pattern for any
    power-law key — AQE's skew handling covers JOINS, but a skewed
    aggregation needs the salt (or a mergeable sketch) explicitly.
    """
    ev = load_table(spark, sf_dir, "events")
    SALT = 16
    salted = ev.withColumn("_salt", (F.rand(seed=7) * SALT).cast("int"))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pc"),
        F.sum("value").alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pc").alias("n_events"),
        F.round(F.sum("pv"), 2).alias("total_value"),
    )

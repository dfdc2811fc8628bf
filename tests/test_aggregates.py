from __future__ import annotations

from pyspark.sql import types as T

from airflow_loan_etl_pipeline_spark.operators.aggregates import grouped_metrics

SCHEMA = T.StructType(
    [
        T.StructField("g", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def test_grouped_metrics_counts_and_sums(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None), (None, 4.0)], SCHEMA
    )
    rows = {r["g"]: r for r in grouped_metrics(df, ["g"]).collect()}
    assert rows["a"]["loan_count"] == 2 and rows["a"]["total_amount"] == 3.0
    assert rows["b"]["loan_count"] == 1 and rows["b"]["total_amount"] is None
    assert rows[None]["loan_count"] == 1  # count(lit(1)) counts null-key rows


def test_missing_group_cols_fall_back_to_global(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], SCHEMA)
    out = grouped_metrics(df, ["no_such_col"]).collect()
    assert len(out) == 1
    assert out[0]["loan_count"] == 2
    assert out[0]["total_amount"] == 3.0


def test_missing_amount_col_yields_null_sum(spark):
    df = spark.createDataFrame([("a", 1.0)], SCHEMA)
    out = grouped_metrics(df, ["g"], amount_col="nope").collect()
    assert out[0]["total_amount"] is None


def test_sum_of_counts_equals_row_count(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    aggs = grouped_metrics(orders, ["o_orderstatus"], amount_col="o_totalprice")
    assert sum(r["loan_count"] for r in aggs.collect()) == orders.count()


def test_merge_aggregates_equals_full_reaggregate(spark):
    from airflow_loan_etl_pipeline_spark.operators.aggregates import (
        merge_aggregates,
    )

    old = spark.createDataFrame(
        [("a", 3, 30.0, 1.0, 9.0), ("b", 2, 20.0, 2.0, 8.0)],
        "k string, n long, total double, lo double, hi double",
    )
    delta = spark.createDataFrame(
        [("b", 1, 5.0, 0.5, 3.0), ("c", 4, 40.0, 4.0, 10.0)],
        "k string, n long, total double, lo double, hi double",
    )
    out = {
        r.k: r
        for r in merge_aggregates(
            old, delta, ["k"], sum_cols=("n", "total"),
            min_cols=("lo",), max_cols=("hi",),
        ).collect()
    }
    assert out["a"].n == 3 and out["a"].total == 30.0
    assert out["b"].n == 3 and out["b"].total == 25.0
    assert out["b"].lo == 0.5 and out["b"].hi == 8.0  # min/max merge
    assert out["c"].n == 4 and out["c"].hi == 10.0

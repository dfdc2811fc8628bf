"""Multi-key aggregation with global fallback (SURVEY.md A3-A6) plus
rollup/cube/pivot breadth.

Reference: groupBy over whichever of the preferred grouping columns
exist, count + sum, global aggregate when none do
(/root/reference/airflow/include/loan_spark_etl.py:91-131). All of this
plans to partial+final ``HashAggregateExec`` — map-side combine before
the shuffle — which is exactly the shape that scales.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _metrics(amount_col: str) -> list[Column]:
    return [
        F.count(F.lit(1)).alias("loan_count"),
        F.sum(F.col(amount_col)).alias("total_amount"),
    ]


def grouped_metrics(
    df: DataFrame,
    group_cols: list[str],
    amount_col: str = "amount",
) -> DataFrame:
    """A3 + A4: count/sum by the grouping columns that actually exist;
    global single-row summary when none do (loan_spark_etl.py:110-120).
    Deterministic output order by the group columns (T2)."""
    present = [c for c in group_cols if c in df.columns]
    amount = (
        F.col(amount_col).cast("double")
        if amount_col in df.columns
        else F.lit(None).cast("double")
    )
    df = df.withColumn("_amount_num", amount)
    if not present:
        return df.agg(*_metrics("_amount_num"))
    return df.groupBy(*present).agg(*_metrics("_amount_num")).orderBy(*present)


def rollup_metrics(df: DataFrame, group_cols: list[str], amount_col: str) -> DataFrame:
    """Hierarchical subtotals over the grouping keys (§7 phase 2)."""
    return df.rollup(*group_cols).agg(*_metrics(amount_col))


def cube_metrics(df: DataFrame, group_cols: list[str], amount_col: str) -> DataFrame:
    """All grouping-set combinations (§7 phase 2)."""
    return df.cube(*group_cols).agg(*_metrics(amount_col))

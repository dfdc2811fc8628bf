"""Top-k operators (SURVEY.md T1-T3 + per-group variant).

``orderBy(...).limit(k)`` plans to ``TakeOrderedAndProject`` — a
per-partition heap followed by a driver-side merge of k·n_partitions
rows; no full sort, no full shuffle. That is the right physical shape at
any scale, so the implementation is deliberately just the declarative
form. Reference: loan_spark_etl.py:60-63 (top-1 mode pick), :211-214
(top-10 report).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k. Pass explicit tie-break columns for determinism —
    the reference's top-1 is tie-nondeterministic (SURVEY.md §7 risk a)."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    k: int,
    partition_cols: list[str],
    order: list[Column],
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k via ``row_number`` (§2.5 extension). One shuffle on
    the partition keys; with AQE skew handling for hot groups."""
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )

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
from airflow_loan_etl_pipeline_spark.operators.cache_scope import (
    materialize_consistent as _consistent,
)
from airflow_loan_etl_pipeline_spark.session import (
    engine_parallelism as _parallelism,
)


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


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
) -> DataFrame:
    """Exact dense global rank (1..n) by ``order_cols`` WITHOUT the
    single-partition window a naive ``row_number() OVER (ORDER BY ...)``
    plans to.

    The distributed recipe: range-partition on the sort key (ordered,
    disjoint ranges), rank LOCALLY per shuffle partition (a parallel
    window on the partition id), then add per-partition row-count
    offsets — a parallelism-sized aggregate broadcast back. Ranks are
    exact for ANY bounds the range sampler picked, because ranges are
    ordered and local ranking is dense. ``order_cols`` must be a total
    order (append a unique id as tie-break).

    The offsets branch re-derives the ranked subtree, and a re-derived
    ``repartitionByRange`` may sample DIFFERENT range bounds, so the
    ranged frame is MATERIALIZED ONCE (cache_scope.materialize_consistent
    — eager checkpoint, lifetime owned by the JVM plan graph) before
    both branches read it — (key, id)-width rows, spill-safe. Used by
    text.shuffle_order (training-order permutation),
    text.rrf_fuse/rank_rbo, and stats.revenue_concentration/zipf_fit
    (Gini/Zipf ranks).
    """
    n = _parallelism(df.sparkSession)
    ranked = _consistent(
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    local = ranked.withColumn("_lrk", F.row_number().over(w_local))
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_lrk") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_lrk", "_off")
    )


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """Exact inclusive prefix sum of ``sum_col`` in ``order_cols``
    order, distributed — the same two-pass recipe as
    :func:`global_rank` (range partition → local running sum →
    per-partition TOTALS broadcast back as offsets), so the corpus
    never passes through a single-partition window. Powers cumulative-
    share analytics (Pareto/ABC classes, Lorenz curves) at any scale.

    ``order_cols`` must be a total order; ``sum_col`` should be an
    integer/decimal type when cross-engine exactness matters (float
    prefix sums are order-defined here, matching any sequential
    oracle).
    """
    n = _parallelism(df.sparkSession)
    # materialized once for the same totals-branch re-derivation
    # reason as global_rank above
    ranged = _consistent(
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(
        *[F.col(c).asc() for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, 0)
    local = ranged.withColumn("_ls", F.sum(sum_col).over(w_local))
    totals = local.groupBy("_pid").agg(F.sum(sum_col).alias("_pt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_pt").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_ls") + F.col("_off"))
        .drop("_pid", "_ls", "_off")
    )


def pareto_frontier(
    df: DataFrame,
    min_col: str,
    max_col: str,
) -> DataFrame:
    """2-D skyline: rows not dominated by any other row (dominated =
    another row is <= on ``min_col`` AND >= on ``max_col`` with at
    least one strict) — "cheapest part for its size class" style
    frontier queries.

    The quadratic NOT-EXISTS formulation (the oracle) dies at scale;
    the distributed shape here is O(n log n) total:

    1. collapse to distinct ``min_col`` values keeping max(``max_col``)
       — only those candidates can be on the frontier (same-price
       smaller sizes are dominated by the same-price max, strictly);
    2. prefix-max of ``max_col`` over strictly-lower ``min_col`` via
       the same two-pass recipe as :func:`global_rank` (range
       partition → local window → per-partition maxima broadcast as
       offsets) — never a single-partition window;
    3. a candidate survives iff its ``max_col`` strictly exceeds every
       lower-price prefix max; join survivors back to recover all rows
       carrying a frontier (min, max) pair (ties keep every copy:
       equal pairs don't dominate each other).
    """
    cand = df.groupBy(min_col).agg(F.max(max_col).alias(max_col))
    n = _parallelism(df.sparkSession)
    # materialized once: the offsets branch re-derives this subtree,
    # and a re-derived repartitionByRange may sample different range
    # bounds — the same _pid-desync hazard as global_rank (this site
    # previously fanned the nondeterministic frame out unprotected)
    ranged = _consistent(
        cand.repartitionByRange(n, F.col(min_col)).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(F.col(min_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_prev_local", F.max(max_col).over(w_local))
    totals = local.groupBy("_pid").agg(F.max(max_col).alias("_pmax"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.max("_pmax").over(w_off).alias("_prev_pids")
    )
    frontier = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "_prev", F.greatest(
                F.coalesce(F.col("_prev_local"), F.lit(float("-inf"))),
                F.coalesce(F.col("_prev_pids"), F.lit(float("-inf"))),
            )
        )
        .filter(F.col(max_col) > F.col("_prev"))
        .select(min_col, max_col)
    )
    return df.join(F.broadcast(frontier), [min_col, max_col])

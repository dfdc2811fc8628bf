"""As-of (point-in-time) join — an operator Spark lacks natively.

Semantics: for each left row, attach the most recent right row (same
key) whose timestamp is <= the left timestamp — DuckDB's ``ASOF JOIN``,
pandas' ``merge_asof``, kdb's ``aj``.

Implementation is the union+window composition (preferred over a
Pandas-UDF ``merge_asof`` because it stays JVM-side):

1. union the tagged sides on (key, ts),
2. one window per key ordered by (ts, side) carries the last non-null
   right payload forward (``last(..., ignorenulls=True)``),
3. keep left rows.

Physical shape: ONE shuffle on the key (the window), no join at all —
at 100 TB this beats a range-join expansion by orders of magnitude, and
skewed keys are bounded by per-key sort, not a cross product. Right rows
sort before left rows at equal timestamps, so ties match (>= semantics,
same as ASOF JOIN's ``a.ts >= b.ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join. ``right_value_cols`` are carried onto each
    left row as ``asof_<name>`` plus ``asof_ts``; ``how='left'`` keeps
    unmatched left rows with nulls."""
    lcols = [c for c in left.columns if c != left_ts]
    tagged_r = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in lcols if c not in key_cols],
    )
    tagged_l = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in key_cols],
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *key_cols,
        "_side",
        "_ts",
        *[F.col(f"_l_{c}") for c in lcols if c not in key_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    out = out.withColumnRenamed("_ts", left_ts)
    for c in lcols:
        if c not in key_cols:
            out = out.withColumnRenamed(f"_l_{c}", c)
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Forward as-of join: attach the EARLIEST right row (same key) with
    timestamp >= the left timestamp — next-event attribution (click →
    next purchase), the mirror of the backward join above and an
    operator neither Spark nor DuckDB has natively.

    Same one-shuffle union+window shape, reflected: left rows sort
    BEFORE right rows at equal timestamps (so ``>=`` ties match) and a
    ``first(..., ignorenulls)`` over the [current, ∞) frame carries the
    next right payload backward. Deterministic when the right side is
    unique per (key, ts) — pre-aggregate it (as the registry query
    does) if it is not.
    """
    lcols = [c for c in left.columns if c != left_ts]
    tagged_l = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in key_cols],
    )
    tagged_r = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in lcols if c not in key_cols],
    )
    unioned = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        *key_cols,
        "_side",
        "_ts",
        *[F.col(f"_l_{c}") for c in lcols if c not in key_cols],
        F.first("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 0).drop("_side")
    out = out.withColumnRenamed("_ts", left_ts)
    for c in lcols:
        if c not in key_cols:
            out = out.withColumnRenamed(f"_l_{c}", c)
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out

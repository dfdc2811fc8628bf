"""Data-quality expectations — the reference's own declared roadmap
item ("Add schema validation to uploaded CSVs",
/root/reference/README.md:222), implemented engine-side.

A rule is (name, boolean Column that SHOULD hold). The report counts,
per rule, the rows where the condition is not TRUE (NULL counts as a
violation — an unparseable cell failing a range check is a data-quality
problem, not a pass). All rules evaluate in ONE scan: a single global
aggregate of conditional sums (map-side partial, no shuffle of data
rows), then a driver-free unpivot of the one result row into
(rule, n_violations) records. At 100 TB this is the same single pass a
count() costs, regardless of rule count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """(rule, n_violations, n_rows, passed) — one row per rule."""
    viol = [
        F.sum(
            F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
        ).alias(name)
        for name, cond in rules
    ]
    one = df.agg(*viol, F.count(F.lit(1)).alias("_n_rows"))
    stack_args = ", ".join(f"'{name}', `{name}`" for name, _ in rules)
    return one.selectExpr(
        f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)",
        "_n_rows AS n_rows",
    ).withColumn("passed", F.col("n_violations") == 0)


def quarantine_split(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): rows failing ANY rule are diverted with a
    `_failed_rules` array naming what they broke — the row-level
    companion to :func:`check_expectations` (which only counts).
    Both outputs share one scan subtree; writing them is two jobs
    unless the caller persists the input.
    """
    tagged = df.withColumn(
        "_failed_rules",
        F.array_compact(
            F.array(
                *[
                    F.when(
                        ~F.coalesce(cond, F.lit(False)), F.lit(name)
                    )
                    for name, cond in rules
                ]
            )
        ),
    )
    clean = tagged.filter(F.size("_failed_rules") == 0).drop("_failed_rules")
    bad = tagged.filter(F.size("_failed_rules") > 0)
    return clean, bad

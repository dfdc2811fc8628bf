"""Datetime decomposition (SURVEY.md D1-D3, P1-P2).

Reference: ``_transform_dates`` parses ``created_at`` → timestamp, then
derives ``created_date`` (date) and ``created_time`` ("HH:mm:ss" string),
dropping the intermediate (/root/reference/airflow/include/
loan_spark_etl.py:71-88). Pure projection — no shuffle, stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Format ladder for sloppy timestamp strings, most-specific first. The
# reference pins spark.sql.legacy.timeParserPolicy=LEGACY globally
# (loan_spark_etl.py:42), which silently accepts sloppy inputs like
# '2021-3-7 5:4:3' or '3/7/21'; the engine keeps the CORRECTED parser
# and offers this explicit, auditable ladder instead — each format is a
# deliberate choice, not whatever SimpleDateFormat happens to take.
LENIENT_TS_FORMATS = (
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-M-d H:m:s",
    "yyyy-MM-dd",
    "M/d/yyyy H:m:s",
    "M/d/yyyy",
    "M/d/yy",
)


def lenient_to_timestamp(col: Column | str) -> Column:
    """First successful parse across :data:`LENIENT_TS_FORMATS`
    (``try_to_timestamp`` never throws — unparseable rows yield NULL,
    the PERMISSIVE contract). Pure projection, stays in codegen; use on
    string columns ingested from sources with inconsistent formats."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        *[F.try_to_timestamp(c, F.lit(f)) for f in LENIENT_TS_FORMATS]
    )


def split_datetime(
    df: DataFrame,
    source_col: str = "created_at",
    prefix: str = "created",
    keep_ts: bool = False,
) -> DataFrame:
    """Derive ``{prefix}_date``, ``{prefix}_time``, ``{prefix}_year``,
    ``{prefix}_month`` from a timestamp-or-string column.

    Column-existence guard mirrors the reference's defensive no-op when
    the source column is absent (loan_spark_etl.py:77-78).
    """
    if source_col not in df.columns:
        return df
    ts = F.to_timestamp(F.col(source_col))
    out = (
        df.withColumn(f"{prefix}_ts", ts)
        .withColumn(f"{prefix}_date", F.to_date(F.col(f"{prefix}_ts")))
        .withColumn(f"{prefix}_time", F.date_format(F.col(f"{prefix}_ts"), "HH:mm:ss"))
        .withColumn(f"{prefix}_year", F.year(F.col(f"{prefix}_ts")))
        .withColumn(f"{prefix}_month", F.month(F.col(f"{prefix}_ts")))
    )
    if not keep_ts:
        out = out.drop(f"{prefix}_ts")
    return out

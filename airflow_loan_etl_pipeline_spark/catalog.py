"""Table catalog: load the star-schema parquet tables for a scale factor.

Scans are plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown / column pruning / partition pruning on every query built on
top (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One table as a DataFrame (lazy parquet scan).

    ``events.ts`` has shipped in two physical encodings across fixture
    generations: TIMESTAMP(NANOS) (which Spark's vectorized parquet
    reader rejects — read as long, rebuild a microsecond timestamp with
    integer division; double division would lose precision above
    2^53 ns) and plain TIMESTAMP(MICROS) (pass through). Dispatch on the
    dtype the reader actually surfaces so both generations load.
    """
    path = table_path(sf_dir, name)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type in ("bigint", "long"):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            # Downstream operators cast ts to bigint/double (epoch math),
            # which TIMESTAMP_NTZ forbids; normalize to session-tz LTZ
            # TIMESTAMP — the exact dtype the nanos rebuild produced.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All star-schema tables that exist under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            # via load_table: events needs the TIMESTAMP(NANOS) rebuild.
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)

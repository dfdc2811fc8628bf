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

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; read it as a long and rebuild a microsecond
    timestamp with integer division (a double division would lose
    precision above 2^53 ns).
    """
    path = table_path(sf_dir, name)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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

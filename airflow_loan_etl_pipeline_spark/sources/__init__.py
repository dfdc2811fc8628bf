from airflow_loan_etl_pipeline_spark.sources.io import (
    read_csv_dir,
    read_parquet,
    write_csv,
    write_parquet,
)

__all__ = ["read_csv_dir", "read_parquet", "write_csv", "write_parquet"]

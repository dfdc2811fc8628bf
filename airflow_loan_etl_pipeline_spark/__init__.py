"""airflow_loan_etl_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the query and data-processing
capabilities of the reference pipeline (Aadarshao/airflow-loan-etl-pipeline):
incremental file ingestion with exactly-once semantics, schema-tolerant
cleaning (mode imputation), datetime decomposition, multi-key aggregation,
top-k reporting, columnar sinks — extended with large-scale training-data
operators (dedup, similarity search, text analysis, multimodal columns).

Everything is expressed through the DataFrame/SQL API so Catalyst+Tungsten
pick the physical strategy; Pandas UDFs are reserved for operators the
built-ins genuinely cannot express.
"""

from airflow_loan_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

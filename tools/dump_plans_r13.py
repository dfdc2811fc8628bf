"""Dump `.explain("formatted")` for a set of queries into
plans/r13/<query>_<tag>.txt — the before/after evidence files the
round-12 optimization deliverable requires.

Usage: python tools/dump_plans_r13.py <tag> [sf_dir] [query ...]
With no query list, dumps the bench HEADLINE set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from airflow_loan_etl_pipeline_spark import registry  # noqa: E402
from airflow_loan_etl_pipeline_spark import registry_mm  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark import registry_rel  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark import registry_sql  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark import registry_stats  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark import registry_stream  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark import registry_text  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    out_dir = os.path.join("/root/repo/plans/r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump_r13")
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # plan-time failure is itself evidence
            txt = f"EXPLAIN FAILED: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

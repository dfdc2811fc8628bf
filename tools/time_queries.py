"""Targeted probe-bracketed timing: time a list of registry queries
(cold + warm median-of-3, count action, cache cleared between runs)
and print one JSON line. Used for same-window A/B between two source
trees (run this script from each tree back-to-back; compare medians,
normalize by the bracketed probe when the window drifts mid-session).

Usage: python tools/time_queries.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_loan_etl_pipeline_spark import registry  # noqa: E402
from airflow_loan_etl_pipeline_spark import registry_mm  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark import registry_rel  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark import registry_sql  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark import registry_stats  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark import registry_stream  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark import registry_text  # noqa: E402, F401
from airflow_loan_etl_pipeline_spark.catalog import TABLE_NAMES, load_table  # noqa: E402
from airflow_loan_etl_pipeline_spark.session import get_spark  # noqa: E402


def probe(spark, sf_dir, reps=3) -> float:
    fn = registry.QUERIES["nation_revenue"]
    fn(spark, sf_dir).count()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("time_queries")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    pre = probe(spark, sf_dir)
    out: dict = {"probe_pre_s": pre, "sf_dir": sf_dir, "q": {}}
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            out["q"][name] = None
            continue
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out["q"][name] = {
            "cold": round(runs[0], 3),
            "warm_med": round(statistics.median(runs[1:]), 3),
        }
        print(f"# {name}: {out['q'][name]}", file=sys.stderr)
    out["probe_post_s"] = probe(spark, sf_dir)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

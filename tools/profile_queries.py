"""Per-query profile: wall time (median of reps), Spark job count and
stage count per evaluation — the fixed-overhead census behind the r12
optimization pass. Job-heavy queries (eager probes, checkpoint
materializations, per-iteration collects) hide their cost from a plan
dump; this counts them.

Usage: python tools/profile_queries.py [sf_dir] [reps] [query ...]
Prints one JSON line per query: {"q":..., "median_s":..., "jobs":...,
"stages":..., "tasks":...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import uuid

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    spark = get_spark("profile_r12")
    sc = spark.sparkContext
    from airflow_loan_etl_pipeline_spark.catalog import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    results = []
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        # cold rep to warm codegen, not counted
        fn(spark, sf_dir).count()
        spark.catalog.clearCache()
        times = []
        jobs = stages = tasks = 0
        for i in range(reps):
            group = f"prof_{name}_{i}_{uuid.uuid4().hex[:6]}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
            if i == 0:
                tracker = sc.statusTracker()
                jids = tracker.getJobIdsForGroup(group)
                jobs = len(jids)
                sids = set()
                for j in jids:
                    info = tracker.getJobInfo(j)
                    if info:
                        sids.update(info.stageIds)
                stages = len(sids)
                tasks = 0
                for s in sids:
                    si = tracker.getStageInfo(s)
                    if si:
                        tasks += si.numTasks
            spark.catalog.clearCache()
        row = {
            "q": name,
            "median_s": round(statistics.median(times), 3),
            "min_s": round(min(times), 3),
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    results.sort(key=lambda r: -r["median_s"])
    print("# slowest:", file=sys.stderr)
    for r in results[:15]:
        print(f"#   {r['q']}: {r['median_s']}s jobs={r['jobs']} "
              f"stages={r['stages']} tasks={r['tasks']}", file=sys.stderr)


if __name__ == "__main__":
    main()

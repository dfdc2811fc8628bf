"""Record a SOLO bench run as BENCH_SOLO.json (repo root).

Round 10: variance-disciplined protocol (VERDICT r9 item 2 — two
same-code recordings 34.7 s vs 49.1 s differed purely by host drift,
poisoning the next round's 2x-budget comparison).

1. **Noise probe first.** Before any recording, the probe re-times one
   pinned, long-untouched pure-scan query (``nation_revenue``,
   unchanged since round 1) several times in its own session and
   compares the median to the archived probe value in the existing
   BENCH_SOLO.json. If the host is >20% off its archived speed the
   tool REFUSES to record (exit 3) — a recording taken on a loaded or
   thermally different host is worse than no recording. ``--force``
   overrides (and says so in the file).
2. **N interleaved full passes.** bench.py is invoked ``--passes``
   times back-to-back (default 3); each run already reports a
   per-query warm median-of-3. The recorded number per query is the
   MIN of the runs' warm medians — min-of-medians is robust to
   transient load (load only ever adds time) while the inner median
   guards against single-execution jitter.
3. The archive carries the protocol fields so a future reader can see
   how the number was produced, plus the probe context.

Run with the machine otherwise idle (no concurrent pytest/driver
gates — concurrent load was measured to skew warm timings ~40%), then
commit the file. bench.py embeds the recorded warm-median total +
commit as `solo_ref` in its headline JSON line, so driver-harness
BENCH_r{N} rows self-report how far harness-side load moved the suite
from the like-for-like solo measurement.

Usage: python tools/record_solo_bench.py [--passes 3] [--force]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE_QUERY = "nation_revenue"  # pure-scan headline, untouched since r1
PROBE_REPS = 5
PROBE_TOLERANCE = 0.20


def run_noise_probe() -> float:
    """Median wall time of PROBE_QUERY over PROBE_REPS fresh builds in
    one dedicated session (rebuilt DataFrame each rep — re-collecting
    the same object would skip materialized stages)."""
    sys.path.insert(0, REPO)
    from airflow_loan_etl_pipeline_spark import registry
    import __spark_entry__  # noqa: F401  — loads every registry module
    from airflow_loan_etl_pipeline_spark.catalog import TABLE_NAMES, load_table
    from airflow_loan_etl_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("solo_noise_probe")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLE_NAMES:  # page-cache warm, same as bench.py
        load_table(spark, sf_dir, t).count()
    fn = registry.QUERIES[PROBE_QUERY]
    fn(spark, sf_dir).count()  # JIT/codegen warm
    times = []
    for _ in range(PROBE_REPS):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times.append(time.perf_counter() - t0)
    spark.stop()
    return statistics.median(times)


def run_bench_once() -> tuple[dict, dict]:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:])
        raise SystemExit(proc.returncode)
    headline = json.loads(proc.stdout.strip().splitlines()[-1])
    detail = {}
    for ln in proc.stderr.splitlines():
        if ln.startswith("# detail: "):
            detail = json.loads(ln[len("# detail: "):])
            break
    return headline, detail


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--force", action="store_true",
                    help="record even if the noise probe is out of band")
    args = ap.parse_args()
    if args.passes < 3:
        sys.exit("--passes must be >= 3 (the protocol's minimum)")

    out_path = os.path.join(REPO, "BENCH_SOLO.json")
    archived_probe = None
    try:
        with open(out_path) as fh:
            archived_probe = (json.load(fh).get("noise_probe") or {}).get(
                "median_s"
            )
    except Exception:
        pass

    probe = run_noise_probe()
    probe_rec = {
        "query": PROBE_QUERY,
        "reps": PROBE_REPS,
        "median_s": round(probe, 3),
        "archived_median_s": archived_probe,
        "tolerance": PROBE_TOLERANCE,
    }
    if archived_probe:
        drift = abs(probe - archived_probe) / archived_probe
        probe_rec["drift"] = round(drift, 3)
        if drift > PROBE_TOLERANCE and not args.force:
            sys.exit(
                f"REFUSING to record: noise probe {probe:.3f}s is "
                f"{drift:.0%} off the archived {archived_probe:.3f}s "
                f"(> {PROBE_TOLERANCE:.0%}); the host is not in the "
                "same performance band as the archive. Re-run on a "
                "quiet host, or --force to record anyway."
            )
    print(f"# noise probe: {probe_rec}", file=sys.stderr)

    t0 = time.time()
    runs = [run_bench_once() for _ in range(args.passes)]
    headline0 = runs[0][0]
    medians = [d.get("queries_warm_median", {}) for _h, d in runs]
    names = set().union(*medians)
    min_of_medians = {
        q: min(m[q] for m in medians if q in m) for q in sorted(names)
    }
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    record = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime()),
        "commit": commit,
        "wall_s": round(time.time() - t0, 1),
        "protocol": {
            "passes": args.passes,
            "per_query": "min over passes of each pass's warm "
                         "median-of-3",
            "forced": bool(args.force),
        },
        "noise_probe": probe_rec,
        "sf": headline0.get("sf"),
        # headline totals under the protocol
        "value_warm_median": round(sum(min_of_medians.values()), 3),
        "value_warm_median_runs": [
            h.get("value_warm_median") for h, _d in runs
        ],
        "value": headline0.get("value"),
        "value_warm": headline0.get("value_warm"),
        "n_extra_queries": headline0.get("n_extra_queries"),
        "extra_total_sec": headline0.get("extra_total_sec"),
        "queries_cold": headline0.get("queries", {}),
        "queries_warm_median": min_of_medians,
        "streaming_e2e": runs[0][1].get("streaming_e2e"),
        "streaming": headline0.get("streaming"),
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path}: warm_median={record['value_warm_median']}s "
          f"(runs: {record['value_warm_median_runs']}) @ {commit}")


if __name__ == "__main__":
    main()

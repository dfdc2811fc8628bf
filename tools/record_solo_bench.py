"""Record a SOLO bench run as BENCH_SOLO.json (repo root).

Run this with the machine otherwise idle (no concurrent pytest/driver
gates — concurrent load was measured to skew warm timings ~40%), then
commit the file. bench.py embeds its warm-median total + commit as
`solo_ref` in the headline JSON line, so the driver-harness BENCH_r{N}
self-reports how far harness-side load moved the suite from the
like-for-like solo measurement (VERDICT r7 items 1 and 8).

Usage: python tools/record_solo_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    t0 = time.time()
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
    line = proc.stdout.strip().splitlines()[-1]
    headline = json.loads(line)
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.strip()
    record = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime()),
        "commit": commit,
        "wall_s": round(time.time() - t0, 1),
        **{
            k: headline.get(k)
            for k in (
                "value",
                "value_warm",
                "value_warm_median",
                "value_warm_median_r1set",
                "sf",
                "n_extra_queries",
                "extra_total_sec",
            )
        },
        "queries_cold": headline.get("queries", {}),
    }
    # the full warm detail lives on bench's stderr `# detail:` line
    for ln in proc.stderr.splitlines():
        if ln.startswith("# detail: "):
            detail = json.loads(ln[len("# detail: "):])
            record["queries_warm_median"] = detail.get(
                "queries_warm_median", {}
            )
            record["streaming_e2e"] = detail.get("streaming_e2e")
            break
    out = os.path.join(REPO, "BENCH_SOLO.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"wrote {out}: warm_median={record.get('value_warm_median')}s "
          f"@ {commit}")


if __name__ == "__main__":
    main()

"""Driver-contract invariants: the prefix-sampling rotation in
__spark_entry__ (VERDICT r10 item 8) and bench.py's embedded noise
probe (VERDICT r10 item 2)."""

from __future__ import annotations

import math

import __spark_entry__ as entry
from airflow_loan_etl_pipeline_spark import registry


def test_rotation_covers_every_query_within_cycle(monkeypatch):
    """Simulated multi-round STALEST-FIRST cycle: each simulated round
    samples the driver prefix, stamps those entries as externally
    verified that round, and re-sorts. Every registry entry must be
    sampled within ceil(rest / step) rounds — nothing ages
    indefinitely, by construction of the staleness sort."""
    rewired = [k for k in entry._REWIRED if k in registry.QUERIES]
    rest_n = len(registry.QUERIES) - len(rewired)
    step = max(1, entry._DRIVER_SAMPLE - len(rewired))
    cycle = math.ceil(rest_n / step)
    assert cycle <= 8, f"rotation cycle {cycle} rounds is too slow"
    last = dict(entry._last_verified_round())
    seen: set[str] = set()
    for rnd in range(100, 100 + cycle):
        monkeypatch.setattr(entry, "_last_verified_round", lambda: last)
        prefix = list(entry.queries(round_no=rnd))[: entry._DRIVER_SAMPLE]
        assert len(prefix) == entry._DRIVER_SAMPLE
        seen.update(prefix)
        last = dict(last)
        for q in prefix:
            last[q] = rnd
    assert seen == set(registry.QUERIES)


def test_rotation_samples_stalest_cohort_first():
    """The non-rewired part of the driver's prefix window is drawn from
    the OLDEST-external-check cohort (VERDICT r11 item 6): no entry
    outside the window has an older last-verified round than any entry
    inside it, and never-verified entries (round 0) sort first of
    all."""
    rewired = {k for k in entry._REWIRED if k in registry.QUERIES}
    last = entry._last_verified_round()
    order = [
        k
        for k in entry.queries(round_no=12)
        if k not in rewired
    ]
    window = order[: entry._DRIVER_SAMPLE - len(rewired)]
    outside = order[entry._DRIVER_SAMPLE - len(rewired):]
    assert window and outside
    assert max(last.get(k, 0) for k in window) <= min(
        last.get(k, 0) for k in outside
    )
    # staleness keys are non-decreasing along the whole tail
    keys = [last.get(k, 0) for k in order]
    assert keys == sorted(keys)


def test_rotation_is_deterministic_and_complete():
    q1 = entry.queries(round_no=11)
    q2 = entry.queries(round_no=11)
    assert list(q1) == list(q2)
    assert set(q1) == set(registry.QUERIES)
    # rewired entries hold the front of the sample window
    rewired = [k for k in entry._REWIRED if k in registry.QUERIES]
    assert list(q1)[: len(rewired)] == rewired
    # oracle map mirrors the rotated order
    osql = entry.oracle_sql()
    assert set(osql) == {k for k in q1 if k in registry.ORACLE}


def test_current_round_infers_from_artifacts(tmp_path, monkeypatch):
    import os

    (tmp_path / "CORRECTNESS_r03.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r10.json").write_text("{}")
    monkeypatch.setattr(
        entry.os.path, "dirname", lambda p: str(tmp_path)
    )
    assert entry._current_round() == 11
    for f in tmp_path.iterdir():
        os.remove(f)
    assert entry._current_round() == 1


def test_bench_headline_line_keeps_queries_map():
    """VERDICT r12 item 1: the stdout headline must carry the full
    per-query map within the driver's ~2000-char capture. Build the
    exact field set main() emits with a worst-case 43-query map and
    assert the serialized line fits WITHOUT demoting the map."""
    import json

    import bench

    queries = {name: 12.345 for name in bench.HEADLINE}
    assert len(queries) == 43
    headline = {
        "metric": "headline_suite_wall_clock",
        "value": 123.456,
        "unit": "sec",
        "passes": "queries=cold; warm maps on stderr detail",
        "queries": queries,
        "sf": 0.1,
        "value_warm": 123.456,
        "value_warm_median": 123.456,
        "value_warm_median_r1set": 123.456,
        "noise_probe": {
            "q": "nation_revenue",
            "reps": 5,
            "median_s": 1.207,
            "solo_ref_s": 0.937,
            "drift_x": 1.29,
            "post_median_s": 1.207,
            "post_drift_x": 1.29,
            "unstable_window": True,
        },
    }
    line = bench.format_headline_line(headline)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    # graceful degradation: a hostile budget sheds precision, then the
    # map — but the line always stays parseable
    short = json.loads(bench.format_headline_line(dict(headline), budget=600))
    assert short["value"] == 123.456


def test_bench_noise_probe_block(spark):
    """bench.py's probe block carries the drift-accounting fields the
    BENCH_r{N} artifact needs (probe median + factor vs archived solo
    probe)."""
    import bench

    block = bench.noise_probe_block(spark, "/root/testdata/sf0.001", reps=1)
    assert block["q"] == "nation_revenue"
    assert block["median_s"] > 0
    # BENCH_SOLO.json is committed in-repo, so the drift factor vs the
    # archived solo probe must be present
    assert "solo_ref_s" in block and "drift_x" in block

"""Driver-contract invariants: the prefix-sampling rotation in
__spark_entry__ (VERDICT r10 item 8) and bench.py's embedded noise
probe (VERDICT r10 item 2)."""

from __future__ import annotations

import math

import __spark_entry__ as entry
from airflow_loan_etl_pipeline_spark import registry


def test_rotation_covers_every_query_within_cycle():
    """Simulated multi-round rotation: with the rewired list held
    fixed, the union of the driver's 50-row prefixes over one full
    cycle covers EVERY registry entry — nothing ages indefinitely."""
    rewired = [k for k in entry._REWIRED if k in registry.QUERIES]
    rest_n = len(registry.QUERIES) - len(rewired)
    step = max(1, entry._DRIVER_SAMPLE - len(rewired))
    cycle = math.ceil(rest_n / step)
    assert cycle <= 8, f"rotation cycle {cycle} rounds is too slow"
    seen: set[str] = set()
    for rnd in range(11, 11 + cycle):
        prefix = list(entry.queries(round_no=rnd))[: entry._DRIVER_SAMPLE]
        assert len(prefix) == entry._DRIVER_SAMPLE
        seen.update(prefix)
    assert seen == set(registry.QUERIES)


def test_rotation_prefixes_tile_without_overlap():
    """Consecutive rounds' post-rewired windows are contiguous slices
    of the same sorted list — adjacent rounds never waste sample slots
    re-checking the same non-rewired entry (until the cycle wraps)."""
    rewired = {k for k in entry._REWIRED if k in registry.QUERIES}
    w1 = [
        k
        for k in list(entry.queries(round_no=11))[: entry._DRIVER_SAMPLE]
        if k not in rewired
    ]
    w2 = [
        k
        for k in list(entry.queries(round_no=12))[: entry._DRIVER_SAMPLE]
        if k not in rewired
    ]
    assert not (set(w1) & set(w2))


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

"""Unit tests for the statistical-diagnostics operators
(operators/stats.py), BM25, triangle counting, and snapshot_diff —
semantics the differential oracle already pins numerically; these
cover the edge behavior and known-graph shapes directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.operators import graph as G
from airflow_loan_etl_pipeline_spark.operators import stats as ST
from airflow_loan_etl_pipeline_spark.operators import validate as V


def test_snapshot_diff_classifies_all_four_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["doc_id", "fp"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], ["doc_id", "fp"]
    )
    rows = {
        r["doc_id"]: r["status"]
        for r in V.snapshot_diff(old, new, "doc_id", "fp").collect()
    }
    assert rows == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_triangle_participation_counts_known_graph(spark):
    # K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["n_triangles"]
        for r in G.triangle_participation(edges).collect()
    }
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_participation_empty_on_triangle_free_graph(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["doc_a", "doc_b"])
    assert G.triangle_participation(edges).count() == 0


def test_benford_ignores_nonpositive_amounts(spark):
    df = spark.createDataFrame(
        [(123.4,), (0.0,), (-5.0,), (987.0,), (1.2,)], ["amt"]
    )
    rows = {r["digit"]: r["n_rows"] for r in ST.benford_first_digit(df, "amt").collect()}
    assert rows == {1: 2, 9: 1}


def test_trend_regression_recovers_exact_line(spark):
    # y = 2*x + 1 sampled hourly: slope_per_day = 48, intercept = 1.
    rows = [
        ("a", float(2 * (h / 24.0) + 1), f"2024-01-0{1 + h // 24} {h % 24:02d}:00:00")
        for h in range(48)
    ]
    df = spark.createDataFrame(rows, ["event_type", "value", "ts_s"]).select(
        "event_type", "value", F.to_timestamp("ts_s").alias("ts")
    )
    out = ST.trend_regression(df).collect()[0]
    assert out["slope_per_day"] == 2.0
    assert out["intercept"] == 1.0
    assert out["time_corr"] == 1.0


def test_js_divergence_zero_for_identical_distributions(spark):
    df = spark.createDataFrame(
        [("s1", "a b c"), ("s2", "a b c")], ["source", "text"]
    )
    out = ST.js_divergence_by_key(df).collect()
    assert len(out) == 1
    assert out[0]["js_divergence"] == 0.0
    assert out[0]["n_shared_tokens"] == 3


def test_js_divergence_ln2_for_disjoint_distributions(spark):
    # Disjoint vocabularies share no tokens -> the pair appears with
    # the ln(2) maximum (round-6 contract: the pair universe is every
    # key pair; previously these most-divergent pairs were absent).
    import math

    df = spark.createDataFrame(
        [("s1", "a a b"), ("s2", "x y z")], ["source", "text"]
    )
    rows = ST.js_divergence_by_key(df).collect()
    assert len(rows) == 1
    assert rows[0]["n_shared_tokens"] == 0
    assert abs(rows[0]["js_divergence"] - round(math.log(2.0), 6)) < 1e-9


def test_collapse_state_runs_gaps_and_islands(spark):
    from airflow_loan_etl_pipeline_spark.operators import timeseries as T

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"), (2, 1, "b")],
        ["k", "t", "st"],
    )
    runs = sorted(
        (r["k"], r["st"], r["valid_from"], r["valid_to"], r["n_periods"])
        for r in T.collapse_state_runs(df, "k", "t", "st").collect()
    )
    assert runs == [
        (1, "a", 1, 2, 2),
        (1, "a", 4, 4, 1),
        (1, "b", 3, 3, 1),
        (2, "b", 1, 1, 1),
    ]


def test_chi_square_zero_for_independent_columns(spark):
    # Perfectly balanced 2x2 contingency: chi2 == 0, dof == 1.
    rows = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 5
    df = spark.createDataFrame(rows, ["a", "b"])
    out = ST.chi_square_independence(df, "a", "b").collect()[0]
    assert out["chi2"] == 0.0
    assert out["dof"] == 1
    assert out["n_observed_cells"] == 4


def test_chi_square_counts_missing_cells_mass(spark):
    # Diagonal-only occupancy: the two absent cells contribute their
    # expected mass (closed form), total chi2 = N for a 2x2 diagonal.
    rows = [("x", "p")] * 10 + [("y", "q")] * 10
    df = spark.createDataFrame(rows, ["a", "b"])
    out = ST.chi_square_independence(df, "a", "b").collect()[0]
    assert out["chi2"] == 20.0
    assert out["n_observed_cells"] == 2


def test_rfm_segments_scores_quartiles(spark):
    from airflow_loan_etl_pipeline_spark.operators.stats import rfm_segments

    # freq varies 1..4; recency and monetary constant across customers.
    rows = []
    for cust, n in ((1, 1), (2, 2), (3, 3), (4, 4)):
        for i in range(n):
            # per-customer TOTAL spend is constant (monetary is a sum)
            rows.append((cust, "1998-01-01", 1200.0 / n))
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string, o_totalprice double"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    out = rfm_segments(orders).collect()
    # identical recency/monetary -> same r/m everywhere; freq quartiles
    # split the four customers into four distinct f_scores.
    assert sorted(r.f_score for r in out) == [1, 2, 3, 4]
    assert all(r.n_customers == 1 for r in out)
    assert len({(r.r_score, r.m_score) for r in out}) == 1


def test_debounce_lag_semantics(spark):
    from airflow_loan_etl_pipeline_spark.operators.timeseries import debounce

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "click", 1.0, ""),
            (2, "2024-01-01 00:00:30", 7, "click", 1.0, ""),  # 30s: drop
            (3, "2024-01-01 00:01:30", 7, "click", 1.0, ""),  # 60s: keep
            (4, "2024-01-01 00:01:40", 7, "click", 1.0, ""),  # 10s: drop
            (5, "2024-01-01 00:00:10", 8, "click", 1.0, ""),  # other key
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.event_type: r for r in debounce(events).collect()}
    assert out["click"].n_kept == 3  # ids 1, 3, 5
    assert out["click"].n_dropped == 2  # ids 2, 4


def test_transition_matrix_hand_computed(spark):
    from airflow_loan_etl_pipeline_spark.operators.stats import (
        transition_matrix,
    )

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "a", 0.0, ""),
            (2, "2024-01-01 00:00:01", 7, "b", 0.0, ""),
            (3, "2024-01-01 00:00:02", 7, "a", 0.0, ""),
            (4, "2024-01-01 00:00:03", 7, "b", 0.0, ""),
            (5, "2024-01-01 00:00:00", 8, "a", 0.0, ""),
            (6, "2024-01-01 00:00:01", 8, "c", 0.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r.from_state, r.to_state): r for r in transition_matrix(events).collect()
    }
    # user 7: a->b, b->a, a->b; user 8: a->c. From 'a': 2x b, 1x c.
    assert out[("a", "b")].n_transitions == 2
    assert out[("a", "b")].p_transition == 0.6666
    assert out[("a", "c")].p_transition == 0.3333
    assert out[("b", "a")].p_transition == 1.0


def test_time_weighted_avg_vs_arithmetic_mean(spark):
    from airflow_loan_etl_pipeline_spark.operators.timeseries import (
        time_weighted_avg,
    )

    # value 10 holds for 90s, then three rapid updates of 0 (burst)
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "t", 10.0, ""),
            (2, "2024-01-01 00:01:30", 7, "t", 0.0, ""),
            (3, "2024-01-01 00:01:35", 7, "t", 0.0, ""),
            (4, "2024-01-01 00:01:40", 7, "t", 0.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = time_weighted_avg(events).collect()[0]
    # intervals: 10 for 90s, 0 for 5s, 0 for 5s -> 900/100 = 9.0
    assert out.n_intervals == 3
    assert out.twap == 9.0  # arithmetic mean of values would be 2.5


def test_revenue_gini_hand_computed(spark):
    from airflow_loan_etl_pipeline_spark.operators.stats import (
        revenue_concentration,
    )

    def gini_of(amounts):
        rows = [(i, "1998-01-01", a) for i, a in enumerate(amounts)]
        orders = spark.createDataFrame(
            rows, "o_custkey long, o_orderdate string, o_totalprice double"
        )
        return revenue_concentration(orders).collect()[0]

    equal = gini_of([5.0, 5.0, 5.0, 5.0])
    assert equal.n_keys == 4 and equal.gini == 0.0  # perfect equality
    skew = gini_of([1.0, 3.0])
    assert skew.gini == 0.25  # closed form for [1, 3]


def test_winsorized_mean_resists_outlier(spark):
    from airflow_loan_etl_pipeline_spark.operators.stats import (
        winsorized_stats,
    )

    # 19 values of 1.0 and one 1000.0 outlier
    rows = [(i, "2024-01-01 00:00:00", 7, "t", 1.0, "") for i in range(19)]
    rows.append((99, "2024-01-01 00:00:00", 7, "t", 1000.0, ""))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    )
    out = winsorized_stats(events).collect()[0]
    assert out.mean_raw == round((19 + 1000) / 20, 6)  # 50.95
    # p95 interpolates at position 18.05 of 20: 1.0 + 0.05*(1000-1)
    # = 50.95 -> the outlier clips to 50.95, winsorized mean 3.4975
    assert out.mean_winsorized == 3.4975
    assert out.mean_winsorized < out.mean_raw / 10


def test_zipf_fit_exact_power_law(spark):
    from airflow_loan_etl_pipeline_spark.operators.stats import zipf_fit

    # construct frequencies c = 64 / rank exactly: ln c = ln 64 - ln rk
    words = []
    # c = 12 / rank for actual dense ranks 1..4 -> exact -1 power law
    for rk, c in ((1, 12), (2, 6), (3, 4), (4, 3)):
        words += [f"w{rk}"] * c
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    out = zipf_fit(docs).collect()[0]
    assert out.n_terms == 4
    assert out.zipf_slope == -1.0
    assert out.r2 == 1.0


def test_interval_concurrency_hand_computed(spark):
    from airflow_loan_etl_pipeline_spark.operators.timeseries import (
        interval_concurrency,
    )

    starts = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-02",), ("2024-01-02",)], "day string"
    ).select(F.col("day").cast("date").alias("day"))
    ends = spark.createDataFrame(
        [("2024-01-03",), ("2024-01-02",), ("2024-01-05",)], "day string"
    ).select(F.col("day").cast("date").alias("day"))
    out = {str(r.day): r.n_open for r in interval_concurrency(starts, ends).collect()}
    # Jan1: 1 open; Jan2: +2 = 3, one closes END of Jan2 -> still 3 on Jan2;
    # Jan3: 2 (one closed); Jan4: 1 (Jan3-end close); Jan6: 0
    assert out["2024-01-01"] == 1
    assert out["2024-01-02"] == 3
    assert out["2024-01-03"] == 2
    assert out["2024-01-04"] == 1
    assert out["2024-01-06"] == 0


def test_mad_anomalies_robust_to_injected_outlier(spark):
    from airflow_loan_etl_pipeline_spark.operators.stats import (
        mad_anomaly_counts,
    )

    # 20 values near 10.0 (tight), one wild 1000.0
    rows = [(i, "2024-01-01", 7, "t", 10.0 + (i % 5) * 0.01, "") for i in range(20)]
    rows.append((99, "2024-01-01", 7, "t", 1000.0, ""))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    )
    out = mad_anomaly_counts(events).collect()[0]
    assert out.n_events == 21
    assert out.n_anomalies == 1  # exactly the injected outlier
    assert out.median_value == 10.02  # median untouched by the outlier


def test_session_paths_hand_computed(spark):
    from airflow_loan_etl_pipeline_spark.operators.timeseries import (
        session_paths,
    )

    events = spark.createDataFrame(
        [
            # user 7, session 1: a, b, c, d (4th truncated from path)
            (1, "2024-01-01 00:00:00", 7, "a", 0.0, ""),
            (2, "2024-01-01 00:01:00", 7, "b", 0.0, ""),
            (3, "2024-01-01 00:02:00", 7, "c", 0.0, ""),
            (4, "2024-01-01 00:03:00", 7, "d", 0.0, ""),
            # user 7, session 2 (gap > 5 min): a alone
            (5, "2024-01-01 01:00:00", 7, "a", 0.0, ""),
            # user 8: a, b
            (6, "2024-01-01 00:00:00", 8, "a", 0.0, ""),
            (7, "2024-01-01 00:04:00", 8, "b", 0.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.path: r.n_sessions for r in session_paths(events).collect()}
    assert out == {"a>b>c": 1, "a": 1, "a>b": 1}


def test_ohlc_bars_hand_computed(spark):
    from airflow_loan_etl_pipeline_spark.operators.timeseries import ohlc_bars

    events = spark.createDataFrame(
        [
            # one hour bucket, out-of-order insertion: open/close are by
            # event time, not input order
            (3, "2024-01-01 10:30:00", 1, "m", 5.0, ""),
            (1, "2024-01-01 10:00:00", 1, "m", 2.0, ""),
            (2, "2024-01-01 10:59:59", 1, "m", 9.0, ""),
            # same-ts tie broken by event_id: id=5 is the close
            (4, "2024-01-01 11:00:00", 1, "m", 1.0, ""),
            (5, "2024-01-01 11:00:00", 1, "m", 7.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {r.bar_ts.hour: r for r in ohlc_bars(events).collect()}
    b10 = rows[10]
    assert (b10.open, b10.high, b10.low, b10.close) == (2.0, 9.0, 2.0, 9.0)
    assert b10.n_events == 3 and b10.volume == 16.0
    b11 = rows[11]
    assert (b11.open, b11.close) == (1.0, 7.0)


def test_latest_state_hand_computed(spark):
    from airflow_loan_etl_pipeline_spark.operators.timeseries import (
        latest_state,
    )

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "signup", 1.0, ""),
            (2, "2024-01-02 00:00:00", 7, "purchase", 9.5, ""),
            # same ts as id=2 but higher event_id wins the tiebreak
            (3, "2024-01-02 00:00:00", 7, "refund", -9.5, ""),
            (4, "2024-01-01 00:00:00", 8, "view", 0.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.user_id: r for r in latest_state(events).collect()}
    assert out[7].last_event_type == "refund"
    assert out[7].last_value == -9.5
    assert out[7].n_events == 3
    assert out[8].last_event_type == "view" and out[8].n_events == 1


def test_ab_welch_matches_scipy_formula(spark):
    from airflow_loan_etl_pipeline_spark.operators.stats import ab_welch_test

    # arm 0: users 0,2 -> values [1, 2, 3, 4]; arm 1: users 1,3 ->
    # values [10, 12, 14]
    rows = [
        (1, "2024-01-01 00:00:00", 0, "m", 1.0, ""),
        (2, "2024-01-01 00:00:00", 0, "m", 2.0, ""),
        (3, "2024-01-01 00:00:00", 2, "m", 3.0, ""),
        (4, "2024-01-01 00:00:00", 2, "m", 4.0, ""),
        (5, "2024-01-01 00:00:00", 1, "m", 10.0, ""),
        (6, "2024-01-01 00:00:00", 3, "m", 12.0, ""),
        (7, "2024-01-01 00:00:00", 3, "m", 14.0, ""),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = ab_welch_test(events).collect()[0]
    # hand Welch: m0=2.5 v0=5/3 n0=4; m1=12 v1=4 n1=3
    import math

    se = 5 / 3 / 4 + 4 / 3
    t = (2.5 - 12) / math.sqrt(se)
    dof = se * se / ((5 / 3 / 4) ** 2 / 3 + (4 / 3) ** 2 / 2)
    assert out.n0 == 4 and out.n1 == 3
    assert out.t_stat == round(t, 4)
    assert out.welch_df == round(dof, 2)


def test_seasonal_anomaly_flags_only_cell_outlier(spark):
    from airflow_loan_etl_pipeline_spark.operators.stats import (
        seasonal_anomaly_counts,
    )

    rows = []
    eid = 0
    # Mondays 10:00 cell: tight values around 10 plus one huge outlier.
    for day in ["2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22"]:
        for m in range(5):
            eid += 1
            rows.append((eid, f"{day} 10:0{m}:00", 1, "m", 10.0 + 0.01 * m, ""))
    eid += 1
    rows.append((eid, "2024-01-29 10:00:00", 1, "m", 500.0, ""))
    # Tuesday 10:00 cell: naturally large values — NOT anomalous within
    # their own cell even though a global z-score would flag them.
    for m in range(4):
        eid += 1
        rows.append((eid, f"2024-01-02 10:0{m}:00", 1, "m", 400.0 + m, ""))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = seasonal_anomaly_counts(events).collect()[0]
    assert out.n_events == 25
    assert out.n_anomalies == 1


def test_psi_drift_detects_shifted_distribution(spark):
    from airflow_loan_etl_pipeline_spark.operators.stats import psi_drift

    rows = []
    eid = 0
    # metric "stable": identical uniform-ish values in both halves.
    # metric "shifted": values 1..100 in the first half, 201..300 after.
    for day, lo in [("2024-01-01", 0), ("2024-02-01", 0)]:
        for i in range(100):
            eid += 1
            rows.append(
                (eid, f"{day} 00:{i // 60:02d}:{i % 60:02d}", 1, "stable",
                 float(i % 10), "")
            )
    for day, lo in [("2024-01-01", 1), ("2024-02-01", 201)]:
        for i in range(100):
            eid += 1
            rows.append(
                (eid, f"{day} 01:{i // 60:02d}:{i % 60:02d}", 1, "shifted",
                 float(lo + i), "")
            )
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.event_type: r for r in psi_drift(events).collect()}
    assert out["stable"].n_ref == 100 and out["stable"].n_cur == 100
    assert out["stable"].psi < 0.01
    # total shift: every current value above every reference decile ->
    # p_cur mass concentrated in the top bucket; PSI explodes
    assert out["shifted"].psi > 1.0


def test_funnel_window_excludes_late_conversions(spark):
    from airflow_loan_etl_pipeline_spark.operators.timeseries import funnel

    rows = [
        # user 1: click 30 min after view -> converts in a 1h window
        (1, "2024-01-01 00:00:00", 1, "view", 0.0, ""),
        (2, "2024-01-01 00:30:00", 1, "click", 0.0, ""),
        # user 2: click 2 h after view -> excluded by the window,
        # included without it
        (3, "2024-01-01 00:00:00", 2, "view", 0.0, ""),
        (4, "2024-01-01 02:00:00", 2, "click", 0.0, ""),
        # user 3: greedy anchor — views at 00:00 and 01:30; click at
        # 02:00 is within 1h of the SECOND view but the anchor is the
        # earliest view, so the windowed funnel excludes it.
        (5, "2024-01-01 00:00:00", 3, "view", 0.0, ""),
        (6, "2024-01-01 01:30:00", 3, "view", 0.0, ""),
        (7, "2024-01-01 02:00:00", 3, "click", 0.0, ""),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plain = funnel(events, steps=("view", "click")).collect()[0]
    assert (plain.users_view, plain.users_click) == (3, 3)
    windowed = funnel(events, steps=("view", "click"), max_gap_s=3600).collect()[0]
    assert (windowed.users_view, windowed.users_click) == (3, 1)


def test_cusum_changepoint_finds_injected_shift(spark):
    from airflow_loan_etl_pipeline_spark.operators.stats import (
        cusum_changepoint,
    )

    rows = []
    # 40 events at level 10, then 40 at level 50: the changepoint is at
    # the boundary (k = 40, the last pre-shift index maximizes CUSUM).
    for i in range(80):
        level = 10.0 if i < 40 else 50.0
        rows.append(
            (i + 1, f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00", 1, "m",
             level, "")
        )
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = cusum_changepoint(events).collect()[0]
    assert out.k == 40
    assert out.n_events == 80
    # |S_40 - (40/80) S_80| = |400 - 0.5*2400| = 800
    assert out.cusum_stat == 800.0


def test_crosscorr_detects_lag_relationship(spark):
    from airflow_loan_etl_pipeline_spark.registry_stats import (
        events_crosscorr_lags,
    )

    # purchases at hour h+1 are exactly 2x clicks at hour h -> lag-1
    # crosscorr == 1.0; contemporaneous values are engineered unrelated.
    rows = []
    eid = 0
    click = [10.0, 50.0, 20.0, 80.0, 30.0, 60.0, 40.0, 70.0]
    noise = [33.0, 1.0, 47.0, 2.0, 44.0, 3.0, 41.0, 4.0]
    for hft, v in enumerate(click):
        eid += 1
        rows.append((eid, f"2024-01-01 {hft:02d}:00:00", 1, "click", v, ""))
    for hft, v in enumerate(click[:-1]):
        eid += 1
        rows.append(
            (eid, f"2024-01-01 {hft + 1:02d}:30:00", 1, "purchase", 2 * v, "")
        )
    eid += 1
    rows.append((eid, "2024-01-01 00:30:00", 1, "purchase", noise[0], ""))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    import airflow_loan_etl_pipeline_spark.registry_stats as RS

    orig_rs = RS.load_table
    try:
        RS.load_table = lambda sp, sf, name: events
        out = {r.lag: r for r in events_crosscorr_lags(spark, "unused").collect()}
    finally:
        RS.load_table = orig_rs
    assert out[1].crosscorr == 1.0
    assert out[1].n_hours == 7


def test_source_entropy_orders_diversity(spark):
    from airflow_loan_etl_pipeline_spark.registry_stats import (
        docs_source_entropy,
    )
    import math

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en", "diverse", 0),
            (2, "x x x x", "en", "template", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import airflow_loan_etl_pipeline_spark.registry_stats as RS

    orig = RS.load_table
    try:
        RS.load_table = lambda sp, sf, name: docs
        out = {r.source: r for r in docs_source_entropy(spark, "x").collect()}
    finally:
        RS.load_table = orig
    assert out["diverse"].entropy_nats == round(math.log(4), 4)
    assert out["template"].entropy_nats == 0.0
    assert out["diverse"].n_types == 4


def test_poisson_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from airflow_loan_etl_pipeline_spark.operators.stats import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame(
        [(i, 100.0 + (i % 7)) for i in range(300)], "k long, v double"
    )
    out1 = poisson_bootstrap_ci(df, "k", "v").collect()[0]
    # repartitioning must not change the draw (content-addressed)
    out2 = poisson_bootstrap_ci(df.repartition(13), "k", "v").collect()[0]
    assert out1 == out2
    assert out1.n_rows == 300
    assert out1.boot_lo <= out1.mean_val <= out1.boot_hi
    # tight population (spread 6 around ~103): the CI must be narrow
    assert out1.boot_hi - out1.boot_lo < 2.0


def test_ab_conversion_z_hand_computed(spark):
    import math

    from airflow_loan_etl_pipeline_spark.registry_stats import (
        events_ab_conversion,
    )

    rows = []
    eid = 0
    # arm 0 (even users 0..9): 8 of 10 convert; arm 1 (odd 1..19): 2 of 10
    for u in range(20):
        eid += 1
        conv = (u % 2 == 0 and u < 16) or (u % 2 == 1 and u < 4)
        val = 200.0 if conv else 10.0
        rows.append((eid, "2024-01-01 00:00:00", u, "purchase", val, ""))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import airflow_loan_etl_pipeline_spark.registry_stats as RS

    orig = RS.load_table
    try:
        RS.load_table = lambda sp, sf, name: events
        out = events_ab_conversion(spark, "x").collect()[0]
    finally:
        RS.load_table = orig
    assert (out.n0, out.c0, out.n1, out.c1) == (10, 8, 10, 2)
    pp = 10 / 20
    z = (0.8 - 0.2) / math.sqrt(pp * (1 - pp) * (1 / 10 + 1 / 10))
    assert out.z_stat == round(z, 4)


def test_seasonality_r2_extremes(spark):
    from airflow_loan_etl_pipeline_spark.registry_stats import (
        events_seasonality_r2,
    )

    rows = []
    eid = 0
    # "clock": value is a pure function of hour -> R2 == 1
    # "noise": value alternates within each hour cell -> R2 ~= 0
    for day in ("2024-01-01", "2024-01-08"):  # same weekday
        for h in range(4):
            for i in range(4):
                eid += 1
                rows.append(
                    (eid, f"{day} {h:02d}:{i * 10:02d}:00", 1, "clock",
                     float(h * 10), "")
                )
                eid += 1
                rows.append(
                    (eid, f"{day} {h:02d}:{i * 10 + 5:02d}:00", 1, "noise",
                     float(i % 2), "")
                )
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import airflow_loan_etl_pipeline_spark.registry_stats as RS

    orig = RS.load_table
    try:
        RS.load_table = lambda sp, sf, name: events
        out = {r.event_type: r for r in events_seasonality_r2(spark, "x").collect()}
    finally:
        RS.load_table = orig
    assert out["clock"].seasonal_r2 == 1.0
    assert out["noise"].seasonal_r2 == 0.0


def test_psi_drift_survives_single_period_metric(spark):
    """A metric whose events all fall in ONE period must not raise an
    ANSI divide-by-zero: the missing period's shares degrade to the
    floor, producing a large finite PSI."""
    from airflow_loan_etl_pipeline_spark.operators.stats import psi_drift

    rows = []
    eid = 0
    # "both": spans both halves. "early": entirely in the first half
    # (the global midpoint is set by "both"'s range).
    for day in ("2024-01-01", "2024-03-01"):
        for i in range(20):
            eid += 1
            rows.append((eid, f"{day} 00:{i:02d}:00", 1, "both",
                         float(i), ""))
    for i in range(20):
        eid += 1
        rows.append((eid, f"2024-01-02 00:{i:02d}:00", 1, "early",
                     float(i), ""))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.event_type: r for r in psi_drift(events).collect()}
    assert out["early"].n_cur == 0
    import math

    assert math.isfinite(out["early"].psi)
    assert out["early"].psi > 1.0  # total disappearance = massive drift


def test_exact_percentiles_distributed_matches_percentile(spark, sf_dir):
    """The range-partition/global-rank boundary computation must be
    bit-identical to Spark's single-buffer exact `percentile` (same
    p*(n-1) interpolation) — it exists to replace that aggregate's
    one-task merge at scale."""
    from airflow_loan_etl_pipeline_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).alias("cents")
    )
    probs = tuple(i / 10 for i in range(1, 10))
    got = ST.exact_percentiles_distributed(li, "cents", probs).collect()[0][
        "bs"
    ]
    plist = ", ".join(f"{p}D" for p in probs)
    want = li.agg(
        F.expr(f"percentile(cents, array({plist}))").alias("bs")
    ).collect()[0]["bs"]
    assert list(got) == list(want)


def test_exact_percentiles_twopass_matches_percentile(spark, sf_dir):
    """The two-pass histogram boundaries (no full-data shuffle) must
    also be bit-identical to exact `percentile` on an integer-valued
    column, including duplicate-heavy and tiny inputs."""
    from airflow_loan_etl_pipeline_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).alias("cents")
    )
    probs = (0.25, 0.5, 0.75, 0.9)
    got = ST.exact_percentiles_twopass(li, "cents", probs)
    plist = ", ".join(f"{p}D" for p in probs)
    want = li.agg(
        F.expr(f"percentile(cents, array({plist}))").alias("bs")
    ).collect()[0]["bs"]
    assert got == list(want)
    # duplicate-heavy + constant cases
    dup = spark.createDataFrame(
        [(v,) for v in [1, 1, 1, 2, 2, 3, 100, 100, 100, 100]], ["x"]
    )
    # sorted ranks 4,5 (0-indexed) hold 2 and 3 -> interpolated 2.5
    assert ST.exact_percentiles_twopass(dup, "x", (0.5,)) == [2.5]
    const = spark.createDataFrame([(7,)] * 5, ["x"])
    assert ST.exact_percentiles_twopass(const, "x", (0.1, 0.9)) == [7.0, 7.0]


def test_percentile_primitives_ignore_nulls(spark):
    """Both distributed exact-percentile recipes must skip NULLs the
    way Spark's `percentile` does (NULLs previously crashed the
    two-pass histogram walk and silently shifted distributed ranks)."""
    df = spark.createDataFrame(
        [(1,), (None,), (3,), (None,), (5,)], "x int"
    )
    want = df.agg(
        F.expr("percentile(x, array(0.5D))").alias("bs")
    ).collect()[0]["bs"]
    assert ST.exact_percentiles_twopass(df, "x", (0.5,)) == list(want)
    got = ST.exact_percentiles_distributed(df, "x", (0.5,)).collect()[0][
        "bs"
    ]
    assert list(got) == list(want)


def test_mad_anomalies_zero_mad_key_does_not_crash(spark):
    """ANSI-mode regression (review r6): a key where >=50% of values
    equal the median has MAD = 0; the modified z is undefined there —
    NULL, counted as not-anomalous — never a DIVIDE_BY_ZERO abort."""
    rows = [("flat", 5.0)] * 10 + [("flat", 9.0)] * 2
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {r["event_type"]: r.asDict() for r in ST.mad_anomaly_counts(df).collect()}
    assert out["flat"]["n_events"] == 12
    assert out["flat"]["n_anomalies"] == 0  # undefined z -> not counted
    assert out["flat"]["mad"] == 0.0


def test_welch_zero_variance_arms_yield_null_t(spark):
    """Both arms constant -> zero pooled variance -> t and df are NULL
    (undefined), not an ANSI DIVIDE_BY_ZERO abort."""
    rows = [("k", uid, 4.0) for uid in range(8)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    r = ST.ab_welch_test(df).collect()[0]
    assert r["n0"] == 4 and r["n1"] == 4
    assert r["t_stat"] is None and r["welch_df"] is None


def test_poisson_bootstrap_tiny_and_empty_inputs(spark):
    """Degenerate replicas (all weights 0) and empty inputs must yield
    NULL CI bounds, not DIVIDE_BY_ZERO / INVALID_ARRAY_INDEX."""
    one = spark.createDataFrame([(1, 10.0)], "k long, v double")
    r = ST.poisson_bootstrap_ci(one, "k", "v").collect()[0]
    assert r["n_rows"] == 1  # runs; bounds may be NULL or 10.0
    empty = spark.createDataFrame([], "k long, v double")
    r = ST.poisson_bootstrap_ci(empty, "k", "v").collect()[0]
    assert r["n_rows"] == 0
    assert r["boot_lo"] is None and r["boot_hi"] is None


def test_benford_first_significant_digit_subunit_amounts(spark):
    """Benford must use the first SIGNIFICANT digit: 0.75 -> 7 (the old
    floor+substr form extracted 0 and divided by zero in the share)."""
    df = spark.createDataFrame(
        [(0.75,), (0.075,), (7.5,), (750.0,), (0.2,)], "amt double"
    )
    got = {r["digit"]: r["n_rows"] for r in
           ST.benford_first_digit(df, "amt").collect()}
    assert got == {7: 4, 2: 1}


def test_js_divergence_disjoint_vocabularies_emit_ln2(spark):
    """Two sources sharing zero tokens are MAXIMALLY divergent — the
    pair must appear with js = ln(2), not vanish from the gauge
    (review r6: the shared-token inner join omitted exactly the
    most-drifted pairs)."""
    import math

    df = spark.createDataFrame(
        [("s1", 1, "aa bb aa"), ("s2", 2, "cc dd ee")],
        "source string, doc_id long, text string",
    )
    rows = {(r["source_a"], r["source_b"]): r.asDict()
            for r in ST.js_divergence_by_key(df).collect()}
    r = rows[("s1", "s2")]
    assert r["n_shared_tokens"] == 0
    assert abs(r["js_divergence"] - round(math.log(2.0), 6)) < 1e-9


def test_psi_drift_all_in_current_key_surfaces_with_max_drift(spark):
    """A metric that first appears AFTER the midpoint (no reference
    events) must surface with n_ref = 0 and a large floored-reference
    PSI — not silently vanish through the threshold join."""
    from datetime import datetime

    rows = [
        ("old", datetime(2024, 1, 1, h), 1.0 + h) for h in range(10)
    ] + [
        ("new", datetime(2024, 1, 1, 9, 30), 5.0),
        ("new", datetime(2024, 1, 1, 9, 45), 6.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {r["event_type"]: r.asDict() for r in ST.psi_drift(df).collect()}
    assert "new" in out, "all-in-current key must not vanish"
    assert out["new"]["n_ref"] == 0 and out["new"]["n_cur"] == 2
    assert out["new"]["psi"] > 1.0  # floored reference -> maximal drift


def test_chi2_null_categories_are_real_categories(spark):
    """NULL metadata is a category: its cells must survive the marginal
    joins (null-safe) and count toward the table dimensions — a plain
    join dropped the cells while their mass stayed in n, inflating
    chi2 (review r6)."""
    rows = [("en", "web")] * 4 + [("en", None)] * 3 + [(None, "web")] * 2
    df = spark.createDataFrame(rows, "lang string, source string")
    r = ST.chi_square_independence(df, "lang", "source").collect()[0]
    assert r["n_observed_cells"] == 3
    assert r["dof"] == 1  # 2 langs (en, NULL) x 2 sources (web, NULL)
    # all mass accounted: chi2 finite and non-negative
    assert r["chi2"] is not None and r["chi2"] >= 0


def test_null_key_groups_survive_threshold_joins(spark):
    """winsorized / MAD / seasonal operators: a NULL key is a real
    group — it must appear in the output, not be dropped by the
    threshold join-back (repo null-safe group-key rule)."""
    from datetime import datetime

    rows = [(None, datetime(2024, 1, 1, 1), float(v)) for v in range(10)]
    rows += [("k", datetime(2024, 1, 1, 2), 1.0)] * 3
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    w = {r["event_type"]: r for r in ST.winsorized_stats(df).collect()}
    assert None in w and w[None]["n_events"] == 10
    m = {r["event_type"]: r for r in ST.mad_anomaly_counts(df).collect()}
    assert None in m and m[None]["n_events"] == 10
    s = {r["event_type"]: r for r in ST.seasonal_anomaly_counts(df).collect()}
    assert None in s and s[None]["n_events"] == 10
    # psi_drift joined plainly until ADVICE r6 — the NULL-key metric
    # vanished through the threshold and totals joins
    p = {r["event_type"]: r for r in ST.psi_drift(df).collect()}
    assert None in p and p[None]["n_ref"] == 10 and p[None]["n_cur"] == 0
    assert "k" in p and p["k"]["n_ref"] == 0 and p["k"]["n_cur"] == 3

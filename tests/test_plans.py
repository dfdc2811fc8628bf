"""Physical-plan shape assertions (SURVEY.md §4): the properties that
make these queries survive a 100 TB scale-up — predicate pushdown to the
parquet scan, column pruning, broadcast joins for dims, TakeOrdered
top-k (no full sort), partial+final aggregation, whole-stage codegen.

Catching a regression here (a filter that stops pushing down, a dim
join that silently becomes a sort-merge shuffle) matters as much as a
wrong answer: at sf0.001 both plans give identical rows; at 100 TB one
of them doesn't finish.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark import registry
from airflow_loan_etl_pipeline_spark import registry_mm  # noqa: F401
from airflow_loan_etl_pipeline_spark import registry_rel  # noqa: F401
from airflow_loan_etl_pipeline_spark import registry_stats  # noqa: F401
from airflow_loan_etl_pipeline_spark import registry_stream  # noqa: F401
from airflow_loan_etl_pipeline_spark import registry_text  # noqa: F401
from airflow_loan_etl_pipeline_spark.catalog import load_table


import pytest

from airflow_loan_etl_pipeline_spark.operators import cache_scope


@pytest.fixture(autouse=True, scope="module")
def _capture_materialization_plans():
    """Materialization-plan capture is opt-in (production paths skip
    the explain rendering); the plan-contract tests need it on."""
    cache_scope.set_plan_capture(True)
    yield
    cache_scope.set_plan_capture(False)


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushes_down_to_parquet_scan(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") < 5)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5.0)" in plan

def test_column_pruning_reaches_read_schema(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    # ReadSchema lists ONLY the projected columns — a scan that reads all
    # 11 lineitem columns for a 2-column projection is wrong.
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema and "l_returnflag" not in read_schema


def test_dim_join_broadcasts(spark, sf_dir):
    plan = _plan(registry.QUERIES["nation_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_plans_take_ordered_not_full_sort(spark, sf_dir):
    plan = _plan(registry.QUERIES["topk_segments"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_aggregate_is_partial_then_final(spark, sf_dir):
    plan = _plan(registry.QUERIES["loan_agg"](spark, sf_dir))
    # map-side partial + post-shuffle final
    assert plan.count("HashAggregate") >= 2
    # Codegen spans only materialize in the explain output once AQE has
    # finalized stages; flip AQE off to assert the static plan compiles
    # whole-stage codegen for the aggregate pipeline.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        codegen = _plan(registry.QUERIES["loan_agg"](spark, sf_dir), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in codegen and "Found 0" not in codegen


def test_anti_join_ledger_broadcasts(spark, sf_dir):
    plan = _plan(registry.QUERIES["customers_without_orders"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_gapfill_broadcast_hint_honored(spark, sf_dir):
    """VERDICT r1 item 2: the hint must sit on the BUILD (right) side of
    the left-outer join — a left-side hint is silently dropped and the
    join degrades to a shuffle."""
    plan = _plan(registry.QUERIES["events_gapfill_10min"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_assignment_is_map_side(spark, sf_dir):
    """VERDICT r1 item 3: centroid assignment must not shuffle the
    corpus — no Window, no shuffle exchange anywhere in the IVF plan
    (the only exchanges allowed are broadcasts of the tiny centroid/
    probe sides and the final TakeOrdered singlePartition gather)."""
    plan = _plan(registry.QUERIES["embeddings_ivf_topk"](spark, sf_dir))
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime row-level filtering: a selective dim-side predicate
    should inject a bloom filter (or DPP subquery) into the fact scan
    side so non-matching fact rows die before the shuffle — the 100 TB
    difference between shuffling 2% and 100% of lineitem."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    # Injection requires the application (fact) side to scan more than
    # this threshold — default 10GB, far above any test fixture. At
    # production scale the default is the right guard; here we lower it
    # to observe the rewrite itself.
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    # Force the non-broadcast path: bloom filters only apply when the
    # join is shuffle-based (broadcast joins already prune at probe).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower()
        assert "bloom_filter_agg" in plan.lower()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "10GB",
        )


def test_q21_top2_rewrite_has_no_fact_self_join(spark, sf_dir):
    """The r9 top-2 aggregate rewrite must hold: lineitem is scanned
    exactly TWICE (the per-(order, supplier) max aggregate and the
    qualifying-row probe) — the EXISTS/NOT EXISTS predecessor scanned
    it three times and sorted it twice for fact-to-fact self-joins
    (26.9 s -> 10.5 s at 100x). The bounded per-order top-2 rides a
    collect_list whose size is suppliers-per-order."""
    import airflow_loan_etl_pipeline_spark.registry_sql  # noqa: F401

    plan = _plan(registry.QUERIES["q21_last_shipper"](spark, sf_dir))
    assert plan.count("lineitem.parquet") == 2, plan
    assert "collect_list" in plan


def test_decontaminate_broadcasts_benchmark_shingles(spark, sf_dir):
    # The training corpus must never shuffle: the benchmark shingle set
    # is the broadcast build side; any SortMergeJoin here would shuffle
    # 100 TB of training shingles to meet a tiny eval suite.
    plan = _plan(registry.QUERIES["docs_decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_heavy_hitters_verify_join_broadcasts_candidates(spark, sf_dir):
    # Phase-2 recount: candidate set broadcast into the scan-side
    # semi-join, so tail keys are filtered before the count shuffle.
    plan = _plan(registry.QUERIES["docs_heavy_tokens"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_chunking_is_shuffle_free(spark, sf_dir):
    # Pure map-side explode: any Exchange would mean chunking shuffles
    # the corpus.
    plan = _plan(registry.QUERIES["docs_chunks"](spark, sf_dir))
    assert "Exchange" not in plan


def test_pii_scrub_is_shuffle_free_codegen(spark, sf_dir):
    plan = _plan(registry.QUERIES["docs_pii_scrub"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "codegen id" in plan  # formatted mode's whole-stage marker


def test_pack_sequences_partitions_by_source(spark, sf_dir):
    # The running-sum window must partition by source (no global
    # single-partition window), and the window input is (source, id,
    # n_tok) — the text column must not survive into the exchange.
    plan = _plan(registry.QUERIES["docs_pack_sequences"](spark, sf_dir))
    assert "hashpartitioning(source" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" in read_schema  # scanned to size tokens...
    windows = [ln for ln in plan.splitlines() if "Window" in ln][0]
    assert "text" not in windows  # ...but never enters the window


def test_trend_regression_is_single_partial_final_agg(spark, sf_dir):
    """The regr_* trend query must be one partial+final hash aggregate
    over the scan - no window, no join, one exchange on the group key."""
    plan = _plan(registry.QUERIES["events_trend_regression"](spark, sf_dir))
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "partial_regr_slope" in plan  # map-side co-moment partials
    assert "Window" not in plan and "Join" not in plan


def test_basket_lift_broadcasts_dim_and_counts(spark, sf_dir):
    """Part dim and the brand-count sides must broadcast; the only
    sort-merge-eligible join is the basket self-join on orderkey."""
    plan = _plan(registry.QUERIES["basket_brand_lift"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_bm25_broadcasts_docfreq_and_corpus_stats(spark, sf_dir):
    """df table and corpus stats are vocabulary-sized global state -
    they must reach the score map-side as broadcasts, leaving one
    shuffle keyed on (doc, term) plus the final per-doc aggregate."""
    plan = _plan(registry.QUERIES["docs_bm25_scores"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row corpus stats cross join


def test_source_divergence_broadcasts_totals(spark, sf_dir):
    """Per-source token totals (K rows) broadcast into the distribution
    projection; the pair join shuffles vocabulary-sized distributions,
    never documents."""
    plan = _plan(registry.QUERIES["docs_source_divergence"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_rfm_segments_has_no_window(spark, sf_dir):
    """RFM scoring must avoid the textbook global ntile (a single-
    partition window): thresholds arrive as a 1-row broadcast cross
    join, scoring is scan-local, and the only exchanges are the two
    map-side-combinable aggregates."""
    plan = _plan(registry.QUERIES["orders_rfm_segments"](spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row thresholds
    assert "partial_percentile" in plan  # percentile agg is partial+final


def test_shuffle_order_never_single_partitions_the_corpus(spark, sf_dir):
    """The global training-order rank must use the distributed recipe
    (range partition + per-partition local rank + broadcast offsets).
    The documents table must NEVER pass through Exchange
    SinglePartition — the only SinglePartition allowed is the
    parallelism-sized offset aggregate."""
    # clear first: a stale ring entry from an earlier test must never
    # satisfy these assertions
    cache_scope.clear_materialization_plans()
    plan = _plan(registry.QUERIES["corpus_shuffle_order"](spark, sf_dir))
    # the ranked frame is checkpoint-materialized, so the range
    # partitioning + partition-id stamp live in the MATERIALIZATION
    # plan (cache_scope ring), not the truncated result plan
    mats = cache_scope.recent_materialization_plans()
    assert len(mats) == 1
    mat = mats[-1]
    assert "Arguments: rangepartitioning" in mat
    assert "spark_partition_id" in mat.lower()
    assert "Arguments: SinglePartition" not in mat  # corpus never funnels
    # offsets reach the rank join as a broadcast, never a shuffle
    assert "BroadcastHashJoin" in plan
    # a SinglePartition exchange may only feed a Window/agg over the
    # tiny _pid counts — it must never sit directly on the corpus scan
    lines = plan.splitlines()
    for i, l in enumerate(lines):
        if "Arguments: SinglePartition" in l:
            ctx = "\n".join(lines[max(0, i - 6): i])
            assert "Scan parquet" not in ctx and "ExistingRDD" not in ctx


def test_containment_pins_aqe_exempt_repartition(spark, sf_dir):
    """The containment pair expansion must ride the numbered,
    AQE-exempt repartition on the shingle hash (REPARTITION_BY_NUM) so
    the multiply-out stage can't be coalesced serial — the same pin the
    Jaccard generator carries. (At fixture scale one join side
    broadcasts; at corpus scale the shared exchange makes the self-join
    shuffle-free on both sides.)"""
    plan = _plan(registry.QUERIES["ngram_containment_pairs"](spark, sf_dir))
    assert "REPARTITION_BY_NUM" in plan


def test_length_rebalance_window_is_per_bucket(spark, sf_dir):
    """The rebalance window must partition BY BUCKET (parallel), never
    be a global window, and the target size must broadcast."""
    plan = _plan(registry.QUERIES["corpus_length_rebalance"](spark, sf_dir))
    assert "Window" in plan
    assert "partitionBy=[bucket" in plan.replace(" ", "").replace(
        "partitionBy=[bucket", "partitionBy=[bucket"
    ) or "hashpartitioning(bucket" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row n_target


def test_active_users_7d_broadcasts_day_axis(spark, sf_dir):
    """The rolling-distinct recipe must range-join the (day,user) fact
    against a BROADCAST day axis — never shuffle the fact for the
    window fan-out."""
    plan = _plan(registry.QUERIES["events_active_users_7d"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # range condition, tiny axis


def test_referential_audit_one_scan_per_child_broadcast_probes(spark, sf_dir):
    """Edges sharing a child table audit in ONE child scan (r8 rework:
    4 child scans + 6 key-only parent scans = 10, vs 18 when each edge
    anti-probed and counted separately); every orphan probe is a
    broadcast LeftOuter null-count — facts never shuffle against their
    parents, and no anti-join remains."""
    plan = _plan(
        registry.QUERIES["referential_integrity_audit"](spark, sf_dir)
    )
    assert plan.count("BroadcastHashJoin") >= 6
    assert "LeftAnti" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 10


def test_abc_classes_no_single_partition_over_customers(spark, sf_dir):
    """The prefix-sum recipe: any SinglePartition exchange may only sit
    over pre-aggregated partition totals, never a table scan."""
    cache_scope.clear_materialization_plans()
    plan = _plan(registry.QUERIES["orders_abc_classes"](spark, sf_dir))
    # the ranged frame is checkpoint-materialized; its range exchange
    # lives in the materialization plan (see corpus_shuffle_order test)
    mats = cache_scope.recent_materialization_plans()
    assert len(mats) == 1
    mat = mats[-1]
    assert "Arguments: rangepartitioning" in mat
    assert "Arguments: SinglePartition" not in mat
    lines = plan.splitlines()
    for i, l in enumerate(lines):
        if "Arguments: SinglePartition" in l:
            ctx = "\n".join(lines[max(0, i - 6): i])
            assert "Scan parquet" not in ctx


def test_ohlc_and_latest_state_have_no_window(spark, sf_dir):
    """Order-aware first/last must plan as min_by/max_by hash
    aggregates (map-side partials), never a per-key window sort."""
    for name in ("events_ohlc_hourly", "events_latest_state"):
        plan = _plan(registry.QUERIES[name](spark, sf_dir))
        assert "Window" not in plan, name
        # struct-ordered min_by/max_by buffers aren't hash-aggregable,
        # so Spark plans SortAggregate — still partial (map-side) +
        # final, which is the property that matters: one shuffle of
        # per-partition candidates, never a per-key window sort.
        assert "partial_m" in plan, name  # partial_min_by / partial_max_by
        assert "Aggregate" in plan, name


def test_seasonal_anomalies_broadcasts_grid(spark, sf_dir):
    """The (type, dow, hour) seasonal grid is bounded at |types|x168
    rows and must come back as a broadcast join — the facts are never
    shuffled on the cell key for scoring."""
    plan = _plan(registry.QUERIES["events_seasonal_anomalies"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_batch_topk_per_query_window_is_two_stage(spark, sf_dir):
    """Exact batched retrieval: the first row_number cut must partition
    by (query, input partition) so the corpus never funnels into
    |queries| partitions; scoring joins the query batch broadcast."""
    plan = _plan(registry.QUERIES["embeddings_batch_topk"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # broadcast query batch
    assert plan.count("windowspecdefinition") == 2
    assert "SPARK_PARTITION_ID" in plan.upper()
    # Spark additionally pushes the rank cut below each window's sort
    assert "WindowGroupLimit" in plan


def test_dimension_stats_is_partial_final_agg(spark, sf_dir):
    """posexplode then a |dims|-key aggregate: partial aggregation must
    collapse map-side (two HashAggregates around one |dims|-key
    exchange), no window, no sort."""
    plan = _plan(registry.QUERIES["embedding_dim_stats"](spark, sf_dir))
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "Generate posexplode" in plan or "posexplode" in plan


def test_pareto_frontier_never_self_joins(spark, sf_dir):
    """The skyline must run the distributed prefix-max recipe: no
    NestedLoop/cartesian self-join, and any SinglePartition exchange
    sits over the per-partition maxima (parallelism-sized), never the
    table."""
    plan = _plan(registry.QUERIES["part_pareto_frontier"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "NestedLoopJoin" not in plan.replace("BroadcastNestedLoopJoin", "")
    # frontier pairs come back broadcast
    assert "BroadcastHashJoin" in plan


def test_prefix_filter_verification_not_inverted_index(spark, sf_dir):
    """PPJoin shape: the exact-verify stage must fetch per-doc shingle
    arrays (array_intersect on collected sets), not re-expand the full
    inverted index a second time. Since r8 the per-doc (set, prefix)
    frame is checkpoint-materialized (four consuming branches), so the
    doc-keyed collect_list aggregate lives in the MATERIALIZATION plan
    and the result plan reads stored rows."""
    cache_scope.clear_materialization_plans()
    plan = _plan(
        registry.QUERIES["ngram_jaccard_pairs_prefix"](spark, sf_dir)
    )
    assert "array_intersect" in plan
    mats = cache_scope.recent_materialization_plans()
    # r10: on the all-distinct fixture the adaptive probe BYPASSES the
    # exact-dedup harness, so only the per-doc (set, prefix) frame the
    # PPJoin core builds is materialized. The harness route (dup-heavy
    # input) is pinned separately below.
    assert len(mats) == 1
    assert any("collect_list" in m for m in mats)
    # prefix + verification set come from ONE doc-keyed aggregate —
    # no per-doc window sort anywhere, in any plan
    assert "Window" not in plan
    assert all("Window" not in m for m in mats)

    # harness route: a copy-heavy frame (ratio far below the bypass
    # cutoff) must add the exact-dedup member-map materialization (md5
    # fingerprint -> doc id) in front of the PPJoin core.
    from airflow_loan_etl_pipeline_spark.operators import dedup as D

    heavy = (
        spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon") for i in range(40)]
            + [(100 + i, f"zeta eta theta iota tok{i}") for i in range(4)],
            "doc_id long, text string",
        )
    )
    cache_scope.clear_materialization_plans()
    _plan(D.prefix_filter_jaccard_pairs(heavy))
    mats2 = cache_scope.recent_materialization_plans()
    assert len(mats2) == 2
    assert any("md5" in m for m in mats2)


def test_feature_matrix_is_single_scan_no_shuffle(spark, sf_dir):
    """The fused feature export must stay one scan-local projection —
    no exchange, no join (the join lives only in the oracle)."""
    plan = _plan(registry.QUERIES["docs_feature_matrix"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "Join" not in plan
    # formatted explain prints the single scan node twice (tree + detail)
    assert plan.count("Scan parquet") <= 2


def test_recent_bounded_frames_broadcast(spark, sf_dir):
    """The continuation queries' bounded side-tables (segment sizes,
    month/nation totals, probability-model broadcasts) must come back
    as broadcast joins — facts never shuffle to meet bounded state."""
    for name, want in (
        ("audience_overlap_matrix", "BroadcastHashJoin"),
        ("supplier_revenue_hhi", "BroadcastHashJoin"),
        ("events_psi_drift", "BroadcastHashJoin"),
        ("docs_unigram_logprob", "BroadcastHashJoin"),
    ):
        plan = _plan(registry.QUERIES[name](spark, sf_dir))
        assert want in plan, name


def test_changepoint_argmax_is_aggregate_not_second_sort(spark, sf_dir):
    """CUSUM: one time-ordered window builds the running sums; the
    argmax must be a max_by aggregate, not a second per-key sort."""
    plan = _plan(registry.QUERIES["events_changepoint"](spark, sf_dir))
    assert plan.count("windowspecdefinition") <= 2  # rn + running sum share one window
    assert "max_by" in plan


def test_substring_cut_path_is_native_anti_join(spark, sf_dir):
    """The cut path must be a LEFT ANTI on (doc, position) with the
    sorted-struct rebuild — no window, no extra Python stage beyond the
    one shingle emitter."""
    plan = _plan(registry.QUERIES["docs_substring_cut"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "sort_array" in plan
    # ONE Arrow execution: the hashed shingle rows are materialized
    # once (eager checkpoint), so every consumer reads the stored
    # ExistingRDD scan and the Python emitter runs once no matter how
    # many branches reference it. (The earlier window-count form also
    # ran it once but put every occurrence of a hot n-gram into a
    # single task — unbounded skew at scale; the materialized agg+join
    # combines df map-side and AQE can split the skewed join
    # partitions.)
    assert "ExistingRDD" in plan
    # no df WINDOW over the hash key anywhere in the cut path
    assert "windowspecdefinition(sh" not in plan


def test_median_bootstrap_no_weight_expansion_or_exact_percentile(
    spark, sf_dir
):
    """The replica medians must come from cumulative weights over the
    32x replica fan-out — exactly ONE generator (the replica explode),
    no x-weight row expansion, and no single-buffer exact `percentile`
    over exploded rows (the only percentile allowed is the global
    median over the raw orders scan)."""
    from airflow_loan_etl_pipeline_spark import registry_stats  # noqa: F401

    plan = _plan(
        registry.QUERIES["orders_median_bootstrap_ci"](spark, sf_dir)
    )
    # the only generator is the 32-replica fan-out (the literal
    # sequence(1,32) constant-folds to an UnsafeArrayData literal;
    # formatted explain prints the Generate node twice: tree + detail)...
    assert plan.count("Generate") == 2
    # ...never a per-row x-weight expansion
    assert "sequence(1, _w" not in plan and "sequence(1, cast(_w" not in plan
    # the only exact percentile is the global median (formatted explain
    # prints its partial+final aggregate expressions <= 4 times); the
    # replica medians come from the cumulative-weight window on b
    assert plan.count("percentile(") <= 4
    assert "windowspecdefinition(b" in plan


def test_equidepth_hist_plan_scale_shape(spark, sf_dir):
    """The lazy counting-sort equi-depth plan (stats._by_value_frames +
    equidepth_histogram) must keep its 100 TB-safe shape: no
    single-buffer exact `percentile` (every group in one task's
    memory), no global range sort, no cartesian product over data, and
    every join broadcast (candidate list / one-row boundary array).
    Windows ARE allowed — they run over the level-1/level-2 frames,
    which are bounded by the value DOMAIN (<= domain/block and <= block
    rows per partition), never by the fact row count."""
    from airflow_loan_etl_pipeline_spark import registry_mm  # noqa: F401

    cache_scope.clear_materialization_plans()
    plan = _plan(registry.QUERIES["lineitem_equidepth_hist"](spark, sf_dir))
    # the level-1/level-2 reductions are materialized once (share=True)
    # — exchange reuse measurably did NOT fire across the histogram's
    # branches (5 fact scans in the AQE final plan before the share);
    # now the two materializations hold the only fact scans and the
    # final plan reads stored frames exclusively
    mats = cache_scope.recent_materialization_plans()
    assert len(mats) == 2
    for m in mats:
        assert m.count("Location: InMemoryFileIndex") == 1
        assert "percentile" not in m
        assert "rangepartitioning" not in m
        assert "CartesianProduct" not in m
        assert "SortMergeJoin" not in m
    # candidate-block filtering reaches the level-2 fact scan as a
    # broadcast HASH join, not a shuffle
    assert "BroadcastHashJoin" in mats[1]
    assert "Location: InMemoryFileIndex" not in plan  # no third scan
    assert "percentile" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # a global sort over the fact would plan as range partitioning
    assert "rangepartitioning" not in plan
    # the one-row boundary broadcast is the only nested-loop join
    # (formatted explain prints each node in tree + detail)
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_incremental_neardup_shares_band_key_derivation(spark, sf_dir):
    """The admission pipeline (dedup_incremental_neardup) derives the
    batch band keys ONCE via eager materialization — the r7 plan
    re-derived the shingle->minhash pass per consuming branch (22
    scans). Round 11 (driver-bounded fast path): the corpus screen,
    the within-batch pair graph, AND the batch id set ride ONE
    collect, so the contract is ONE materialization (the fresh-side
    band keys, one parquet scan) and a RESULT plan that is a LOCAL
    RELATION — the decisions are assembled on the driver, so the plan
    holds no file scan, no join, no shuffle at all; the expensive text
    column never leaves the materialization."""
    from airflow_loan_etl_pipeline_spark import registry_text  # noqa: F401

    cache_scope.clear_materialization_plans()
    plan = _plan(registry.QUERIES["dedup_incremental_neardup"](spark, sf_dir))
    mats = cache_scope.recent_materialization_plans()
    assert len(mats) == 1
    assert mats[0].count("Location: InMemoryFileIndex") == 1
    assert "CartesianProduct" not in mats[0]
    # result plan: a driver-assembled local relation (LocalTableScan
    # when small enough to stay literal, Scan ExistingRDD via the
    # parallelized local-relation path) — never a file re-scan,
    # shuffle, or join
    assert plan.count("Location: InMemoryFileIndex") == 0
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan


def test_corpus_build_shares_stage_survivor_sets(spark, sf_dir):
    """The capstone corpus build materializes each stage's survivor ID
    set once (exact-dedup reps; cluster reps) so the quality+md5 gate
    lineage never re-derives per downstream branch — the r7 plan
    re-scanned documents 19 times. Contract: exactly two top-level
    materializations, and the result plan holds only the genuine
    text-reading scans (decontamination pair + final token count +
    benchmark side)."""
    from airflow_loan_etl_pipeline_spark import registry_text  # noqa: F401

    cache_scope.clear_materialization_plans()
    plan = _plan(registry.QUERIES["corpus_build_summary"](spark, sf_dir))
    mats = [
        m
        for m in cache_scope.recent_materialization_plans()
        if "Location: InMemoryFileIndex" in m or "Scan ExistingRDD" in m
    ]
    assert len(mats) >= 2
    assert plan.count("Location: InMemoryFileIndex") <= 4
    assert "Scan ExistingRDD" in plan  # stored survivor id sets
    assert "CartesianProduct" not in plan


def test_audience_overlap_is_single_scan_pair_expansion(spark, sf_dir):
    """Audience overlap must read events ONCE: per-user sorted type
    sets, every ordered pair (incl. the self-pair carrying the segment
    size) exploded map-side, and the bounded cell frame materialized —
    the r7 shape self-joined a distinct (type, user) frame and scanned
    events four times. Result plan: stored cells + broadcast size
    joins, no parquet scan, no sort-merge self-join."""
    cache_scope.clear_materialization_plans()
    plan = _plan(registry.QUERIES["audience_overlap_matrix"](spark, sf_dir))
    mats = cache_scope.recent_materialization_plans()
    assert len(mats) == 1
    # one events scan inside the materialization (formatted explain
    # prints the scan node twice: tree + detail)
    assert mats[0].count("Scan parquet") <= 2
    assert "collect_set" in mats[0]
    assert "Scan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_kmv_similarity_materializes_sketch_once(spark, sf_dir):
    """The KMV slice-similarity sketch (|slices| x k rows) feeds three
    plan branches (both sides of the pair cross + the membership join);
    it must be materialized once so the corpus-sized (slice, hash)
    distinct runs a single time. Result plan reads stored sketch rows
    only."""
    from airflow_loan_etl_pipeline_spark import registry_text  # noqa: F401

    cache_scope.clear_materialization_plans()
    plan = _plan(registry.QUERIES["source_kmv_similarity"](spark, sf_dir))
    mats = cache_scope.recent_materialization_plans()
    assert len(mats) == 1
    assert mats[0].count("Scan parquet") <= 2  # tree + detail of ONE scan
    assert "Scan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_pmi_bigrams_never_shuffles_the_corpus(spark, sf_dir):
    """Bigrams must explode map-side from arrays_zip(slice, slice) —
    codegen, no corpus-sized (doc, pos) self-join exchange. The
    vocabulary-bounded unigram frame (three consumers: two PMI
    denominator joins + the token total) is materialized once; the
    result plan holds exactly one parquet scan (the bigram pass) and
    no window/sort-merge over exploded tokens."""
    from airflow_loan_etl_pipeline_spark import registry_text  # noqa: F401

    cache_scope.clear_materialization_plans()
    plan = _plan(registry.QUERIES["docs_pmi_bigrams"](spark, sf_dir))
    mats = cache_scope.recent_materialization_plans()
    assert len(mats) == 1
    assert mats[0].count("Scan parquet") <= 2  # tree + detail of ONE scan
    assert plan.count("Scan parquet") <= 2
    assert "arrays_zip" in plan
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan

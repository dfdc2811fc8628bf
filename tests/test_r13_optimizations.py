"""Round-13 optimization pins: the rewrites are value-IDENTICAL.

Focused equivalence/mechanism tests for OPTIMIZATION_r13.md:

- dup_clusters NULL-endpoint pairs must not crash the driver fast
  path, and both routes must agree (ADVICE r12).
- dup_clusters' fallback must not re-evaluate the pairs subtree after
  a failed driver probe (VERDICT r12 item 4): the probe pins the pair
  frame, so the loop reads a LogicalRDD scan, not the generator.
- the loop's edge-frame cache pattern (numbered repartition + persist)
  must expose a stable hash partitioning to the per-round join — the
  edge side of the propagate join carries NO exchange.
- orders_median_bootstrap_ci's histogram collapse must be
  value-identical to the row-expanded window form (it is pinned by the
  unchanged DuckDB oracle too; this is the focused unit).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.operators import dedup as D


def test_dup_clusters_null_endpoints_fast_path(spark):
    """ADVICE r12: NULL pair endpoints previously raised TypeError in
    the driver union-find (None not comparable); the distributed loop
    drops them via join non-matches. Both paths must now agree."""
    pairs = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None), (5, 6)],
        "doc_a long, doc_b long",
    )
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    fast = {
        r.doc_id: r.cluster_id for r in D.dup_clusters(docs, pairs).collect()
    }
    dist = {
        r.doc_id: r.cluster_id
        for r in D.dup_clusters(docs, pairs, driver_max_pairs=0).collect()
    }
    assert fast == dist
    assert fast[2] == 1 and fast[6] == 5
    # null-incident endpoints are singletons, exactly like the loop
    assert fast[3] == 3 and fast[4] == 4


def test_dup_clusters_fallback_reads_pinned_pairs(spark):
    """VERDICT r12 item 4: when the driver probe overflows the cap the
    fallback loop must reuse the PINNED pair rows — the pairs subtree
    (at scale: shingle → minhash → band join) is evaluated once, not
    once for the probe and again for the loop. Detected via an
    evaluation-counting Python accumulator inside the pair plan."""
    acc = spark.sparkContext.accumulator(0)

    @F.udf("long")
    def counted(x):
        acc.add(1)
        return x

    counted = counted.asNondeterministic()  # keep a single evaluation site
    base = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    pairs = base.select(counted("doc_a").alias("doc_a"), "doc_b")
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    out = {
        r.doc_id: r.cluster_id
        for r in D.dup_clusters(docs, pairs, driver_max_pairs=2).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}
    # one evaluation of the 3-row pair frame = 3 accumulator ticks;
    # the pre-fix shape re-evaluated it for the loop (6+)
    assert acc.value == 3, f"pairs subtree evaluated {acc.value / 3:g} times"


def test_dup_clusters_loop_edge_cache_is_exchange_free(spark):
    """The loop's edge-frame pattern — numbered repartition by src +
    persist — must expose a stable HashPartitioning to the per-round
    propagate join: no shuffle exchange above the edge side's cache
    scan. (localCheckpoint loses partitioning under AQE — measured —
    which is why the operator persists the edge frame instead.)"""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ue = (
            spark.createDataFrame(
                [(i, i + 1) for i in range(100)], "src long, dst long"
            )
            .repartition(8, "src")
            .persist()
        )
        ue.count()
        labels = spark.range(100).select(
            F.col("id").alias("node"), F.col("id").alias("lbl")
        )
        j = ue.join(labels, ue.src == labels.node)
        plan = j._jdf.queryExecution().executedPlan().toString()
        # exactly one join-inserted (ENSURE_REQUIREMENTS) exchange — the
        # labels side; the cached edge side must reuse its partitioning.
        # (The cache subtree's own REPARTITION_BY_NUM exchange renders
        # inside the InMemoryRelation and is the one-time build cost.)
        ensure = [
            ln
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
            and "ENSURE_REQUIREMENTS" in ln
        ]
        assert len(ensure) == 1 and "node" in ensure[0], plan
        assert "InMemoryTableScan" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bootstrap_histogram_collapse_is_value_identical(spark):
    """orders_median_bootstrap_ci r13: collapsing tied (replica, cents)
    rows into a weight histogram before the per-replica window must
    reproduce the row-expanded weighted-median math bit-for-bit —
    including tie-heavy and single-value replicas."""
    from pyspark.sql import Window

    rows = [
        (1, 100.0, 2),
        (1, 100.0, 1),
        (1, 200.0, 3),
        (1, 300.0, 1),
        (2, 50.0, 1),
        (2, 50.0, 1),
        (3, 70.0, 5),
    ]
    weighted = spark.createDataFrame(rows, "b int, _vc double, _wt int")

    def medians(frame):
        wcum = (
            Window.partitionBy("b")
            .orderBy("_vc")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wtot = Window.partitionBy("b")
        t = frame.withColumn("_cum", F.sum("_wt").over(wcum)).withColumn(
            "_tot", F.sum("_wt").over(wtot)
        )
        p = (F.col("_tot") - 1) / 2.0
        lo, hi = F.floor(p), F.ceil(p)
        prev = F.col("_cum") - F.col("_wt")
        pb = (
            t.select(
                "b",
                p.alias("_p"),
                lo.alias("_lo"),
                F.when(
                    (prev <= lo) & (lo < F.col("_cum")), F.col("_vc")
                ).alias("_vlo"),
                F.when(
                    (prev <= hi) & (hi < F.col("_cum")), F.col("_vc")
                ).alias("_vhi"),
            )
            .groupBy("b")
            .agg(
                (
                    (
                        F.max("_vlo")
                        + (F.max("_p") - F.max("_lo"))
                        * (F.max("_vhi") - F.max("_vlo"))
                    )
                    / 100.0
                ).alias("med_b")
            )
        )
        return {r.b: r.med_b for r in pb.collect()}

    expanded = medians(weighted)
    collapsed = medians(
        weighted.groupBy("b", "_vc").agg(F.sum("_wt").alias("_wt"))
    )
    assert expanded == collapsed
    # hand-checked: replica 1 weights {100:3, 200:3, 300:1}, W=7, p=3
    # -> expanded position 3 is the first 200
    assert collapsed[1] == 2.0
    assert collapsed[2] == 0.5 and collapsed[3] == 0.7

"""Round-12 optimization pins: the rewrites are value-IDENTICAL.

Each optimization in OPTIMIZATION_r12.md that changed an operator's
internals gets a focused equivalence test here:

- `_dot_self_py` (driver-side centroid self-dot embedded as a literal)
  must replay the SQL aggregate fold bit-for-bit, including NULL
  poisoning and NaN/Inf propagation.
- `_scores_expr` (hoisted-norm centroid scores) must equal the
  pre-hoist three-dot formulation bit-for-bit on random vectors.
- `_spread_for_python` must repartition narrow inputs (the fixture
  case) and pass wide inputs through unshuffled.
- the threaded `dedup_funnel_summary` local relation must equal the
  four crossJoined aggregates it replaced.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.operators import dedup as D
from airflow_loan_etl_pipeline_spark.operators import similarity as S


def test_dot_self_py_matches_sql_fold(spark):
    vecs = [
        None,
        [],
        [1.5, -2.25, 3.125],
        [0.1, 0.2, 0.3],                      # non-representable doubles
        [float("nan"), 1.0],
        [1.0, float("inf")],
        [float("inf"), float("nan")],
        [1.0, None, float("nan")],            # NULL then NaN -> NULL
        [float("nan"), None],                 # NaN then NULL -> NULL
        [1e308, 1e308],                       # overflow -> inf
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "i long, cv array<double>"
    )
    got = {
        r["i"]: r["cn"]
        for r in df.select(
            "i", F.expr(S.DOT.format(a="cv", b="cv")).alias("cn")
        ).collect()
    }
    for i, v in enumerate(vecs):
        py = S._dot_self_py(v)
        sql = got[i]
        if py is None or sql is None:
            assert py is None and sql is None, (i, py, sql)
        elif math.isnan(py) or math.isnan(sql):
            assert math.isnan(py) and math.isnan(sql), (i, py, sql)
        else:
            # bit-identical, not approx
            assert py == sql and math.copysign(1, py) == math.copysign(1, sql)


def test_hoisted_scores_bit_equal_three_dot_form(spark):
    import random

    random.seed(123)
    n, d, k = 400, 16, 7
    rows = [
        (i, [random.uniform(-1, 1) for _ in range(d)]) for i in range(n)
    ] + [(n, None), (n + 1, [0.0] * d)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.withColumn("v", F.expr(S._as_double("embedding")))
    cents = {i: [random.uniform(-1, 1) for _ in range(d)] for i in range(k)}
    cents[k] = None
    lit_arr, _ = S._literal_centroid_scores(cents)
    old_scores = (
        "transform(cents, c -> named_struct("
        f"'ccos', {S.cosine_expr('v', 'c.cv')}, "
        "'negcid', -c.cid, 'cid', c.cid))"
    )
    both = (
        base.withColumn("cents", lit_arr)
        .withColumn("b_old", F.expr(f"array_max({old_scores})"))
        .withColumn("b_new", F.expr(f"array_max({S._scores_expr()})"))
    )
    bad = both.filter(
        "NOT (b_old.cid = b_new.cid AND (b_old.ccos = b_new.ccos"
        " OR (isnan(b_old.ccos) AND isnan(b_new.ccos))"
        " OR (b_old.ccos IS NULL AND b_new.ccos IS NULL)))"
    ).count()
    assert bad == 0


def test_spread_for_python_narrow_vs_wide(spark):
    narrow = spark.range(100).coalesce(1)
    wide_n = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    wide = spark.range(1000).repartition(wide_n)
    assert D._spread_for_python(narrow).rdd.getNumPartitions() > 1
    # wide inputs pass through without a new exchange
    assert D._spread_for_python(wide) is wide


def test_dup_clusters_driver_path_equals_distributed(spark):
    # chain, triangle, singleton-in-docs, isolated pair — both routes
    # must produce identical (doc_id, cluster_id) labelings
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (11, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 5, 10, 11, 12, 20, 21]], "doc_id long"
    )
    fast = {
        r.doc_id: r.cluster_id
        for r in D.dup_clusters(docs, pairs).collect()
    }
    dist = {
        r.doc_id: r.cluster_id
        for r in D.dup_clusters(
            docs, pairs, driver_max_pairs=0
        ).collect()
    }
    assert fast == dist
    assert fast[3] == 1 and fast[12] == 10 and fast[5] == 5 and fast[21] == 20


def test_dup_clusters_cap_exceeded_falls_back(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    # cap smaller than the pair count: the distributed loop must run
    # and still label correctly
    out = {
        r.doc_id: r.cluster_id
        for r in D.dup_clusters(docs, pairs, driver_max_pairs=2).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_funnel_local_relation_equals_crossjoin_form(spark, sf_dir):
    from airflow_loan_etl_pipeline_spark.registry import QUERIES
    from airflow_loan_etl_pipeline_spark.catalog import load_table
    from airflow_loan_etl_pipeline_spark.operators import text as X
    from airflow_loan_etl_pipeline_spark.registry_text import dup_clusters

    out = QUERIES["dedup_funnel_summary"](spark, sf_dir)
    row = out.collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    ref = (
        docs.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(
            D.exact_dedup(docs).agg(F.count(F.lit(1)).alias("n_after_exact"))
        )
        .crossJoin(
            X.normalized_exact_dedup(docs).agg(
                F.count(F.lit(1)).alias("n_after_normalized")
            )
        )
        .crossJoin(
            dup_clusters(spark, sf_dir).agg(
                F.countDistinct("cluster_id").alias("n_after_neardup")
            )
        )
        .collect()[0]
    )
    assert row.asDict() == ref.asDict()
    assert out.columns == [
        "n_docs", "n_after_exact", "n_after_normalized", "n_after_neardup"
    ]

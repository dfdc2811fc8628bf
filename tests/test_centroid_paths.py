"""Literal-SQL vs broadcast-numpy centroid assignment parity
(VERDICT r11 item 1): the two driver-held-codebook argmax paths must
agree — same cid on every vector, same NULL/NaN rules — so the
large-k numpy path can be swapped in above CENTROID_LITERAL_MAX_CELLS
without moving any oracle-checked result."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.catalog import load_table
from airflow_loan_etl_pipeline_spark.operators import similarity as S


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def _assign_both(spark, data, cents, id_type="long"):
    base = spark.createDataFrame(
        data, f"vec_id {id_type}, v array<double>"
    )
    lit = S._with_best_centroid_driver(base, cents, "literal").select(
        "vec_id", "best.cid", "best.ccos"
    )
    npy = S._with_best_centroid_driver(base, cents, "numpy").select(
        "vec_id", "best.cid", "best.ccos"
    )
    return lit.collect(), npy.collect()


def test_edge_semantics_identical(spark):
    """NULL vector / NULL element / zero norm / length mismatch / NULL
    centroid: cid AND ccos-nullness agree between the paths."""
    cents = {0: [1.0, 0.0], 1: [0.0, 1.0], 2: None}
    data = [
        (0, [1.0, 0.1]),       # plain
        (1, [0.0, 0.0]),       # zero norm → all-null → min cid
        (2, None),             # null vector → min cid, null ccos
        (3, [1.0, None]),      # null element → all-null
        (4, [1.0, 0.0, 5.0]),  # length mismatch → all-null
        (5, [0.1, 1.0]),       # plain, nearest cid 1
    ]
    lit, npy = _assign_both(spark, data, cents)
    by_id_l = {r.vec_id: r for r in lit}
    by_id_n = {r.vec_id: r for r in npy}
    assert set(by_id_l) == set(by_id_n)
    for i in by_id_l:
        assert by_id_l[i].cid == by_id_n[i].cid, i
        assert (by_id_l[i].ccos is None) == (by_id_n[i].ccos is None), i
        if by_id_l[i].ccos is not None:
            assert by_id_l[i].ccos == pytest.approx(
                by_id_n[i].ccos, rel=1e-12
            ), i
    # all-null rows take the smallest cid with NULL ccos
    for i in (1, 2, 3, 4):
        assert by_id_l[i].cid == 0 and by_id_l[i].ccos is None


def test_nan_element_wins_identically(spark):
    """A NaN component poisons the cosine to NaN, which is LARGEST in
    Spark's double total order — both paths must assign the min cid
    among the NaN-cosine centroids."""
    cents = {0: [1.0, 0.0], 1: [0.0, 1.0]}
    data = [(0, [float("nan"), 1.0]), (1, [1.0, 0.0])]
    lit, npy = _assign_both(spark, data, cents)
    l0 = {r.vec_id: r for r in lit}
    n0 = {r.vec_id: r for r in npy}
    import math

    assert l0[0].cid == n0[0].cid == 0
    assert math.isnan(l0[0].ccos) and math.isnan(n0[0].ccos)
    assert l0[1].cid == n0[1].cid == 0


# Integer-valued components: every dot product is an exact integer sum
# (products and partial sums stay far inside 2^53), so summation ORDER
# cannot matter — the sequential SQL aggregate and the BLAS matmul are
# mathematically identical and the equality below is exact, never
# tolerance-based, on any draw.
_int_vec = st.lists(
    st.integers(min_value=-64, max_value=64).map(float),
    min_size=4,
    max_size=4,
)


@settings(max_examples=10, deadline=None)
@given(
    vecs=st.lists(_int_vec, min_size=1, max_size=8),
    cvecs=st.lists(_int_vec, min_size=1, max_size=5),
)
def test_hypothesis_paths_bitexact_on_integer_grid(spark, vecs, cvecs):
    cents = {i: cv for i, cv in enumerate(cvecs)}
    data = [(i, v) for i, v in enumerate(vecs)]
    lit, npy = _assign_both(spark, data, cents)
    key = lambda r: r.vec_id  # noqa: E731
    for lr, nr in zip(sorted(lit, key=key), sorted(npy, key=key)):
        assert lr.vec_id == nr.vec_id
        assert lr.cid == nr.cid
        assert lr.ccos == nr.ccos  # bit-exact: integer-grid sums commute


def test_auto_routing_and_validation(spark):
    """Auto routing: compact codebooks stay literal (plan has no
    Python stage); above the cell threshold the plan carries the Arrow
    eval; ragged codebooks refuse the numpy path."""
    base = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, v array<double>"
    )
    small = {0: [1.0, 0.0], 1: [0.0, 1.0]}
    plan_small = S._with_best_centroid_driver(base, small)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan_small and "MapInPandas" not in plan_small
    d = 8
    k = S.CENTROID_LITERAL_MAX_CELLS // d + 1
    big = {i: [float(i % 7)] * d for i in range(k)}
    plan_big = S._with_best_centroid_driver(base.withColumn(
        "v", F.expr("transform(sequence(1, 8), x -> cast(x AS double))")
    ), big)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan_big
    ragged = {0: [1.0], 1: [1.0, 2.0]}
    with pytest.raises(ValueError, match="uniform-dim"):
        S._with_best_centroid_driver(base, ragged, "numpy")
    with pytest.raises(ValueError, match="assign_path"):
        S._with_best_centroid_driver(base, small, "bogus")
    # ragged codebooks auto-route to the literal path, which handles
    # them element-wise
    assert "MapInPandas" not in S._with_best_centroid_driver(
        base, ragged
    )._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", ["kmeans", "ivf", "semdedup"])
def test_fixture_queries_same_rows_numpy_forced(spark, sf_dir, name):
    """The three registry consumers produce IDENTICAL result rows with
    the numpy path forced — the verdict's done-criterion at the gate
    scale (cid assignments can only differ if two centroids sit within
    one BLAS ulp of cosine, which the fixture corpora never do)."""
    emb = load_table(spark, sf_dir, "embeddings")
    if name == "kmeans":
        mk = lambda p: S.kmeans_train(  # noqa: E731
            emb, n_centroids=16, n_iters=3,
            train_sample_size=S.TRAIN_SAMPLE_SIZE, assign_path=p,
        )
    elif name == "ivf":
        def mk(p):
            cents = S.kmeans_train(
                emb, n_centroids=16, n_iters=2,
                train_sample_size=S.TRAIN_SAMPLE_SIZE,
                include_sizes=False, assign_path=p,
            )
            return S.ivf_topk(emb, query_id=0, centroids=cents,
                              assign_path=p)
    else:
        mk = lambda p: S.semdedup(  # noqa: E731
            emb, n_centroids=16, n_iters=2,
            threshold=S.SEMDEDUP_THRESHOLD,
            train_sample_size=S.TRAIN_SAMPLE_SIZE, assign_path=p,
        )
    lit = mk("literal")
    npy = mk("numpy")
    # centroid arrays are rounded to 6 dp inside the trainer, so even
    # the float payloads compare exactly
    assert _rows(lit) == _rows(npy)

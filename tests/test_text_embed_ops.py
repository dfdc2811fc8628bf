"""Edge cases for the text/embedding operators the fixtures can't
express: zero vectors under quantization, TF-IDF ranking invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.operators.similarity import quantize_int8
from airflow_loan_etl_pipeline_spark.operators.text import tfidf_top_terms, top_terms


def test_quantize_int8_zero_vector_and_range(spark):
    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 0.0]),
            (2, [1.0, -2.0, 0.5]),
            (3, [-0.001, 0.001, 0.0005]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert out[1].scale == 0.0 and out[1].q == [0, 0, 0]
    assert out[2].scale == 2.0
    assert out[2].q == [64, -127, 32]  # floor(x*127/2 + 0.5)
    assert all(-127 <= x <= 127 for r in out.values() for x in r.q)


def test_tfidf_scores_and_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common common rare"),
            (2, "common filler words here"),
            (3, "common more filler text"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, per_doc_k=2).collect()
    doc1 = sorted([r for r in rows if r.doc_id == 1], key=lambda r: r.rn)
    scores = {r.term: r.tfidf for r in rows if r.doc_id == 1}
    # rational idf (n+1)/(df+1) with n=3 docs:
    assert scores["common"] == 3.0  # tf=3 * 4/(3+1)
    assert scores["rare"] == 2.0  # tf=1 * 4/(1+1) — idf boost, tf still wins
    assert [r.term for r in doc1] == ["common", "rare"]


def test_top_terms_counts_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c")], "doc_id long, text string"
    )
    rows = top_terms(docs, k=2).collect()
    assert rows[0].term == "a" and rows[0].total_count == 3 and rows[0].doc_freq == 2
    assert rows[1].term == "b"  # tie b/c broken by term asc

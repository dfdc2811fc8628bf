"""The composed training-corpus build — the engine's capstone plan:

    quality gate → exact dedup → near-dup cluster dedup →
    benchmark decontamination → frozen split assignment → summary

Every stage is one of the engine's oracle-verified operators; this plan
wires them in the order a production corpus build runs them (cheap
map-side gates first, the quadratic-risk near-dup stage after the
corpus has already shrunk, decontamination last because the benchmark
probe is the cheapest join of the four).

Scale notes: stages 1–2 are scan-local + one 16-byte-key aggregate;
stage 3 is the capped LSH pipeline (see operators/dedup.py);
stage 4 broadcasts the benchmark shingle set; stage 5 is a
content-addressed projection. Document sets pass between stages as
doc_id semi-joins, and each stage's survivor ID SET is eagerly
materialized (cache_scope.materialize_consistent — tiny doc_id-only
frames) so a stage's gate work runs ONCE no matter how many downstream
branches consume it; the r7 plan re-derived the quality+md5 lineage
per branch (19 document scans). The text column is only re-joined
where a stage genuinely reads it (md5 fingerprint, decontamination
shingles, final token count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.catalog import load_table
from airflow_loan_etl_pipeline_spark.operators import dedup as D
from airflow_loan_etl_pipeline_spark.operators import text as X
from airflow_loan_etl_pipeline_spark.operators.cache_scope import (
    materialize_consistent,
)

MIN_QUALITY = 0.5
MIN_TOKENS, MAX_TOKENS = 20, 2000
CONTAMINATION_FRAC = 0.2


def corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shipped corpus itself: every surviving document with its
    frozen split label — feed this to ``ship_corpus`` (or any sink).
    ``build_corpus`` below reduces it to the per-split summary the
    oracle verifies."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)

    # 1. Quality + length gate (map-side). Single consumer (the
    # fingerprint pass) — stays lazy.
    q = X.quality_score(train).filter(
        (F.col("quality_score") >= MIN_QUALITY)
        & F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS)
    ).select("doc_id")
    s1 = train.join(q, "doc_id", "left_semi")

    # 2. Exact dedup: one representative (min id) per distinct text.
    # The representative set already implies the quality gate (min ids
    # are drawn FROM s1), so downstream stages semi-join `train`
    # directly against ids2 — and ids2 is materialized because three
    # branches (both pair endpoints + the cluster node set) consume it.
    ids2 = materialize_consistent(
        s1.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )

    # 3. Near-dup cluster dedup. Signatures are per-document, so pairs
    # over the full corpus restricted to surviving endpoints equal
    # pairs computed on the survivors — and the SQL oracle can share
    # the restriction.
    pairs = (
        D.minhash_lsh_pairs(docs)
        .join(ids2.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(ids2.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
    )
    clusters = D.dup_clusters(ids2, pairs)
    ids3 = materialize_consistent(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
            "doc_id"
        )
    )
    s3 = train.join(ids3, "doc_id", "left_semi")

    # 4. Benchmark decontamination (broadcast eval shingles).
    contaminated = (
        D.decontaminate(s3, bench)
        .filter(F.col("overlap_frac") >= CONTAMINATION_FRAC)
        .select("doc_id")
    )
    final_ids = ids3.join(contaminated, "doc_id", "left_anti")
    s4 = train.join(final_ids, "doc_id", "left_semi")

    # 5. Frozen content-addressed split + shipped summary.
    h = (
        "cast(conv(substr(md5(cast(doc_id AS string)), 1, 8), 16, 10) "
        "AS bigint) % 100"
    )
    split = (
        F.when(F.expr(h) >= 95, F.lit("test"))
        .when(F.expr(h) >= 90, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return s4.withColumn("split", split)


def build_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the full build over the documents table; benchmark slice =
    ``doc_id % 20 == 0``. Returns the per-split summary (split, n_docs,
    n_tokens) of the shipped corpus."""
    return (
        corpus_docs(spark, sf_dir)
        .select("split", F.size(F.split("text", " ")).alias("n_tok"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


def ship_corpus(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """Materialize the shipped corpus partitioned by split — consumers
    read exactly one split directory (partition pruning), and the
    frozen content-addressed assignment means re-shipping after
    appending new source documents never rewrites which split an
    existing document lives in."""
    corpus_docs(spark, sf_dir).write.mode("overwrite").partitionBy(
        "split"
    ).parquet(out_path)

"""Degenerate-input robustness: zero-row and one-row tables.

Empty partitions and near-empty splits are routine on a large
cluster (a filter that drops a whole date range, a new ingest source
with one document, a straggler executor fed an empty parquet split).
Every operator family must COMPLETE on such input — returning zero
or degenerate rows, never crashing in a Python batch stage or an
ANSI-mode expression.

The full-registry sweep (all 261 queries against both datasets) runs
out-of-band each round; this suite pins one representative per
operator family so a regression fails fast in CI. docs_heavy_tokens
is the historical offender: the Misra-Gries empty candidate batch
shipped an int64 column for a string key until round 8.
"""

from __future__ import annotations

import pytest

from airflow_loan_etl_pipeline_spark.catalog import load_table
from airflow_loan_etl_pipeline_spark import registry
import __spark_entry__  # noqa: F401  — loads every registry module

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# One representative per operator family: core agg, mode-impute,
# window, TPC-H join tree, exact + near-dup pair generators, graph
# closure, text stats, heavy hitters (the past offender), embedding
# ANN + training, distributed percentiles, drift stats, funnel,
# corpus capstone, streaming-backed totals.
REPRESENTATIVE = (
    "loan_agg",
    "mode_per_column",
    "window_topk_per_priority",
    "q5_local_supplier_volume",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "dup_clusters",
    "docs_token_stats",
    "docs_heavy_tokens",
    "embeddings_cosine_topk",
    "kmeans_train_k16",
    "lineitem_percentiles",
    "events_psi_drift",
    "events_funnel",
    "corpus_build_summary",
    "audience_overlap_matrix",
    "docs_pmi_bigrams",
    "dup_reach_3hop",
    "events_autocorr_lag1",
    "embedding_dim_correlations",
    "semdedup_prune",
    "docs_decontaminate_bloom",
    "docs_decontaminate_bloom_m20",
)


def _write_limited(spark, dst: str, n: int) -> str:
    for t in TABLES:
        (
            load_table(spark, "/root/testdata/sf0.001", t)
            .limit(n)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{dst}/{t}.parquet")
        )
    return dst


# Payload columns a failed upstream stage realistically leaves null
# (missing scrape text, absent embedding, dropped event props).
_NULL_PAYLOAD = {
    "documents": ("text", "lang", "source"),
    "events": ("props", "value"),
    "embeddings": ("embedding", "label"),
}


def _write_transformed(spark, dst: str, transform) -> str:
    for t in TABLES:
        df = transform(t, load_table(spark, "/root/testdata/sf0.001", t))
        df.coalesce(1).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    return dst


# Importable builders (tools/degenerate_sweep.py runs the FULL 261
# registry against each axis out-of-band; these fixtures reuse them
# for the fast representative slice in CI).


def build_empty(spark, dst: str) -> str:
    return _write_limited(spark, dst, 0)


def build_onerow(spark, dst: str) -> str:
    return _write_limited(spark, dst, 1)


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    return build_empty(spark, str(tmp_path_factory.mktemp("sg_empty")))


@pytest.fixture(scope="module")
def onerow_dir(spark, tmp_path_factory):
    return build_onerow(spark, str(tmp_path_factory.mktemp("sg_onerow")))


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_completes_on_empty_tables(spark, empty_dir, name):
    # count() forces full execution (incl. Python batch stages); the
    # contract is completion, not a specific row count.
    assert registry.QUERIES[name](spark, empty_dir).count() >= 0


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_completes_on_one_row_tables(spark, onerow_dir, name):
    assert registry.QUERIES[name](spark, onerow_dir).count() >= 0


def build_null_payload(spark, dst: str) -> str:
    from pyspark.sql import functions as F

    def nullify(t, df):
        for c in _NULL_PAYLOAD.get(t, ()):
            if c in df.columns:
                df = df.withColumn(c, F.lit(None).cast(dict(df.dtypes)[c]))
        return df

    return _write_transformed(spark, dst, nullify)


def build_skew(spark, dst: str) -> str:
    """Maximal skew: every document the same text, every event one
    user/type, every embedding the same vector — each dedup/ANN
    bucket as hot as it can possibly be."""
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    one_vec = emb.limit(1).select("embedding").collect()[0][0]
    emb_type = dict(emb.dtypes)["embedding"]

    def skew(t, df):
        if t == "documents":
            return df.withColumn(
                "text", F.lit("the quick brown fox jumps over the dog")
            )
        if t == "events":
            return df.withColumn("user_id", F.lit(7)).withColumn(
                "event_type", F.lit("click")
            )
        if t == "embeddings":
            return df.withColumn(
                "embedding", F.lit(one_vec).cast(emb_type)
            )
        return df

    return _write_transformed(spark, dst, skew)


@pytest.fixture(scope="module")
def null_payload_dir(spark, tmp_path_factory):
    return build_null_payload(
        spark, str(tmp_path_factory.mktemp("sg_nullpay"))
    )


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    return build_skew(spark, str(tmp_path_factory.mktemp("sg_skew")))


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_completes_on_null_payloads(spark, null_payload_dir, name):
    """A failed upstream extract leaves text/embedding/props null;
    every operator family must complete (null-skipping aggregates,
    not-null pre-filters, try_ arithmetic), not crash."""
    assert registry.QUERIES[name](spark, null_payload_dir).count() >= 0


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_completes_on_maximal_skew(spark, skew_dir, name):
    """All-identical payloads make every dedup/ANN bucket maximally
    hot and zero every variance: pair generators must stay bounded
    (cap valves), correlations must NULL rather than divide by zero,
    and reachability must not enumerate clique paths."""
    assert registry.QUERIES[name](spark, skew_dir).count() >= 0


_ADVERSARIAL_TEXT = (
    "‮RTL override text‬ normal after",
    "emoji soup \U0001F600\U0001F4A9\U0001F680 mixed with text",
    "中文文本没有空格分词会把整句当成一个词",
    "a" * 5000,                              # one 5k-char token
    "tab\tand\nnewline\rand\x00control chars",
    "ＦＵＬＬＷＩＤＴＨ ｌａｔｉｎ ｔｅｘｔ",
    "zero​width‌spaces‍inside",
    "", " ", "   ",
    "mixed اللغة العربية and english نص",
    "🏳️‍🌈 flag sequences 👨‍👩‍👧‍👦 zwj families",
)


def build_unicode(spark, dst: str) -> str:
    """Adversarial unicode text: RTL overrides, ZWJ emoji, CJK
    without spaces, a 5k-char single token, control chars, empty and
    whitespace-only strings — cycled across every document."""
    from pyspark.sql import functions as F

    opts = F.array(*[F.lit(s) for s in _ADVERSARIAL_TEXT])
    n = len(_ADVERSARIAL_TEXT)

    def hostile(t, df):
        if t != "documents":
            return df
        return df.withColumn(
            "text",
            F.element_at(opts, (F.col("doc_id") % n).cast("int") + 1),
        )

    return _write_transformed(spark, dst, hostile)


@pytest.fixture(scope="module")
def unicode_dir(spark, tmp_path_factory):
    return build_unicode(spark, str(tmp_path_factory.mktemp("sg_unicode")))


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_completes_on_adversarial_unicode(spark, unicode_dir, name):
    """Tokenizers, shingle emitters, PII regexes, fingerprints, and
    the Arrow batch boundary must survive hostile unicode — no
    encoding crash, no regex hang, no mis-typed empty batch."""
    assert registry.QUERIES[name](spark, unicode_dir).count() >= 0


def build_maxcard(spark, dst: str) -> str:
    """Maximal-cardinality keys — the anti-skew pole (sixth axis,
    VERDICT r8 item 8): every row a distinct user / event type / order
    status / document word / embedding label, so every "bounded"
    |keys|-sized frame the plan notes rely on (per-type cells, segment
    pairs, status pivots, per-word vocabularies) is as large as the
    fact table itself. Deterministic: uniqueness comes from the row's
    own keys, never from RNG or monotonically_increasing_id."""
    from pyspark.sql import functions as F

    def widen(t, df):
        if t == "documents":
            # every word (hence every shingle) globally unique per doc
            return df.withColumn(
                "text",
                F.expr(
                    "concat_ws(' ', transform(sequence(1, 8),"
                    " i -> concat('u', doc_id, 'x', i)))"
                ),
            ).withColumn("source", F.concat(F.lit("src"), F.col("doc_id")))
        if t == "events":
            u = F.xxhash64("ts", "user_id", "event_type", "value")
            return df.withColumn("user_id", u).withColumn(
                "event_type", F.concat(F.lit("t"), u)
            )
        if t == "embeddings":
            return df.withColumn(
                "label", F.concat(F.lit("l"), F.col("vec_id"))
            )
        if t == "orders":
            return df.withColumn(
                "o_orderstatus", F.concat(F.lit("s"), F.col("o_orderkey"))
            ).withColumn(
                "o_orderpriority", F.concat(F.lit("p"), F.col("o_orderkey"))
            )
        if t == "lineitem":
            k = F.concat(F.col("l_orderkey"), F.lit("_"), F.col("l_linenumber"))
            return df.withColumn(
                "l_returnflag", F.concat(F.lit("r"), k)
            ).withColumn("l_linestatus", F.concat(F.lit("s"), k))
        return df

    return _write_transformed(spark, dst, widen)


@pytest.fixture(scope="module")
def maxcard_dir(spark, tmp_path_factory):
    return build_maxcard(spark, str(tmp_path_factory.mktemp("sg_maxcard")))


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_completes_on_maximal_cardinality(spark, maxcard_dir, name):
    """All-distinct keys: group-by cardinality equals the row count,
    every LSH/shingle bucket has exactly one member (zero pairs, not a
    crash), pivot/cell frames hit their worst legal width, and
    collect_set-per-key state stays one element per row. Operators
    whose "bounded" frames assumed few keys must still complete."""
    assert registry.QUERIES[name](spark, maxcard_dir).count() >= 0

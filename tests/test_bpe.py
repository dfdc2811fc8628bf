"""BPE tokenizer: hand-computed merges on the classic tiny corpus,
encoding semantics, and partitioning invariance."""

from __future__ import annotations

from airflow_loan_etl_pipeline_spark.operators import bpe as B


def test_train_bpe_hand_computed_merges(spark):
    # classic Sennrich example: {low:5, lower:2, newest:6, widest:3}
    rows = (
        [(i, "low") for i in range(5)]
        + [(100 + i, "lower") for i in range(2)]
        + [(200 + i, "newest") for i in range(6)]
        + [(300 + i, "widest") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = B.train_bpe(df, n_merges=4)
    # pair counts round 1: ('e','s') 9, ('s','t') 9, ('t','</w>') 9,
    # ('w','e') 8, ... — tie on 9 broken lexicographically: ('e','s')
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    # round 4: 'lo' appears in low(5)+lower(2)=7, beats 'ne'(6)/'wi'(3)
    assert merges[3] == ("l", "o")


def test_bpe_token_counts_encoding(spark):
    rows = [(1, "low low"), (2, "lowest"), (3, "")]
    train = spark.createDataFrame(
        [(i, "low") for i in range(5)]
        + [(200 + i, "newest") for i in range(6)]
        + [(300 + i, "widest") for i in range(3)],
        "doc_id long, text string",
    )
    merges = B.train_bpe(train, n_merges=4)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in B.bpe_token_counts(df, merges).collect()}
    # without "lower" in the training set the merges are
    # (e,s),(es,t),(est,</w>),(e,w):
    # "low" encodes as [l, o, w, </w>] = 4 tokens
    assert got[1].n_words == 2 and got[1].n_bpe_tokens == 8
    # "lowest" -> [l, o, w, est</w>] = 4 tokens
    assert got[2].n_words == 1 and got[2].n_bpe_tokens == 4
    assert got[3].n_words == 0 and got[3].n_bpe_tokens == 0
    assert got[2].bpe_per_word == 4.0


def test_bpe_partitioning_invariant(spark, sf_dir):
    """Same corpus, any partitioning -> identical merges and counts
    (deterministic tie-breaks; the word-frequency table is partition-
    order-free)."""
    from airflow_loan_etl_pipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    m1 = B.train_bpe(docs, n_merges=50)
    m2 = B.train_bpe(docs.repartition(7), n_merges=50)
    assert m1 == m2
    c1 = {
        r.doc_id: r.n_bpe_tokens
        for r in B.bpe_token_counts(docs, m1).collect()
    }
    c2 = {
        r.doc_id: r.n_bpe_tokens
        for r in B.bpe_token_counts(docs.repartition(7), m1).collect()
    }
    assert c1 == c2
    # real counts are bounded by character length and at least word count
    stats = B.bpe_token_counts(docs, m1)
    from pyspark.sql import functions as F

    bad = stats.filter(
        (F.col("n_bpe_tokens") < F.col("n_words"))
    ).count()
    assert bad == 0


def test_frozen_merges_match_trainer(spark):
    """FROZEN_MERGES_V1 is exactly the deterministic
    train_bpe(documents@sf0.01, 200) output — the artifact cannot
    silently drift from the trainer that defines it."""
    from airflow_loan_etl_pipeline_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    assert tuple(B.train_bpe(docs, n_merges=200)) == B.FROZEN_MERGES_V1


def test_frozen_encoding_handles_hostile_words(spark):
    """Encoding under the frozen merges is total: words containing the
    map-separator byte, quotes, or non-ASCII never crash and count at
    least one token per word (the length-prefixed oracle key design has
    no collision to exploit either)."""
    rows = [
        (1, "a\x01b 'quoted' café"),
        (2, "éé low low"),
        (3, "1:ab"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in B.bpe_token_counts(df, list(B.FROZEN_MERGES_V1)).collect()
    }
    assert got[1].n_words == 3 and got[1].n_bpe_tokens >= 3
    assert got[2].n_words == 3
    assert got[3].n_bpe_tokens >= 1

"""Round-2 corpus-prep operators: repetition scoring, decontamination,
sequence packing, chunking, PII redaction, event funnels. Semantics
pinned on tiny hand-checkable inputs (the registry oracle covers the
fixture-scale differential check).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.operators import dedup as D
from airflow_loan_etl_pipeline_spark.operators import text as X
from airflow_loan_etl_pipeline_spark.operators.timeseries import funnel


def test_repetition_stats_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # no repeats at all
            (2, "x y x y x y x y"),      # 2-token loop
            (3, "a b"),                  # < n tokens: excluded
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in X.repetition_stats(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].dup_token_frac == 0.0 and rows[1].dup_ngram_frac == 0.0
    # doc 2: 8 tokens, 2 distinct -> dup_token 0.75; 6 trigram positions,
    # 2 distinct trigrams ("x y x", "y x y") -> dup_ngram 1 - 2/6
    assert rows[2].dup_token_frac == 0.75
    assert rows[2].dup_ngram_frac == round(1 - 2 / 6, 4)


def test_decontaminate_flags_only_overlapping(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),
            (2, "completely unrelated training text here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox questions")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in D.decontaminate(train, bench).collect()}
    # doc 1 shares exactly the "quick brown fox" trigram; doc 2 is clean.
    assert set(out) == {1}
    assert out[1].n_overlap == 1
    assert out[1].n_sh == 4
    assert out[1].overlap_frac == 0.25


def test_pack_sequences_bin_boundaries(spark):
    # 3 docs of 300 tokens each in one source: cumsum-before = 0/300/600
    # -> bins 0, 0, 1 with bin_tokens=512.
    docs = spark.createDataFrame(
        [(i, "s1", " ".join(["w"] * 300)) for i in range(3)],
        "doc_id long, source string, text string",
    )
    out = {
        r.bin_id: r
        for r in X.pack_sequences(docs, bin_tokens=512).collect()
    }
    assert out[0].n_docs == 2 and out[0].tokens_in_bin == 600
    assert out[0].first_doc == 0 and out[0].last_doc == 1
    assert out[1].n_docs == 1 and out[1].first_doc == 2


def test_chunk_documents_coverage_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(1, 21))  # 20 tokens
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        X.chunk_documents(docs, window=16, stride=8).collect(),
        key=lambda r: r.chunk_idx,
    )
    # starts: 1, 9, 17 -> sizes 16, 12, 4; every token covered.
    assert [r.chunk_start for r in rows] == [1, 9, 17]
    assert [r.n_chunk_tokens for r in rows] == [16, 12, 4]
    assert len({r.chunk_fp for r in rows}) == 3


def test_redact_pii_patterns_and_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.org card 4111-1111-1111-1111 tel +44 2079460000"),
            (2, "no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in X.redact_pii(docs).collect()}
    r = out[1]
    assert (r.n_email, r.n_card, r.n_phone) == (1, 1, 1)
    assert r.clean_text == "mail <EMAIL> card <CARD> tel <PHONE>"
    assert out[2].clean_text == "no pii at all"
    assert (out[2].n_email, out[2].n_card, out[2].n_phone) == (0, 0, 0)


def test_funnel_strict_ordering(spark):
    # u1 completes all 3 in order; u2 clicks BEFORE viewing (click must
    # not count); u3 views only.
    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:01:00", "click"),
        (1, "2024-01-01 10:02:00", "purchase"),
        (2, "2024-01-01 09:00:00", "click"),
        (2, "2024-01-01 09:30:00", "view"),
        (3, "2024-01-01 11:00:00", "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_type")
    r = funnel(ev).collect()[0]
    assert (r.users_view, r.users_click, r.users_purchase) == (3, 1, 1)
    assert r.rate_click == round(1 / 3, 4)
    assert r.rate_purchase == 1.0


def test_heavy_hitters_exact_and_partitioning_independent(spark):
    # Zipf-ish stream: 'hot' = 600 of 1100 rows, 'warm' = 300, tail of
    # 200 distinct singletons x1. k=5 -> threshold n/k = 220.
    rows = (
        [("hot",)] * 600 + [("warm",)] * 300 + [(f"tail{i}",) for i in range(200)]
    )
    from airflow_loan_etl_pipeline_spark.operators.aggregates import heavy_hitters

    for parts in (1, 7):
        df = spark.createDataFrame(rows, "term string").repartition(parts)
        out = {r.term: r.cnt for r in heavy_hitters(df, "term", k=5).collect()}
        assert out == {"hot": 600, "warm": 300}, parts


def test_heavy_hitters_empty_and_all_null_input(spark):
    """Empty partitions are routine at scale: the Misra-Gries stage's
    empty counter index is int64, so the empty batch must be emitted
    with the KEY column's real dtype or Arrow rejects it for string
    keys (the docs_heavy_tokens-on-empty-corpus crash). All-null input
    takes the same path (nulls are excluded up front)."""
    from airflow_loan_etl_pipeline_spark.operators.aggregates import heavy_hitters

    empty_str = spark.createDataFrame([], "term string")
    assert heavy_hitters(empty_str, "term", k=5).count() == 0
    all_null = spark.createDataFrame([(None,), (None,)], "term string")
    assert heavy_hitters(all_null, "term", k=5).count() == 0
    empty_int = spark.createDataFrame([], "term int")
    assert heavy_hitters(empty_int, "term", k=5).count() == 0


def test_quota_select_deterministic_ties(spark):
    # 4 identical-quality docs per stratum, quota 2 -> lowest ids win.
    rows = [
        (i, f"s{i % 2}", "alpha beta gamma delta epsilon zeta")
        for i in range(8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = X.quota_select(docs, per_stratum=2)
    got = sorted((r.source, r.doc_id) for r in out.collect())
    assert got == [("s0", 0), ("s0", 2), ("s1", 1), ("s1", 3)]


def test_partition_stats_reports_balance(spark):
    from airflow_loan_etl_pipeline_spark.operators.validate import partition_stats

    df = spark.range(1000).repartition(4)
    rows = partition_stats(df).collect()
    assert sum(r.n_rows for r in rows) == 1000
    assert len(rows) == 4
    assert max(r.share_of_max for r in rows) == 1.0


def test_table_checksum_order_insensitive_and_content_sensitive(spark):
    from airflow_loan_etl_pipeline_spark.operators.validate import table_checksum

    rows = [(i, f"text {i}") for i in range(100)]
    a = spark.createDataFrame(rows, "id long, t string")
    b = spark.createDataFrame(list(reversed(rows)), "id long, t string").repartition(7)
    ca = table_checksum(a).collect()[0]
    cb = table_checksum(b).collect()[0]
    assert (ca.n_rows, ca.checksum) == (cb.n_rows, cb.checksum)
    mutated = spark.createDataFrame(
        rows[:-1] + [(99, "text 99!")], "id long, t string"
    )
    assert table_checksum(mutated).collect()[0].checksum != ca.checksum


def test_asof_forward_ties_and_no_match(spark):
    """Forward as-of: >= ties match (purchase at the same instant
    counts), and a left row after the last right row drops on inner."""
    from airflow_loan_etl_pipeline_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00"),
         (1, 11, "2024-01-01 12:00:00"),
         (2, 20, "2024-01-01 09:00:00")],
        "user_id long, event_id long, ts_s string",
    ).select("user_id", "event_id", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0),   # same instant as event 10
         (1, "2024-01-01 11:00:00", 7.0),   # before event 11 -> no match for it
         (2, "2024-01-01 09:30:00", 9.0)],
        "user_id long, ts_s string, v double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "v")
    out = {r.event_id: r for r in asof_join_forward(
        left, right, ["user_id"], "ts", "ts", ["v"]).collect()}
    assert out[10].asof_v == 5.0          # >= tie matches
    assert 11 not in out                  # nothing after 12:00 -> inner drops
    assert out[20].asof_v == 9.0


def test_ship_corpus_partitions_match_summary(spark, sf_dir, tmp_path):
    """The shipped partition layout must agree with the oracle-verified
    summary: one directory per split, counts identical, and reading one
    split prunes to that directory."""
    import os

    from airflow_loan_etl_pipeline_spark.plans.corpus_build import (
        build_corpus,
        ship_corpus,
    )

    out = str(tmp_path / "corpus")
    ship_corpus(spark, sf_dir, out)
    summary = {r.split: r.n_docs for r in build_corpus(spark, sf_dir).collect()}
    dirs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("split=")}
    assert dirs == set(summary)
    shipped = spark.read.parquet(out)
    got = {r.split: r.cnt for r in
           shipped.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == summary


def test_pack_sequences_conserves_tokens(spark):
    """Packing must conserve the corpus: every doc in exactly one bin,
    total tokens preserved, bins contiguous in doc order per source."""
    rows = [(i, f"s{i % 3}", " ".join(["w"] * (50 + i))) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = X.pack_sequences(docs, bin_tokens=256).collect()
    assert sum(r.n_docs for r in out) == 30
    assert sum(r.tokens_in_bin for r in out) == sum(50 + i for i in range(30))
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for rs in by_src.values():
        rs.sort(key=lambda r: r.bin_id)
        for prev, cur in zip(rs, rs[1:]):
            assert prev.last_doc < cur.first_doc  # contiguous, no overlap


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, short),                    # 5 tokens, 3 trigrams
            (2, filler + " " + short),     # short doc pasted into long one
            (3, "totally different content here now"),
        ],
        "doc_id long, text string",
    )
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in D.ngram_containment_pairs(docs, threshold=0.9).collect()
    }
    # every trigram of doc 1 appears in doc 2 -> containment 1.0
    assert cont == {(1, 2): 1.0}
    # symmetric Jaccard is ~3/63 -- far below any useful threshold
    jac = D.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    assert jac == []


def test_containment_max_df_drops_hot_shingles(spark):
    hot = "the of and"  # appears in every doc
    docs = spark.createDataFrame(
        [(i, hot + f" unique{i} filler{i} tail{i}") for i in range(1, 8)],
        "doc_id long, text string",
    )
    uncapped = D.ngram_containment_pairs(docs, threshold=0.1).collect()
    assert len(uncapped) > 0  # hot trigram links every pair
    capped = D.ngram_containment_pairs(docs, threshold=0.1, max_df=3).collect()
    assert capped == []  # df=7 shingle dropped; no informative overlap


def test_leakage_safe_split_keeps_clusters_together(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 11)], "doc_id long, text string"
    )
    # two chained clusters: {1,2,3} and {7,8}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    clusters = D.dup_clusters(docs, pairs)
    out = {r.doc_id: r for r in X.leakage_safe_split(docs, clusters).collect()}
    assert len(out) == 10
    # all members of a cluster share rep AND split
    assert out[1].cluster_id == out[2].cluster_id == out[3].cluster_id == 1
    assert out[1].split == out[2].split == out[3].split
    assert out[7].cluster_id == out[8].cluster_id == 7
    assert out[7].split == out[8].split
    # singletons label themselves
    assert out[5].cluster_id == 5


def test_shuffle_order_is_partitioning_invariant_permutation(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id long, text string"
    )
    a = {r.doc_id: r.shuffle_rank for r in X.shuffle_order(docs).collect()}
    b = {
        r.doc_id: r.shuffle_rank
        for r in X.shuffle_order(docs.repartition(7)).collect()
    }
    assert a == b  # same order under any physical layout
    assert sorted(a.values()) == list(range(1, 101))  # a true permutation
    # different seed -> different permutation (content-addressed, not id order)
    c = {r.doc_id: r.shuffle_rank for r in X.shuffle_order(docs, seed=7).collect()}
    assert c != a


def test_unigram_logprob_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in X.unigram_logprob(docs).collect()}
    # counts: a=2, b=1, c=1, total=4
    d1 = (2 * math.log(2 / 4) + math.log(1 / 4)) / 3
    assert out[1].n_tokens == 3
    assert out[1].avg_logprob == round(d1, 6)
    assert out[2].avg_logprob == round(math.log(1 / 4), 6)
    # the rare-token doc scores strictly lower
    assert out[2].avg_logprob < out[1].avg_logprob


def test_length_rebalance_downsamples_to_min_bucket(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b"), (2, "c d"), (3, "e f"),          # bucket 1 (2//2)
            (4, "g h i j"), (5, "k l m n"),              # bucket 2
            (6, "o"),                                    # bucket 0
        ],
        "doc_id long, text string",
    )
    out = {r.bucket: r for r in X.length_rebalance(docs, bucket_tokens=2).collect()}
    assert {b: r.n_docs for b, r in out.items()} == {0: 1, 1: 3, 2: 2}
    assert all(r.n_kept == 1 for r in out.values())  # min bucket size is 1


def test_dup_span_stats_hand_computed(spark):
    from airflow_loan_etl_pipeline_spark.operators.dedup import dup_span_stats

    docs = spark.createDataFrame(
        [
            # doc 1 and 2 share the boilerplate tail "all rights reserved"
            (1, "alpha beta gamma all rights reserved", "en", "a", 0),
            (2, "delta epsilon zeta all rights reserved", "en", "a", 0),
            # doc 3: internal repeat "x y z x y z" -> trigram "x y z"
            # occurs twice WITHIN the doc (df=2 counts it)
            (3, "x y z x y z", "en", "b", 0),
            # doc 4: all-unique trigrams
            (4, "one two three four", "en", "b", 0),
            # doc 5: too short for a trigram -> excluded
            (5, "hi there", "en", "b", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in dup_span_stats(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    # docs 1/2: 6 tokens -> 4 positions; only "all rights reserved"
    # (position 4) is shared
    assert out[1].n_pos == 4 and out[1].n_dup_pos == 1
    assert (out[1].first_dup_pos, out[1].last_dup_pos) == (4, 4)
    assert out[1].dup_share == 0.25
    # doc 3: 6 tokens -> 4 positions; "x y z" at pos 1 and 4 (df=2),
    # "y z x" and "z x y" are unique
    assert out[3].n_dup_pos == 2
    assert (out[3].first_dup_pos, out[3].last_dup_pos) == (1, 4)
    assert out[4].n_dup_pos == 0 and out[4].first_dup_pos is None


def test_charset_stats_hand_counted(spark):
    from airflow_loan_etl_pipeline_spark.operators.text import charset_stats

    docs = spark.createDataFrame(
        [
            (1, "Ab1 c!", "en", "s1", 0),   # len 6: 1 digit, 1 upper, 1 space, 1 other
            (2, "2024 OK", "en", "s1", 0),  # len 7: 4 digits, 2 upper, 1 space
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = charset_stats(docs).collect()[0]
    assert r.n_docs == 2 and r.n_chars == 13
    assert r.digit_chars == 5
    assert r.upper_chars == 3
    assert r.space_chars == 2
    assert r.other_chars == 1
    import math
    assert r.digit_share == math.floor(5 * 1e4 / 13) / 1e4


def test_pareto_frontier_matches_bruteforce(spark):
    from airflow_loan_etl_pipeline_spark.operators.topk import pareto_frontier

    import itertools
    import random

    rng = random.Random(7)
    rows = [
        (i, float(rng.randint(1, 12)), rng.randint(1, 9))
        for i in range(60)
    ]
    # inject exact duplicates of one point: both copies must survive
    rows.append((100, 1.0, 9))
    rows.append((101, 1.0, 9))
    df = spark.createDataFrame(rows, "id long, price double, size int")

    def dominated(p, q):
        return (
            q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
        )

    expected = {
        p[0]
        for p in rows
        if not any(dominated(p, q) for q in rows if q[0] != p[0])
    }
    got = {
        r.id
        for r in pareto_frontier(df, min_col="price", max_col="size").collect()
    }
    assert got == expected
    assert {100, 101} <= got


def test_kmv_similarity_extremes_and_mergeability(spark):
    from airflow_loan_etl_pipeline_spark.operators.dedup import (
        kmv_source_similarity,
    )

    words = [f"w{i}" for i in range(200)]
    docs = spark.createDataFrame(
        [
            # a and b: identical vocabulary (two docs each, shuffled)
            (1, " ".join(words[:100]), "en", "a", 0),
            (2, " ".join(words[50:100]), "en", "a", 0),
            (3, " ".join(words[:50]), "en", "b", 0),
            (4, " ".join(words[25:100]), "en", "b", 0),
            # c: disjoint vocabulary
            (5, " ".join(words[100:200]), "en", "c", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        (r.source_a, r.source_b): r
        for r in kmv_source_similarity(docs, k=32).collect()
    }
    assert out[("a", "b")].jaccard_est == 1.0  # identical vocab
    assert out[("a", "c")].jaccard_est == 0.0  # disjoint vocab
    assert out[("a", "c")].k_used == 32

    # mergeability (bottom-k of a union == bottom-k of the union of
    # bottom-k's): sketch each doc alone with k=32, merge, re-cut, and
    # compare against sketching the full slice directly.
    import hashlib

    def h60(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)

    full_vocab_a = set(words[:100])
    direct = sorted(h60(t) for t in full_vocab_a)[:32]
    sk_doc1 = sorted(h60(t) for t in set(words[:100]))[:32]
    sk_doc2 = sorted(h60(t) for t in set(words[50:100]))[:32]
    merged = sorted(set(sk_doc1) | set(sk_doc2))[:32]
    assert merged == direct


def test_pseudonymize_preserves_joins_and_rotates_with_salt(spark):
    from airflow_loan_etl_pipeline_spark.operators.validate import pseudonymize

    a = spark.createDataFrame([(1, "x"), (2, "y")], "uid long, a string")
    b = spark.createDataFrame([(1, "m"), (3, "n")], "uid long, b string")
    pa = pseudonymize(a, ["uid"], salt="s1")
    pb = pseudonymize(b, ["uid"], salt="s1")
    joined = pa.join(pb, "uid").collect()
    assert len(joined) == 1 and joined[0].a == "x" and joined[0].b == "m"
    # different salt unlinks everything
    pb2 = pseudonymize(b, ["uid"], salt="s2")
    assert pa.join(pb2, "uid").count() == 0
    # pseudonyms are not the raw ids and are 64 hex chars
    vals = [r.uid for r in pa.collect()]
    assert all(len(v) == 64 and v not in ("1", "2") for v in vals)


def test_range_checksums_localize_divergence(spark):
    from airflow_loan_etl_pipeline_spark.operators.validate import (
        range_checksums,
    )

    rows = [(i, f"v{i}") for i in range(160)]
    a = spark.createDataFrame(rows, "k long, v string")
    # replica with ONE mutated row (key 37 -> chunk 37 % 16 = 5)
    rows_b = [(i, "MUTATED" if i == 37 else f"v{i}") for i in range(160)]
    b = spark.createDataFrame(rows_b, "k long, v string").repartition(7)
    ca = {r.chunk: r.checksum for r in range_checksums(a, "k").collect()}
    cb = {r.chunk: r.checksum for r in range_checksums(b, "k").collect()}
    diff = [c for c in ca if ca[c] != cb[c]]
    assert diff == [5]  # divergence localized to exactly one chunk
    # identical replicas agree on every chunk regardless of layout
    c2 = {
        r.chunk: r.checksum
        for r in range_checksums(a.repartition(13), "k").collect()
    }
    assert c2 == ca


def test_substring_cut_removes_shared_boilerplate(spark):
    import hashlib

    from airflow_loan_etl_pipeline_spark.operators.dedup import substring_cut

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma all rights reserved", "en", "a", 0),
            (2, "delta epsilon zeta all rights reserved", "en", "a", 0),
            (3, "one two three four", "en", "b", 0),
            (4, "hi there", "en", "b", 0),  # too short: passes through
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in substring_cut(docs).collect()}
    # docs 1/2 lose exactly the shared trailing trigram's 3 tokens
    assert out[1].n_removed == 3
    assert out[1].clean_md5 == hashlib.md5(b"alpha beta gamma").hexdigest()
    assert out[2].clean_md5 == hashlib.md5(b"delta epsilon zeta").hexdigest()
    # unique doc untouched; short doc passes through uncut
    assert out[3].n_removed == 0
    assert out[3].clean_md5 == hashlib.md5(b"one two three four").hexdigest()
    assert out[4].n_removed == 0 and out[4].n_tokens == 2


def test_dedup_funnel_is_monotone(spark):
    """Funnel contract: each stage can only shrink the corpus —
    raw >= exact >= normalized, and near-dup clusters never exceed the
    exact-group count (identical texts share every band, so LSH always
    links them)."""
    from airflow_loan_etl_pipeline_spark.registry_text import (
        dedup_funnel_summary,
    )

    r = dedup_funnel_summary(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.n_docs >= r.n_after_exact >= r.n_after_normalized
    assert r.n_after_neardup <= r.n_after_exact
    assert r.n_after_neardup >= 1


def _bloom_positions_py(texts, m):
    """Pure-python mirror of the bloom hash/shingle definition: distinct
    3-gram shingles (whole text if short), two md5-slice positions."""
    import hashlib

    pos = set()
    for t in texts:
        toks = t.split(" ")
        if len(toks) >= 3:
            sh = dict.fromkeys(
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            )
        else:
            sh = {t: None}
        for s in sh:
            h = hashlib.md5(s.encode()).hexdigest()
            pos.add(int(h[0:15], 16) % m)
            pos.add(int(h[15:30], 16) % m)
    return pos


def test_bloom_words_pack_exactly(spark):
    """benchmark_bloom_words packs exactly the independently-computed
    md5 position set, stays signed-64 safe, and the empty benchmark
    packs an all-zero bitmap."""
    texts = [
        "the quick brown fox jumps high",
        "one two three four five",
        "xy",  # short doc: whole text is the shingle
    ]
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m = D.BLOOM_M_BITS
    words = D.benchmark_bloom_words(bench)
    assert len(words) == m // 64
    assert all(-(1 << 63) <= w < (1 << 63) for w in words)
    unpacked = {
        64 * wi + k
        for wi, w in enumerate(words)
        for k in range(64)
        if ((w % (1 << 64)) >> k) & 1
    }
    assert unpacked == _bloom_positions_py(texts, m)

    empty = bench.filter("doc_id < 0")
    assert all(w == 0 for w in D.benchmark_bloom_words(empty))


def test_bloom_packing_paths_identical(spark):
    """The distributed bit_or packing produces the BIT-IDENTICAL word
    list as the driver-side distinct+pack, at the compact default m and
    at the m=2^20 production configuration; auto picks by m; the
    broadcast-probe ceiling raises instead of silently overflowing."""
    import pytest

    texts = [
        "the quick brown fox jumps high",
        "one two three four five six seven",
        "xy",
        "the quick brown fox jumps high",  # dup doc: bit_or must not care
    ]
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for m in (D.BLOOM_M_BITS, 1 << 20):
        drv = D.benchmark_bloom_words(bench, m_bits=m, packing="driver")
        dist = D.benchmark_bloom_words(bench, m_bits=m, packing="bit_or")
        assert drv == dist
        assert any(w != 0 for w in drv)
    # auto: driver at the compact default, bit_or above it — both pin
    # to the same values either way, so just check it runs
    assert D.benchmark_bloom_words(bench) == D.benchmark_bloom_words(
        bench, packing="bit_or"
    )
    with pytest.raises(ValueError, match="ceiling"):
        D.benchmark_bloom_words(bench, m_bits=D.BLOOM_M_BITS_MAX * 2)
    with pytest.raises(ValueError, match="packing"):
        D.benchmark_bloom_words(bench, packing="nope")


def test_decontaminate_bloom_no_false_negatives(spark, sf_dir):
    """Bloom contract on the real fixture: every doc the exact join
    flags is bloom-flagged with n_overlap_bloom >= the exact overlap
    (bit tests can only add hits, never lose one)."""
    from airflow_loan_etl_pipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    exact = {r.doc_id: r for r in D.decontaminate(train, bench).collect()}
    bloom = {
        r.doc_id: r for r in D.decontaminate_bloom(train, bench).collect()
    }
    assert set(exact) <= set(bloom)
    for did, r in exact.items():
        assert bloom[did].n_overlap_bloom >= r.n_overlap, did
        assert bloom[did].n_sh == r.n_sh, did
    # and the calibration row agrees with the set difference
    from airflow_loan_etl_pipeline_spark import registry_text  # noqa: F401
    from airflow_loan_etl_pipeline_spark.registry import QUERIES

    cal = QUERIES["decontaminate_bloom_fp_rate"](spark, sf_dir).collect()[0]
    assert cal.n_flagged_exact == len(exact)
    assert cal.n_flagged_bloom == len(bloom)
    assert cal.n_false_pos == len(set(bloom) - set(exact))


def test_dedup_token_savings_funnel_monotone(spark, sf_dir):
    """Token-economics funnel: per source, surviving-representative
    tokens can only shrink down the funnel (every near-dup cluster rep
    is also an exact rep: identical texts share all bands, so the
    cluster min-id is its own exact-group keeper), and doc counts
    reconcile with the corpus."""
    from airflow_loan_etl_pipeline_spark import registry_text  # noqa: F401
    from airflow_loan_etl_pipeline_spark.catalog import load_table
    from airflow_loan_etl_pipeline_spark.registry import QUERIES

    rows = QUERIES["dedup_token_savings"](
        spark, sf_dir
    ).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert len(rows) > 0
    for r in rows:
        assert (
            r.tokens_neardup_reps <= r.tokens_exact_reps <= r.total_tokens
        ), r.source
    # dedup actually binds somewhere on the fixture
    assert any(r.tokens_neardup_reps < r.total_tokens for r in rows)

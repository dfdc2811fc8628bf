"""Text analysis for training-data pipelines (SURVEY.md §7 phase 4):
tokenization, quality scoring, language ID, document fingerprinting.

All operators are native Spark expressions (split / array lambdas / md5)
— no Python UDFs — so they stay inside whole-stage codegen and scale
linearly with no shuffle (pure map-side projection). That matters at
100 TB: a per-row Python UDF here would serialize every document across
the JVM↔Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from airflow_loan_etl_pipeline_spark.operators.cache_scope import (
    materialize_consistent as _consistent,
)
from airflow_loan_etl_pipeline_spark.session import (
    engine_parallelism as _parallelism,
)

# Tiny English function-word lexicon for the n-gram/stopword heuristic.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (single-space corpus convention)."""
    return F.split(F.col(col), " ")


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting + lexical diversity, one codegen'd projection."""
    t = tokens(text_col)
    return df.select(
        id_col,
        F.length(F.col(text_col)).alias("n_chars_m"),
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        F.round(F.size(F.array_distinct(t)) / F.size(t), 4).alias("distinct_ratio"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: length, mean token length, stopword
    ratio, lexical diversity, and a blended score."""
    sw = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    t = f"split({text_col}, ' ')"
    n_tok = f"size({t})"
    # Score blends the UNROUNDED ratios: blending pre-rounded 4-decimal
    # values lands on exact decimal halves (e.g. 0.47455) where engines'
    # float rounding direction diverges.
    raw = df.selectExpr(
        id_col,
        f"{n_tok} AS n_tokens",
        f"aggregate(transform({t}, x -> length(x)), 0, (acc, x) -> acc + x)"
        f" / {n_tok} AS _mtl",
        f"size(filter({t}, x -> x IN ({sw}))) / {n_tok} AS _swr",
        f"size(array_distinct({t})) / {n_tok} AS _dr",
    )
    return raw.select(
        id_col,
        "n_tokens",
        F.round("_mtl", 4).alias("mean_token_len"),
        F.round("_swr", 4).alias("stopword_ratio"),
        F.round("_dr", 4).alias("distinct_ratio"),
        # floor-scaling instead of round(): the blend of small rationals
        # regularly lands on exact decimal halves (x.xxxx5) where decimal
        # rounding of a binary double is engine-dependent; floor on the
        # identical double is not.
        (
            F.floor(
                (
                    0.4 * F.least(F.col("n_tokens") / 64.0, F.lit(1.0))
                    + 0.3 * F.col("_dr")
                    + 0.3 * F.least(F.col("_swr") * 5.0, F.lit(1.0))
                )
                * 10000
            )
            / 10000
        ).alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """n-gram-free heuristic language ID: English function-word density.

    A real pipeline would swap in fastText/CLD3 behind the same column
    contract; the heuristic keeps the operator oracle-comparable.
    """
    sw = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    t = f"split({text_col}, ' ')"
    scored = df.selectExpr(
        id_col,
        f"round(size(filter({t}, x -> x IN ({sw}))) / size({t}), 4) AS en_score",
    )
    return scored.withColumn(
        "predicted_lang",
        F.when(F.col("en_score") >= 0.05, F.lit("en")).otherwise(F.lit("und")),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint (md5) — the exact-dedup key.
    At scale: group/partition by this 128-bit key, never by raw text
    (shuffling full documents to compare equality wastes the network)."""
    return df.select(
        id_col,
        F.md5(F.col(text_col)).alias("fingerprint"),
    )


def top_terms(
    df: DataFrame, k: int = 20, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary head: the ``k`` most frequent tokens with
    document frequency and total count — the first diagnostic every
    corpus build runs (stopword skew, boilerplate detection, the df
    distribution that motivates the dedup caps).

    Scale shape: explode → ONE hash aggregate keyed by token (map-side
    partial combine collapses each partition's repeats before the
    shuffle) → TakeOrderedAndProject for the top-k. No window, no
    second pass.
    """
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    counts = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("total_count"),
        F.countDistinct(id_col).alias("doc_freq"),
    )
    return counts.orderBy(
        F.col("total_count").desc(), F.col("term").asc()
    ).limit(k)


def tfidf_top_terms(
    df: DataFrame,
    per_doc_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``per_doc_k`` terms by TF-IDF — the classic
    keyword extraction over a corpus.

    IDF uses the RATIONAL form (n_docs + 1) / (df + 1) instead of its
    logarithm: rankings are identical (log is monotone) and every
    arithmetic op stays IEEE-exact (+,*,/ — no transcendental whose
    last-ulp behavior differs between engines), so the oracle matches
    bit-for-bit.

    Scale shape: one explode → (doc, term) count aggregate; df per term
    via a second aggregate over the SAME pre-aggregated rows (not the
    raw corpus); n_docs is a 1-row broadcast; the per-doc top-k window
    partitions over doc_id on rows already collapsed to distinct
    (doc, term) — bounded by vocabulary size per doc, not corpus size.
    """
    tf = (
        df.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.col("n_docs") + 1) / (F.col("df") + 1), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_doc_k)
        .select(id_col, "term", "tf", "df", "tfidf", "rn")
    )


def corpus_mix_sample(
    df: DataFrame,
    rates: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: int = 0,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the corpus-mixing step
    of a training-data build ("keep 80% of en, 30% of zh, ...").

    Membership is CONTENT-ADDRESSED: keep iff
    ``md5(doc_id) % 100 < rate(stratum)``. Unlike seeded ``sampleBy``
    (whose RNG stream is engine- and partitioning-dependent), the same
    document makes the same cut on any engine, any partitioning, any
    rerun — the property a reproducible corpus release needs, and what
    makes the operator oracle-verifiable. Rates are integer percages
    0-100; strata absent from ``rates`` get ``default_rate``.

    Scale shape: pure scan-local filter (one md5 per row, codegen), no
    shuffle, trivially parallel at any corpus size.
    """
    h = (
        f"cast(conv(substr(md5(cast({id_col} AS string)), 1, 8), 16, 10) "
        "AS bigint) % 100"
    )
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(int(v))).otherwise(rate)
    return df.withColumn("_bucket", F.expr(h)).filter(
        F.col("_bucket") < rate
    ).drop("_bucket")


# BPE-ish subword pattern: runs of letters, runs of digits, or a single
# non-alphanumeric mark — the pre-tokenization split every byte-pair
# tokenizer applies before merges. Subword merges then only SHORTEN
# token streams, so `ceil(chars/4)` (the ~4-chars/token empirical rate
# for English BPE vocabularies) brackets the estimate from the other
# side. Both are one codegen'd projection — no UDF, no vocab shipping.
BPE_PRETOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_token_estimate(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Tokenizer-cost estimation for LLM training-data budgeting:
    pre-token count (regex, upper bound) and chars/4 (lower-ish bound).
    At 100 TB this is the projection that decides what a corpus costs
    to train on — it must stay JVM-side, which both expressions do."""
    return df.select(
        id_col,
        F.size(
            F.expr(f"regexp_extract_all({text_col}, '{BPE_PRETOKEN_RE}', 0)")
        ).alias("n_pretokens"),
        F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).alias("est_bpe_tokens"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Intra-document repetition signals (the Gopher/MassiveText filter
    family): fraction of duplicated tokens and of duplicated word
    n-grams. Heavily self-repeating documents (boilerplate, listings,
    SEO spam) are dropped from LLM corpora before any cross-document
    dedup runs.

    ``dup_ngram_frac = 1 - distinct_ngrams / ngram_positions`` — 0 for a
    text that never repeats an n-gram, → 1 as the doc degenerates into a
    loop. Docs shorter than ``n`` tokens are excluded (no n-gram
    positions to score).

    Scale shape: the distinct-n-gram count rides :func:`dedup.shingle_rows`
    (Arrow-batched, already the corpus shingling primitive), collapsed
    to ~1 row/doc by a map-side-combinable max; token counts are a pure
    projection; the final equi-join keys on doc_id. No pass touches the
    corpus more than once.
    """
    from airflow_loan_etl_pipeline_spark.operators.dedup import shingle_rows

    t = tokens(text_col)
    tok_stats = df.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
    ).filter(F.col("n_tokens") >= n)
    # shingle_rows emits one row per DISTINCT shingle with the per-doc
    # count attached; max() collapses back to one row per doc.
    distinct_ngrams = (
        shingle_rows(df, id_col, text_col, n)
        .groupBy(id_col)
        .agg(F.max("n_sh").alias("n_distinct_ngrams"))
    )
    out = tok_stats.join(distinct_ngrams, id_col)
    positions = F.col("n_tokens") - F.lit(n - 1)
    return out.select(
        id_col,
        "n_tokens",
        positions.alias("ngram_positions"),
        "n_distinct_ngrams",
        F.round(
            F.lit(1.0) - F.col("n_distinct_tokens") / F.col("n_tokens"), 4
        ).alias("dup_token_frac"),
        F.round(F.lit(1.0) - F.col("n_distinct_ngrams") / positions, 4).alias(
            "dup_ngram_frac"
        ),
    )


def pack_sequences(
    df: DataFrame,
    bin_tokens: int = 512,
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequential sequence-packing plan: concatenate documents in
    id order and cut every ``bin_tokens`` tokens — the packing step that
    turns a filtered corpus into fixed-length training sequences.

    A document lands in the bin where the running token total stood
    when it arrived (``floor(cumsum_before / bin_tokens)``): greedy
    concatenation with documents spanning bin boundaries, which is how
    production packers behave (split-and-carry), summarized at doc
    granularity by the bin each doc STARTS in.

    Scale shape: the running sum partitions by ``part_col`` (corpus
    shard / source), so no global single-partition window exists — each
    source packs independently, exactly how a sharded packer runs, and
    the window input is one int per doc, not the text. Output is one
    row per (source, bin): doc count + token fill.
    """
    sized = df.select(
        F.col(part_col), F.col(id_col), F.size(tokens(text_col)).alias("n_tok")
    )
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = sized.withColumn(
        "bin_id",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / bin_tokens),
    )
    return binned.groupBy(part_col, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("tokens_in_bin"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def chunk_documents(
    df: DataFrame,
    window: int = 16,
    stride: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking (RAG / context-window prep):
    each document explodes into chunks of ``window`` tokens every
    ``stride`` tokens, final partial chunk included.

    Output carries the chunk fingerprint (md5) instead of the chunk
    text — at 100 TB the downstream chunk-level dedup/indexing keys on
    the fingerprint, and the full text re-materializes only for chunks
    that survive.

    Scale shape: pure map-side explode (fan-out ≈ n_tokens/stride per
    doc), zero shuffles; the per-chunk slice/concat runs on the already
    tokenized array.
    """
    t = tokens(text_col)
    # Upper bound for chunk starts: with window > stride the previous
    # chunk always reaches at least n - stride + window - 1 >= n, so
    # capping at n-1 skips only fully-covered suffix starts. With
    # window <= stride that cap LOSES the tail (an 8/8 chunking of a
    # 9-token doc covered only tokens 1-8) — the final start must be
    # allowed to reach n so the partial tail chunk is emitted.
    cap = F.size(t) - 1 if window > stride else F.size(t)
    starts = F.sequence(F.lit(1), F.greatest(cap, F.lit(1)), F.lit(stride))
    ex = df.select(
        F.col(id_col), t.alias("_toks"), F.posexplode(starts)
    ).withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "chunk_start")
    chunk = F.slice(F.col("_toks"), F.col("chunk_start"), window)
    return ex.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_fp"),
    )


# Conservative, engine-portable PII patterns (same semantics under
# Java regex and RE2/DuckDB): emails, international-ish phone numbers,
# 16-digit card numbers. A production scrubber swaps in a vetted
# library behind the same column contract; these give the operator its
# real shape (N patterns, ordered replace, per-doc hit counts).
PII_PATTERNS = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    ("card", r"\b[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}\b"),
    ("phone", r"\+[0-9]{1,3}[- ][0-9]{3,14}"),
)


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction for corpus release: replace emails / card numbers /
    phone numbers with ``<TYPE>`` tokens and count hits per category.

    Patterns apply in fixed order (card before phone: a hyphenated card
    number contains phone-shaped substrings). Pure codegen projection —
    ``regexp_replace``/``regexp_count`` are JVM-side, no UDF, no
    shuffle; at 100 TB this runs at scan speed.
    """
    out = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(F.regexp_count(out, F.lit(pat)).alias(f"n_{name}"))
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return df.select(F.col(id_col), *counts, out.alias("clean_text"))


def quota_select(
    df: DataFrame,
    per_stratum: int = 50,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-quota corpus selection: the top ``per_stratum`` documents
    per stratum by quality score — how a curated training mix enforces
    per-domain budgets ("at most N pages per site / per source") instead
    of a global threshold that lets one domain dominate.

    Scale shape: the score is a map-side projection; the only shuffle is
    the per-stratum top-k window, which partitions by the stratum — and
    ranks (score, id) pairs, not documents: the text never enters the
    exchange. Ties break on doc_id so the selection is deterministic.
    """
    scored = quality_score(df, id_col, text_col).select(id_col, "quality_score")
    strata = df.select(id_col, stratum_col)
    j = strata.join(scored, id_col)
    w = Window.partitionBy(stratum_col).orderBy(
        F.col("quality_score").desc(), F.col(id_col).asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_stratum)
        .select(stratum_col, id_col, "quality_score", "rn")
    )


def corpus_split(
    df: DataFrame,
    val_pct: int = 5,
    test_pct: int = 5,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-addressed train/val/test assignment: bucket =
    ``md5(doc_id) % 100``; the top ``test_pct`` buckets are test, the
    next ``val_pct`` val, the rest train. Reduced to per-(stratum,
    split) counts.

    Same determinism contract as :func:`corpus_mix_sample` — a document
    lands in the same split on any engine, partitioning, or rerun, and
    adding documents never moves existing ones between splits (the
    property a frozen eval set requires; a seeded ``randomSplit``
    reshuffles everything on every change).

    Scale shape: scan-local md5 + one small aggregate keyed by
    (stratum, split).
    """
    h = (
        f"cast(conv(substr(md5(cast({id_col} AS string)), 1, 8), 16, 10) "
        "AS bigint) % 100"
    )
    split = (
        F.when(F.expr(h) >= 100 - test_pct, F.lit("test"))
        .when(F.expr(h) >= 100 - test_pct - val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return (
        df.select(F.col(stratum_col), split.alias("split"))
        .groupBy(stratum_col, "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    val_pct: int = 5,
    test_pct: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/val/test assignment keyed on the NEAR-DUP CLUSTER id, not
    the document id: every member of a duplicate cluster lands in the
    same split.

    :func:`corpus_split` hashes the doc id, so two near-identical
    documents can straddle train and test — the classic eval-leakage
    bug (the model is "tested" on a paraphrase of a training doc).
    Hashing the cluster representative instead makes leakage across
    splits impossible by construction, while keeping the same
    determinism contract: content-addressed, engine/partitioning/rerun
    independent, and adding documents never moves existing clusters.

    Scale shape: the cluster map is (doc_id, cluster_id) — one equi-join
    on the doc id (broadcastable when only dup clusters are passed;
    singletons default to their own id via the left join + coalesce),
    then scan-local md5. No new shuffle beyond the join.
    """
    labeled = docs.select(id_col).join(
        clusters.select(
            F.col(id_col), F.col("cluster_id").alias("_cid")
        ),
        id_col,
        "left",
    ).withColumn("cluster_id", F.coalesce(F.col("_cid"), F.col(id_col)))
    h = (
        "cast(conv(substr(md5(cast(cluster_id AS string)), 1, 8), 16, 10) "
        "AS bigint) % 100"
    )
    split = (
        F.when(F.expr(h) >= 100 - test_pct, F.lit("test"))
        .when(F.expr(h) >= 100 - test_pct - val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return labeled.select(
        F.col(id_col), F.col("cluster_id"), split.alias("split")
    )


def shuffle_order(
    df: DataFrame,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: rank every document
    by ``md5(seed || id)`` — a content-addressed permutation that is
    identical on any engine, partition layout, or rerun (a seeded
    ``orderBy(rand())`` is none of those: rand() is per-partition-seeded,
    so the SAME seed gives a different order after a repartition).

    Training pipelines need this once per epoch spec: interleaving
    sources destroys the within-source ordering correlations (curriculum
    accidents, crawl-date clumping) that hurt convergence.

    Scale shape: the naive ``row_number() OVER (ORDER BY hash)`` plans
    as an Exchange SinglePartition — the whole corpus through one task.
    This uses the standard distributed global-rank recipe instead:
    range-partition on (hash, id) (uniform key → balanced bounds), rank
    LOCALLY per shuffle partition (parallel window on the partition id),
    then add per-partition offsets computed from a tiny
    partitions-count aggregate (≤ parallelism rows) broadcast back. The
    global rank is exact whatever bounds the range sampler picked,
    because ranges are ordered and ranking is dense within each. For a
    pure materialization, skip ranking entirely:
    ``repartitionByRange(n, hash).sortWithinPartitions(hash)`` gives
    the same order.

    The offsets branch re-derives the ranked subtree (the
    ``spark_partition_id`` marker blocks exchange reuse); at corpus
    scale persist/localCheckpoint the ranked frame first so the range
    shuffle runs once — both passes are balanced-parallel either way,
    which is the point: the naive formulation serializes the corpus.
    """
    from airflow_loan_etl_pipeline_spark.operators.topk import global_rank

    h = (
        f"cast(conv(substr(md5(concat(cast({seed} AS string), ':', "
        f"cast({id_col} AS string))), 1, 15), 16, 10) AS bigint)"
    )
    return global_rank(
        df.withColumn("_h", F.expr(h)),
        ["_h", id_col],
        rank_col="shuffle_rank",
    ).drop("_h")


def oov_stats(
    df: DataFrame, vocab_k: int = 20, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Tokenizer-coverage diagnostic: per document, the fraction of
    token OCCURRENCES outside the corpus top-``vocab_k`` vocabulary —
    the out-of-vocabulary rate that sizes a tokenizer's vocab against
    a corpus (high OOV → byte-fallback blowup in sequence length).

    Scale shape: the vocabulary head is tiny and **broadcast**; the
    corpus-side pass is one explode + a left join against the broadcast
    + a ~1-row/doc count aggregate. The corpus never shuffles for the
    vocab probe.
    """
    vocab = top_terms(df, k=vocab_k, id_col=id_col, text_col=text_col).select(
        "term", F.lit(1).alias("_v")
    )
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    joined = tok.join(F.broadcast(vocab), "term", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("_v").isNull().cast("long")).alias("n_oov"),
        F.round(
            F.sum(F.col("_v").isNull().cast("long")) / F.count(F.lit(1)), 4
        ).alias("oov_rate"),
    )


def pmi_bigrams(
    df: DataFrame,
    top: int = 15,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collocation extraction: top adjacent-token bigrams by pointwise
    mutual information. PMI uses the RATIONAL form
    ``count(ab) * n_tokens / (count(a) * count(b))`` — the log is
    monotone, so rankings match the textbook score while every
    arithmetic op stays IEEE-exact for the oracle.

    Scale shape: bigrams explode MAP-SIDE from
    ``arrays_zip(slice(toks, 1, n-1), slice(toks, 2, n-1))`` — plain
    codegen expressions, not an interpreted higher-order lambda — so
    the corpus is never shuffled at all: the only exchanges carry
    vocabulary-bounded (word) and (w1, w2) count rows with map-side
    partial aggregation. (The previous positional self-join paid two
    corpus-sized (doc, pos) exchanges; measured 2x slower warm at
    sf0.1 and strictly worse at cluster scale.) The unigram count
    frame feeds three branches (both PMI denominator joins + the
    total-token sum) and is vocabulary-bounded, so it is materialized
    once. Final top-k is TakeOrdered.
    """
    arr = f"split({text_col}, ' ')"
    big = (
        df.selectExpr(
            f"explode(arrays_zip(slice({arr}, 1, size({arr}) - 1),"
            f" slice({arr}, 2, size({arr}) - 1))) AS bg"
        )
        .select(
            F.col("bg")["0"].alias("w1"), F.col("bg")["1"].alias("w2")
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    uni = _consistent(
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tok = uni.agg(F.sum("c").alias("n_tokens"))
    # No explicit broadcast on the unigram table: it is VOCABULARY-sized
    # (can reach 10^7+ rows on a web corpus — too big to force onto every
    # executor). The joins key on the word, so their shuffles are bounded
    # by vocab, not corpus; AQE still picks broadcast when uni is small.
    scored = (
        big.join(uni.withColumnRenamed("w", "w1")
                 .withColumnRenamed("c", "c_a"), "w1")
        .join(uni.selectExpr("w AS w2", "c AS c_b"), "w2")
        .crossJoin(F.broadcast(n_tok))
        .select(
            "w1", "w2", "c_ab",
            # Multiply in DOUBLE: c_ab * n_tokens in int64 overflows on a
            # ~1e10-token corpus (ANSI mode then kills the job); the
            # oracle casts identically so both engines run the same
            # IEEE product.
            F.round(
                F.col("c_ab") * F.col("n_tokens").cast("double")
                / (F.col("c_a").cast("double") * F.col("c_b")), 6
            ).alias("pmi_ratio"),
        )
    )
    return scored.orderBy(
        F.col("pmi_ratio").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top)


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    df: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 relevance of every document against a fixed term set — the
    retrieval primitive over an LLM corpus (quality-weighted sampling,
    topic probes, eval-set mining). Whole pipeline is native codegen:
    one explode pass computes term frequencies, the per-term document
    frequencies are a tiny broadcast, and the per-doc score is a
    map-side expression — one shuffle keyed on (doc, term), nothing
    keyed on text. At 100 TB the df table is the only global state and
    it is vocabulary-sized.

    Emits every matching doc (no LIMIT): rank cutoffs on an IEEE score
    are engine-order-sensitive at ties, full output is not.
    """
    terms = tuple(terms)
    docs = df.select(
        # internal frame keys on the CALLER'S id column name so the
        # output id column honors id_col (previously hardcoded doc_id)
        F.col(id_col).alias(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.split(F.col(text_col), " ").alias("_toks"),
    )
    corpus = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        docs.select(id_col, "dl", F.explode("_toks").alias("w"))
        .filter(F.col("w").isin(*terms))
        .groupBy(id_col, "dl", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = idf * (
        F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1
            * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(corpus))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.round(F.sum(term_score), 4).alias("bm25"),
        )
    )


def length_weighted_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_chars_cap: int = 400,
) -> DataFrame:
    """Importance sampling with keep-probability proportional to
    document length (capped): keep iff
    ``md5(doc_id) % 1e6 < min(n_chars, cap) * 1e6 / cap``. Same
    content-addressed determinism as corpus_mix_sample — the identical
    document makes the identical cut on any engine or partitioning —
    but with a CONTINUOUS per-row weight instead of per-stratum rates.
    Pure scan-local codegen filter, no shuffle.
    """
    h = (
        f"cast(conv(substr(md5(cast({id_col} AS string)), 1, 8), 16, 10) "
        "AS bigint) % 1000000"
    )
    threshold = (
        F.least(F.col("n_chars"), F.lit(weight_chars_cap)) * 1e6
        / F.lit(float(weight_chars_cap))
    )
    return df.withColumn("_u", F.expr(h)).filter(F.col("_u") < threshold).drop("_u")


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    token distribution — the poor-man's LM quality filter (the CCNet
    recipe scores docs with a KenLM model; the unigram corpus model is
    its zero-dependency analogue). Documents full of rare/garbage
    tokens score very negative; boilerplate scores near the corpus mode.

    Plan: one explode of token occurrences, a map-side-combinable
    count aggregate, a 1-row total broadcast, then a token-level
    equi-join back to the occurrences and a per-doc avg. The join keys
    on the raw token string (dictionary-encoded, shuffle-compressed);
    at 100 TB swap the join for a BROADCAST of the top-V vocabulary
    with a rare-token floor probability — the tail of the distribution
    carries almost no mass, so the cutoff changes scores negligibly
    while removing the corpus-sized shuffle entirely.
    """
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
    )
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n_total"))
    lp = cnt.crossJoin(F.broadcast(tot)).select(
        "t", F.log(F.col("c") / F.col("n_total")).alias("lp")
    )
    return (
        tok.join(lp, "t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # round(x, 6), not floor-scaling: log values are irrational,
            # never exact decimal halves (the repo's float-parity rule).
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


def length_rebalance(
    df: DataFrame,
    bucket_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Uniform length-distribution rebalance: bucket documents by token
    count, then down-sample every bucket to the SMALLEST bucket's size,
    keeping the deterministically-first docs by content hash.

    Long-tail length skew is a real training-mix problem (crawl corpora
    are dominated by short docs; naive sampling starves the long-doc
    buckets that teach long-range structure). Selection inside a bucket
    is ranked by ``md5(doc_id)`` — engine/partitioning/rerun invariant,
    no RNG.

    Plan: scan-local bucketing, one tiny bucket-size aggregate joined
    back by broadcast, one window partitioned BY BUCKET (parallel across
    buckets — never global), one final count. The window's per-bucket
    ordering is the scale constraint: a mega-bucket sorts in one task's
    spill space, which is exactly the skew the rebalance exists to
    remove, and the post-filter output is min_size rows per bucket.
    """
    # Integer division, never a double→int cast: Spark's cast truncates
    # while DuckDB's rounds half-to-even — `div` is floor on both.
    b = df.select(
        F.col(id_col),
        F.expr(
            f"size(split({text_col}, ' ')) div {bucket_tokens}"
        ).alias("bucket"),
    )
    sizes = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs"))
    target = sizes.agg(F.min("n_docs").alias("n_target"))
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    kept = (
        b.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(target))
        .filter(F.col("rk") <= F.col("n_target"))
    )
    return (
        kept.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .join(sizes, "bucket")
        .select("bucket", "n_docs", "n_kept")
    )


def charset_stats(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Character-class composition per corpus slice: digit / uppercase /
    whitespace / non-alphanumeric character counts and the digit share —
    the encoding-health screen that catches OCR noise, base64 blobs,
    table dumps, and mojibake sources before they enter a training mix.

    All counts are exact integers computed scan-local as
    ``length(x) - length(regexp_replace(x, class, ''))`` (native codegen,
    zero UDFs, zero shuffles beyond the |sources|-row aggregate). The
    share is floored at 4 decimals per the registry's float-parity rule.
    Character classes are ASCII-explicit (``[0-9]``, ``[A-Z]``,
    ``[^a-zA-Z0-9 ]``) so the Java-regex and RE2 oracles agree.
    """
    t = F.col(text_col)

    def n_matching(pattern: str):
        return F.length(t) - F.length(F.regexp_replace(t, pattern, ""))

    per_doc = docs.select(
        F.col(group_col),
        F.length(t).alias("_len"),
        n_matching("[0-9]").alias("_digits"),
        n_matching("[A-Z]").alias("_upper"),
        n_matching(" ").alias("_spaces"),
        n_matching("[^a-zA-Z0-9 ]").alias("_other"),
    )
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_len").alias("n_chars"),
        F.sum("_digits").alias("digit_chars"),
        F.sum("_upper").alias("upper_chars"),
        F.sum("_spaces").alias("space_chars"),
        F.sum("_other").alias("other_chars"),
        (
            F.floor(F.sum("_digits") * 1e4 / F.sum("_len")) / 1e4
        ).alias("digit_share"),
    )


VOCAB_CHECKPOINTS = (4, 8, 16, 24, 1024, 65536)


def vocab_coverage(
    docs: DataFrame,
    text_col: str = "text",
    checkpoints: tuple[int, ...] = VOCAB_CHECKPOINTS,
) -> DataFrame:
    """Vocabulary coverage curve: what share of all token OCCURRENCES
    the top-k most frequent types cover, at the given k checkpoints —
    the tokenizer-sizing curve ("how big a vocab covers 95% of the
    corpus") and the Zipf-health companion to docs_zipf_fit.

    One vocabulary-sized shuffle builds type frequencies; the
    rank-and-running-sum over (freq desc, token asc) then uses the
    distributed two-pass recipe (range partition -> ONE local window
    computing both row_number and running sum -> per-partition
    (count, sum) totals broadcast back as offsets), so the vocabulary
    never funnels through a single-partition window. Output is
    |checkpoints| rows.
    """
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n = _parallelism(docs.sparkSession)
    # materialized once: the offsets branch re-derives this subtree,
    # and a re-derived repartitionByRange may sample different range
    # bounds — the same _pid-desync hazard global_rank guards against
    # (this site previously fanned the frame out unprotected)
    ranged = _consistent(
        freq.withColumn("_negc", -F.col("c"))
        .repartitionByRange(n, F.col("_negc"), F.col("tok"))
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(
        F.col("_negc").asc(), F.col("tok").asc()
    )
    local = ranged.withColumn(
        "_lrk", F.row_number().over(w_local)
    ).withColumn(
        "_ls",
        F.sum("c").over(w_local.rowsBetween(Window.unboundedPreceding, 0)),
    )
    totals = local.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("c").alias("_s")
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_offn"),
        F.coalesce(F.sum("_s").over(w_off), F.lit(0)).alias("_offs"),
    )
    # corpus total from the parallelism-sized per-partition totals —
    # re-aggregating freq would be a second full explode+groupBy pass
    tot = totals.agg(F.sum("_s").alias("_total"))
    ks = list(checkpoints)
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select(
            (F.col("_lrk") + F.col("_offn")).alias("vocab_size"),
            (F.col("_ls") + F.col("_offs")).alias("tokens_covered"),
        )
        .filter(F.col("vocab_size").isin(ks))
        .crossJoin(F.broadcast(tot))
        .select(
            "vocab_size",
            "tokens_covered",
            (
                F.floor(F.col("tokens_covered") * 1e4 / F.col("_total"))
                / 1e4
            ).alias("coverage"),
        )
    )


def rrf_fuse(
    ranked: list[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k: int = 60,
    top: int = 20,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) over any number of
    ranked lists: fused = Σ 1/(k + rank_i), the standard way to blend
    heterogeneous retrieval signals (BM25 relevance x quality score x
    embedding similarity) without score calibration.

    Each list is ranked by (score desc, id asc) — a total order — with
    the DISTRIBUTED global-rank recipe, so a corpus-sized candidate list
    never single-partitions. Lists are then full-outer joined on id
    (an id missing from a list contributes 0, the union-RRF convention)
    and the final top-``top`` is a TakeOrdered, not a full sort.
    """
    from airflow_loan_etl_pipeline_spark.operators.topk import global_rank

    fused = None
    for i, (df, score_col) in enumerate(ranked):
        r = global_rank(
            df.select(F.col(id_col), (-F.col(score_col)).alias("_neg")),
            ["_neg", id_col],
            rank_col=f"_r{i}",
        ).select(id_col, f"_r{i}")
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    contrib = [
        F.coalesce(1.0 / (F.lit(k) + F.col(f"_r{i}")), F.lit(0.0))
        for i in range(len(ranked))
    ]
    total = contrib[0]
    for c in contrib[1:]:
        total = total + c
    return (
        fused.select(F.col(id_col), F.round(total, 6).alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(top)
    )


def rank_rbo(
    a: DataFrame,
    b: DataFrame,
    score_a: str,
    score_b: str,
    id_col: str = "doc_id",
    p: float = 0.9,
    k: int = 20,
) -> DataFrame:
    """Rank-Biased Overlap (Webber et al. 2010) between two rankings,
    truncated at depth ``k`` — the standard top-weighted "how similar
    are these two retrieval systems" metric (unlike Kendall/Spearman it
    handles non-conjoint lists and weights early ranks geometrically).

    RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d. A shared doc with
    ranks (ra, rb) belongs to every prefix intersection from depth
    max(ra, rb) on, so its total contribution is the tail sum
    Σ_{d≥max} p^{d−1}/d — precomputed as a k-row broadcast lookup. The
    whole metric is then: rank both lists (distributed global-rank),
    inner-join on id, join the tail-sum lookup, one SUM. No per-depth
    iteration, no quadratic prefix scan.
    """
    from airflow_loan_etl_pipeline_spark.operators.topk import global_rank

    ra = global_rank(
        a.select(F.col(id_col), (-F.col(score_a)).alias("_neg")),
        ["_neg", id_col],
        rank_col="_ra",
    ).filter(F.col("_ra") <= k).select(id_col, "_ra")
    rb = global_rank(
        b.select(F.col(id_col), (-F.col(score_b)).alias("_neg")),
        ["_neg", id_col],
        rank_col="_rb",
    ).filter(F.col("_rb") <= k).select(id_col, "_rb")
    # tail[d] = sum_{j=d..k} p^(j-1)/j, exact same floats both engines
    tails = []
    acc = 0.0
    for d in range(k, 0, -1):
        acc += p ** (d - 1) / d
        tails.append((d, acc))
    spark = a.sparkSession
    lut = spark.createDataFrame(tails, "d int, tail double")
    shared = ra.join(rb, id_col).select(
        F.greatest(F.col("_ra"), F.col("_rb")).cast("int").alias("d")
    )
    return (
        shared.join(F.broadcast(lut), "d")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.round(F.coalesce((1 - p) * F.sum("tail"), F.lit(0.0)), 6).alias("rbo"),
        )
    )


def normalized_text(col: str = "text") -> Column:
    """Canonical text normalization for dedup keys: casefold, strip
    non-alphanumerics, collapse whitespace runs, trim. ASCII-explicit
    classes so Java-regex and RE2 oracles agree."""
    t = F.lower(F.col(col))
    t = F.regexp_replace(t, "[^a-z0-9 ]", "")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def normalized_exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on NORMALIZED text: catches duplicates that differ
    only in case, punctuation, or whitespace — the cheap pre-pass every
    production dedup runs before the shingle-based family (a large
    share of web near-dups are byte-level trivial). Same scale shape as
    exact_dedup: the shuffle carries the 16-byte md5 of the normalized
    form, never the text."""
    return (
        df.select(
            F.md5(normalized_text(text_col)).alias("nfp"), F.col(id_col)
        )
        .groupBy("nfp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def feature_matrix(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality-classifier feature export: every scalar
    text feature (length, token counts, lexical diversity, mean token
    length, stopword ratio, blended quality, language score/verdict) in
    ONE scan-local projection — the wide table a fastText-style quality
    model trains on.

    Fused on purpose: joining the individual operators would shuffle
    narrow feature rows by doc three times; computing the same
    expressions in one projection is shuffle-free. Consistency with the
    canonical operators is pinned by the ORACLE, which is literally the
    JOIN of token_stats x quality_score x lang_id oracles — if this
    fused projection ever drifts from the per-operator definitions, the
    gate breaks.
    """
    sw = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    t = f"split({text_col}, ' ')"
    n_tok = f"size({t})"
    raw = df.selectExpr(
        id_col,
        f"length({text_col}) AS n_chars_m",
        f"{n_tok} AS n_tokens",
        f"size(array_distinct({t})) AS n_unique_tokens",
        f"aggregate(transform({t}, x -> length(x)), 0, (acc, x) -> acc + x)"
        f" / {n_tok} AS _mtl",
        f"size(filter({t}, x -> x IN ({sw}))) / {n_tok} AS _swr",
        f"size(array_distinct({t})) / {n_tok} AS _dr",
    )
    return raw.select(
        id_col,
        "n_chars_m",
        "n_tokens",
        "n_unique_tokens",
        F.round("_dr", 4).alias("distinct_ratio"),
        F.round("_mtl", 4).alias("mean_token_len"),
        F.round("_swr", 4).alias("stopword_ratio"),
        (
            F.floor(
                (
                    0.4 * F.least(F.col("n_tokens") / 64.0, F.lit(1.0))
                    + 0.3 * F.col("_dr")
                    + 0.3 * F.least(F.col("_swr") * 5.0, F.lit(1.0))
                )
                * 10000
            )
            / 10000
        ).alias("quality_score"),
        F.round("_swr", 4).alias("en_score"),
        F.when(F.round("_swr", 4) >= 0.05, F.lit("en"))
        .otherwise(F.lit("und"))
        .alias("predicted_lang"),
    )


def readability(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    feature for quality filtering (very low scores flag legalese /
    machine-generated runs; implausibly high ones flag word salad).

    Syllables are approximated by VOWEL RUNS counted exactly in
    codegen: replacing each ``[aeiouy]+`` run with one marker and with
    nothing makes ``len(one) − len(none)`` the run count — integer
    arithmetic, no UDF, dialect-safe ASCII classes. Sentences split on
    ``[.!?]+`` with a non-empty-trim filter (fixture text without
    punctuation degrades to one sentence per doc, still well-defined).
    Scan-local; joins nothing.
    """
    t = F.lower(F.col(text_col))
    one = F.length(F.regexp_replace(t, "[aeiouy]+", "V"))
    none = F.length(F.regexp_replace(t, "[aeiouy]+", ""))
    syllables = one - none
    words = F.size(F.split(F.col(text_col), " "))
    sentences = F.greatest(
        F.size(
            F.filter(
                F.split(F.col(text_col), "[.!?]+"),
                lambda s: F.length(F.trim(s)) > 0,
            )
        ),
        F.lit(1),
    )
    score = (
        206.835
        - 1.015 * (words / sentences)
        - 84.6 * (syllables / words)
    )
    return docs.select(
        F.col(id_col),
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        F.round(score, 4).alias("flesch_score"),
    )


def compressibility(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document gzip compressibility — the entropy-proxy quality
    signal (boilerplate and template spam compress far better than
    natural prose; binary-ish noise compresses worse). Used as a cheap
    pre-filter alongside the repetition fractions.

    This is one of the few operators where Python is genuinely
    required (no codegen DEFLATE): an Arrow-batched ``mapInPandas``
    with per-batch zlib at level 6 — bytes never leave the executor,
    output is 3 numbers per doc. No SQL oracle (DuckDB has no gzip
    scalar): registered rows-only, semantics pinned by unit test.
    """
    import zlib

    def op(batches):
        import pandas as pd

        for pdf in batches:
            t = pdf[text_col].fillna("")
            raw = t.str.encode("utf-8")
            n_bytes = raw.str.len()
            n_gz = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes,
                    "n_gzip_bytes": n_gz,
                    "compress_ratio": (
                        (n_gz * 1e4 // n_bytes.clip(lower=1)) / 1e4
                    ),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        op,
        schema=f"{id_col} long, n_bytes long, n_gzip_bytes long,"
        " compress_ratio double",
    )


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean bigram conditional log-probability
    ln P(w_i | w_{i-1}) under the corpus's own bigram model with
    add-one smoothing — the context-aware upgrade of
    :func:`unigram_logprob` (word salad with plausible unigrams but
    impossible transitions scores sharply lower). The CCNet-style
    quality dial without an external LM.

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V), V = |unigram types|.
    Plan: bigram pairs built in-expression from the token array (one
    pass), corpus bigram/unigram counts as map-side-combinable
    aggregates, V as a 1-row broadcast, then the per-doc join + avg.
    The probability table is vocabulary²-bounded (observed bigrams
    only); single-token docs have no bigrams and are absent by
    contract.
    """
    # Tokenize ONCE into a column, then pair adjacent tokens with
    # zip_with over two slices — linear in tokens. The earlier
    # sequence+try_element_at formulation interpolated `split(text)`
    # INTO the lambda body, so every element access re-tokenized the
    # whole document: O(tokens²) string work per doc, measured as two
    # 4.2 s single-task stages at sf0.1 (now ~0.15 s). size >= 2 guard
    # first: slice lengths of size-1 are empty for 1-token docs either
    # way, but the filter also keeps the by-contract absence of
    # single-token docs explicit.
    # materialized once: the (doc, bigram) rows feed the bigram-count
    # aggregate AND the final per-doc scoring join.
    bi = (
        "zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1),"
        " (a, b) -> concat(a, ' ', b))"
    )
    pairs = _consistent(
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_t"))
        .filter(F.size("_t") >= 2)
        .selectExpr(id_col, f"{bi} AS _bis")
        .select(F.col(id_col), F.explode("_bis").alias("bg"))
        .filter(F.col("bg").isNotNull())
    )
    bcnt = pairs.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    toks = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("t")
    )
    ucnt = toks.groupBy("t").agg(F.count(F.lit(1)).alias("cu"))
    vsize = ucnt.agg(F.count(F.lit(1)).alias("V"))
    prob = (
        bcnt.withColumn("_w1", F.split(F.col("bg"), " ").getItem(0))
        .join(ucnt.select(F.col("t").alias("_w1"), "cu"), "_w1")
        .crossJoin(F.broadcast(vsize))
        .select(
            "bg",
            F.log(
                (F.col("cb") + 1) * F.lit(1.0) / (F.col("cu") + F.col("V"))
            ).alias("lp"),
        )
    )
    return (
        pairs.join(prob, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 4).alias("avg_bigram_logprob"),
        )
    )


def quality_importance_sample(
    df: DataFrame,
    target_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Soft quality filter by importance sampling: accept each document
    with probability proportional to its quality score — p = min(1,
    target_frac · q / mean(q)) — instead of a hard threshold. The hard
    cut discards everything below the bar and keeps boilerplate above
    it; proportional acceptance (the FineWeb/DSIR-style soft screen)
    keeps a quality-tilted sample whose EXPECTED size is ~target_frac
    of the corpus while every stratum stays represented.

    Determinism: u is content-addressed (md5 of the doc id, ':qis'
    salt) so the same doc makes the same cut on any engine, partition
    layout, or rerun; mean(q) is computed over exact fixed-point
    integers (quality scores are floor-scaled 4-decimal values, so the
    scaled sum is exact and the mean is the identical double on both
    engines — no summation-order ulp in the acceptance threshold).

    Scale shape: one |corpus|-scan quality pass, a 1-row broadcast
    mean, and a scan-local filter — no shuffle of documents.
    """
    q = quality_score(df, id_col, text_col).select(id_col, "quality_score")
    mean_row = q.agg(
        (
            F.sum(F.round(F.col("quality_score") * 1e4).cast("bigint"))
            / F.count(F.lit(1))
            / F.lit(1e4)
        ).alias("_mean_q")
    )
    u = (
        F.expr(
            f"cast(conv(substr(md5(concat(cast({id_col} AS string), ':qis')),"
            " 1, 8), 16, 10) AS bigint)"
        )
        / F.lit(4294967296.0)
    )
    p = F.least(
        F.lit(1.0),
        F.lit(target_frac) * F.col("quality_score") / F.col("_mean_q"),
    )
    return (
        q.crossJoin(F.broadcast(mean_row))
        .select(
            id_col,
            "quality_score",
            p.alias("_p"),
            u.alias("_u"),
        )
        .filter(F.col("_u") < F.col("_p"))
        .select(
            id_col,
            "quality_score",
            (F.floor(F.col("_p") * 1e4) / 1e4).alias("p_accept"),
        )
    )

"""Deduplication operators (SURVEY.md §7 phase 4): exact, n-gram
Jaccard, MinHash+LSH, SimHash.

Scale design:

- **Exact** dedup groups by an md5 fingerprint, not the raw text — the
  shuffle moves 16-byte keys instead of documents.
- **MinHash+LSH**: signatures are a pure projection (no shuffle); the
  only shuffle is the band-bucket self-join, whose fan-out is bounded by
  bucket sizes. This is the standard shingle→minhash→band→bucket-join
  pipeline; at 100 TB you'd additionally drop mega-buckets (stop-shingle
  analogue) before the self-join.
- **SimHash** is a single aggregation pass per document (32 conditional
  sums over exploded tokens in one hash-aggregate).

All hashes are md5-derived (``conv(substr(md5(x),1,8),16,10)``) so an
ANSI-SQL oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# MinHash parameters. P is a prime > 2^32; multipliers stay < 2^18 so
# a*h < 2^50 never overflows int64.
MINHASH_P = 4_294_967_311
MINHASH_A = (3, 7, 13, 31, 61, 127, 251, 509, 1021, 2039, 4093, 8191, 16381, 32749, 65521, 131071)
MINHASH_B = (17, 29, 43, 71, 101, 151, 223, 337, 499, 743, 1109, 1657, 2477, 3709, 5563, 8341)
N_BANDS = 4
ROWS_PER_BAND = 4

HASH32 = "cast(conv(substr(md5({x}), 1, 8), 16, 10) AS bigint)"
# 60-bit variant for join/groupBy keys where 32-bit birthday collisions
# would perturb exact counts (15 hex digits < 2^61).
HASH60 = "cast(conv(substr(md5({x}), 1, 15), 16, 10) AS bigint)"


def shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, repartition: bool = True
) -> DataFrame:
    """Distinct word n-gram shingles per document (pure projection).

    Tokenization is materialized ONCE as a column before the per-index
    lambda — inlining ``split`` inside ``transform`` re-tokenizes for
    every shingle position (O(tokens²) per document). ``repartition``
    spreads the CPU-heavy projection across cores when the source is a
    few large files (a single parquet row-group otherwise pins the whole
    corpus to one task); at real scale input file count already provides
    parallelism, and the extra round-robin shuffle of raw text can be
    disabled.
    """
    if repartition:
        sc = df.sparkSession.sparkContext
        df = df.repartition(sc.defaultParallelism)
    toks = df.withColumn("_toks", F.split(F.col(text_col), " "))
    expr = (
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> concat_ws(' ', slice(_toks, i, {n})))) "
        f"ELSE array({text_col}) END"
    )
    return toks.withColumn("shingles", F.expr(expr)).drop("_toks")


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: one representative (min id) per
    distinct text. Groups by md5(text), not text itself."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, sig array of 16 minhashes) — single projection, no shuffle."""
    sh = shingles(df, text_col, n)
    hashed = sh.withColumn(
        "hh", F.expr(f"transform(shingles, s -> {HASH32.format(x='s')})")
    )
    sig_items = ", ".join(
        f"array_min(transform(hh, h -> ({a} * h + {b}) % {MINHASH_P}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    return hashed.select(F.col(id_col), F.expr(f"array({sig_items})").alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: docs sharing any
    band of their MinHash signature. Output: (doc_a, doc_b), doc_a<doc_b.

    Physical shape: project signatures → explode to (band_id, band_key)
    → self-equi-join on the band key (shuffle bounded by bucket sizes,
    AQE handles skewed buckets) → distinct pairs.
    """
    sigs = minhash_signatures(df, id_col, text_col, n)
    bands = ", ".join(
        f"named_struct('band_id', {j}, 'band_key', "
        f"concat_ws('-', slice(sig, {j * ROWS_PER_BAND + 1}, {ROWS_PER_BAND})))"
        for j in range(N_BANDS)
    )
    exploded = sigs.select(
        F.col(id_col), F.explode(F.expr(f"array({bands})")).alias("b")
    ).select(id_col, "b.band_id", "b.band_key")
    # Bucket members are gathered with ONE groupBy and pairs expanded
    # in-expression — no self-join, so the signature pipeline is computed
    # exactly once and nothing needs caching. Bucket size bounds the
    # expansion (at 100 TB: cap/drop mega-buckets before expanding —
    # they're stop-shingle noise). Numbered repartition keeps AQE from
    # serializing the expansion (see ngram_jaccard_pairs).
    exploded = exploded.repartition(
        exploded.sparkSession.sparkContext.defaultParallelism,
        "band_id", "band_key",
    )
    buckets = exploded.groupBy("band_id", "band_key").agg(
        F.array_sort(F.collect_list(id_col)).alias("ids")
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> named_struct('doc_a', x, 'doc_b', y))))"
    )
    return (
        buckets.filter(F.size("ids") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    Shuffle is on the shingle key; frequency-bounded because shingles
    are distinct-per-doc. At 100 TB you'd first drop shingles whose
    document frequency exceeds a cap (they generate quadratic pairs but
    carry no signal).
    """
    sh = shingles(df, text_col, n).select(
        F.col(id_col), F.col("shingles"), F.size("shingles").alias("n_sh")
    )
    # Shuffle 8-byte shingle hashes, not shingle strings (HASH60: the
    # 2^61 space keeps exact counts collision-safe at realistic corpus
    # sizes; the oracle applies the identical hash).
    ex = sh.select(
        id_col,
        "n_sh",
        F.expr(f"transform(shingles, s -> {HASH60.format(x='s')})").alias("hh"),
    ).select(id_col, "n_sh", F.explode("hh").alias("s"))
    # Same no-self-join shape as minhash_lsh_pairs: gather each shingle's
    # posting list with one groupBy, expand (doc_a, doc_b) pairs
    # in-expression, then count shared shingles per pair. Two shuffles
    # total; the expansion is bounded by per-shingle document frequency
    # (at 100 TB, cap the posting-list length first).
    # Explicit numbered repartition on the key: the pair expansion
    # MULTIPLIES data ~10x after this shuffle, and AQE — which sizes
    # partitions by shuffle INPUT bytes — would coalesce the small input
    # to one task and serialize the expansion. REPARTITION_BY_NUM is
    # exempt from AQE coalescing; the following groupBy reuses the
    # partitioning (no extra shuffle).
    ex = ex.repartition(ex.sparkSession.sparkContext.defaultParallelism, "s")
    postings = ex.groupBy("s").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("n_sh")))
        ).alias("ids")
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> named_struct('doc_a', x.id, 'doc_b', y.id, "
        "'na', x.n_sh, 'nb', y.n_sh))))"
    )
    inter = (
        postings.filter(F.size("ids") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy("p.doc_a", "p.doc_b", "p.na", "p.nb")
        .agg(F.count(F.lit(1)).alias("inter"))
        .select(
            F.col("doc_a"), F.col("doc_b"),
            F.col("na"), F.col("nb"), F.col("inter"),
        )
    )
    return (
        inter.withColumn(
            "jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32) -> DataFrame:
    """Per-document SimHash over token hashes: one explode + one
    hash-aggregate with ``bits`` conditional sums (single shuffle on id).
    """
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn("h", F.expr(HASH32.format(x="tok")))
    bit_sums = [
        F.sum(
            F.when(F.expr(f"(h div {1 << b}) % 2") == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    sim = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN cast({1 << b} AS bigint) ELSE 0 END)"
        for b in range(bits)
    )
    return agg.select(F.col(id_col), F.expr(sim).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ ``max_hamming``.

    Banded LSH on the signature: the ``bits`` are split into
    ``max_hamming + 1`` contiguous bands, so by pigeonhole any pair
    within the distance budget agrees EXACTLY on at least one band —
    banding is a lossless candidate filter, and the result equals the
    brute-force O(n²) answer. Candidates are gathered with one groupBy
    per band key (no self-join — the signature aggregation runs once)
    and verified with an exact popcount on the XOR. At 100 TB, bucket
    size bounds the pair expansion; cap mega-buckets (constant-ish
    documents) before expanding.
    """
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    sig = simhash(df, id_col, text_col, bits)
    bands = ", ".join(
        f"named_struct('band_id', {b}, "
        f"'band_key', (simhash div {1 << (b * band_bits)}) % {1 << band_bits})"
        for b in range(n_bands)
    )
    exploded = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.expr(f"array({bands})")).alias("b"),
    ).select(id_col, "simhash", "b.band_id", "b.band_key")
    exploded = exploded.repartition(
        exploded.sparkSession.sparkContext.defaultParallelism, "band_id", "band_key"
    )
    buckets = exploded.groupBy("band_id", "band_key").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("sh")))
        ).alias("ids")
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> named_struct('doc_a', x.id, 'doc_b', y.id, "
        "'hamming', cast(bit_count(x.sh ^ y.sh) AS int)))))"
    )
    return (
        buckets.filter(F.size("ids") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )

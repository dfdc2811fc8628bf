"""Deduplication operators (SURVEY.md §7 phase 4): exact, n-gram
Jaccard, MinHash+LSH, SimHash.

Scale design:

- **Exact** dedup groups by an md5 fingerprint, not the raw text — the
  shuffle moves 16-byte keys instead of documents.
- **MinHash+LSH**: signatures cost one ~1-row-per-doc shuffle (map-side
  partial agg over co-located exploded shingles); the only data-sized
  shuffle is the band-bucket join, whose fan-out is bounded by bucket
  sizes. This is the standard shingle→minhash→band→bucket-join
  pipeline; at 100 TB you'd additionally drop mega-buckets (stop-shingle
  analogue) before the self-join.
- **SimHash** is a single aggregation pass per document (32 conditional
  sums over exploded tokens in one hash-aggregate).
- **Exact-dedup-first (round 9)**: every UNCAPPED pair generator whose
  verdict is a pure function of the two texts (Jaccard, containment,
  prefix-filter AllPairs, MinHash banding) routes through
  :func:`_exact_group_pairs` — candidates are generated over DISTINCT
  texts and expanded output-sized, so copy-heavy corpora (the common
  crawl reality) cost distinct-text work, not corpus² work. The capped
  variants keep their oracle-pinned all-docs df/bucket semantics.
  Quotient-graph analytics (:func:`dup_clusters_text_quotient`,
  graph.blowup_triangle_participation) extend the same factorization
  to the downstream graph stage.

All hashes are md5-derived (``conv(substr(md5(x),1,8),16,10)``) so an
ANSI-SQL oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from airflow_loan_etl_pipeline_spark.operators.cache_scope import (
    pin,
    materialize_consistent as _consistent,
)
from airflow_loan_etl_pipeline_spark.session import (
    engine_parallelism as _parallelism,
)

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

# Default scale caps for the capped pair generators. A shingle appearing
# in df documents generates O(df²) join rows; one stopword-like trigram
# with df=10⁶ is 10¹² rows. The caps drop those keys BEFORE the pair
# expansion — they carry no near-dup signal (a shingle shared by
# thousands of documents identifies nothing). Shared with the oracle SQL
# (registry_text.py) so both engines apply the identical cutoff.
NGRAM_MAX_DF = 4
LSH_MAX_BUCKET = 2
SIMHASH_MAX_BUCKET = 8

# Distinct-text ratio above which the exact-dedup-first harness routes
# an uncapped pair generator straight to its direct formulation (see
# _exact_group_pairs): at >99% distinct texts the quotient is the
# corpus, so the factorization's constant overhead (~3 extra jobs)
# buys nothing. Group-size cap for the group² within-group emission
# when a caller opts into the mega-group valve.
DEDUP_FIRST_BYPASS_RATIO = 0.99
PAIR_MAX_GROUP = 8

# Auto-valve policy: within-group pair mass the mega-group valve admits,
# expressed per corpus document so the budget scales with the input
# (Σ kept-group C(g,2) ≤ PAIR_MASS_PER_DOC · N keeps the quadratic
# identical-pair term LINEAR in corpus size at any scale).
PAIR_MASS_PER_DOC = 1.0


def auto_max_group(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs_per_doc: float = PAIR_MASS_PER_DOC,
) -> int:
    """Derive the mega-group valve cap from the corpus itself
    (VERDICT r10 item 6 — the valve as a POLICY, not a magic number).

    Policy: over the exact-text group-size histogram (the same frame
    :func:`dup_degree_histogram` reports as the sizing preflight),
    ascending by group size, admit sizes while the cumulative
    within-group pair mass Σ ng·C(g,2) stays within
    ``pairs_per_doc × N``; the cap is the largest admitted size, floor
    1 (singletons carry zero pair mass, so they are always kept). The
    budget is proportional to corpus size, so the group² emission the
    valve prices stays a LINEAR term at 100 TB exactly as it does at
    sf0.01.

    Cost: one partial-aggregated pass over 16-byte md5 fingerprints
    plus a histogram collect bounded by the number of DISTINCT group
    sizes (≤ the largest multiplicity, in practice tens of rows).
    Mirrored verbatim in the ``*_group_auto`` oracle SQL so both
    engines derive the identical cap."""
    fp = F.coalesce(F.md5(F.col(text_col)), F.lit("_null_"))
    hist = (
        df.select(fp.alias("_fp"))
        .groupBy("_fp")
        .agg(F.count(F.lit(1)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("ng"))
        .collect()
    )
    n_docs = sum(int(r["g"]) * int(r["ng"]) for r in hist)
    budget = pairs_per_doc * n_docs
    cap, cum = 1, 0
    for g, ng in sorted((int(r["g"]), int(r["ng"])) for r in hist):
        cum += ng * (g * (g - 1) // 2)
        if cum > budget:
            break
        cap = g
    return cap


def _spread_for_python(df: DataFrame) -> DataFrame:
    """Round-robin repartition BEFORE a CPU-heavy Arrow/Python stage —
    but only when the input actually under-fills the engine (r12,
    guide §2.4: remove shuffles outright). The fixtures are single
    small parquet files whose one scan split would pin the whole
    Python shingle pass to one task, so locally the repartition always
    fires (bench numbers comparable round-over-round); at real scale
    the scan's split count already exceeds the engine parallelism and
    the unconditional form was a full shuffle of RAW TEXT bought for
    nothing. ``df.rdd.getNumPartitions()`` is plan analysis only — no
    job runs."""
    par = _parallelism(df.sparkSession)
    try:
        if df.rdd.getNumPartitions() >= par:
            return df
    except Exception:  # Connect/vendor runtimes without RDD access
        pass
    return df.repartition(par)


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
        df = _spread_for_python(df)

    # Arrow-batched Pandas UDF, NOT a Catalyst higher-order function:
    # `transform(sequence(...), i -> concat_ws(...))` runs as an
    # interpreted lambda per shingle position (no whole-stage codegen
    # for HOF bodies) and measured ~0.5 ms/shingle; the vectorized
    # Python loop is ~3.5x faster on the same corpus. Semantics match
    # the SQL oracle exactly: whitespace split, first-occurrence
    # distinct, whole text as the lone shingle for short docs.
    #
    # NOTE: reference the `shingles` column ONCE downstream.
    # CollapseProject inlines a deterministic UDF into every reference
    # (size(shingles) + explode(shingles) = two Python evaluations of
    # the same doc); consumers needing flat (n_sh, shingle) rows should
    # use shingle_rows() below, which emits them in a single pass.
    @pandas_udf("array<string>")
    def _shingle(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            # NULL text (PERMISSIVE ingest can produce it) is treated as
            # an empty document, not a crash inside the Arrow batch.
            t = t if isinstance(t, str) else ""
            toks = t.split(" ")
            if len(toks) >= n:
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        )
                    )
                )
            else:
                out.append([t])
        return pd.Series(out)

    return df.withColumn("shingles", _shingle(F.col(text_col)))


def shingle_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    repartition: bool = True,
) -> DataFrame:
    """Flat (id, n_sh, shingle) rows — one ``mapInPandas`` pass.

    The array-returning :func:`shingles` needs TWO references downstream
    (``size`` for the shingle count + ``explode`` for the rows), and
    CollapseProject duplicates the Python evaluation per reference.
    Emitting already-exploded rows with the per-doc count attached keeps
    the UDF subtree single-evaluation AND canonically deterministic, so
    a self-join over it can reuse one shuffle exchange for both sides.
    """
    if repartition:
        df = _spread_for_python(df)

    def op(batches):
        for pdf in batches:
            ids, counts, shs = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                # NULL-safe: treat missing text as an empty document
                # (matches the oracle's ELSE [text] arm only for non-null
                # fixtures; the contract for NULL is "one empty shingle",
                # never an executor crash).
                t = t if isinstance(t, str) else ""
                toks = t.split(" ")
                if len(toks) >= n:
                    sh = list(
                        dict.fromkeys(
                            " ".join(toks[j : j + n])
                            for j in range(len(toks) - n + 1)
                        )
                    )
                else:
                    sh = [t]
                ids.extend([i] * len(sh))
                counts.extend([len(sh)] * len(sh))
                shs.extend(sh)
            yield pd.DataFrame({id_col: ids, "n_sh": counts, "s_str": shs})

    return df.select(id_col, text_col).mapInPandas(
        op, schema=f"{id_col} long, n_sh int, s_str string"
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: one representative (min id) per
    distinct text. Groups by md5(text), not text itself."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    repartition: bool = True,
) -> DataFrame:
    """(id, sig array of 16 minhashes).

    Physical shape: explode shingles → flat md5 hash (codegen) →
    ``groupBy(id).agg(16 × min)`` — every expression whole-stage
    codegen'd, unlike the in-array ``array_min(transform(...))``
    formulation whose 16 lambdas run interpreted per shingle (~3x
    slower measured). The groupBy shuffle is ~1 row/doc: each doc's
    shingles are co-located (exploded from one row), so map-side
    partial aggregation collapses them before the exchange."""
    sh = shingle_rows(df, id_col, text_col, n, repartition=repartition)
    hashed = sh.select(id_col, F.expr(HASH32.format(x="s_str")).alias("h"))
    mins = [
        F.min(((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P))).alias(f"m{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    per_doc = hashed.groupBy(id_col).agg(*mins)
    return per_doc.select(
        F.col(id_col),
        F.array(*[F.col(f"m{i}") for i in range(len(MINHASH_A))]).alias("sig"),
    )


def band_key_rows(
    sigs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, band_id, band_key) rows from a signature frame — THE
    banding definition: minhash_lsh_pairs builds its pair join from
    these rows and streaming admission screens its state with them, so
    the two tiers cannot drift."""
    bands = ", ".join(
        f"named_struct('band_id', {j}, 'band_key', "
        f"concat_ws('-', slice(sig, {j * ROWS_PER_BAND + 1}, {ROWS_PER_BAND})))"
        for j in range(N_BANDS)
    )
    return sigs.select(
        F.col(id_col), F.explode(F.expr(f"array({bands})")).alias("b")
    ).select(id_col, "b.band_id", "b.band_key")


def exact_text_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Exact-text group structure: ``(members, reps, rep_docs)``.

    ``members`` is (``_fp`` = md5(text) with NULL text mapped to a
    non-hex sentinel, id) — checkpoint-materialized, it anchors every
    dedup-first consumer (:func:`_exact_group_pairs`, the blown-up
    graph analytics). ``reps`` picks min(id) per group; ``rep_docs``
    is the input restricted to one representative document per
    distinct text."""
    fp = F.coalesce(F.md5(F.col(text_col)), F.lit("_null_"))
    members = _consistent(df.select(fp.alias("_fp"), F.col(id_col)))
    reps = members.groupBy("_fp").agg(F.min(id_col).alias("_rid"))
    rep_docs = df.join(
        reps.select(F.col("_rid").alias(id_col)), id_col, "left_semi"
    )
    return members, reps, rep_docs


def _exact_group_pairs(
    df: DataFrame,
    pair_fn,
    id_col: str,
    text_col: str,
    same_cols: dict | None,
    max_group: int | None = None,
    bypass: bool | str = "auto",
) -> DataFrame:
    """Exact-dedup-first harness for LOSSLESS pair generators (round 9).

    Any pair generator whose verdict on (doc_a, doc_b) is a pure
    function of the two TEXTS — n-gram Jaccard/containment, prefix-
    filter AllPairs, MinHash-LSH banding — factors through exact text
    groups: group docs by md5(text), run ``pair_fn`` over one
    representative per distinct text, then (a) emit every within-group
    pair with the identical-text score (``same_cols``; None = emit
    none), and (b) expand each representative pair to all member doc
    pairs carrying the representative score. Production pipelines run
    exact dedup before near-dedup for exactly this reason: on a
    copy-heavy corpus the candidate problem shrinks to DISTINCT texts,
    and every doc-level row produced downstream is an output row. The
    100x copy-multiplied sweep is the extreme case — the uncapped
    generators went from disk-guard aborts (Σ df² with every df
    multiplied 100x) to completing, with byte-identical results at
    every differential scale.

    ``pair_fn`` must return (doc_a, doc_b, *score_cols) with
    ``doc_a < doc_b``; member expansion re-canonicalizes with
    least/greatest (groups are disjoint, so each unordered doc pair
    appears exactly once).

    Adaptive bypass (round 10): the factorization pays a constant
    multi-job overhead (group build + checkpoint + two expansion joins
    + the same-pair union) that buys nothing on a corpus with ~no
    exact duplicates. A one-aggregate probe — count vs count-distinct
    of the text fingerprint, one partial-aggregated pass over 16-byte
    md5s, the same cost class as the exact dedup the harness starts
    with — routes the call straight to ``pair_fn(df)`` when more than
    :data:`DEDUP_FIRST_BYPASS_RATIO` of texts are distinct. Either
    route is exact: ``pair_fn`` is lossless by contract, so direct ==
    harness == brute force (hypothesis-pinned); the probe only picks
    the cheaper physical plan. On the copy-heavy corpora where the
    harness matters (the 100x copy-multiplied sweep: ratio 1/copies)
    the probe keeps the harness.

    ``max_group`` is the mega-group valve (round 10): the within-group
    emission below is group² — correct, but a 10⁶-copy boilerplate
    group at real corpus scale is 5·10¹¹ output pairs that identify
    nothing beyond "this text is boilerplate". With the valve set,
    every doc whose exact-text group exceeds ``max_group`` members is
    dropped BEFORE representative selection, so mega-groups contribute
    neither within-group pairs nor candidates (mirror the same filter
    in the differential oracle). Size the cap with
    ``dup_degree_histogram`` — its group-size histogram is exactly the
    preflight that shows where the group² mass sits. The valve forces
    the harness (no bypass): its semantics are defined over the group
    structure.

    ``bypass`` makes the route an explicit tri-state (round 11, per
    advice): ``"auto"`` runs the one-aggregate probe above — note the
    probe is EAGER (a Spark job at plan-construction time), which is
    right for the registry entries that always execute the result but
    wrong for explain-only or composed pipelines; those pass ``True``
    (straight to ``pair_fn``, no probe, no harness) or ``False``
    (harness, no probe). All three routes are exact — the parameter
    only picks the physical plan."""
    if bypass is True and max_group is None:
        return pair_fn(df)
    if bypass == "auto" and max_group is None:
        fp = F.coalesce(F.md5(F.col(text_col)), F.lit("_null_"))
        n_docs, n_texts = df.select(
            F.count(F.lit(1)).alias("_n"),
            F.count_distinct(fp).alias("_d"),
        ).first()
        if n_docs == 0 or n_texts >= DEDUP_FIRST_BYPASS_RATIO * n_docs:
            return pair_fn(df)
    members, reps, rep_docs = exact_text_groups(df, id_col, text_col)
    if max_group is not None:
        small = (
            members.groupBy("_fp")
            .agg(F.count(F.lit(1)).alias("_gs"))
            .filter(F.col("_gs") <= max_group)
            .select("_fp")
        )
        members = members.join(small, "_fp", "left_semi")
        reps = members.groupBy("_fp").agg(F.min(id_col).alias("_rid"))
        rep_docs = df.join(
            reps.select(F.col("_rid").alias(id_col)), id_col, "left_semi"
        )
    rep_pairs = pair_fn(rep_docs)
    score_cols = [c for c in rep_pairs.columns if c not in ("doc_a", "doc_b")]
    par = _parallelism(df.sparkSession)
    ra = reps.select(F.col("_rid").alias("doc_a"), F.col("_fp").alias("_fpa"))
    rb = reps.select(F.col("_rid").alias("doc_b"), F.col("_fp").alias("_fpb"))
    # Numbered repartitions pin the expansion joins' parallelism: their
    # shuffle INPUTS are rep-pair-sized (tiny) while the join fan-out is
    # group-size-squared — exactly the stage AQE would coalesce to one
    # partition and serialize (same REPARTITION_BY_NUM pattern as the
    # band/shingle self-joins).
    cross = (
        rep_pairs.join(ra, "doc_a")
        .join(rb, "doc_b")
        .drop("doc_a", "doc_b")
        .repartition(par, "_fpa")
        .join(
            members.select(
                F.col("_fp").alias("_fpa"), F.col(id_col).alias("_da")
            ),
            "_fpa",
        )
        .repartition(par, "_fpb")
        .join(
            members.select(
                F.col("_fp").alias("_fpb"), F.col(id_col).alias("_db")
            ),
            "_fpb",
        )
        # NULL doc ids never survive the direct path (pair_fn's
        # doc_a < doc_b is NULL-rejecting) — drop them here too so the
        # expansion route stays equivalent under PERMISSIVE ingest.
        .filter(F.col("_da").isNotNull() & F.col("_db").isNotNull())
        .select(
            F.least("_da", "_db").alias("doc_a"),
            F.greatest("_da", "_db").alias("doc_b"),
            *score_cols,
        )
    )
    if same_cols is None:
        return cross
    memb = members.repartition(par, "_fp")
    ma = memb.select("_fp", F.col(id_col).alias("doc_a"))
    mb = memb.select("_fp", F.col(id_col).alias("doc_b"))
    same = (
        ma.join(mb, "_fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            *[v.alias(k) for k, v in same_cols.items()],
        )
    )
    return same.unionByName(cross)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_bucket: int | None = None,
    sigs: DataFrame | None = None,
    max_group: int | str | None = None,
    bypass: bool | str = "auto",
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: docs sharing any
    band of their MinHash signature. Output: (doc_a, doc_b), doc_a<doc_b.

    Physical shape: project signatures → explode to (band_id, band_key)
    → self-equi-join on the band key (shuffle bounded by bucket sizes,
    AQE handles skewed buckets) → distinct pairs.

    ``max_bucket`` is the 100 TB safety valve: band buckets holding more
    than this many documents are DROPPED before the self-join (a bucket
    of b docs expands to b² join rows; a mega-bucket of boilerplate or
    near-constant documents expands quadratically while identifying
    nothing). The size count and the semi-filter reuse the same
    repartition exchange as the join itself, so the cap costs one extra
    pre-aggregated pass over band keys, not a new data shuffle.

    Uncapped + no precomputed ``sigs`` (round 9): runs through
    :func:`_exact_group_pairs` — signatures are a pure function of the
    text, so identical texts share every band and the banded join need
    only see one representative per distinct text. Lossless; the
    recursive call pins ``sigs`` to skip re-dispatch. Callers that pass
    their own ``sigs`` (streaming admission) or a cap keep the direct
    banded join.

    ``max_group`` (round 10) is the exact-text MEGA-GROUP valve: docs
    whose text occurs more than this many times are dropped before
    candidate generation (see :func:`_exact_group_pairs`; size it with
    :func:`dup_degree_histogram`). Mutually exclusive with
    ``max_bucket``/``sigs`` — the valve is defined over the group
    structure the direct banded join never builds.
    """
    if max_group is not None and (max_bucket is not None or sigs is not None):
        raise ValueError("max_group requires the dedup-first path "
                         "(no max_bucket / precomputed sigs)")
    if max_group == "auto":
        max_group = auto_max_group(df, id_col, text_col)
    if max_bucket is None and sigs is None:
        return _exact_group_pairs(
            df,
            lambda reps: minhash_lsh_pairs(
                reps,
                id_col,
                text_col,
                n,
                sigs=minhash_signatures(reps, id_col, text_col, n),
            ),
            id_col,
            text_col,
            same_cols={},
            max_group=max_group,
            bypass=bypass,
        )
    if sigs is None:
        sigs = minhash_signatures(df, id_col, text_col, n)
    exploded = band_key_rows(sigs, id_col)
    # Pair generation as a self-equi-join on the band key — codegen'd
    # hash join + distinct, where a collect_list posting expansion runs
    # as an interpreted lambda (and, when AQE coalesces the tiny
    # post-shuffle stage to one partition, runs SERIALLY — measured 3x
    # slower end-to-end). Numbered repartition pins the exchange that
    # both join sides reuse. Bucket size bounds the join fan-out (at
    # 100 TB: cap/drop mega-buckets first — they're stop-shingle noise).
    exploded = exploded.repartition(
        _parallelism(exploded.sparkSession),
        "band_id", "band_key",
    )
    if max_bucket is not None:
        small = (
            exploded.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") <= max_bucket)
            .select("band_id", "band_key")
        )
        exploded = exploded.join(small, ["band_id", "band_key"], "left_semi")
    a = exploded.select("band_id", "band_key", F.col(id_col).alias("doc_a"))
    b = exploded.select("band_id", "band_key", F.col(id_col).alias("doc_b"))
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
    max_group: int | str | None = None,
    bypass: bool | str = "auto",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    Shuffle is on the shingle key; frequency-bounded because shingles
    are distinct-per-doc. ``max_df`` is the 100 TB safety valve: shingles
    whose document frequency exceeds it are dropped before the self-join
    (join fan-out is Σ df² — one stopword-like trigram with df=10⁶ alone
    produces 10¹² rows). Per-doc shingle counts (na/nb) keep counting
    ALL shingles, so the Jaccard denominator is unchanged; only the
    intersection is restricted to informative shingles — the standard
    stop-shingle treatment, which can only LOWER a pair's score.

    Uncapped (round 9): runs exact-dedup-first through
    :func:`_exact_group_pairs` — Jaccard is a pure function of the two
    texts, identical texts score exactly 1.0, so the Σ df² inverted-
    index join sees only DISTINCT texts. Lossless. The capped form
    keeps the direct join: its df counts are defined over ALL docs
    (oracle-pinned), which dedup would change.

    ``max_group`` (round 10): exact-text mega-group valve, see
    :func:`minhash_lsh_pairs`. Dedup-first path only.
    """
    if max_group is not None and max_df is not None:
        raise ValueError("max_group requires the dedup-first path (no max_df)")
    if max_group == "auto":
        max_group = auto_max_group(df, id_col, text_col)
    if max_df is None:
        return _exact_group_pairs(
            df,
            lambda reps: _ngram_jaccard_core(
                reps, id_col, text_col, n, threshold, None
            ),
            id_col,
            text_col,
            same_cols=(
                {"jaccard": F.lit(1.0)} if threshold <= 1.0 else None
            ),
            max_group=max_group,
            bypass=bypass,
        )
    return _ngram_jaccard_core(df, id_col, text_col, n, threshold, max_df)


def _ngram_jaccard_core(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    max_df: int | None,
) -> DataFrame:
    sh = shingle_rows(df, id_col, text_col, n)
    # Hash AFTER the explode, on a flat string column: a hash inside
    # `transform(shingles, ...)` runs as an interpreted lambda per array
    # element, while a flat projection stays in whole-stage codegen
    # (~5x cheaper for the same md5 count). The shuffle then moves
    # 8-byte hashes, not shingle strings (HASH60: the 2^61 space keeps
    # exact counts collision-safe at realistic corpus sizes; the oracle
    # applies the identical hash).
    ex = sh.select(
        F.col(id_col), "n_sh", F.expr(HASH60.format(x="s_str")).alias("s")
    )
    # Numbered repartition on the key: the pair expansion MULTIPLIES
    # data ~5-10x downstream of this shuffle, and AQE — which sizes
    # partitions by shuffle INPUT bytes — would coalesce the small input
    # and serialize the expansion. REPARTITION_BY_NUM is exempt from AQE
    # coalescing, and it satisfies the self-join's required hash
    # distribution, so the join adds no exchange of its own.
    ex = ex.repartition(_parallelism(ex.sparkSession), "s")
    if max_df is not None:
        # df-count + semi-filter ride the repartition exchange above
        # (both group/join on s) — one pre-aggregated pass, no new data
        # shuffle, and the quadratic expansion below never sees hot keys.
        keep = (
            ex.groupBy("s")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("s")
        )
        ex = ex.join(keep, "s", "left_semi")
    # Pair generation as a self-equi-join on the shingle hash. The
    # entire subtree below the exchange runs ONCE (ReusedExchange on the
    # other side), and the join + pair-count aggregate are codegen'd —
    # measured ~3x faster than gathering posting lists with collect_list
    # and expanding pairs with interpreted transform/slice lambdas. The
    # join fan-out is Σ df² over shingle document frequencies; at 100 TB,
    # cap/drop high-df shingles first (they generate quadratic pairs but
    # carry no signal).
    a = ex.select("s", F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    b = ex.select("s", F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    inter = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    bypass: bool | str = "auto",
) -> DataFrame:
    """Asymmetric near-dup detection: n-gram CONTAINMENT of the smaller
    shingle set in the larger — ``inter / least(na, nb)``.

    Jaccard misses quote-inclusion: a 50-token doc pasted verbatim into
    a 5000-token doc has containment 1.0 but Jaccard ~0.01, so a
    Jaccard-thresholded dedup keeps both and the short doc's content is
    double-weighted in training. Containment (Broder's resemblance
    companion measure) is the standard fix for subset/superset dups —
    boilerplate headers, quoted replies, concatenated shards.

    Same physical shape as :func:`ngram_jaccard_pairs` (one shuffle on
    the 8-byte shingle hash, codegen self-equi-join, pair-count
    aggregate); only the final scoring expression differs, so the
    ``max_df`` hot-shingle cap and the AQE-exempt numbered repartition
    carry over unchanged. Containment is MORE sensitive to hot shingles
    than Jaccard (a small doc of pure boilerplate is "contained" in
    everything), so at 100 TB run this capped.

    Uncapped (round 9): exact-dedup-first via
    :func:`_exact_group_pairs`, same rationale as
    :func:`ngram_jaccard_pairs` (identical texts have containment
    exactly 1.0). Lossless; capped form unchanged.
    """
    if max_df is None:
        return _exact_group_pairs(
            df,
            lambda reps: _ngram_containment_core(
                reps, id_col, text_col, n, threshold
            ),
            id_col,
            text_col,
            same_cols=(
                {"containment": F.lit(1.0)} if threshold <= 1.0 else None
            ),
            bypass=bypass,
        )
    return _ngram_containment_core(df, id_col, text_col, n, threshold, max_df)


def _ngram_containment_core(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    max_df: int | None = None,
) -> DataFrame:
    sh = shingle_rows(df, id_col, text_col, n)
    ex = sh.select(
        F.col(id_col), "n_sh", F.expr(HASH60.format(x="s_str")).alias("s")
    )
    ex = ex.repartition(_parallelism(ex.sparkSession), "s")
    if max_df is not None:
        keep = (
            ex.groupBy("s")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("s")
        )
        ex = ex.join(keep, "s", "left_semi")
    a = ex.select("s", F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    b = ex.select("s", F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    inter = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "containment",
            F.round(F.col("inter") / F.least(F.col("na"), F.col("nb")), 4),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
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
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ ``max_hamming``.

    Banded LSH on the signature: the ``bits`` are split into
    ``max_hamming + 1`` contiguous bands, so by pigeonhole any pair
    within the distance budget agrees EXACTLY on at least one band —
    banding is a lossless candidate filter, and the result equals the
    brute-force O(n²) answer. Candidates are gathered with one groupBy
    per band key (no self-join — the signature aggregation runs once)
    and verified with an exact popcount on the XOR.

    ``max_bucket`` is the 100 TB safety valve: band buckets larger than
    it are dropped before the pair self-join (the b² blow-up of a
    mega-bucket of near-constant documents). With a cap the result is
    no longer the exact brute force: a pair is reported iff SOME band
    both docs share is small enough — the deliberate trade the cap
    buys.
    """
    sig = simhash(df, id_col, text_col, bits)
    return hamming_pairs(
        sig, id_col, "simhash", bits=bits, max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


def hamming_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    bits: int = 32,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Hamming-distance pairs (≤ ``max_hamming``) over ANY precomputed
    ``bits``-wide signature column (SimHash, perceptual/block hashes of
    binary assets, ...).

    Two physical strategies, same logical result contract:

    - **Uncapped (max_bucket=None): lossless, equal to the brute-force
      O(n²) popcount scan** — round-9 rewrite. Identical signatures are
      grouped FIRST, so same-signature doc pairs (hamming 0) come from
      an output-sized group expansion and the candidate problem shrinks
      to DISTINCT signature values. Cross-signature candidates use the
      Manku/Jain/Sarma (WWW'07 §3) multi-table scheme: the ``bits`` are
      split into ``max_hamming + 3`` blocks and each signature is keyed
      by every 3-block combination (C(m,3) tables, ~3·bits/m-bit keys).
      Pigeonhole: ≤ ``max_hamming`` differing bits corrupt at most
      ``max_hamming`` blocks, leaving ≥ 3 intact — some combo key
      matches exactly. The previous 4-contiguous-band formulation had a
      2^(bits/4)-sized key space (256 keys for 32-bit signatures), so
      candidate fan-out grew as n²/256 regardless of similarity — at
      the 100x sweep it timed out; this shape finishes because work is
      bounded by (distinct signatures)²/key-space + true-output size.
    - **Capped (max_bucket=N): the documented 4-contiguous-band
      semantics** — a pair is reported iff SOME shared band's bucket
      (counted in docs) is within the cap. This is oracle-pinned
      (registry_text.simhash_pairs_capped) and unchanged.
    """
    if max_bucket is None:
        return _hamming_pairs_lossless(sig, id_col, hash_col, bits, max_hamming)
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    bands = ", ".join(
        f"named_struct('band_id', {b}, "
        f"'band_key', ({hash_col} div {1 << (b * band_bits)}) % {1 << band_bits})"
        for b in range(n_bands)
    )
    exploded = sig.select(
        F.col(id_col),
        F.col(hash_col).alias("simhash"),
        F.explode(F.expr(f"array({bands})")).alias("b"),
    ).select(id_col, "simhash", "b.band_id", "b.band_key")
    exploded = exploded.repartition(
        _parallelism(exploded.sparkSession), "band_id", "band_key"
    )
    if max_bucket is not None:
        small = (
            exploded.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") <= max_bucket)
            .select("band_id", "band_key")
        )
        exploded = exploded.join(small, ["band_id", "band_key"], "left_semi")
    a = exploded.select(
        "band_id",
        "band_key",
        F.col(id_col).alias("doc_a"),
        F.col("simhash").alias("_ha"),
    )
    b = exploded.select(
        "band_id",
        "band_key",
        F.col(id_col).alias("doc_b"),
        F.col("simhash").alias("_hb"),
    )
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("cast(bit_count(_ha ^ _hb) AS int)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _hamming_pairs_lossless(
    sig: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int,
    max_hamming: int,
) -> DataFrame:
    """Exact (brute-force-equal) hamming pairs: signature-dedup +
    3-of-m combo tables. See :func:`hamming_pairs` for the argument.

    Work bound: the combo self-join runs over DISTINCT signatures (for
    a ``bits``-wide hash that is ≤ 2^bits rows no matter how large the
    corpus), and every doc-level row produced is an output row — the
    corpus-sized frames are touched only by one hash-agg (dedup) and
    two output-sized expansion joins."""
    from itertools import combinations

    members = _consistent(
        sig.select(F.col(id_col), F.col(hash_col).alias("_h"))
    )
    par = _parallelism(sig.sparkSession)
    # Same-signature pairs: hamming 0, output-sized group expansion.
    # Numbered repartition pins the fan-out stages' parallelism against
    # AQE input-byte coalescing (see _exact_group_pairs).
    memb = members.repartition(par, "_h")
    ma = memb.select("_h", F.col(id_col).alias("doc_a"))
    mb = memb.select("_h", F.col(id_col).alias("doc_b"))
    same = (
        ma.join(mb, "_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).alias("hamming"))
    )
    if max_hamming == 0:
        return same
    # Cross-signature candidates over distinct signatures only.
    sigd = members.select("_h").distinct()
    m = max_hamming + 3
    sizes = [bits // m + (1 if i < bits % m else 0) for i in range(m)]
    shifts = [sum(sizes[:i]) for i in range(m)]
    # Bit-field extraction with shiftright + AND mask — bit-exact for
    # SIGNED signatures too (ADVICE r9: `div`/`%` truncate toward zero
    # and return negatives for a bigint with the sign bit set, so two
    # signatures agreeing on a block's bits could land in different
    # buckets and a within-budget pair would be missed; arithmetic
    # shift's sign-extension is cut off by the mask).
    block = [
        f"(shiftright(_h, {shifts[i]}) & {(1 << sizes[i]) - 1})"
        for i in range(m)
    ]
    tables = ", ".join(
        "named_struct('t', {t}, 'k', "
        "(({bi} * {sj} + {bj}) * {sk} + {bk}))".format(
            t=t,
            bi=block[i],
            bj=block[j],
            bk=block[k],
            sj=1 << sizes[j],
            sk=1 << sizes[k],
        )
        for t, (i, j, k) in enumerate(combinations(range(m), 3))
    )
    keyed = sigd.select(
        F.col("_h"), F.explode(F.expr(f"array({tables})")).alias("b")
    ).select("_h", "b.t", "b.k")
    keyed = keyed.repartition(_parallelism(keyed.sparkSession), "t", "k")
    ka = keyed.select("t", "k", F.col("_h").alias("_ha"))
    kb = keyed.select("t", "k", F.col("_h").alias("_hb"))
    hpairs = (
        ka.join(kb, ["t", "k"])
        .filter(F.col("_ha") < F.col("_hb"))
        .select(
            "_ha",
            "_hb",
            F.expr("cast(bit_count(_ha ^ _hb) AS int)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    # Expand distinct-signature pairs back to doc pairs (output-sized).
    pa = members.select(F.col("_h").alias("_ha"), F.col(id_col).alias("_da"))
    pb = members.select(F.col("_h").alias("_hb"), F.col(id_col).alias("_db"))
    cross = (
        hpairs.repartition(par, "_ha")
        .join(pa, "_ha")
        .repartition(par, "_hb")
        .join(pb, "_hb")
        .select(
            F.least("_da", "_db").alias("doc_a"),
            F.greatest("_da", "_db").alias("doc_b"),
            "hamming",
        )
    )
    return same.unionByName(cross)


def text_group_graph(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """The exact-text QUOTIENT of the MinHash-LSH doc graph:
    ``(members, group_edges)`` where ``members`` is (``_fp``, id) and
    ``group_edges`` is the distinct (ga, gb) fingerprint pairs whose
    representative texts share an LSH band. The doc-level graph is the
    blow-up of this one (see :func:`dup_clusters_text_quotient`), so
    graph analytics (components, triangles, PageRank) run on it and
    expand output-sized."""
    members, reps, rep_docs = exact_text_groups(docs, id_col, text_col)
    rep_pairs = minhash_lsh_pairs(
        rep_docs,
        id_col,
        text_col,
        n,
        sigs=minhash_signatures(rep_docs, id_col, text_col, n),
    )
    rep_edges = (
        rep_pairs.join(
            reps.select(F.col("_rid").alias("doc_a"), F.col("_fp").alias("ga")),
            "doc_a",
        )
        .join(
            reps.select(F.col("_rid").alias("doc_b"), F.col("_fp").alias("gb")),
            "doc_b",
        )
        .select("ga", "gb")
    )
    return members, rep_edges


def dup_clusters_text_quotient(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_iter: int = 25,
) -> DataFrame:
    """Transitive MinHash-LSH near-dup clusters computed on the
    exact-text QUOTIENT graph — same (doc_id, cluster_id) contract as
    ``dup_clusters(docs, minhash_lsh_pairs(docs))``.

    Why it is exact: the doc-level LSH graph is the blow-up of the
    distinct-text graph (identical texts share every band, and a
    cross-text edge holds for all members or none), so connected
    components expand group-wise, and because each group's
    representative IS its minimum doc id, the min-id label of a rep
    component equals the min-id label of the expanded component.
    Pointer jumping therefore runs on |distinct texts| nodes instead of
    |corpus| — on a copy-heavy corpus the iterative stage (the scale
    bottleneck: O(log diameter) rounds of corpus-sized joins) shrinks
    by the duplication factor, and the corpus-sized work left is one
    md5 group pass plus one output-sized expansion join."""
    members, reps, rep_docs = exact_text_groups(docs, id_col, text_col)
    rep_pairs = minhash_lsh_pairs(
        rep_docs,
        id_col,
        text_col,
        n,
        sigs=minhash_signatures(rep_docs, id_col, text_col, n),
    )
    rep_cl = dup_clusters(rep_docs, rep_pairs, id_col, max_iter=max_iter)
    return (
        members.join(reps, "_fp")
        .join(
            rep_cl.select(F.col(id_col).alias("_rid"), F.col("cluster_id")),
            "_rid",
        )
        .select(F.col(id_col), "cluster_id")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for every training document, how many
    of its distinct word ``n``-grams also appear in a held-out benchmark
    corpus. Training sets ship only after documents overlapping the eval
    suites are flagged/dropped — the standard n-gram-overlap
    decontamination (GPT-3 appendix C / PaLM style, done here at n=3 to
    suit the tiny fixture docs; production uses n=8–13).

    Output: (doc_id, n_sh, n_overlap, overlap_frac) for CONTAMINATED
    training docs only (n_overlap > 0).

    Scale shape: benchmark suites are tiny next to a 100 TB corpus, so
    the distinct benchmark-shingle set is **broadcast** — the training
    corpus is never shuffled; the whole check is one scan-local
    hash-join probe per training shingle plus a ~1-row/doc
    map-side-combinable count aggregate keyed on doc_id.
    """
    tr = shingle_rows(train, id_col, text_col, n)
    tr = tr.select(id_col, "n_sh", F.expr(HASH60.format(x="s_str")).alias("s"))
    ev = (
        shingle_rows(benchmark, id_col, text_col, n, repartition=False)
        .select(F.expr(HASH60.format(x="s_str")).alias("s"))
        .distinct()
    )
    hits = tr.join(F.broadcast(ev), "s")
    return (
        hits.groupBy(id_col, "n_sh")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            id_col,
            "n_sh",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("n_sh"), 4).alias("overlap_frac"),
        )
    )


# Bloom-filter decontamination parameters, shared with the oracle SQL
# (registry_text.py) so both engines derive the identical bit positions.
# m = 2^14 bits packs into 256 longs — ONE broadcast row regardless of
# corpus size. Two hash functions from disjoint md5 slices (15 hex
# chars each → non-negative < 2^60, so `%` needs no pmod dance).
BLOOM_M_BITS = 16384
BLOOM_H1 = "cast(conv(substr(md5({x}), 1, 15), 16, 10) AS bigint) % {m}"
BLOOM_H2 = "cast(conv(substr(md5({x}), 16, 15), 16, 10) AS bigint) % {m}"


#: Hard ceiling on ``m_bits``: the probe indexes the broadcast word
#: array with an INT (element_at + ``p div 64`` cast), so the word
#: index must stay below 2³¹ → m_bits < 2³⁷; memory caps it first —
#: 2³⁴ bits is already a 2 GiB broadcast bitmap. Larger filters need a
#: words-FRAME probe join, not a broadcast array.
BLOOM_M_BITS_MAX = 1 << 34


def benchmark_bloom_words(
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m_bits: int = BLOOM_M_BITS,
    packing: str = "auto",
) -> list[int]:
    """Build the benchmark's Bloom bitmap: every distinct benchmark
    shingle sets its two hash bits; the bitmap returns packed as
    ``m_bits / 64`` signed longs (word ``w`` bit ``k`` = position
    ``64*w + k``).

    Two packing strategies, value-identical (pinned by test):

    - ``driver`` — collect the DISTINCT set-bit positions and pack in
      Python. Collect size is bounded by ``m_bits`` (2 KB of longs at
      the 2¹⁴ default), but the distinct runs a shuffle whose key
      cardinality is min(shingles, m) and the driver loop touches every
      position.
    - ``bit_or`` — the production shape the driver path's old docstring
      promised: positions reduce EXECUTOR-side with a per-word
      ``bit_or(shiftleft(1L, pos % 64))`` hash aggregate (map-side
      partial bit_or, no distinct pass at all — OR is idempotent, so
      duplicate positions are free), and only the ≤ ``m_bits/64``
      non-zero (word_index, word) rows cross to the driver. At
      m = 2²⁰ that is ≤ 16 Ki rows regardless of benchmark size; at the
      2³³-bit scale of a billion-shingle suite union the same aggregate
      ships as a words frame (see ``BLOOM_M_BITS_MAX``).

    ``auto`` picks ``driver`` at the compact default (the distinct of
    ≤ 2¹⁴ positions is cheaper than an extra aggregate on tiny
    suites) and ``bit_or`` for anything larger."""
    if m_bits > BLOOM_M_BITS_MAX:
        raise ValueError(
            f"m_bits={m_bits} exceeds the broadcast-array probe ceiling "
            f"{BLOOM_M_BITS_MAX} (int word index + broadcast memory); "
            "ship the filter as a words frame instead"
        )
    if packing == "auto":
        packing = "driver" if m_bits <= BLOOM_M_BITS else "bit_or"
    ev = shingle_rows(benchmark, id_col, text_col, n, repartition=False)
    pos = ev.select(
        F.explode(
            F.array(
                F.expr(BLOOM_H1.format(x="s_str", m=m_bits)),
                F.expr(BLOOM_H2.format(x="s_str", m=m_bits)),
            )
        ).alias("pos")
    )
    words = [0] * ((m_bits + 63) // 64)
    if packing == "bit_or":
        word_rows = (
            pos.select(
                F.expr("pos div 64").alias("w"),
                F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("b"),
            )
            .groupBy("w")
            .agg(F.expr("bit_or(b)").alias("word"))
            .collect()
        )
        for r in word_rows:
            # already SIGNED 64-bit from the JVM — no re-pack needed
            words[int(r["w"])] = int(r["word"])
        return words
    if packing != "driver":
        raise ValueError(f"unknown packing {packing!r}")
    pos_rows = pos.distinct().collect()
    for r in pos_rows:
        p = int(r["pos"])
        words[p // 64] |= 1 << (p % 64)
    # pack as SIGNED 64-bit (bit 63 set → negative long); the probe's
    # `(w >> k) & 1` is sign-safe — arithmetic shift only pollutes HIGH
    # bits, and `& 1` reads the lowest
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def decontaminate_bloom(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m_bits: int = BLOOM_M_BITS,
    packing: str = "auto",
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the constant-memory
    scale path next to :func:`decontaminate`'s exact broadcast join.

    The benchmark's distinct shingles set bits in an ``m_bits`` Bloom
    bitmap (:func:`benchmark_bloom_words`); every training shingle then
    probes the bitmap with two O(1) bit tests — ``element_at`` into the
    broadcast word array + ``shiftright & 1`` — entirely scan-local,
    whole-stage-codegen'd, no join at all on the probe side. Bloom
    semantics exactly: NO false negatives (every truly-overlapping
    shingle hits), tunable false positives (a clean shingle whose two
    positions happen to be set) — ``decontaminate_bloom_fp_rate``
    measures the realized rate against the exact join.

    Output mirrors :func:`decontaminate`: ``(doc_id, n_sh,
    n_overlap_bloom, overlap_frac_bloom)`` for docs with ≥1 hit.

    Why this exists at 100 TB: the exact path broadcasts the full
    distinct benchmark-shingle hash set (8 bytes/shingle — GBs for a
    large eval-suite union); the bitmap is ``m_bits/8`` bytes FOREVER,
    and the probe is two ALU ops instead of a hash-table lookup. The
    oracle replays it relationally — the bitmap is definitionally the
    indicator of the set-bit position set, so ``bit test`` ≡
    ``position IN set`` and DuckDB needs no bit arithmetic."""
    words = benchmark_bloom_words(
        benchmark, id_col, text_col, n, m_bits, packing
    )
    spark = train.sparkSession
    bloom_df = spark.createDataFrame([(words,)], "bloom array<bigint>")
    tr = shingle_rows(train, id_col, text_col, n).select(
        id_col,
        "n_sh",
        F.expr(BLOOM_H1.format(x="s_str", m=m_bits)).alias("_p1"),
        F.expr(BLOOM_H2.format(x="s_str", m=m_bits)).alias("_p2"),
    )
    # word index via INTEGER division ({p} div 64): the old
    # `cast({p} / 64 AS int)` ran a double division whose 53-bit
    # mantissa (and 32-bit cast) silently degrades for huge bitmaps;
    # `div` is exact at every m_bits ≤ BLOOM_M_BITS_MAX (ADVICE r11)
    bit = (
        "((element_at(bloom, cast({p} div 64 AS int) + 1)"
        " >> cast({p} % 64 AS int)) & 1) = 1"
    )
    hit = F.expr(bit.format(p="_p1")) & F.expr(bit.format(p="_p2"))
    return (
        tr.crossJoin(F.broadcast(bloom_df))
        .filter(hit)
        .groupBy(id_col, "n_sh")
        .agg(F.count(F.lit(1)).alias("n_overlap_bloom"))
        .select(
            id_col,
            "n_sh",
            "n_overlap_bloom",
            F.round(F.col("n_overlap_bloom") / F.col("n_sh"), 4).alias(
                "overlap_frac_bloom"
            ),
        )
    )


#: Pair-list size up to which dup_clusters labels components on the
#: DRIVER (collect + union-find) instead of running the distributed
#: pointer-jumping loop — the same cap-guarded fast path streaming
#: admission has used since round 11, generalized to the batch
#: operator (r12). 100k edges is a few MB collected; the label table
#: it produces broadcasts back. After the upstream valves
#: (max_bucket/max_group/max_df) a real corpus's surviving pair list
#: is routinely this small even at 100 TB; anything larger falls back
#: to the distributed loop.
CLUSTERS_DRIVER_MAX_PAIRS = 100_000


def _min_label_components(edges: list[tuple]) -> dict:
    """Union-find with min-id component labels — the same labeling the
    distributed pointer-jumping loop computes, on a driver-bounded
    edge list. (Moved here from streaming/admission.py in r12 so the
    batch and streaming fast paths share one definition.)"""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    roots: dict = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    label: dict = {}
    for r, members in roots.items():
        members.append(r)
        m = min(members)
        for n in members:
            label[n] = m
    return label


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
    check_every: int = 2,
    driver_max_pairs: int | None = CLUSTERS_DRIVER_MAX_PAIRS,
) -> DataFrame:
    """Transitive near-duplicate clusters: (doc_id, cluster_id) for
    EVERY document, where cluster_id is the minimum doc id in the doc's
    connected component over the pair graph (singletons label
    themselves). This is the step after LSH in a real dedup pipeline —
    pairs alone over-delete (A~B, B~C ⇒ keep one of {A,B,C}, not two
    "winners" of independent pairs).

    Algorithm: min-label propagation WITH POINTER JUMPING — each round
    every node first adopts the smallest label among itself and its
    neighbors (one edge-list join), then shortcuts through its label's
    own label (``lbl ← lbl(lbl)``, one labels-to-labels self-join).
    The jump halves path lengths, so convergence is O(log diameter)
    rounds instead of the plain propagation's O(diameter) — a chain of
    10⁶ chained near-dups converges in ~20 rounds, not 10⁶ (same
    doubling trick as large-star/small-star, with simpler invariants).
    Near-dup components are usually flat; the jump costs one extra
    small join and makes deep components safe anyway.

    The driver-side convergence check (`.count()` action) runs every
    ``check_every`` rounds rather than every round — each skipped check
    saves a full pass at the cost of at most ``check_every - 1`` extra
    (cheap, already-converged) rounds.

    Lineage is truncated every round: cache_scope.pin (localCheckpoint
    locally; reliable checkpoint() when a checkpoint dir is set)
    here in local mode; at cluster scale prefer RELIABLE checkpoints
    (``spark.sparkContext.setCheckpointDir`` on durable storage +
    ``df.checkpoint()``) so an executor loss mid-iteration doesn't
    force recomputing the whole chain.

    The iteration runs over ONLY the nodes that appear in some pair —
    at corpus scale the dup subgraph is a small fraction of the
    documents, so every per-round join is |dup nodes|-sized, not
    |corpus|-sized; singletons label themselves via one final LEFT
    join after convergence.

    DRIVER FAST PATH (r12, guide §1.2 — the admission-module design
    generalized): pair lists up to ``driver_max_pairs`` are collected
    (guarded by limit(cap+1)) and labeled with the union-find above —
    byte-identical labels (min id per component, pinned by the
    union-find hypothesis test), one collect job plus a broadcast-join
    projection instead of ~2 joins + checkpoint + convergence count
    per pointer-jumping round. r13 (VERDICT r12 item 4): the pair
    frame is PINNED before the limit probe, so an over-cap graph no
    longer re-evaluates the whole shingle→minhash→band-join subtree a
    second time for the fallback loop — probe and loop read the same
    materialized rows. ``driver_max_pairs=0``/None forces the loop
    (tests pin the two paths equal).
    """
    if driver_max_pairs:
        pairs = pin(pairs.select("doc_a", "doc_b"))
        rows = pairs.limit(driver_max_pairs + 1).collect()
        if len(rows) <= driver_max_pairs:
            # drop NULL endpoints before union-find (ADVICE r12): the
            # distributed loop drops them silently via join
            # non-matches; min()/sorted() over mixed None/int raises
            label = _min_label_components(
                [
                    (r[0], r[1])
                    for r in rows
                    if r[0] is not None and r[1] is not None
                ]
            )
            if not label:
                return docs.select(
                    F.col(id_col),
                    F.col(id_col).alias("cluster_id"),
                )
            spark = docs.sparkSession
            id_type = dict(docs.dtypes)[id_col]
            lbl = spark.createDataFrame(
                sorted(label.items()),
                f"_node {id_type}, _lbl {id_type}",
            )
            return (
                docs.join(
                    F.broadcast(lbl),
                    docs[id_col] == F.col("_node"),
                    "left",
                )
                .select(
                    F.col(id_col),
                    F.coalesce("_lbl", F.col(id_col)).alias("cluster_id"),
                )
            )

    # r13 (VERDICT r12 item 4, guide §2.4): hold ONE numbered hash
    # partitioning of the EDGE frame across the whole loop. The edge
    # list (2x pairs — the loop's biggest frame) is repartitioned by
    # `src` once and PERSISTED: a cached plan's output partitioning is
    # stable under AQE (`canChangeCachedPlanOutputPartitioning` is
    # false by default), so every round's propagate join reads the
    # cache exchange-free instead of re-shuffling the edge list per
    # round. localCheckpoint could not serve here: under AQE the
    # checkpointed plan reports UnknownPartitioning (measured), so the
    # pinned frames would re-exchange every round. The cache is scoped
    # to the loop — the per-round label pins truncate lineage, so the
    # returned frame never references it and it is unpersisted before
    # returning.
    from airflow_loan_etl_pipeline_spark.session import engine_parallelism

    n_part = engine_parallelism(docs.sparkSession)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    ue = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(n_part, "src")
        .persist()
    )

    # distinct on node == src reuses the cached hash partitioning —
    # the node-universe build is exchange-free too
    labels = (
        ue.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .transform(pin)
    )

    for it in range(max_iter):
        prop = (
            ue.join(labels, ue.src == labels.node)
            .groupBy("dst")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = labels.join(prop, labels.node == prop.dst, "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce("nbr_lbl", F.col("lbl"))).alias(
                "lbl"
            ),
        )
        # Pointer jump: follow my label to ITS label (always ≤ mine,
        # since labels only decrease and lbl is itself a node id).
        parent = stepped.select(
            F.col("node").alias("pnode"), F.col("lbl").alias("plbl")
        )
        new_labels = (
            stepped.join(parent, stepped.lbl == parent.pnode, "left")
            .select(
                "node",
                F.coalesce("plbl", F.col("lbl")).alias("lbl"),
            )
            .transform(pin)
        )
        last_round = it == max_iter - 1
        if (it + 1) % check_every == 0 or last_round:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
                .filter(F.col("n.lbl") != F.col("o.lbl"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels

    # the loop's label pins truncated lineage, so nothing downstream
    # references the cached edge frame — release it now
    ue.unpersist()

    # Singletons (docs in no pair) label themselves; only dup-subgraph
    # nodes carried through the iteration.
    return (
        docs.select(F.col(id_col))
        .join(labels, docs[id_col] == labels.node, "left")
        .select(
            F.col(id_col),
            F.coalesce("lbl", F.col(id_col)).alias("cluster_id"),
        )
    )


def benchmark_contamination_report(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """The INVERSE of :func:`decontaminate`: per BENCHMARK document,
    how much of it already appears in the training corpus. Training-
    side decontamination tells you which training docs to drop;
    this report tells you which eval items are compromised — the
    number you need to discount or regenerate eval scores when a
    benchmark leaked into the crawl.

    Same scale shape as decontaminate, mirrored: the benchmark's
    distinct shingle set is tiny and BROADCASTS into one scan of the
    training shingles; the train side contributes only the distinct
    set of benchmark shingles it matched (benchmark-sized), which then
    joins back to per-eval-doc counts. The 100 TB training corpus is
    never shuffled.
    """
    ev = shingle_rows(benchmark, id_col, text_col, n, repartition=False)
    ev = ev.select(
        id_col, "n_sh", F.expr(HASH60.format(x="s_str")).alias("s")
    )
    ev_sh = ev.select("s").distinct()
    tr = shingle_rows(train, id_col, text_col, n).select(
        F.expr(HASH60.format(x="s_str")).alias("s")
    )
    hit_sh = tr.join(F.broadcast(ev_sh), "s").select("s").distinct()
    hits = ev.join(hit_sh, "s")
    return (
        hits.groupBy(id_col, "n_sh")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .select(
            id_col,
            "n_sh",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_sh"), 4).alias("hit_frac"),
        )
    )


def positional_shingle_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    repartition: bool = True,
) -> DataFrame:
    """Flat (id, n_pos, pos, shingle) rows for EVERY shingle position —
    the positional counterpart of :func:`shingle_rows` (which emits
    first-occurrence-distinct shingles for set-similarity).

    Substring-level dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better") needs *where* a duplicated span
    sits inside the document, and counts repeats WITHIN a document too,
    so no per-doc distinct is applied. Documents shorter than ``n``
    tokens have no n-gram positions and are dropped (documented
    contract; the set-based family keeps them as a whole-text shingle).
    ``pos`` is 1-based; ``n_pos = len(tokens) - n + 1``.
    """
    if repartition:
        df = _spread_for_python(df)

    def op(batches):
        for pdf in batches:
            ids, nps, ps, shs = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                t = t if isinstance(t, str) else ""
                toks = t.split(" ")
                n_pos = len(toks) - n + 1
                if n_pos <= 0:
                    continue
                for j in range(n_pos):
                    ids.append(i)
                    nps.append(n_pos)
                    ps.append(j + 1)
                    shs.append(" ".join(toks[j : j + n]))
            yield pd.DataFrame(
                {id_col: ids, "n_pos": nps, "pos": ps, "s_str": shs}
            )

    schema = f"{id_col} long, n_pos long, pos long, s_str string"
    return df.select(id_col, text_col).mapInPandas(op, schema)


def dup_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Per-document duplicated-span profile: how much of each document
    is made of n-grams that occur ≥ ``min_df`` times corpus-wide
    (including repeats inside the same document) — the measurement pass
    of substring-level dedup (Lee et al. 2022). A doc with
    ``dup_share`` near 1.0 is boilerplate; contiguous [first_dup_pos,
    last_dup_pos] ranges are the spans a substring-cut pass would
    remove.

    Shape at scale: text leaves the Python workers as (60-bit hash,
    position) rows only; the global df count and the join back shuffle
    8-byte keys twice on the SAME key (exchange reuse), never the
    corpus text. Cap note: df is a count, not a pair expansion — no
    quadratic blowup, so no bucket cap is needed here (contrast
    minhash_lsh_pairs).
    """
    rows = positional_shingle_rows(docs, id_col, text_col, n)
    # materialized once: the hashed rows feed BOTH the df aggregate
    # and the join-back; without it the Python shingling subtree
    # evaluates once per consumer (measured — a broadcast join leaves
    # the probe side exchange-free, so nothing is reused). The earlier
    # WINDOW-count formulation evaluated once by construction but put
    # EVERY occurrence of one shingle into a single task with no
    # partial aggregation — a hot boilerplate n-gram (df in the
    # billions at 100 TB) is an unbounded single-task straggler. The
    # agg+join form combines df map-side and AQE skew-join splits the
    # hot join partitions; rows are 8-byte hashes + positions, never
    # text, so the checkpointed frame stays small and spill-safe.
    hashed = _consistent(rows.select(
        id_col,
        "n_pos",
        "pos",
        F.expr(HASH60.format(x="s_str")).alias("sh"),
    ))
    dfs = hashed.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    hashed = hashed.join(dfs, "sh")
    is_dup = F.col("df") >= min_df
    out = (
        hashed
        .groupBy(id_col, "n_pos")
        .agg(
            F.count(F.when(is_dup, 1)).alias("n_dup_pos"),
            F.min(F.when(is_dup, F.col("pos"))).alias("first_dup_pos"),
            F.max(F.when(is_dup, F.col("pos"))).alias("last_dup_pos"),
        )
        .select(
            id_col,
            "n_pos",
            "n_dup_pos",
            "first_dup_pos",
            "last_dup_pos",
            (
                F.floor(F.col("n_dup_pos") * 1e4 / F.col("n_pos")) / 1e4
            ).alias("dup_share"),
        )
    )
    return out


def kmv_sketch(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 64,
) -> DataFrame:
    """Bottom-k (KMV) sketch per slice: the k smallest distinct 60-bit
    token hashes, as (src, h) rows. Cut in two window stages (local per
    input partition, then per slice over ≤ partitions x k survivors) so
    a slice's whole vocabulary never sits in one partition.

    MERGEABLE: ``kmv_merge(sketch(A), sketch(B)) == sketch(A ∪ B)`` —
    bottom-k of a union is the bottom-k of the union of bottom-k's —
    so incremental pipelines maintain the sketch per ingest batch
    (see kmv_merge and the streaming maintenance test).
    """
    toks = docs.select(
        F.col(group_col).alias("src"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    hashed = toks.select(
        "src", F.expr(HASH60.format(x="tok")).alias("h")
    ).distinct()
    w_local = Window.partitionBy("src", "_pid").orderBy(F.col("h").asc())
    local = (
        hashed.withColumn("_pid", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(w_local))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_pid")
    )
    w_src = Window.partitionBy("src").orderBy(F.col("h").asc())
    return (
        local.withColumn("_rn", F.row_number().over(w_src))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge (src, h) sketch rows from any number of batches back into
    a valid bottom-k sketch: distinct-union then re-cut to the k
    smallest per slice. Idempotent and associative — the foreachBatch
    state-update step of incremental sketch maintenance.
    """
    w_src = Window.partitionBy("src").orderBy(F.col("h").asc())
    return (
        sketches.distinct()
        .withColumn("_rn", F.row_number().over(w_src))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_source_similarity(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 64,
) -> DataFrame:
    """Pairwise vocabulary Jaccard between corpus slices, estimated
    from bottom-k (KMV) sketches — the mergeable-sketch answer to "how
    similar are these crawls?" when the slices are too big to intersect
    exactly.

    Each slice keeps only its k smallest distinct 60-bit token hashes
    (a bottom-k / K-Minimum-Values sketch; Beyer et al. 2007). The
    estimator for a pair is |bottom-L of the sketch union that belong
    to both sketches| / L with L = min(k, |union|) — deterministic
    given the hash, so the oracle replays it bit-for-bit in SQL.

    Scale shape: the only corpus-sized work is one distinct on
    (slice, hash); the bottom-k cut runs in two window stages (local
    per input partition, then per slice over ≤ partitions x k
    survivors) so no slice's whole vocabulary ever sits in one
    partition. Everything after operates on |slices| x k rows.
    Sketches are decomposable: unioning per-shard sketches and
    re-cutting to k gives the same sketch — the property that lets an
    incremental pipeline maintain them per ingest batch.

    The sketch frame feeds three plan branches (both sides of the
    slice-pair cross and the membership join); it is |slices| x k
    rows, so it is materialized once rather than re-running the
    corpus-sized distinct per branch.
    """
    sk = _consistent(kmv_sketch(docs, group_col, text_col, k))
    srcs = sk.select("src").distinct()
    pairs = (
        srcs.select(F.col("src").alias("source_a"))
        .crossJoin(srcs.select(F.col("src").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    joined = pairs.join(
        sk,
        (F.col("src") == F.col("source_a"))
        | (F.col("src") == F.col("source_b")),
    )
    prows = joined.groupBy("source_a", "source_b", "h").agg(
        F.max((F.col("src") == F.col("source_a")).cast("int")).alias("in_a"),
        F.max((F.col("src") == F.col("source_b")).cast("int")).alias("in_b"),
    )
    w_pair = Window.partitionBy("source_a", "source_b").orderBy(
        F.col("h").asc()
    )
    w_cnt = Window.partitionBy("source_a", "source_b")
    ranked = prows.withColumn("_rn", F.row_number().over(w_pair)).withColumn(
        "_L", F.least(F.lit(k), F.count(F.lit(1)).over(w_cnt))
    )
    return (
        ranked.filter(F.col("_rn") <= F.col("_L"))
        .groupBy("source_a", "source_b")
        .agg(
            F.max("_L").alias("k_used"),
            # count (BIGINT both engines) rather than sum(int): DuckDB
            # widens integer SUM to HUGEINT, which would break the
            # schema compare.
            F.count(
                F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1)
            ).alias("n_both"),
        )
        .select(
            "source_a",
            "source_b",
            "k_used",
            "n_both",
            (
                F.floor(F.col("n_both") * 1e4 / F.col("k_used")) / 1e4
            ).alias("jaccard_est"),
        )
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    bypass: bool | str = "auto",
) -> DataFrame:
    """Exact threshold-Jaccard pairs via PREFIX FILTERING (AllPairs /
    PPJoin family, Bayardo et al. 2007; Xiao et al. 2008) — the
    LOSSLESS alternative to ``ngram_jaccard_pairs(max_df=...)``'s
    stop-shingle capping.

    Each doc's distinct shingles are ordered globally by (document
    frequency asc, hash asc) — rarest first — and only the first
    ``|d| - ceil(t*|d|) + 1`` participate in the candidate join: two
    sets with Jaccard >= t MUST share a prefix element under any global
    order (pigeonhole on the required overlap), so recall is exactly
    100% by construction. The join fan-out drops from Σ df² over ALL
    shingles to Σ df_prefix² — and because the ordering puts frequent
    shingles LAST, hot shingles are exactly the ones prefixes exclude.

    Verification is candidate-bounded, not join-bounded: each doc's
    shingle-hash set is collected once (sorted bigint array), candidates
    fetch the two arrays by id, and the intersection is a codegen'd
    ``array_intersect`` — cost |candidates| x |doc|, never the inverted
    -index blowup. This is the shape to prefer at 100 TB when exact
    threshold semantics matter; df-capping remains for the "drop
    boilerplate signal entirely" policy.

    Round 9: exact-dedup-first via :func:`_exact_group_pairs` —
    threshold-Jaccard is a pure function of the two texts and the
    prefix filter is already lossless under ANY global shingle order,
    so running it over one representative per distinct text and
    expanding is byte-identical. On copy-heavy corpora the prefix
    index shrinks by the duplication factor (the 100x sweep's
    disk-guard abort came from every prefix posting list being 100x
    hot).
    """
    if threshold > 1.0:
        same_cols = None
    else:
        same_cols = {"jaccard": F.lit(1.0)}
    return _exact_group_pairs(
        df,
        lambda reps: _prefix_filter_core(reps, id_col, text_col, n, threshold),
        id_col,
        text_col,
        same_cols=same_cols,
        bypass=bypass,
    )


def _prefix_filter_core(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
) -> DataFrame:
    sh = shingle_rows(df, id_col, text_col, n)
    ex = sh.select(
        F.col(id_col), "n_sh", F.expr(HASH60.format(x="s_str")).alias("s")
    )
    ex = ex.repartition(_parallelism(ex.sparkSession), "s")
    # ONE doc-keyed aggregate builds both artifacts: the (df, hash)-
    # sorted array gives the prefix by slice, and its hash projection is
    # the verification set — replacing the earlier window + separate
    # collect_list formulation (two doc shuffles + a per-doc sort each;
    # measured 6.1 s -> this shape at sf0.1). Per-doc arrays are
    # doc-sized, the same bound shingle_rows already implies.
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    ).cast("int")
    # agg+join df, NOT a window: bydoc is consumed twice downstream
    # (prefix explode + verification sets), and a window-df doubles the
    # heavier sorted-window subtree — measured ~2x slower at sf0.1.
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("_df"))
    # bydoc is materialized ONCE: four plan branches read it (both
    # sides of the candidate self-join via the prefix explode, plus
    # both verification-set fetches), and lazily each re-ran the
    # shingle mapInPandas + df join + per-doc sort (the r7 plan's 8
    # scans / 12 exchanges). Stored rows are one per doc — the same
    # bound shingle_rows already implies.
    bydoc = _consistent(
        ex.join(dfreq, "s")
        .groupBy(id_col, "n_sh")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_df"), F.col("s")))
            ).alias("_ord")
        )
        .select(
            F.col(id_col),
            F.col("n_sh"),
            F.expr("transform(_ord, x -> x.s)").alias("_set"),
            F.slice(
                F.expr("transform(_ord, x -> x.s)"), F.lit(1), prefix_len
            ).alias("_prefix"),
        )
    )
    pre = bydoc.select(
        F.col(id_col), "n_sh", F.explode("_prefix").alias("s")
    )
    a = pre.select(
        "s", F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na")
    )
    b = pre.select(
        "s", F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb")
    )
    cand = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "na", "nb")
        .distinct()
    )
    sets = bydoc.select(id_col, "_set")
    joined = cand.join(
        sets.select(F.col(id_col).alias("doc_a"), F.col("_set").alias("_sa")),
        "doc_a",
    ).join(
        sets.select(F.col(id_col).alias("doc_b"), F.col("_set").alias("_sb")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    return (
        joined.withColumn(
            "jaccard",
            F.round(inter / (F.col("na") + F.col("nb") - inter), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_estimate_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Estimator-quality gauge for the MinHash pipeline: over the LSH
    candidate pairs, compare the signature-agreement Jaccard estimate
    (matching positions / 16) against the exact shingle-set Jaccard —
    mean/max absolute error and their correlation. The companion dial
    to lsh_candidate_recall: that one measures what banding FINDS, this
    one measures what the signatures CLAIM about it (how trustworthy
    est_jaccard is as a dedup-threshold proxy at 100 TB, where exact
    verification is rationed).

    Work is candidate-bounded: signatures and per-doc 32-bit shingle
    hash arrays are joined to the (small) candidate set by id; the
    agreement count and exact intersection are array expressions —
    no inverted-index re-expansion.
    """
    sh = shingle_rows(df, id_col, text_col, n)
    hashed = sh.select(
        F.col(id_col), F.expr(HASH32.format(x="s_str")).alias("h")
    )
    # persisted: hsets joins the candidate set twice (doc_a / doc_b)
    # and sigs feeds both the banding pair generation AND the two
    # agreement joins — without the caches the Python shingle stage
    # evaluates once per reference (measured 2.1 s -> ~1.4 s fresh at
    # sf0.1).
    hsets = _consistent(
        hashed.groupBy(id_col).agg(F.collect_list("h").alias("hh"))
    )
    sigs = _consistent(minhash_signatures(df, id_col, text_col, n))
    cand = minhash_lsh_pairs(df, id_col, text_col, n, sigs=sigs)
    j = (
        cand.join(
            sigs.select(
                F.col(id_col).alias("doc_a"), F.col("sig").alias("_sa")
            ),
            "doc_a",
        )
        .join(
            sigs.select(
                F.col(id_col).alias("doc_b"), F.col("sig").alias("_sb")
            ),
            "doc_b",
        )
        .join(
            hsets.select(
                F.col(id_col).alias("doc_a"), F.col("hh").alias("_ha")
            ),
            "doc_a",
        )
        .join(
            hsets.select(
                F.col(id_col).alias("doc_b"), F.col("hh").alias("_hb")
            ),
            "doc_b",
        )
    )
    est = F.expr(
        "size(filter(sequence(1, 16),"
        " i -> element_at(_sa, i) = element_at(_sb, i))) / 16.0"
    )
    inter = F.size(F.array_intersect("_ha", "_hb"))
    true_j = inter / (F.size("_ha") + F.size("_hb") - inter)
    scored = j.select(
        est.alias("_est"), true_j.alias("_true")
    )
    err = F.abs(F.col("_est") - F.col("_true"))
    out = scored.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(err), 4).alias("mean_abs_err"),
        F.round(F.max(err), 4).alias("max_abs_err"),
        F.round(F.corr("_est", "_true"), 4).alias("est_corr"),
    )
    return out


def substring_cut(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """The CUT half of substring-level dedup (Lee et al. 2022):
    remove every token covered by an n-gram occurring ≥ ``min_df``
    times corpus-wide, and emit the cleaned document's fingerprint +
    removal accounting (the cleaned text itself stays distributed; the
    md5 lets the oracle verify the rebuild byte-for-byte without
    shipping documents).

    Fully native: dup positions come from the same hashed positional
    rows as :func:`dup_span_stats`; coverage expands each dup position
    to its n token slots (explode, distinct); surviving tokens are a
    LEFT ANTI join on (doc, position); the rebuild is
    ``concat_ws(sort_array(struct(pos, token)))`` — per-doc arrays
    bounded by doc length, no Python in the cut path. Docs shorter
    than ``n`` tokens pass through uncut.
    """
    rows = positional_shingle_rows(docs, id_col, text_col, n)
    # persist + map-side-combined df + AQE-skew-splittable join-back —
    # same hot-shingle skew reasoning as dup_span_stats (a window
    # partitioned on the hash key is a single-task straggler for
    # boilerplate n-grams at scale).
    hashed = _consistent(rows.select(
        F.col(id_col), "pos", F.expr(HASH60.format(x="s_str")).alias("sh")
    ))
    dfs = hashed.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    dup = (
        hashed.join(dfs.filter(F.col("df") >= min_df), "sh", "left_semi")
        .select(id_col, "pos")
    )
    cov = (
        dup.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("cp"),
        )
        .distinct()
    )
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("_p0", "tok"),
    ).select(F.col(id_col), (F.col("_p0") + 1).alias("tp"), "tok")
    kept = toks.join(
        cov,
        (toks[id_col] == cov[id_col]) & (F.col("tp") == F.col("cp")),
        "left_anti",
    )
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(sort_array(collect_list(struct(tp, tok))),"
                    " x -> x.tok)"
                ),
            )
        ).alias("clean_md5"),
    )
    out = (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias(
                "n_kept"
            ),
            (
                F.col("n_tokens")
                - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
            # fully-cut docs rebuild to the empty string's md5
            F.coalesce(
                F.col("clean_md5"), F.md5(F.lit(""))
            ).alias("clean_md5"),
        )
    )
    return out

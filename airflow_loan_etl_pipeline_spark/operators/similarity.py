"""Similarity search over embedding columns (SURVEY.md §7 phase 4).

Two tiers:

- **Brute-force cosine top-k** — the exactness baseline. The query
  vector rides into the executors as a literal/broadcast; scoring is a
  pure projection (zip_with + aggregate, JVM-side, no Python); the
  top-k is ``TakeOrderedAndProject`` (per-partition heap, no full sort).
  At 100 TB this is one scan, embarrassingly parallel.
- **LSH-bucketed ANN** — the scale path. Random-hyperplane signatures
  bucket vectors; the query probes only its own bucket. Hyperplanes are
  deterministic (seeded ±1 weights generated from md5 in Python and
  embedded as literals), so an ANSI-SQL oracle reproduces the result
  exactly. On a cluster the bucketed table would be written
  partitioned-by-bucket so a probe prunes to one partition.

All arithmetic is double-precision with sequential left-to-right sums
on both engines, so results are bit-comparable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.operators.cache_scope import pin
from airflow_loan_etl_pipeline_spark.operators.stats import (
    safe_corr as _safe_corr,
)
from airflow_loan_etl_pipeline_spark.session import (
    engine_parallelism as _parallelism,
)

N_PLANES = 8
DIM = 64

# Scale cap for the cosine near-dup pair generator: hyperplane buckets
# holding more than this many vectors are DROPPED before the pair
# self-join (a bucket of b vectors expands to b² pairs; one hot bucket
# of near-constant/boilerplate embeddings expands quadratically while
# identifying nothing). Shared with the oracle SQL (registry_text.py)
# so both engines apply the identical cutoff — same discipline as
# dedup.LSH_MAX_BUCKET / dedup.NGRAM_MAX_DF. Fixture buckets peak at
# 33 vectors (sf0.1), so the default never binds at gate scale; at
# 100 TB it bounds per-bucket fan-out to ~32k pairs.
COSINE_MAX_BUCKET = 256


def _plane_weights(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplane weights from md5 — reproducible in
    any engine (and cheap enough to inline as literals)."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"plane_{p}_{i}".encode()).hexdigest()
            row.append(1 if int(h[:2], 16) % 2 == 1 else -1)
        planes.append(row)
    return planes


PLANES = _plane_weights()

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 AS double), "
    "(acc, v) -> acc + v)"
)


def _as_double(col: str) -> str:
    return f"transform({col}, x -> cast(x AS double))"


def _dot_self_py(vec) -> float | None:
    """Driver-side self-dot replaying the SQL fold bit-for-bit:
    ``aggregate(zip_with(cv, cv, (x, y) -> x * y), 0.0,
    (acc, v) -> acc + v)`` is a left-to-right IEEE-double fold; Python
    floats are IEEE doubles with the same * and + semantics, so the
    same element order produces the identical bits (NaN/Inf included).
    A NULL element poisons the SQL fold to NULL from that position on
    regardless of later elements (acc + NULL = NULL, NULL + v = NULL)
    — the early return matches that exactly."""
    if vec is None:
        return None
    acc = 0.0
    for x in vec:
        if x is None:
            return None
        x = float(x)
        acc = acc + x * x
    return acc


def cosine_expr(a: str, b: str) -> str:
    """cos(a,b) = dot(a,b)/sqrt(dot(a,a)*dot(b,b)) — identical formula
    and evaluation order to the oracle SQL. A ZERO-NORM vector has no
    direction: its cosine is NULL (sorts last under ORDER BY cosine
    DESC on both engines), guarded with try_divide — the unguarded
    division raised DIVIDE_BY_ZERO under the session's ANSI mode and
    produced engine-dependent NaN ordering in IEEE mode."""
    return (
        f"try_divide({DOT.format(a=a, b=b)}, "
        f"sqrt({DOT.format(a=a, b=a)} * {DOT.format(a=b, b=b)}))"
    )


def brute_force_cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to the vector of ``query_id``.

    The 1-row query side is broadcast (a crossJoin with a broadcast side
    is a BroadcastNestedLoopJoin — effectively a map-side constant).
    """
    base = df.withColumn("v", F.expr(_as_double(vec_col)))
    # qn (the query's self-dot) is hoisted into the 1-row broadcast side
    # — cosine_expr would recompute it per corpus row (r12, guide §1.2:
    # per-row work drops from 3 interpreted dots to 2). sqrt(dot(v,v) *
    # qn) multiplies the identical doubles — bit-identical cosines.
    q = (
        base.filter(F.col(id_col) == query_id)
        .select(
            F.col("v").alias("qv"),
            F.expr(DOT.format(a="v", b="v")).alias("qn"),
        )
    )
    cos = (
        f"try_divide({DOT.format(a='v', b='qv')}, "
        f"sqrt({DOT.format(a='v', b='v')} * qn))"
    )
    scored = (
        base.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(F.expr(cos), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def bucket_expr(vec_col: str = "v", planes: list[list[int]] = PLANES) -> str:
    """LSH bucket id: bit p = sign(dot(plane_p, v)). Pure projection."""
    bits = []
    for p, w in enumerate(planes):
        arr = "array(" + ", ".join(f"cast({x} AS double)" for x in w) + ")"
        bits.append(
            f"(CASE WHEN {DOT.format(a=arr, b=vec_col)} > 0 THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(bits)


def lsh_bucketed_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hamming: int = 0,
) -> DataFrame:
    """ANN top-k: score only vectors in the query's hyperplane bucket.

    Approximate (recall < 1) but deterministic. ``hamming`` > 0 enables
    MULTI-PROBE: candidates come from every bucket whose code differs
    from the query's in ≤ ``hamming`` bits (`bit_count(a ^ b)`), the
    standard recall/cost dial for hyperplane LSH — each extra bit of
    radius multiplies candidates by ~C(n_planes, r) and recovers
    neighbors that straddle a few planes. Scale path: persist ``bucket``
    as a partition column; a probe prunes the scan to the probed
    buckets (1/256 of the data per bucket for 8 planes).

    Recall note (measured, tests/test_ann_recall.py): on the fixture's
    ISOTROPIC random vectors recall is intrinsically modest (exact
    neighbors sit barely above the cosine noise floor, so bucket
    collisions carry weak signal — hamming 0/2/3 → ~0.01/0.2/0.4 mean
    recall@10 at 500 vectors). On real embedding corpora (clustered by
    topic/near-duplicates) hyperplane agreement is high precisely for
    the neighbors that matter; the operator and its cost model are
    unchanged — only the data's structure differs.
    """
    base = df.withColumn("v", F.expr(_as_double(vec_col))).withColumn(
        "bucket", F.expr(bucket_expr("v"))
    )
    # qn hoisted into the broadcast side (r12) — see
    # brute_force_cosine_topk; bit-identical cosines.
    q = base.filter(F.col(id_col) == query_id).select(
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
        F.expr(DOT.format(a="v", b="v")).alias("qn"),
    )
    probe = (
        F.col("bucket") == F.col("qbucket")
        if hamming == 0
        else F.expr(f"bit_count(bucket ^ qbucket) <= {int(hamming)}")
    )
    cos = (
        f"try_divide({DOT.format(a='v', b='qv')}, "
        f"sqrt({DOT.format(a='v', b='v')} * qn))"
    )
    scored = (
        base.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .filter(probe)
        .select(
            id_col,
            "bucket",
            F.round(F.expr(cos), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def seed_centroids(
    base: DataFrame, n: int, id_col: str = "vec_id"
) -> DataFrame:
    """The ``n`` lowest-id vectors as (cid, cv) with DENSE 0-based
    cids. Selecting the lowest ids FOR REAL (orderBy+limit) instead of
    ``id < n`` keeps the codebook non-empty on id-offset corpora, and
    the dense re-index keeps cids in the compact 0..n-1 domain the
    quantization story assumes. On 0-based contiguous fixtures this is
    identical to the old ``id < n`` filter. ``base`` must carry the
    double-array column ``v``. Dense ids come from posexplode over the
    id-sorted collected seed array — not a row_number Window, so plans
    composing this stay Window-free (the collect_list is bounded by
    ``n`` rows, after the TakeOrdered limit)."""
    arr = (
        base.select(F.col(id_col).alias("_sid"), "v")
        .orderBy("_sid")
        .limit(n)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_sid"), F.col("v")))
            ).alias("_seeds")
        )
    )
    return arr.select(
        F.posexplode("_seeds").alias("cid", "_s")
    ).select(
        F.col("cid").cast("long"), F.col("_s.v").alias("cv")
    )


def _scores_expr() -> str:
    """The shared per-vector centroid-scores expression over a
    ``cents`` array<struct<cid, cv, cn>> column and a double-array
    ``v`` column: ``array_max`` over it picks the best centroid
    (cosine DESC, cid ASC tie-break).

    HOISTED NORMS (r12, guide §4.1/§1.2 — do less work per row inside
    the interpreted HOF): ``cosine_expr`` inlined here would evaluate
    THREE d-element dot products per (row, centroid) — dot(v, cv) plus
    dot(v, v) (a per-ROW constant, recomputed k times) and dot(cv, cv)
    (a per-CENTROID constant, recomputed for every row). The centroid
    self-dot rides in the struct as ``cn`` (computed once per centroid
    at build time) and the row self-dot binds ONCE per row as a lambda
    variable via the single-element-transform let idiom —
    ``transform(array(dot(v, v)), vn -> ...)[0]`` — which keeps the
    hoist inside one expression where the optimizer cannot inline it
    back into the per-centroid lambda. Per (row, centroid) work drops
    from 3 dots to 1 dot + one multiply + sqrt. Bit-identical values:
    ``sqrt(vn * c.cn)`` multiplies exactly the doubles
    ``sqrt(dot(v,v) * dot(cv,cv))`` multiplied, computed by the same
    fold in the same order."""
    dot_vv = DOT.format(a="v", b="v")
    dot_vc = DOT.format(a="v", b="c.cv")
    return (
        f"transform(array({dot_vv}), vn -> "
        "transform(cents, c -> named_struct("
        f"'ccos', try_divide({dot_vc}, sqrt(vn * c.cn)), "
        "'negcid', -c.cid, 'cid', c.cid)))[0]"
    )


def _broadcast_centroid_scores(cents: DataFrame) -> tuple[DataFrame, str]:
    """The shared map-side argmax primitive: collapse a (cid, cv)
    centroid frame into ONE row holding the sorted centroid array
    (broadcast-cross-joined onto the corpus it is a per-task constant —
    BroadcastNestedLoopJoin over 1 row = map side), plus the per-vector
    scores expression whose ``array_max`` picks each vector's best
    centroid (cosine DESC, cid ASC tie-break) with NO shuffle of the
    corpus. Used by ivf_topk, assign_centroids and kmeans_train — one
    definition, so the assignment rule cannot drift between them.
    Each struct carries the centroid's self-dot ``cn`` (evaluated once
    per centroid here, at build time) for :func:`_scores_expr`."""
    cent_arr = cents.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("cid"),
                    F.col("cv"),
                    F.expr(DOT.format(a="cv", b="cv")).alias("cn"),
                )
            )
        ).alias("cents")
    )
    return cent_arr, _scores_expr()


def _with_best_centroid(base: DataFrame, cents: DataFrame) -> tuple[DataFrame, str]:
    """``base`` (carrying double-array column ``v``) + a ``best``
    struct column = each vector's nearest centroid, computed map-side
    via :func:`_broadcast_centroid_scores`. Returns the scores
    expression too for callers that re-rank it (ivf_topk's probe)."""
    cent_arr, scores = _broadcast_centroid_scores(cents)
    with_best = base.crossJoin(F.broadcast(cent_arr)).withColumn(
        "best", F.expr(f"array_max({scores})")
    )
    return with_best, scores


def _literal_centroid_scores(
    cents: dict[int, list[float] | None],
) -> tuple["F.Column", str]:
    """(literal centroid-array column, scores expression) for
    DRIVER-HELD centroids: the centroid array rides into the plan as a
    CONSTANT literal (k x dims doubles — a few KB), so assignment is a
    pure codegen projection with no broadcast build and no extra plan
    branch. Same scores expression (cosine DESC, cid ASC tie-break) as
    :func:`_broadcast_centroid_scores`, so the assignment rule cannot
    drift between the DataFrame-centroid and literal-centroid paths.
    Literal doubles round-trip py4j bit-exactly; NULL vectors/elements
    (PERMISSIVE ingest) stay NULL — their cosine is NULL and they never
    win the argmax, exactly as in the DataFrame formulation.

    Each literal struct carries the centroid's self-dot ``cn``,
    computed DRIVER-side by :func:`_dot_self_py` — the same
    left-to-right IEEE fold the SQL aggregate runs, so the embedded
    double is bit-identical to what Spark would compute (r12 norm
    hoist, see :func:`_scores_expr`)."""
    # The literal is assembled as ONE SQL string parsed by a single
    # F.expr call, NOT as a tree of F.lit/F.struct/F.array Column
    # objects: k=16 x dims=64 doubles is ~1000 py4j round-trips per
    # build (~5 s of pure driver overhead, measured), and kmeans_train
    # rebuilds the literal every Lloyd round. repr() emits the shortest
    # round-trip decimal and Java's parser is correctly rounded, so the
    # parsed doubles are BIT-IDENTICAL to the py4j-shipped ones.
    import math

    def _sql_double(x) -> str:
        if x is None:
            return "CAST(NULL AS DOUBLE)"
        x = float(x)
        if math.isfinite(x):
            return repr(x) + "D"
        name = "NaN" if math.isnan(x) else (
            "Infinity" if x > 0 else "-Infinity"
        )
        return f"CAST('{name}' AS DOUBLE)"

    def _cv_sql(vec) -> str:
        if vec is None:
            return "CAST(NULL AS array<double>)"
        if not vec:
            return "CAST(array() AS array<double>)"
        return "array(" + ",".join(_sql_double(x) for x in vec) + ")"

    lit_arr = F.expr(
        "array("
        + ",".join(
            f"named_struct('cid', CAST({int(cid)} AS BIGINT),"
            f" 'cv', {_cv_sql(vec)},"
            f" 'cn', {_sql_double(_dot_self_py(vec))})"
            for cid, vec in sorted(cents.items())
        )
        + ")"
    )
    return lit_arr, _scores_expr()


def _with_best_centroid_literal(
    base: DataFrame, cents: dict[int, list[float] | None]
) -> DataFrame:
    """``base`` + a ``best`` column, assigned map-side against
    driver-held literal centroids (:func:`_literal_centroid_scores`)
    — the MLlib KMeans loop shape, correct at any corpus scale because
    centroids are k x d, never data-sized."""
    lit_arr, scores = _literal_centroid_scores(cents)
    return (
        base.withColumn("cents", lit_arr)
        .withColumn("best", F.expr(f"array_max({scores})"))
        .drop("cents")
    )


#: k x dims threshold above which driver-held centroid assignment
#: switches from the literal-SQL argmax to the broadcast-numpy
#: mapInPandas argmax (VERDICT r11 item 1). The literal path is a pure
#: codegen projection but its plan text is O(k x dims) and the
#: interpreted transform evaluates O(k) array lambdas per row — right
#: at k=16..1024 on d=64 (every registry default stays literal, so the
#: oracle gate's plans are byte-identical), wrong at SemDeDup's
#: published operating point (k~50k, d>=512: megabytes of plan, ~50k
#: interpreted closures per row). Above the threshold the codebook
#: ships once per executor as an Arrow-broadcast numpy matrix and each
#: batch scores as ONE BLAS matmul.
CENTROID_LITERAL_MAX_CELLS = 65536


def _regular_dim(cents: dict[int, list[float] | None]) -> int | None:
    """The codebook's uniform dimensionality, or None if centroids are
    ragged / all-NULL (the numpy path requires a uniform matrix; the
    literal path handles ragged codebooks element-wise)."""
    dims = {len(v) for v in cents.values() if v is not None}
    return dims.pop() if len(dims) == 1 else None


def _centroid_matrix(cents: dict[int, list[float] | None]):
    """(cids int64[k], C float64[k,d], n2c float64[k], nullcent bool[k])
    for a uniform-dim codebook — the driver-side artifact the numpy
    path broadcasts. A NULL centroid or one containing NULL elements is
    null-class: its cosine is NULL against every vector, exactly as the
    SQL formulation's NULL-poisoned dot product."""
    import numpy as np

    items = sorted(cents.items())
    d = _regular_dim(cents)
    if d is None:
        raise ValueError("numpy centroid path needs a uniform-dim codebook")
    k = len(items)
    cids = np.array([c for c, _ in items], dtype=np.int64)
    C = np.zeros((k, d), dtype=np.float64)
    nullcent = np.zeros(k, dtype=bool)
    for i, (_, v) in enumerate(items):
        if v is None or any(x is None for x in v):
            nullcent[i] = True
        else:
            C[i] = v
    n2c = np.einsum("ij,ij->i", C, C)
    return cids, C, n2c, nullcent


def _cosine_rows(vlist, vnull, C, n2c, nullcent):
    """(cos float64[n,k], nullm bool[n,k]) — per-(vector, centroid)
    cosines with the SAME null semantics as :func:`cosine_expr`:
    NULL vector / NULL element / length mismatch / zero norm → NULL
    (try_divide); NaN elements propagate to NaN cosines (which WIN a
    Spark argmax — NaN is largest in Spark's double total order)."""
    import numpy as np

    n, d = len(vlist), C.shape[1]
    V = np.zeros((n, d), dtype=np.float64)
    rownull = np.zeros(n, dtype=bool)
    for i, (v, vn) in enumerate(zip(vlist, vnull)):
        if v is None or vn or len(v) != d:
            rownull[i] = True
        else:
            V[i] = v
    dots = V @ C.T
    n2v = np.einsum("ij,ij->i", V, V)
    denom = np.sqrt(n2v[:, None] * n2c[None, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = dots / denom
    nullm = (denom == 0) | rownull[:, None] | nullcent[None, :]
    return cos, nullm


def _argmax_spark_order(cos, nullm):
    """Per-row best-centroid INDEX under Spark's struct-max ordering
    over (ccos, -cid): NaN beats every value (first NaN index = min cid
    among NaNs), values beat NULL, ties break to the smallest cid
    (np.argmax returns the FIRST maximum; centroid columns are
    cid-sorted). The one undistinguished edge: a REAL -Infinity cosine
    ties with the NULL class (both encode to -inf) — finite-norm
    vectors cannot produce one."""
    import numpy as np

    n = cos.shape[0]
    key = np.where(nullm, -np.inf, cos)
    nanm = np.isnan(key)
    key = np.where(nanm, -np.inf, key)
    idx = key.argmax(axis=1)
    first_nan = nanm.argmax(axis=1)
    return np.where(nanm.any(axis=1), first_nan, idx)


def _with_best_centroid_numpy(
    base: DataFrame, cents: dict[int, list[float] | None]
) -> DataFrame:
    """``base`` + the same ``best`` struct as the literal path, assigned
    by an Arrow-batched mapInPandas argmax against a broadcast numpy
    codebook — the large-k path (k x dims doubles ride to each executor
    ONCE; per batch the score matrix is one BLAS matmul instead of k
    interpreted SQL closures per row). Zero shuffles, zero joins.

    Parity with :func:`_with_best_centroid_literal` (pinned by
    test_centroid_paths): same cid on every fixture/random vector, same
    NULL rules (NULL vector/element, length mismatch, zero norm, NULL
    centroid → that cosine is NULL and never wins; an all-NULL row
    assigns the minimum cid with NULL ccos), same NaN rule (NaN cosine
    wins, min cid among NaNs). The ``ccos`` VALUE may differ from the
    sequential-sum SQL dot in the last ulp (BLAS pairwise summation) —
    callers compare ccos only between same-path rows (semdedup's
    contest) or round to 6 dp, where the ulp cannot surface; integer-
    valued vectors are bit-exact in both paths (exact sums commute).

    NULL-vs-NaN plumbing across the Arrow boundary: NULL-element
    detection happens JVM-side (an ``exists`` probe rides the plan as
    ``_vnull``) because Arrow's pandas conversion folds list nulls into
    NaN on the way OUT, and pyspark's serializer folds float NaN into
    NULL on the way BACK (pa.Array.from_pandas semantics, probed). So
    the UDF emits FLAT numpy columns — ``_bccos`` (NaN doubles arrive
    as NULL, which is exactly what the null class needs) plus a
    ``_bnan`` mask — and the ``best`` struct is reassembled JVM-side,
    re-materializing true NaN ccos from the mask. Flat numpy columns
    are also the fast shape (no per-row dict construction)."""
    cids, C, n2c, nullcent = _centroid_matrix(cents)
    flat_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in base.schema.fields]
        + ["_bccos double", "_bnan boolean", "_bcid long"]
    )
    staged = base.withColumn(
        "_vnull", F.expr("coalesce(exists(v, x -> x is null), false)")
    )

    def assign(batches):
        import numpy as np

        for pdf in batches:
            out = pdf.drop(columns=["_vnull"])
            n = len(pdf)
            if n == 0:
                out["_bccos"] = np.zeros(0, dtype=np.float64)
                out["_bnan"] = np.zeros(0, dtype=bool)
                out["_bcid"] = np.zeros(0, dtype=np.int64)
                yield out
                continue
            cos, nullm = _cosine_rows(
                list(pdf["v"]), pdf["_vnull"].tolist(), C, n2c, nullcent
            )
            idx = _argmax_spark_order(cos, nullm)
            rows = np.arange(n)
            bc = cos[rows, idx]
            bn = nullm[rows, idx]
            out["_bccos"] = np.where(bn, np.nan, bc)
            out["_bnan"] = (~bn) & np.isnan(bc)
            out["_bcid"] = cids[idx]
            yield out

    return (
        staged.mapInPandas(assign, flat_schema)
        .withColumn(
            "best",
            F.struct(
                F.when(
                    F.col("_bnan"), F.expr("cast('NaN' AS double)")
                )
                .otherwise(F.col("_bccos"))
                .alias("ccos"),
                (-F.col("_bcid")).alias("negcid"),
                F.col("_bcid").alias("cid"),
            ),
        )
        .drop("_bccos", "_bnan", "_bcid")
    )


def _with_best_centroid_driver(
    base: DataFrame,
    cents: dict[int, list[float] | None],
    assign_path: str | None = None,
) -> DataFrame:
    """Driver-held centroid assignment, auto-routed: the literal-SQL
    argmax below ``CENTROID_LITERAL_MAX_CELLS`` total codebook cells
    (or for ragged codebooks, which the matrix path can't represent),
    the broadcast-numpy mapInPandas argmax above it. ``assign_path``
    ∈ {None, 'literal', 'numpy'} forces a path (tests pin the two
    paths equal; benches price the crossover)."""
    if assign_path not in (None, "literal", "numpy"):
        raise ValueError(f"unknown assign_path {assign_path!r}")
    d = _regular_dim(cents)
    if assign_path is None:
        cells = len(cents) * (d or 0)
        assign_path = (
            "numpy"
            if d is not None and cells > CENTROID_LITERAL_MAX_CELLS
            else "literal"
        )
    if assign_path == "numpy":
        if d is None:
            raise ValueError(
                "numpy centroid path needs a uniform-dim codebook"
            )
        return _with_best_centroid_numpy(base, cents)
    return _with_best_centroid_literal(base, cents)


def _numpy_probe(
    base: DataFrame,
    cents: dict[int, list[float] | None],
    query_id: int,
    nprobe: int,
    id_col: str,
) -> DataFrame:
    """The IVF probe list for the numpy assignment path: the query's
    single vector is collected (one row) and its ``nprobe`` nearest
    centroids ranked DRIVER-side with the same ordering the literal
    path's ``orderBy(ccos desc, cid asc)`` produces — NaN cosines
    first (Spark: NaN is the largest double), NULL cosines last (desc
    → nulls last), ties to the smaller cid. Ships back as a tiny
    (pcid, qv) local relation, exactly the shape the literal probe's
    TakeOrdered emits — so the downstream broadcast join is
    identical."""
    import math

    spark = base.sparkSession
    schema = "pcid long, qv array<double>"
    row = base.filter(F.col(id_col) == query_id).select("v").head()
    if row is None:
        return spark.createDataFrame([], schema)
    qv = None if row[0] is None else list(row[0])
    cids, C, n2c, nullcent = _centroid_matrix(cents)
    vnull = qv is not None and any(x is None for x in qv)
    cos, nullm = _cosine_rows([qv], [vnull], C, n2c, nullcent)

    def key(j: int):
        if nullm[0, j]:
            return (2, 0.0, int(cids[j]))
        c = float(cos[0, j])
        if math.isnan(c):
            return (0, 0.0, int(cids[j]))
        return (1, -c, int(cids[j]))

    probe = sorted(range(len(cids)), key=key)[:nprobe]
    return spark.createDataFrame(
        [(int(cids[j]), qv) for j in probe], schema
    )


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | dict | None = None,
    assign_path: str | None = None,
) -> DataFrame:
    """IVF-style ANN top-k: coarse-quantize to the nearest centroid,
    probe only the query's ``nprobe`` nearest inverted lists.

    Centroids are the ``n_centroids`` lowest-id data vectors —
    deterministic (no k-means RNG), so the oracle reproduces the
    assignment exactly. The centroid set rides into every task as ONE
    broadcast row holding the whole (tiny) centroid array; assignment
    is a pure map-side projection — ``array_max`` over
    ``struct(ccos, -cid, cid)`` picks each vector's best centroid
    (cosine DESC, cid ASC tie-break) with NO shuffle of the corpus.
    The previous formulation ranked n_vectors × n_centroids scored rows
    with a ``row_number`` window, shuffling the entire corpus by vec_id
    just to take a per-vector argmax.
    Scale path: persist ``cid`` as a partition column so a probe prunes
    the scan to nprobe/n_centroids of the data; recall improves by
    raising nprobe, cost-transparently (measured on the isotropic
    fixture: nprobe 2/4/6/8 → ~0.29/0.43/0.51/0.56 mean recall@10 —
    see tests/test_ann_recall.py and the lsh_bucketed_topk recall
    note; real clustered corpora with k-means/label centroids sit far
    higher at the same nprobe).
    """
    base = df.withColumn("v", F.expr(_as_double(vec_col)))
    if centroids is not None:
        # externally trained index — accepts a {cid: vector} dict
        # (kmeans_train's internal form) or a DataFrame with (cid, cv)
        # or kmeans_train's (cid, n_members, centroid), so
        # ivf_topk(centroids=kmeans_train(...)) composes without a
        # rename shim (VERDICT r4 item 3b). A DataFrame is COLLECTED
        # (k rows by contract) and assigned as driver-held literals:
        # broadcasting the trained-centroid frame executed its whole
        # subtree — including corpus-sized aggregates like
        # kmeans_train's n_members — through the slow driver
        # broadcast-build path (the documented F.broadcast(one_row_df)
        # trap), for columns the probe never reads.
        if isinstance(centroids, dict):
            cdict = centroids
        else:
            cvec = "cv" if "cv" in centroids.columns else "centroid"
            cdict = {
                int(r[0]): (None if r[1] is None else list(r[1]))
                for r in centroids.select("cid", F.col(cvec)).collect()
            }
        d = _regular_dim(cdict)
        chosen = assign_path
        if chosen is None:
            chosen = (
                "numpy"
                if d is not None
                and len(cdict) * d > CENTROID_LITERAL_MAX_CELLS
                else "literal"
            )
        if chosen == "numpy":
            with_best = _with_best_centroid_numpy(base, cdict)
            qprobe = _numpy_probe(
                base, cdict, query_id, nprobe, id_col
            )
        else:
            lit_arr, scores = _literal_centroid_scores(cdict)
            with_best = base.withColumn("cents", lit_arr).withColumn(
                "best", F.expr(f"array_max({scores})")
            )
            qprobe = (
                with_best.filter(F.col(id_col) == query_id)
                .select(
                    F.col("v").alias("qv"),
                    F.explode(F.expr(scores)).alias("s"),
                )
                .orderBy(F.col("s.ccos").desc(), F.col("s.cid").asc())
                .limit(nprobe)
                .select(F.col("s.cid").alias("pcid"), F.col("qv"))
            )
    else:
        cents = seed_centroids(base, n_centroids, id_col)
        with_best, scores = _with_best_centroid(base, cents)
        qprobe = (
            with_best.filter(F.col(id_col) == query_id)
            .select(
                F.col("v").alias("qv"), F.explode(F.expr(scores)).alias("s")
            )
            .orderBy(F.col("s.ccos").desc(), F.col("s.cid").asc())
            .limit(nprobe)
            .select(F.col("s.cid").alias("pcid"), F.col("qv"))
        )
    assigned = with_best.select(id_col, "v", F.col("best.cid").alias("cid"))
    # qn hoisted into the (≤ nprobe)-row broadcast probe side (r12):
    # cosine_expr would recompute the query's self-dot for every probed
    # candidate. Same doubles multiplied — bit-identical cosines.
    qprobe = qprobe.withColumn("qn", F.expr(DOT.format(a="qv", b="qv")))
    cos = (
        f"try_divide({DOT.format(a='v', b='qv')}, "
        f"sqrt({DOT.format(a='v', b='v')} * qn))"
    )
    return (
        assigned.join(F.broadcast(qprobe), F.col("cid") == F.col("pcid"))
        .filter(F.col(id_col) != query_id)
        .select(
            id_col,
            "cid",
            F.round(F.expr(cos), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def assign_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, cid): each vector's nearest seed centroid (the
    ``n_centroids`` lowest-id vectors), computed map-side — the same
    broadcast-array ``array_max`` argmax as :func:`ivf_topk`, zero
    shuffles of the corpus."""
    base = df.withColumn("v", F.expr(_as_double(vec_col)))
    cents = seed_centroids(base, n_centroids, id_col)
    with_best, _ = _with_best_centroid(base, cents)
    return with_best.select(id_col, "v", F.col("best.cid").alias("cid"))


def kmeans_refine(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd iteration: assign every vector to its nearest seed
    centroid (map-side argmax), then recompute each cluster's centroid
    as the element-wise mean of its members — the k-means build step an
    IVF index runs a handful of times before freezing its lists.

    Empty-cluster note: this SINGLE step reports only clusters that
    captured members (an empty cluster has no member mean to report) —
    deliberately different from :func:`kmeans_train`, whose multi-round
    loop must keep k constant by carrying the previous centroid; use
    the trainer when codebook size is a contract.

    Scale shape: assignment is shuffle-free; the mean is ONE hash
    aggregate keyed by (cid, dim_pos) over posexploded components with
    map-side partial sums — dims × centroids output rows regardless of
    corpus size — then a tiny regroup to rebuild the arrays in position
    order. Means are rounded (6 dp) at the edge: cross-engine summation
    order differs in the last ulp; the rounding absorbs it.
    """
    assigned = assign_centroids(df, n_centroids, id_col, vec_col)
    per_dim = (
        assigned.select("cid", F.posexplode("v").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.round(F.avg("x"), 6).alias("m"))
    )
    sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    rebuilt = per_dim.groupBy("cid").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
        ).alias("centroid")
    )
    return rebuilt.join(sizes, "cid").select("cid", "n_members", "centroid")


#: Default fixed-size training sample for kmeans_train(train_sample_size=...):
#: k-means needs a REPRESENTATIVE sample, not the corpus — 64 vectors per
#: centroid at k=16 is well past diminishing returns for a coarse
#: quantizer, and a fixed size makes training cost scale-INVARIANT
#: (the corpus only ever sees one final assignment pass).
TRAIN_SAMPLE_SIZE = 1024


def content_sample(
    df: DataFrame, n: int, id_col: str = "vec_id"
) -> DataFrame:
    """Deterministic content-addressed fixed-SIZE sample: the ``n``
    rows with the smallest ``(md5(id), id)`` key — the same
    engine/partitioning/rerun-independence contract as
    text.corpus_mix_sample's md5-rank trick (a seeded ``sample()``
    draws an engine-dependent RNG stream and is not oracle-replayable),
    but sized rather than rated, which is what a training stage needs:
    the cost of everything downstream of the sample is the same at 1x
    and 100x. md5 is uniform, so the sample is an unbiased draw;
    physical shape is TakeOrdered (per-partition top-n heaps + one
    tiny final merge), never a full sort."""
    key = F.md5(F.col(id_col).cast("string"))
    return df.orderBy(key.asc(), F.col(id_col).asc()).limit(n)


def kmeans_train(
    df: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample_size: int | None = None,
    include_sizes: bool = True,
    assign_path: str | None = None,
) -> DataFrame:
    """Multi-iteration Lloyd k-means on top of the kmeans_refine step:
    seed with the ``n_centroids`` lowest-id vectors, then repeat
    (map-side nearest-centroid assignment against the BROADCAST current
    centroids → per-(cid, dim) mean) ``n_iters`` times. Returns
    (cid, n_members, centroid) for the final assignment.

    EMPTY-CLUSTER CONTRACT: k never shrinks. A centroid that captures
    no members in some iteration KEEPS its previous position (the
    standard Lloyd fallback) instead of silently vanishing — a dropped
    centroid would shrink the codebook mid-training and permanently
    lose index capacity. Empty clusters appear in the output with
    ``n_members = 0`` and their carried-over centroid, so a trained
    index always has exactly ``n_centroids`` inverted lists.

    Scale shape: the training frame is re-scanned once per iteration
    and NEVER shuffled wider than the centroids×dims mean aggregate —
    assignment is a map-side argmax against a LITERAL centroid array
    (centroids live on the driver between rounds, the MLlib KMeans
    shape: k×dims doubles, collected each round, so there is no
    per-round centroid-frame checkpoint or keep-previous join in the
    plan at all; round 10). Means round to 6 dp per round — the same
    edge-rounding as kmeans_refine, which also keeps the
    fixed-iteration replay bit-identical across engines.

    ``train_sample_size`` (round 10) bounds training cost to a
    SCALE-INVARIANT constant: Lloyd rounds run over a deterministic
    content-addressed sample (:func:`content_sample` — md5-rank, so
    the same vectors train on any engine/partitioning/scale) and the
    full corpus is touched exactly once, by a final map-side
    assignment against the trained centroids that produces
    ``n_members``. Seeds come from the sample. This is the production
    IVF lifecycle — FAISS-style train-on-sample, assign-everything —
    and it turns the trainer's per-iteration full scans (the former
    slowest headline: corpus-proportional at 100x) into
    O(sample x iters) + one corpus pass."""
    base = df.withColumn("v", F.expr(_as_double(vec_col)))
    if train_sample_size is not None:
        train = content_sample(base, train_sample_size, id_col).transform(
            lambda d: pin(d, eager=False)
        )
    else:
        train = base
    if n_iters < 1:
        raise ValueError("kmeans_train needs n_iters >= 1")
    # Centroids live on the DRIVER between rounds (round 10, the MLlib
    # KMeans shape): they are k x dims doubles, so collecting them is
    # free, every Lloyd round becomes ONE job (assignment + per-dim
    # mean collect) against a literal centroid array, and the
    # per-round centroid-frame localCheckpoint + keep-previous join of
    # the DataFrame formulation disappears. Values are bit-identical:
    # same scores expression, same grouped rounded means, and literal
    # doubles round-trip py4j exactly.
    cents = {
        int(r["cid"]): (None if r["cv"] is None else list(r["cv"]))
        for r in seed_centroids(train, n_centroids, id_col).collect()
    }
    spark = df.sparkSession
    if not cents:
        # empty input seeds nothing — same empty (cid, n_members,
        # centroid) frame the DataFrame formulation produced
        return spark.createDataFrame(
            [],
            "cid long, centroid array<double>" if not include_sizes
            else "cid long, n_members long, centroid array<double>",
        )
    prev_cents = cents
    for _ in range(n_iters):
        prev_cents = cents
        wb = _with_best_centroid_driver(train, cents, assign_path)
        rows = (
            wb.select(
                F.col("best.cid").alias("cid"),
                F.posexplode("v").alias("pos", "x"),
            )
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(int(r["cid"]), {})[int(r["pos"])] = r["m"]
        # EMPTY-CLUSTER CONTRACT: a cid that captured no members keeps
        # its previous position — k never shrinks. Dims come from the
        # observed positions (posexplode emits every index a member
        # vector carries), matching the DataFrame formulation's
        # array_sort(collect_list(struct(pos, m))) rebuild.
        cents = {
            cid: ([by_cid[cid][p] for p in sorted(by_cid[cid])]
                  if cid in by_cid else vec)
            for cid, vec in cents.items()
        }
    if not include_sizes:
        # centroids-only consumers (a trained index handed to
        # ivf_topk) skip the n_members corpus pass entirely — the
        # trained codebook is already on the driver
        return spark.createDataFrame(
            [(cid, vec) for cid, vec in sorted(cents.items())],
            "cid long, centroid array<double>",
        )
    if train_sample_size is not None:
        # the one full-corpus pass: map-side assignment against the
        # FINAL trained centroids (what an index build does after
        # training) — n_members counts the whole corpus, not the sample
        size_frame, size_cents = base, cents
    else:
        # unchanged contract: n_members reflects the assignment under
        # the PENULTIMATE centroids (the assignment that produced the
        # final means), exactly as the DataFrame formulation reported
        size_frame, size_cents = train, prev_cents
    # Collect the ≤k (cid, n_members) rows and assemble the result as a
    # LOCAL relation. Broadcasting `sizes` instead would build the
    # broadcast relation from its full-corpus assignment subtree through
    # the driver broadcast path — the same trap the ivf_topk probe fix
    # avoids (see _with_best_centroid_literal). This way the corpus pass
    # runs once as a normal job and only k counter rows cross the wire.
    size_rows = dict(
        _with_best_centroid_driver(size_frame, size_cents, assign_path)
        .select(F.col("best.cid").alias("cid"))
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .collect()
    )
    return spark.createDataFrame(
        [
            (cid, int(size_rows.get(cid, 0)), vec)
            for cid, vec in sorted(cents.items())
        ],
        "cid long, n_members long, centroid array<double>",
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|, each
    component mapped to floor(x * 127 / scale + 0.5) ∈ [-127, 127].
    The storage-scale path for 100 TB embedding corpora — 4x smaller
    than float32 (16x vs float64), and int8 dot products vectorize on
    every SIMD ISA. ``floor(x + 0.5)`` instead of ``round`` because
    half-way rounding direction on binary doubles is engine-dependent;
    floor of the identical double is not.

    Pure map-side projection (zip-free: one transform per vector);
    degenerate all-zero vectors quantize to zeros with scale 0.
    """
    # Materialize the scale as a column BEFORE the transform lambda: an
    # aggregate() nested inside the lambda body would re-reduce the
    # whole vector once per element (O(d²) per row).
    staged = df.select(
        F.col(id_col), F.expr(_as_double(vec_col)).alias("v")
    ).withColumn(
        "_scale",
        F.expr(
            "aggregate(v, cast(0.0 AS double), (acc, x) -> greatest(acc, abs(x)))"
        ),
    )
    q = (
        "transform(v, x -> CASE WHEN _scale = 0.0 THEN 0 "
        "ELSE cast(floor(x * 127.0 / _scale + 0.5) AS int) END)"
    )
    return staged.select(
        F.col(id_col),
        F.round(F.col("_scale"), 6).alias("scale"),
        F.expr(q).alias("q"),
    )


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = COSINE_MAX_BUCKET,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked.

    Candidates are restricted to vectors sharing a hyperplane bucket
    (same planes as ``lsh_bucketed_topk``); pair generation is a
    BUCKET-KEYED SELF-EQUI-JOIN — codegen'd hash join, fan-out bounded
    per bucket, AQE splits skewed buckets — the same shape as
    dedup.minhash_lsh_pairs. (The previous formulation collect_list'd
    each whole bucket into ONE row and expanded pairs with an
    interpreted in-row transform×slice lambda: a hot bucket of
    near-constant embeddings became a single multi-GB array row
    processed serially — the last whole-bucket-in-a-row shape in the
    repo, retired per VERDICT r6 item 1.)

    ``max_bucket`` is the 100 TB safety valve: buckets holding more
    than this many vectors are dropped BEFORE the self-join (b² pairs
    of boilerplate identify nothing). The size count and the
    semi-filter ride the same bucket-keyed exchange as the join itself.
    Mirrored bit-for-bit in the DuckDB oracle (registry_text.py), which
    applies the identical HAVING cutoff. Each vector lands in exactly
    one bucket, so no distinct is needed after the join.
    """
    # `n2` (the squared norm) is computed ONCE per vector below the
    # pair join (the same r11 semdedup hoist, applied here in r12):
    # each of the quadratically-many pairs then evaluates one
    # interpreted dot product instead of three — sqrt(n2_a * n2_b)
    # multiplies the identical doubles cosine_expr would, so cosines
    # are bit-identical. The hoisted norm crosses the bucket shuffle as
    # 8 bytes/row.
    base = df.select(
        F.col(id_col), F.expr(_as_double(vec_col)).alias("v")
    ).withColumn("bucket", F.expr(bucket_expr("v"))).withColumn(
        "_n2", F.expr(DOT.format(a="v", b="v"))
    )
    base = base.repartition(_parallelism(base.sparkSession), "bucket")
    if max_bucket is not None:
        small = (
            base.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") <= max_bucket)
            .select("bucket")
        )
        base = base.join(small, "bucket", "left_semi")
    a = base.select(
        "bucket",
        F.col(id_col).alias("vec_a"),
        F.col("v").alias("_va"),
        F.col("_n2").alias("_n2a"),
    )
    b = base.select(
        "bucket",
        F.col(id_col).alias("vec_b"),
        F.col("v").alias("_vb"),
        F.col("_n2").alias("_n2b"),
    )
    cos = (
        f"try_divide({DOT.format(a='_va', b='_vb')}, "
        "sqrt(_n2a * _n2b))"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(F.expr(cos), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


SEMDEDUP_THRESHOLD = 0.3


def semdedup(
    df: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    threshold: float = SEMDEDUP_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample_size: int | None = None,
    max_cluster: int | None = None,
    assign_path: str | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication via k-means blocking — cluster the embedding corpus
    with a TRAINED quantizer, then prune, within each cluster, every
    member of a near-duplicate pair that sits CLOSER to the cluster
    centroid (the paper's diversity-keeping rule: the kept extreme of
    a duplicate neighborhood is its least-typical member). Returns the
    per-cluster prune summary ``(cid, n_vectors, n_pruned, n_kept)``.

    Composition of this repo's existing primitives, in the paper's
    exact shape: :func:`kmeans_train` (fixed-size content-addressed
    sample, driver-side Lloyd) provides the blocks; assignment is the
    same map-side literal-centroid argmax as the trained-IVF path
    (zero corpus shuffles); pair generation is a cid-keyed
    SELF-EQUI-JOIN — identical physical shape to
    :func:`cosine_dup_pairs`, but blocked by the trained quantizer
    instead of random hyperplanes, which is what lets the paper run at
    web scale: candidates are confined to semantically-coherent cells.

    Determinism note (vs the paper): the paper prunes greedily inside
    each duplicate neighborhood; this operator prunes any vector that
    loses at least one pairwise contest (higher centroid-cosine loses;
    ties prune the higher id). Set-valued and order-free, hence
    engine/partitioning-independent and oracle-replayable; it agrees
    with the greedy rule on mutually-similar duplicate groups.

    Scale shape: the within-cluster join's fan-out is Σ|cluster|² —
    the paper's dial is k (they train k=50k on LAION so n/k stays
    bounded); ``max_cluster`` is the same safety valve as
    ``cosine_dup_pairs``'s ``max_bucket`` — clusters above the cap are
    dropped before the self-join. At 100 TB the ``assigned`` relation
    (this plan re-derives it per branch — scan-local projection) would
    persist once as the cid-partitioned index table the IVF path
    already maintains, making each branch a pruned partition scan."""
    base = df.select(F.col(id_col), F.expr(_as_double(vec_col)).alias("v"))
    cents = kmeans_train(
        df, n_centroids=n_centroids, n_iters=n_iters, id_col=id_col,
        vec_col=vec_col, train_sample_size=train_sample_size,
        include_sizes=False, assign_path=assign_path,
    )
    cdict = {
        int(r[0]): (None if r[1] is None else list(r[1]))
        for r in cents.collect()
    }
    if not cdict:
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "cid long, n_vectors long, n_pruned long, n_kept long"
        )
    # The assignment feeds THREE consumers (both self-join branches and
    # the summary); the argmax transform is an interpreted HOF, so
    # re-deriving it per branch triples the most expensive projection.
    # pin() materializes it once — which is also the production shape:
    # at scale `assigned` IS the persisted cid-partitioned index table.
    # `n2` (the squared norm) rides along so each PAIR evaluates one
    # interpreted dot product instead of three: cos(a,b) =
    # try_divide(dot(a,b), sqrt(n2_a * n2_b)) multiplies the identical
    # doubles cosine_expr would — bit-identical result, 3x less HOF
    # work on the quadratic term.
    assigned = pin(
        _with_best_centroid_driver(base, cdict, assign_path).select(
            id_col,
            "v",
            F.expr(DOT.format(a="v", b="v")).alias("n2"),
            F.col("best.cid").alias("cid"),
            F.col("best.ccos").alias("ccos"),
        ),
        eager=False,
    )
    pairable = assigned
    if max_cluster is not None:
        small = (
            assigned.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("_csz"))
            .filter(F.col("_csz") <= max_cluster)
            .select("cid")
        )
        pairable = assigned.join(small, "cid", "left_semi")
    a = pairable.select(
        "cid",
        F.col(id_col).alias("_ia"),
        F.col("v").alias("_va"),
        F.col("n2").alias("_n2a"),
        F.col("ccos").alias("_ca"),
    )
    b = pairable.select(
        "cid",
        F.col(id_col).alias("_ib"),
        F.col("v").alias("_vb"),
        F.col("n2").alias("_n2b"),
        F.col("ccos").alias("_cb"),
    )
    loser = F.when(
        (F.col("_ca") > F.col("_cb"))
        | ((F.col("_ca") == F.col("_cb")) & (F.col("_ia") > F.col("_ib"))),
        F.col("_ia"),
    ).otherwise(F.col("_ib"))
    pruned = (
        a.join(b, "cid")
        .filter(F.col("_ia") < F.col("_ib"))
        .filter(
            F.round(
                F.expr(
                    f"try_divide({DOT.format(a='_va', b='_vb')}, "
                    f"sqrt(_n2a * _n2b))"
                ),
                6,
            )
            >= threshold
        )
        .select(loser.alias(id_col))
        .distinct()
        .withColumn("_pruned", F.lit(1))
    )
    return (
        assigned.join(pruned, id_col, "left")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.count("_pruned").alias("n_pruned"),
        )
        .withColumn("n_kept", F.col("n_vectors") - F.col("n_pruned"))
    )


def batch_cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for a BATCH of query vectors at once — the
    realistic retrieval shape (a request batch, an eval set) instead of
    one query per job.

    The Q query vectors are broadcast; scoring is map-side over one
    corpus scan (Q x N skinny score rows, never materialized wide). The
    per-query top-k runs in TWO window stages: stage 1 takes a local
    top-k within each (query, input-partition) slice — after it at most
    Q x P x k rows survive — and stage 2 reduces those to the global
    per-query top-k. Selection under a total order (cosine desc, id
    asc) commutes with this two-phase cut, so the result is exact while
    the per-query partitions stage 2 sorts are k x P rows, not N: the
    single-window formulation would funnel the whole corpus into Q
    partitions (the classic top-k skew bottleneck at 100 TB).
    """
    # self-dots hoisted to both sides of the Q x N score (r12): each
    # corpus row computes its norm once (not once per query) and each
    # broadcast query row carries its own — per (row, query) work drops
    # from 3 interpreted dots to 1 dot + multiply + sqrt, bit-identical
    # (sqrt(vn * qn) multiplies the same doubles cosine_expr would).
    base = df.withColumn("v", F.expr(_as_double(vec_col))).withColumn(
        "_vn", F.expr(DOT.format(a="v", b="v"))
    )
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("_vn").alias("_qn"),
    )
    cos = (
        f"try_divide({DOT.format(a='v', b='qv')}, "
        "sqrt(_vn * _qn))"
    )
    scored = (
        # exclude only each query's SELF pair — excluding every query
        # id from every candidate set silently hid mutually-near
        # queries from each other's top-k, diverging from the
        # per-query brute_force_cosine_topk contract
        base.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col),
            F.round(F.expr(cos), 6).alias("cosine"),
            F.spark_partition_id().alias("_pid"),
        )
    )
    order = [F.col("cosine").desc(), F.col(id_col).asc()]
    w_local = Window.partitionBy("query_id", "_pid").orderBy(*order)
    local = (
        scored.withColumn("_rn", F.row_number().over(w_local))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_pid")
    )
    w_global = Window.partitionBy("query_id").orderBy(*order)
    return (
        local.withColumn("rank", F.row_number().over(w_global))
        .filter(F.col("rank") <= k)
    )


def dimension_stats(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension distribution stats over an embedding column
    (count/mean/std/min/max) — the whitening / normalization / dead-unit
    diagnostic pass run before indexing a corpus (a dimension with
    near-zero variance is wasted index bits; a shifted mean breaks
    inner-product shortcuts).

    posexplode is map-side (rows x dims, never wider than the vector),
    and the aggregate keys on the dimension index — cardinality = dim,
    so partial aggregation collapses everything executor-side and the
    shuffle carries |dims| rows of five doubles regardless of corpus
    size.
    """
    exploded = df.select(
        F.posexplode(F.expr(_as_double(vec_col))).alias("_pos", "val")
    ).select((F.col("_pos") + 1).cast("long").alias("dim"), "val")
    return exploded.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("val"), 6).alias("mean_val"),
        F.round(F.stddev_samp("val"), 6).alias("std_val"),
        F.round(F.min("val"), 6).alias("min_val"),
        F.round(F.max("val"), 6).alias("max_val"),
    )


def hard_negatives(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_bucket: int | None = COSINE_MAX_BUCKET,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each vector,
    the most cosine-similar vector carrying a DIFFERENT label, searched
    within its hyperplane-LSH bucket (the same index the ANN queries
    use) — near-misses make the strongest negatives, and the bucket
    restriction is exactly the "near" filter.

    The per-anchor argmax is ``max_by(struct(neighbor), struct(cosine,
    -id))`` — a decomposable aggregate with map-side partials (one
    candidate per anchor per partition crosses the shuffle), not a
    per-anchor window sort. Pair fan-out is Σ bucket²; ``max_bucket``
    is the same 100 TB safety valve as :func:`cosine_dup_pairs` /
    dedup.LSH_MAX_BUCKET — buckets above it are dropped before the
    self-join (their anchors lose their negatives — the documented
    capped contract, mirrored by the registered oracle's HAVING
    cutoff). The cap is ON by default (COSINE_MAX_BUCKET): a
    mega-bucket at corpus scale would otherwise expand quadratically,
    and near-duplicate "negatives" from a degenerate bucket are poor
    training signal anyway. Pass ``max_bucket=None`` for the exact
    uncapped search. Anchors whose bucket holds no other-label vector
    are absent (documented contract).

    .. versionchanged:: r8
        The default flipped from ``max_bucket=None`` (exact) to
        ``COSINE_MAX_BUCKET`` (capped). Direct library callers who
        relied on the exact default — every anchor guaranteed a
        negative if ANY other-label vector shares its bucket — must
        now pass ``max_bucket=None`` explicitly: under the capped
        default, anchors in buckets larger than the cap silently lose
        their negatives (intentional, oracle-mirrored; ADVICE r8).
    """
    # per-vector squared norm hoisted below the pair join (r12, same
    # bit-identical rewrite as cosine_dup_pairs): pairs evaluate one
    # dot product, not three.
    base = df.select(
        F.col(id_col), F.col(label_col), F.expr(_as_double(vec_col)).alias("v")
    ).withColumn("bucket", F.expr(bucket_expr("v"))).withColumn(
        "_n2", F.expr(DOT.format(a="v", b="v"))
    )
    if max_bucket is not None:
        small = (
            base.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") <= max_bucket)
            .select("bucket")
        )
        base = base.join(small, "bucket", "left_semi")
    a = base.select(
        "bucket",
        F.col(id_col).alias("_aid"),
        F.col(label_col).alias("_albl"),
        F.col("v").alias("_av"),
        F.col("_n2").alias("_n2a"),
    )
    b = base.select(
        "bucket",
        F.col(id_col).alias("_bid"),
        F.col(label_col).alias("_blbl"),
        F.col("v").alias("_bv"),
        F.col("_n2").alias("_n2b"),
    )
    cos = (
        f"try_divide({DOT.format(a='_av', b='_bv')}, "
        "sqrt(_n2a * _n2b))"
    )
    scored = (
        a.join(b, "bucket")
        .filter(~F.col("_albl").eqNullSafe(F.col("_blbl")))
        .select(
            "_aid",
            "_albl",
            "_bid",
            "_blbl",
            F.round(F.expr(cos), 6).alias("_cos"),
        )
    )
    best = scored.groupBy("_aid", "_albl").agg(
        F.max_by(
            F.struct(
                F.col("_bid").alias("nid"),
                F.col("_blbl").alias("nlbl"),
                F.col("_cos").alias("ncos"),
            ),
            F.struct(F.col("_cos"), -F.col("_bid")),
        ).alias("_best")
    )
    return best.select(
        F.col("_aid").alias(id_col),
        F.col("_albl").alias(label_col),
        F.col("_best.nid").alias("hard_neg_id"),
        F.col("_best.nlbl").alias("hard_neg_label"),
        F.col("_best.ncos").alias("cosine"),
    )


def dimension_correlations(
    df: DataFrame,
    vec_col: str = "embedding",
    n_dims: int = 8,
) -> DataFrame:
    """Pairwise Pearson correlation between the first ``n_dims``
    embedding dimensions — the redundancy screen that motivates
    whitening or PCA before indexing (highly correlated dimensions
    waste index capacity; post-whitening this matrix should be ~0).

    All C(n,2) correlations come from ONE aggregation pass (corr is a
    co-moment aggregate with map-side partials — the corpus is scanned
    once and the shuffle carries a single combined moment row), then the
    wide row unpivots to (dim_a, dim_b, corr) via a map-side stack.
    Full-matrix note: for all-dims-at-once use a Pandas-UDF Gram matrix
    instead; the per-pair aggregate form is for the targeted screen.
    """
    e = F.expr(_as_double(vec_col))
    base = df.select(
        *[F.element_at(e, i).alias(f"_d{i}") for i in range(1, n_dims + 1)]
    )
    pairs = [
        (i, j)
        for i in range(1, n_dims + 1)
        for j in range(i + 1, n_dims + 1)
    ]
    agg = base.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.round(_safe_corr(f"_d{i}", f"_d{j}"), 6).alias(f"_c_{i}_{j}")
            for i, j in pairs
        ],
    )
    stack = ", ".join(f"{i}, {j}, _c_{i}_{j}" for i, j in pairs)
    return agg.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (dim_a, dim_b, corr)", "_n AS n"
    )


def standardized_norms(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Whitening APPLY step: standardize each dimension by the corpus
    mean/std (z = (x−μ_d)/σ_d, dead dimensions → 0) and report each
    vector's standardized L2 norm and max |z| — the outlier-vector
    screen (a corrupt or out-of-distribution embedding shows up as an
    extreme standardized norm even when its raw norm looks normal).

    The per-dimension stats come from :func:`dimension_stats` (its
    ROUNDED outputs are the contract — already proven bit-identical
    across engines), collapsed into two broadcast arrays; the apply is
    a map-side indexed ``transform`` over each vector. One stats
    aggregate + one scan — no shuffle of vectors.
    """
    stats = dimension_stats(df, vec_col=vec_col)
    arrs = stats.agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "mean_val", "std_val"))
        ).alias("_a")
    ).select(
        F.expr("transform(_a, x -> x.mean_val)").alias("_mu"),
        F.expr("transform(_a, x -> x.std_val)").alias("_sd"),
    )
    z = (
        "transform({v}, (x, i) -> CASE WHEN element_at(_sd, i + 1) > 0 "
        "THEN (x - element_at(_mu, i + 1)) / element_at(_sd, i + 1) "
        "ELSE cast(0.0 AS double) END)"
    ).format(v=_as_double(vec_col))
    zn = DOT.format(a="_z", b="_z")
    return (
        df.crossJoin(F.broadcast(arrs))
        .withColumn("_z", F.expr(z))
        .select(
            F.col(id_col),
            F.round(F.sqrt(F.expr(zn)), 4).alias("z_norm"),
            F.round(
                F.expr("array_max(transform(_z, x -> abs(x)))"), 4
            ).alias("max_abs_z"),
        )
    )


PQ_M = 8          # subspaces
PQ_K = 16         # codebook entries per subspace
PQ_SUBDIM = DIM // PQ_M


def _pq_codebook(base: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(j, cid, subc): the deterministic per-subspace PQ codebook — the
    PQ_K lowest-id vectors' subvectors (seed_centroids discipline, no
    RNG, dense 0-based cids on ANY corpus). ONE definition shared by
    :func:`pq_encode` and :func:`pq_adc_topk` so encode and the ADC
    distance table can never be built from different codebooks. M x K
    rows — always broadcast-sized."""
    return (
        seed_centroids(base, PQ_K, id_col)
        .select(
            "cid",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("j"),
            F.col("cv").alias("v"),
        )
        .select(
            "j",
            "cid",
            F.expr(f"slice(v, j * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias(
                "subc"
            ),
        )
    )


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product Quantization encode (Jégou et al. 2011 — the FAISS
    storage standard): split each vector into ``PQ_M`` subvectors and
    replace each with the id of its nearest codebook entry — 64 floats
    become 8 small codes (32x compression at these settings), with the
    reconstruction error reported per vector.

    Codebooks are deterministic (the PQ_K lowest-id vectors' subvectors
    — the same no-RNG discipline as ivf_topk; swap in k-means codebooks
    at production scale without touching the assignment). The
    assignment is relational: vectors cross the broadcast
    (subspace, centroid, subvector) table — M x K rows — and a
    decomposable ``min_by`` picks each subspace's code; codes reassemble
    with a sorted-struct collect bounded by M. Nothing but the
    |vectors| x M skinny code rows ever shuffles.
    """
    base = df.withColumn("v", F.expr(_as_double(vec_col)))
    cb = _pq_codebook(base, id_col)
    vj = base.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("j"),
        "v",
    ).select(
        id_col,
        "j",
        F.expr(f"slice(v, j * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("subv"),
    )
    dist = F.expr(
        "aggregate(zip_with(subv, subc, (x, y) -> (x - y) * (x - y)),"
        " cast(0.0 AS double), (acc, d) -> acc + d)"
    )
    scored = vj.join(F.broadcast(cb), "j").select(
        id_col, "j", F.col("cid"), dist.alias("_d")
    )
    per_sub = scored.groupBy(id_col, "j").agg(
        F.min_by(F.col("cid"), F.struct(F.col("_d"), F.col("cid"))).alias(
            "code"
        ),
        F.min("_d").alias("_dmin"),
    )
    return per_sub.groupBy(id_col).agg(
        F.expr(
            "transform(sort_array(collect_list(struct(j, code))),"
            " x -> x.code)"
        ).alias("codes"),
        F.round(F.sqrt(F.sum("_dmin")), 6).alias("recon_err"),
    )


def pq_adc_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric Distance Computation over PQ codes — why PQ exists:
    the query stays full-precision, each corpus vector is its 8 codes,
    and the approximate squared-L2 distance is a sum of 8 LOOKUPS into
    the query's per-subspace distance table (M x K = 128 numbers,
    broadcast). At 100 TB the corpus never rematerializes floats: the
    scan reads 8 bytes of codes per vector; compute is table lookups.

    Here the code rows come from :func:`pq_encode` (deterministic
    codebooks); the LUT join keys on (subspace, code) and the top-k is
    the per-query TakeOrdered. Approximate by construction — recall
    against exact cosine is the quantization dial (raise PQ_K / train
    real codebooks).
    """
    base = df.withColumn("v", F.expr(_as_double(vec_col)))
    codes = pq_encode(df, id_col, vec_col).select(
        F.col(id_col),
        F.posexplode("codes").alias("j", "code"),
    )
    q = base.filter(F.col(id_col) == query_id).select(
        F.col("v").alias("qv")
    )
    cb = (
        # the SAME codebook definition pq_encode used (shared helper)
        _pq_codebook(base, id_col)
        .crossJoin(F.broadcast(q))
        .select(
            "j",
            F.col("cid").alias("code"),
            F.expr(
                "aggregate(zip_with(subc,"
                f" slice(qv, j * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
                " (x, y) -> (x - y) * (x - y)),"
                " cast(0.0 AS double), (acc, d) -> acc + d)"
            ).alias("_lut"),
        )
    )
    scored = (
        codes.join(F.broadcast(cb), ["j", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sqrt(F.sum("_lut")), 6).alias("adc_dist"))
        .filter(F.col(id_col) != query_id)
    )
    return scored.orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    ).limit(k)


def ivfpq_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the production ANN composition (Jégou et al. 2011;
    the FAISS ``IVFx,PQy`` index family) — IVF coarse quantization
    prunes the search to the query's ``nprobe`` inverted lists, then
    Asymmetric Distance Computation scores ONLY those lists' PQ codes
    against the query's per-subspace lookup table. This repo's two
    registered halves (``ivf_topk``'s assignment/probe,
    ``pq_adc_topk``'s LUT scoring) composed the way an index actually
    serves queries.

    Deterministic end to end (seed centroids for both quantizers, the
    no-RNG discipline), so the DuckDB oracle splices the two registered
    CTE chains verbatim. Returns ``(id, cid, adc_dist)`` — top-k by
    approximate L2 ascending.

    Scale shape — what each piece costs at 100 TB:

    - assignment: map-side broadcast argmax, zero corpus shuffles
      (ivf_topk's shape); at rest ``cid`` is the partition column.
    - codes: 8 B/vector, encoded once at ingest (pq_encode); here the
      encode runs in-plan because the fixture has no persisted index.
    - the probe semi-join keys on cid: on a cid-partitioned code table
      this is partition PRUNING — the scan reads nprobe/n_centroids of
      the codes and never touches a float.
    - ADC: per candidate, M=8 lookups into the broadcast M x K LUT.
    """
    base = df.withColumn("v", F.expr(_as_double(vec_col)))
    cents = seed_centroids(base, n_centroids, id_col)
    with_best, scores = _with_best_centroid(base, cents)
    assigned = with_best.select(id_col, F.col("best.cid").alias("cid"))
    qprobe = (
        with_best.filter(F.col(id_col) == query_id)
        .select(F.explode(F.expr(scores)).alias("s"))
        .orderBy(F.col("s.ccos").desc(), F.col("s.cid").asc())
        .limit(nprobe)
        .select(F.col("s.cid").alias("pcid"))
    )
    # candidate code rows: the probed lists only — the pruning that
    # makes IVF-PQ sublinear (everything downstream is |probed| sized)
    cand = (
        pq_encode(df, id_col, vec_col)
        .join(assigned, id_col)
        .join(F.broadcast(qprobe), F.col("cid") == F.col("pcid"), "left_semi")
        .select(id_col, "cid", F.posexplode("codes").alias("j", "code"))
    )
    q = base.filter(F.col(id_col) == query_id).select(F.col("v").alias("qv"))
    lut = (
        _pq_codebook(base, id_col)
        .crossJoin(F.broadcast(q))
        .select(
            "j",
            F.col("cid").alias("code"),
            F.expr(
                "aggregate(zip_with(subc,"
                f" slice(qv, j * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
                " (x, y) -> (x - y) * (x - y)),"
                " cast(0.0 AS double), (acc, d) -> acc + d)"
            ).alias("_lut"),
        )
    )
    return (
        cand.join(F.broadcast(lut), ["j", "code"])
        .groupBy(id_col, "cid")
        .agg(F.round(F.sqrt(F.sum("_lut")), 6).alias("adc_dist"))
        .filter(F.col(id_col) != query_id)
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )

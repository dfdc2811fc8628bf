"""Graph analytics over candidate-pair graphs (the structures dedup
emits): PageRank-style centrality. Companion to dedup.dup_clusters
(connected components) — clusters say WHICH documents are tied
together, centrality says which node is the most-linked representative.

Scale shape per iteration: one equi-join of the edge list against the
current rank vector (both keyed on the node id — the join reuses one
hash partitioning across iterations) + one map-side-combinable sum
aggregate. Lineage is truncated per iteration (cache_scope.pin:
localCheckpoint locally, reliable checkpoint() when a checkpoint dir
is set; use
reliable checkpoints on durable storage at cluster scale, same note as
dup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.operators.cache_scope import (
    materialize_consistent as _consistent,
    pin,
)


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank (simplified: dangling mass leaks, the
    standard edge-list formulation). ``edges`` is directed (src, dst);
    pass both directions for an undirected pair graph.

    Deterministic given (graph, iterations): every step is
    join + sum + affine map, so an ANSI-SQL oracle can replay the exact
    iteration count (registry entry ``dup_pagerank`` does, with
    programmatically generated CTE stages).
    """
    # Pin the edge list and degrees ONCE: edges usually arrive as an
    # expensive pipeline (LSH pair generation) that must not re-execute
    # on every iteration's lazy re-evaluation.
    edges = edges.transform(pin)
    n1 = nodes.agg(F.count(F.lit(1)).alias("_n"))
    base = nodes.select(F.col(id_col).alias("v")).crossJoin(F.broadcast(n1))
    ranks = base.select("v", (F.lit(1.0) / F.col("_n")).alias("r"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).transform(pin)

    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges.src == ranks.v)
            .join(outdeg, "src")
            .select(F.col("dst").alias("v"), (F.col("r") / F.col("d")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            base.join(contrib, "v", "left")
            .select(
                "v",
                (
                    (1.0 - damping) / F.col("_n")
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("r"),
            )
            .transform(pin)
        )
    return ranks.select(
        F.col("v").alias(id_col),
        # guard-digit rounding (ADVICE r9): round at 9 dp first, then
        # 6 — engine and oracle sums differ in the last ulp, and a
        # single 6-dp round flips whenever that ulp straddles a 6-dp
        # boundary; the 9-dp pre-round collapses both sides to the
        # same double except in the ~1000x rarer case where a 9-dp
        # boundary is itself a 6-dp midpoint. Oracle mirrors.
        F.round(F.round("r", 9), 6).alias("rank"),
    )


def triangle_participation(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected candidate-pair graph
    (edges canonical ``doc_a < doc_b``) — the clustering-density
    diagnostic for a near-dup graph: high triangle counts mean tight
    dup cliques (template spam), zero means chains of borderline pairs.

    Standard two-join wedge closure entirely on the canonical
    orientation: each triangle a<b<c is found exactly once as
    (a,b)+(b,c)+(a,c), so no global dedup pass is needed. Both joins
    are equi-joins on node ids; fan-out is bounded by the pair
    generator's bucket caps upstream (dedup.minhash_lsh_pairs
    max_bucket), which is what makes wedge counting tractable at scale.
    Per-node counts come from exploding each triangle's three corners —
    a constant 3x of the (small) triangle set, not of the edges.

    The edge list is pinned once (cache_scope.pin, same note as
    pagerank): it is referenced three times by the closure joins, and
    edges usually arrive as an expensive LSH pipeline that must not
    re-execute per reference (measured 12 redundant scans otherwise).
    """
    edges = edges.transform(pin)
    e = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.b") == F.col("bc.a"))
        .join(
            ac,
            (F.col("ac.a") == F.col("ab.a")) & (F.col("ac.b") == F.col("bc.b")),
        )
        .select(
            F.col("ab.a").alias("x"),
            F.col("ab.b").alias("y"),
            F.col("bc.b").alias("z"),
        )
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def blowup_pagerank(
    member_map: DataFrame,
    group_edges: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "_fp",
    a_col: str = "ga",
    b_col: str = "gb",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a BLOWN-UP graph, iterated on the quotient: docs
    in one exact-text group are structurally symmetric (same
    neighborhood: s_g−1 co-members + every member of each neighbor
    group) and start from the same 1/N, so their ranks stay equal
    through every iteration. The per-group recurrence with
    d_g = (s_g−1) + Σ_{h∈N(g)} s_h (each member's doc-level degree):

        r_g ← (1−damping)/N + damping·[(s_g−1)·r_g/d_g
                                       + Σ_{h∈N(g)} s_h·r_h/d_h]

    reproduces :func:`pagerank` on the expanded symmetrized pair list
    (same fixed iteration count, same dangling-mass simplification;
    agreement is exact up to float summation order, absorbed by the
    6-decimal output rounding — hypothesis-pinned). Every iteration
    frame is group- or group-edge-sized; the corpus appears only in
    the group pass and the final output-sized expansion."""
    sizes = _consistent(
        member_map.groupBy(group_col).agg(F.count(F.lit(1)).alias("_s"))
    )
    n1 = member_map.agg(F.count(F.lit(1)).alias("_n"))
    # Enforce the edge contract (each unordered pair once, no self
    # loops) rather than assuming it: a duplicate or (a,b)/(b,a) double
    # edge would silently double-count inflow / _deg_sum / triangles,
    # and `e` is group-edge-sized so the distinct costs ~nothing
    # (ADVICE r9).
    e = group_edges.select(
        F.least(a_col, b_col).alias("_a"), F.greatest(a_col, b_col).alias("_b")
    ).filter(F.col("_a") != F.col("_b")).distinct()
    es = _consistent(
        e.join(
            sizes.select(F.col(group_col).alias("_a"), F.col("_s").alias("_sa")),
            "_a",
        ).join(
            sizes.select(F.col(group_col).alias("_b"), F.col("_s").alias("_sb")),
            "_b",
        )
    )
    nbr = (
        es.select(F.col("_a").alias("_g"), F.col("_sb").alias("_hs"))
        .unionByName(es.select(F.col("_b").alias("_g"), F.col("_sa").alias("_hs")))
        .groupBy("_g")
        .agg(F.sum("_hs").alias("_nbr_sz"))
    )
    base = _consistent(
        sizes.join(nbr, sizes[group_col] == nbr["_g"], "left")
        .drop("_g")
        .select(
            group_col,
            "_s",
            (F.col("_s") - 1 + F.coalesce(F.col("_nbr_sz"), F.lit(0))).alias(
                "_d"
            ),
        )
        .crossJoin(F.broadcast(n1))
    )
    ranks = base.select(
        group_col, (F.lit(1.0) / F.col("_n")).alias("_r")
    )
    for _ in range(iterations):
        rd = base.join(ranks, group_col).select(
            group_col,
            "_s",
            "_d",
            "_n",
            "_r",
            F.when(F.col("_d") > 0, F.col("_r") / F.col("_d"))
            .otherwise(F.lit(0.0))
            .alias("_rd"),
        )
        j = es.join(
            rd.select(F.col(group_col).alias("_a"), F.col("_rd").alias("_rda")),
            "_a",
        ).join(
            rd.select(F.col(group_col).alias("_b"), F.col("_rd").alias("_rdb")),
            "_b",
        )
        inflow = (
            j.select(
                F.col("_a").alias("_g"), (F.col("_sb") * F.col("_rdb")).alias("_c")
            )
            .unionByName(
                j.select(
                    F.col("_b").alias("_g"),
                    (F.col("_sa") * F.col("_rda")).alias("_c"),
                )
            )
            .groupBy("_g")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            rd.join(inflow, rd[group_col] == inflow["_g"], "left")
            .drop("_g")
            .select(
                group_col,
                (
                    (1.0 - damping) / F.col("_n")
                    + damping
                    * (
                        (F.col("_s") - 1) * F.col("_rd")
                        + F.coalesce(F.col("_in"), F.lit(0.0))
                    )
                ).alias("_r"),
            )
            .transform(pin)
        )
    return member_map.join(ranks, group_col).select(
        # guard-digit rounding, mirrored by the oracle (see pagerank)
        F.col(id_col), F.round(F.round("_r", 9), 6).alias("rank")
    )


def blowup_triangle_participation(
    member_map: DataFrame,
    group_edges: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "_fp",
    a_col: str = "ga",
    b_col: str = "gb",
) -> DataFrame:
    """Per-node triangle counts over a BLOWN-UP graph, computed on the
    quotient: the doc-level near-dup graph produced by a text-pure pair
    generator is exactly the blow-up of its exact-text-group graph
    (every within-group doc pair is an edge — identical texts always
    match — and cross-group edges are all-or-none, since the verdict
    depends only on the two texts). So per-doc triangle counts have a
    closed form over the group graph: for a doc in group g with size
    s_g, neighbor groups N(g), and group-level triangles T(g),

        tri(doc) = C(s_g−1, 2)                       # two co-members
                 + (s_g−1) · Σ_{h∈N(g)} s_h          # co-member + neighbor
                 + Σ_{h∈N(g)} C(s_h, 2)              # two in one neighbor
                 + Σ_{(h1,h2)∈T(g)} s_h1 · s_h2      # two adjacent neighbors

    where T(g) ranges over group-graph triangles containing g. Every
    frame here is group- or group-edge-sized except the final member
    expansion, which is output-sized — the doc-level wedge closure
    (|clique|³ work on copy-heavy corpora) never materializes.
    Equals :func:`triangle_participation` on the expanded pair list
    (hypothesis-pinned in tests/test_properties.py).

    ``member_map``: (group_col, id_col) rows, one per doc.
    ``group_edges``: distinct unordered group pairs (a_col, b_col),
    endpoints ≠, each pair once (any orientation)."""
    sizes = _consistent(
        member_map.groupBy(group_col).agg(F.count(F.lit(1)).alias("_s"))
    )
    # Enforce the edge contract (each unordered pair once, no self
    # loops) rather than assuming it: a duplicate or (a,b)/(b,a) double
    # edge would silently double-count inflow / _deg_sum / triangles,
    # and `e` is group-edge-sized so the distinct costs ~nothing
    # (ADVICE r9).
    e = group_edges.select(
        F.least(a_col, b_col).alias("_a"), F.greatest(a_col, b_col).alias("_b")
    ).filter(F.col("_a") != F.col("_b")).distinct()
    es = _consistent(
        e.join(
            sizes.select(F.col(group_col).alias("_a"), F.col("_s").alias("_sa")),
            "_a",
        ).join(
            sizes.select(F.col(group_col).alias("_b"), F.col("_s").alias("_sb")),
            "_b",
        )
    )
    # Per-group neighbor aggregates (both directions of each edge).
    nbr = (
        es.select(F.col("_a").alias("_g"), F.col("_sb").alias("_hs"))
        .unionByName(es.select(F.col("_b").alias("_g"), F.col("_sa").alias("_hs")))
        .groupBy("_g")
        .agg(
            F.sum("_hs").alias("_deg_sum"),
            F.sum(F.expr("_hs * (_hs - 1) div 2")).alias("_nbr_pairs"),
        )
    )
    # Weighted group-graph triangles: canonical wedge closure (as in
    # triangle_participation), each triangle credits every corner with
    # the product of the OTHER two corners' sizes.
    ab, bc, ac = es.alias("ab"), es.alias("bc"), es.alias("ac")
    tri = (
        ab.join(bc, F.col("ab._b") == F.col("bc._a"))
        .join(
            ac,
            (F.col("ac._a") == F.col("ab._a"))
            & (F.col("ac._b") == F.col("bc._b")),
        )
        .select(
            F.col("ab._a").alias("_x"),
            F.col("ab._b").alias("_y"),
            F.col("bc._b").alias("_z"),
            F.col("ab._sa").alias("_sx"),
            F.col("ab._sb").alias("_sy"),
            F.col("bc._sb").alias("_sz"),
        )
    )
    t4 = (
        tri.select(F.col("_x").alias("_g"), (F.col("_sy") * F.col("_sz")).alias("_w"))
        .unionByName(
            tri.select(F.col("_y").alias("_g"), (F.col("_sx") * F.col("_sz")).alias("_w"))
        )
        .unionByName(
            tri.select(F.col("_z").alias("_g"), (F.col("_sx") * F.col("_sy")).alias("_w"))
        )
        .groupBy("_g")
        .agg(F.sum("_w").alias("_t4"))
    )
    per_group = (
        sizes.join(nbr, sizes[group_col] == nbr["_g"], "left")
        .drop("_g")
        .join(t4, sizes[group_col] == t4["_g"], "left")
        .drop("_g")
        .select(
            F.col(group_col),
            (
                F.expr("(_s - 1) * (_s - 2) div 2")
                + (F.col("_s") - 1) * F.coalesce(F.col("_deg_sum"), F.lit(0))
                + F.coalesce(F.col("_nbr_pairs"), F.lit(0))
                + F.coalesce(F.col("_t4"), F.lit(0))
            ).cast("bigint").alias("n_triangles"),
        )
        .filter(F.col("n_triangles") > 0)
    )
    return member_map.join(per_group, group_col).select(id_col, "n_triangles")


def blowup_degree_histogram(
    member_map: DataFrame,
    group_edges: DataFrame,
    group_col: str = "_fp",
    a_col: str = "ga",
    b_col: str = "gb",
) -> DataFrame:
    """log2-bucketed DOC-degree histogram over a BLOWN-UP graph,
    computed on the quotient (r13 — the last graph consumer still
    running on the doc-level pair list): every doc in group g has the
    same degree, with the closed form

        deg(doc in g) = (s_g − 1) + Σ_{h∈N(g)} s_h

    (co-members always pair — identical texts share every band — and
    cross-group edges are all-or-none), so the histogram is a
    group-sized aggregate: bucket each group's degree, weight by s_g.
    Docs with degree 0 (singleton group, no neighbors) are absent,
    exactly as they are absent from the pair-list explode. Equals the
    explode+count histogram over the expanded pair list
    (hypothesis-pinned in tests/test_properties.py)."""
    sizes = member_map.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_s")
    )
    e = group_edges.select(
        F.least(a_col, b_col).alias("_a"), F.greatest(a_col, b_col).alias("_b")
    ).filter(F.col("_a") != F.col("_b")).distinct()
    es = _consistent(
        e.join(
            sizes.select(F.col(group_col).alias("_a"), F.col("_s").alias("_sa")),
            "_a",
        ).join(
            sizes.select(F.col(group_col).alias("_b"), F.col("_s").alias("_sb")),
            "_b",
        )
    )
    nbr = (
        es.select(F.col("_a").alias("_g"), F.col("_sb").alias("_hs"))
        .unionByName(es.select(F.col("_b").alias("_g"), F.col("_sa").alias("_hs")))
        .groupBy("_g")
        .agg(F.sum("_hs").alias("_deg_sum"))
    )
    per_group = (
        sizes.join(nbr, sizes[group_col] == nbr["_g"], "left")
        .drop("_g")
        .select(
            "_s",
            (
                F.col("_s") - 1 + F.coalesce(F.col("_deg_sum"), F.lit(0))
            ).cast("bigint").alias("_deg"),
        )
        .filter(F.col("_deg") > 0)
    )
    bucket = F.floor(F.log2("_deg")).cast("int")
    return (
        per_group.groupBy(bucket.alias("log2_degree"))
        .agg(
            F.sum("_s").alias("n_docs"),
            F.max("_deg").alias("max_degree"),
        )
    )


def k_hop_reach(
    pairs: DataFrame,
    hops: int = 3,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Per-node count of distinct nodes within ≤ ``hops`` undirected
    hops — iterative frontier BFS with SET semantics.

    Why not a recursive CTE? UNION ALL recursion enumerates PATHS, and
    path multiplicity is multiplicative on dense graphs: on a 500-node
    duplicate clique the depth-3 expansion is ~n·(n-1)·(n-2) ≈ 1.2e8
    rows and Spark's recursion row limit aborts the query (observed on
    the all-identical-documents stress set). The BFS expands only the
    NEW frontier each round and anti-joins what is already reached, so
    every level is bounded by the transitive closure's |reachable
    pairs| — on the same clique that is n² rows, and the expand join's
    fan-out collapses map-side in the distinct's partial aggregate.
    Each level is checkpoint-materialized (lineage would otherwise
    double per hop, and reach/frontier each feed two branches).

    Undirected edges come from ONE map-side explode of both
    directions, not a self-union: a Union whose children project the
    same source plan shares base attribute ids across children, which
    trips Catalyst's Union constraint rewriting when the frame is
    later checkpointed (NoSuchElementException on the aliased key) —
    and the explode is one pair scan instead of two anyway. The edge
    frame is materialized once for its hops+1 consumers.
    """
    reach = _k_hop_reach_pairs(pairs, hops, a_col, b_col)
    return (
        reach.filter(F.col("dst") != F.col("src"))
        .groupBy(F.col("src").alias("doc_id"))
        .agg(F.countDistinct("dst").alias("n_reachable"))
    )


def _k_hop_reach_pairs(
    pairs: DataFrame, hops: int, a_col: str, b_col: str
) -> DataFrame:
    """The BFS core of :func:`k_hop_reach`: distinct (src, dst) reach
    pairs within ≤ ``hops`` undirected hops (src=dst rows may appear;
    callers filter). Shared with the quotient-graph consumers."""
    if hops < 1:
        raise ValueError("k_hop_reach needs hops >= 1")
    ue = _consistent(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
                    ),
                    F.struct(
                        F.col(b_col).alias("src"), F.col(a_col).alias("dst")
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    )
    reach = _consistent(ue.distinct())
    frontier = reach
    for _ in range(hops - 1):
        expanded = (
            frontier.alias("r")
            .join(ue.alias("e"), F.col("r.dst") == F.col("e.src"))
            .select(F.col("r.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
        )
        frontier = _consistent(
            expanded.join(reach, ["src", "dst"], "left_anti")
        )
        reach = _consistent(reach.unionAll(frontier))
    return reach


def blowup_k_hop_reach(
    member_map: DataFrame,
    group_edges: DataFrame,
    hops: int = 3,
    id_col: str = "doc_id",
    group_col: str = "_fp",
    a_col: str = "ga",
    b_col: str = "gb",
) -> DataFrame:
    """k-hop reach counts over a BLOWN-UP graph via the quotient:
    distance between docs in DIFFERENT groups equals the group-graph
    distance (any member of an adjacent group is directly reachable),
    and co-members sit at distance 1 (identical texts always pair), so

        n_reachable(doc in g) = (s_g − 1) + Σ_{h: 0 < d_G(g,h) ≤ hops} s_h.

    The BFS runs on |distinct texts| nodes — the uncapped doc-level
    closure (clique² frontier rows on copy-heavy corpora, the r8
    failure the capped dup_reach_3hop works around) never
    materializes. Equals :func:`k_hop_reach` on the expanded pair list
    (hypothesis-pinned)."""
    if hops < 1:
        raise ValueError("blowup_k_hop_reach needs hops >= 1")
    sizes = _consistent(
        member_map.groupBy(group_col).agg(F.count(F.lit(1)).alias("_s"))
    )
    # Lazy set-closure BFS, NOT _k_hop_reach_pairs: the group graph is
    # small enough that per-level checkpoints are unnecessary — and
    # checkpointing a union of LogicalRDDs whose md5-derived keys carry
    # non-null constraints trips Catalyst's LogicalRDD constraint
    # rewrite (NoSuchElementException: key not found — reproduced on
    # Spark 4.1; the doc-level k_hop_reach avoids it only because its
    # parquet-sourced ids are nullable). One materialization of the
    # edge frame (hops+1 plan references), then a pure
    # join-union-distinct closure per hop.
    ue = _consistent(
        group_edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
                    ),
                    F.struct(
                        F.col(b_col).alias("src"), F.col(a_col).alias("dst")
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    )
    reach = ue.distinct()
    for _ in range(hops - 1):
        expanded = (
            reach.alias("r")
            .join(ue.alias("e"), F.col("r.dst") == F.col("e.src"))
            .select(F.col("r.src").alias("src"), F.col("e.dst").alias("dst"))
        )
        reach = reach.unionAll(expanded).distinct()
    cross_sum = (
        reach.filter(F.col("dst") != F.col("src"))
        .join(
            sizes.select(F.col(group_col).alias("dst"), F.col("_s").alias("_hs")),
            "dst",
        )
        .groupBy(F.col("src").alias("_g"))
        .agg(F.sum("_hs").alias("_cross"))
    )
    per_group = (
        sizes.join(cross_sum, sizes[group_col] == cross_sum["_g"], "left")
        .drop("_g")
        .select(
            group_col,
            (
                F.col("_s") - 1 + F.coalesce(F.col("_cross"), F.lit(0))
            ).cast("bigint").alias("n_reachable"),
        )
        .filter(F.col("n_reachable") > 0)
    )
    return member_map.join(per_group, group_col).select(id_col, "n_reachable")

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
    return ranks.select(F.col("v").alias(id_col), F.round("r", 6).alias("rank"))


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
    return (
        reach.filter(F.col("dst") != F.col("src"))
        .groupBy(F.col("src").alias("doc_id"))
        .agg(F.countDistinct("dst").alias("n_reachable"))
    )

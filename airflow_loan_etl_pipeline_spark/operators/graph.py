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

from airflow_loan_etl_pipeline_spark.operators.cache_scope import pin


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

"""Iterative graph algorithms as DataFrame fixpoint loops.

Reference capability (SURVEY §2.6): BFS = frontier `mxm` adjacency over
LOR_LAND (DocSpec.scala:31-53); SSSP = iterate `d ← d min.+ A` until
fixpoint, convergence via isEq (DocSpec.scala:55-101).

Scale notes:
- each iteration is one shuffle join keyed on the frontier ids; the
  frontier/visited sets are distinct-keyed DataFrames, never collected,
- ``localCheckpoint()`` every iteration truncates lineage so plan size
  stays O(1) across iterations (SURVEY §7.3),
- convergence tests are anti-join counts (limit-1), not full equality
  scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph.store import PropertyGraph


def bfs(
    graph: PropertyGraph,
    start_ids: list[int],
    max_hops: int | None = None,
    edge_types: list[str] | None = None,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Multi-source BFS: returns (id long, dist long) with the minimum hop
    count from any start node. LOR_LAND frontier push: frontier ⋈ edges →
    distinct new ids not yet visited.

    The edge set is cached once (every iteration re-joins it); the
    frontier/visited sets are broadcast while small — for whole-graph
    frontiers at cluster scale pass broadcast_frontier=False and the join
    shuffles on src."""
    spark = graph.spark
    edges = graph.typed_edges(edge_types).select("src", "dst").cache()
    visited = spark.createDataFrame([(int(s), 0) for s in start_ids], "id long, dist long")
    frontier = visited.select("id")
    bc = F.broadcast if broadcast_frontier else (lambda df: df)
    dist = 0
    try:
        while max_hops is None or dist < max_hops:
            dist += 1
            nxt = (
                bc(frontier).join(edges, frontier.id == edges.src)
                .select(F.col("dst").alias("id"))
                .dropDuplicates(["id"])
                .join(bc(visited.select("id")), on="id", how="left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.limit(1).count() == 0:
                break
            visited = visited.unionByName(nxt.withColumn("dist", F.lit(dist))).localCheckpoint(eager=True)
            frontier = nxt
    finally:
        edges.unpersist()
    return visited


def sssp(
    graph: PropertyGraph,
    start_ids: list[int],
    max_iters: int = 50,
    edge_types: list[str] | None = None,
    weight_col: str = "weight",
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Single/multi-source shortest path over the MIN_PLUS semiring:
    d ← min(d, d ⊕min.+ A) iterated to fixpoint (Bellman-Ford layered
    relaxation). Returns (id long, dist). Same caching/broadcast strategy
    as bfs()."""
    edges = graph.typed_edges(edge_types).select(
        "src", "dst", F.col(weight_col).alias("w")
    ).cache()
    spark = graph.spark
    # distance domain follows the weight type (long weights -> exact long
    # distances for oracle comparison; double weights -> double distances)
    wtype = dict(edges.dtypes)["w"]
    zero = 0.0 if wtype in ("double", "float") else 0
    dist = spark.createDataFrame([(int(s), zero) for s in start_ids], f"id long, dist {wtype}")
    frontier = dist  # nodes whose distance improved last round
    bc = F.broadcast if broadcast_frontier else (lambda df: df)
    try:
        for _ in range(max_iters):
            candidates = (
                bc(frontier).join(edges, frontier.id == edges.src)
                .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
                .groupBy("id")
                .agg(F.min("dist").alias("dist"))
            )
            # keep only strict improvements over current distances
            improved = (
                candidates.alias("c")
                .join(bc(dist).alias("d"), on="id", how="left")
                .filter(F.col("d.dist").isNull() | (F.col("c.dist") < F.col("d.dist")))
                .select("id", F.col("c.dist").alias("dist"))
                .localCheckpoint(eager=True)
            )
            if improved.limit(1).count() == 0:
                break
            dist = (
                dist.join(improved.select("id"), on="id", how="left_anti")
                .unionByName(improved)
                .localCheckpoint(eager=True)
            )
            frontier = improved
    finally:
        edges.unpersist()
    return dist


def reachable(graph: PropertyGraph, start_ids: list[int], edge_types: list[str] | None = None) -> DataFrame:
    """Transitive closure from the start set (ids only)."""
    return bfs(graph, start_ids, None, edge_types).select("id")

"""Graph persistence: the partition-pruned parquet layout the store
docstring promises for cluster scale.

Reference: the graph lives only in memory there (ConcurrentDirectedGraph
keeps matrices per label/type, g4s-matrix-graph/.../ConcurrentDirectedGraph
.scala:29-41, with BlockingMatrixV2 paging to a scratch dir); a durable,
queryable layout is beyond its surface. Here the layout IS the scale
design: nodes partitioned by label and edges by type mean a label scan or
typed-edge scan is directory pruning — `MATCH (c:Customer)` at 100 TB
touches only the Customer partition, and the planner's typed_edges filter
folds into PartitionFilters instead of reading every edge (verified by
tests/test_graph_store.py's plan assertion).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from .stats import stats_from_dict, stats_to_dict
from .store import PropertyGraph


def save_graph(
    graph: PropertyGraph, path: str, mode: str = "error", with_stats: bool = True
) -> None:
    """Write nodes to <path>/nodes partitioned by label and edges to
    <path>/edges partitioned by type. ``mode`` is the Spark save mode
    (error | overwrite | append).

    ``with_stats`` (default) also ANALYZEs the graph — label/type cards
    and the exact (srcLabel, type, dstLabel) triplet counts the cost
    model prefers — into <path>/stats.json, so a load_graph'ed graph
    plans with a warm cost model instead of recomputing the stats scan
    per session (the StatsStore-at-rest the reference keeps only in
    memory, StatsStore.scala:111-255). Written via temp + os.replace
    (the snapshot manifests' atomic-commit discipline)."""
    graph.nodes.write.partitionBy("label").mode(mode).parquet(f"{path}/nodes")
    graph.edges.write.partitionBy("type").mode(mode).parquet(f"{path}/edges")
    if with_stats:
        tmp = f"{path}/stats.json.tmp"
        with open(tmp, "w") as fh:
            json.dump(stats_to_dict(graph.stats), fh)
        os.replace(tmp, f"{path}/stats.json")


def load_graph(spark: SparkSession, path: str) -> PropertyGraph:
    """Read a save_graph layout back. Partition columns come back last
    in read order, so the canonical (id, label, ...) / (src, dst, type,
    ...) order is restored explicitly. A stats.json (see save_graph)
    pre-warms the planner's cost model."""
    nodes = spark.read.parquet(f"{path}/nodes")
    nodes = nodes.select(
        "id", "label", *[c for c in nodes.columns if c not in ("id", "label")]
    )
    edges = spark.read.parquet(f"{path}/edges")
    edges = edges.select(
        "src", "dst", "type",
        *[c for c in edges.columns if c not in ("src", "dst", "type")],
    )
    g = PropertyGraph(nodes, edges, spark)
    stats_path = f"{path}/stats.json"
    if os.path.exists(stats_path):
        with open(stats_path) as fh:
            g._stats = stats_from_dict(json.load(fh))
    return g

"""Label/type statistics for the cost-based planner.

Reference: NaiveStatsStore maintains write-time counters for node labels,
edge types and (srcLabel, edgeType, dstLabel) triplets
(g4s-optimizer/.../optim/StatsStore.scala:111-255); selectivity = label
count / total (:179-189). We recompute with two groupBy.count() jobs and
cache driver-side — the reference snapshots stats per query the same way
(GraphDB.scala:23-27).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class GraphStats:
    node_count: int
    edge_count: int
    label_counts: dict[str, int] = field(default_factory=dict)
    type_counts: dict[str, int] = field(default_factory=dict)

    @staticmethod
    def compute(nodes: DataFrame, edges: DataFrame) -> "GraphStats":
        lc = {r.label: r["count"] for r in nodes.groupBy("label").count().collect()}
        tc = {r.type: r["count"] for r in edges.groupBy("type").count().collect()}
        return GraphStats(sum(lc.values()), sum(tc.values()), lc, tc)

    # selectivities (StatsStore.scala:179-189)
    def node_sel(self, label: str | None) -> float:
        if label is None or self.node_count == 0:
            return 1.0
        return self.label_counts.get(label, 0) / self.node_count

    def edge_sel(self, types: list[str] | None) -> float:
        if not types or self.edge_count == 0:
            return 1.0
        return sum(self.type_counts.get(t, 0) for t in types) / self.edge_count

    def label_card(self, label: str | None) -> int:
        if label is None:
            return self.node_count
        return self.label_counts.get(label, 0)

    def type_card(self, types: list[str] | None) -> int:
        if not types:
            return self.edge_count
        return sum(self.type_counts.get(t, 0) for t in types)

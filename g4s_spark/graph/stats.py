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
    # (srcLabel, edgeType, dstLabel) -> edge count — the reference's
    # triplet counters (StatsStore.scala:141-170,210-253); exact expand
    # cardinalities for label-constrained hops where independent
    # selectivities mis-estimate (e.g. a type that connects several label
    # pairs). Empty dict = unknown (planner falls back to independence).
    triplet_counts: dict[tuple[str, str, str], int] = field(default_factory=dict)

    @staticmethod
    def compute(nodes: DataFrame, edges: DataFrame) -> "GraphStats":
        lc = {r.label: r["count"] for r in nodes.groupBy("label").count().collect()}
        tc = {r.type: r["count"] for r in edges.groupBy("type").count().collect()}
        # (id,label) resolution joins shuffle on src/dst; AQE broadcasts
        # the slim label projection when it is small enough
        lab = nodes.select("id", "label")
        trip = (
            edges.select("src", "dst", "type")
            .join(lab.select(F.col("id").alias("src"), F.col("label").alias("sl")), on="src")
            .join(lab.select(F.col("id").alias("dst"), F.col("label").alias("dl")), on="dst")
            .groupBy("sl", "type", "dl")
            .count()
        )
        tpc = {(r.sl, r.type, r.dl): r["count"] for r in trip.collect()}
        return GraphStats(sum(lc.values()), sum(tc.values()), lc, tc, tpc)

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

    def triplet_card(
        self, src_label: str | None, types: list[str] | None, dst_label: str | None
    ) -> int | None:
        """Exact edge count matching (srcLabel, type, dstLabel) constraints
        (None = wildcard), the directional estimate of StatsStore.scala:
        141-170,210-253. None when triplet stats are unavailable or no
        label constrains the hop (type_card already answers that)."""
        if not self.triplet_counts or (src_label is None and dst_label is None):
            return None
        tset = set(types) if types else None
        total = 0
        for (sl, t, dl), c in self.triplet_counts.items():
            if src_label is not None and sl != src_label:
                continue
            if dst_label is not None and dl != dst_label:
                continue
            if tset is not None and t not in tset:
                continue
            total += c
        return total

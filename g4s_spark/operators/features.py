"""Neighbor feature aggregation (round-10): the GraphSAGE-style
per-hop neighbor reduce a GNN / graph-feature training pipeline runs
before sampling minibatches (Hamilton et al. 2017's AGGREGATE step,
minus the learned weights — the data-engineering half).

Each hop replaces every node's feature vector with an aggregate of its
OUT-neighbors' CURRENT features, so ``hops=k`` summarizes the exact
k-step ego graph. Pure DataFrame composition — per hop ONE equi-join
(edges ⋈ features on dst) and ONE groupBy(src) with map-side combine;
at 100 TB that is the same shuffle shape as one pagerank iteration
(``operators/algorithms.py:205``), skew-managed the same way (AQE /
salting on hub keys — SCALE.md "hub skew"). No UDFs, no collect; hop
count, not node count, bounds the job count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": lambda c: F.count(c),
}


def neighbor_agg(
    edges: DataFrame,
    features: DataFrame,
    feature_cols: list[str] | None = None,
    agg: str = "mean",
    hops: int = 1,
    id_col: str = "id",
) -> DataFrame:
    """Aggregate each node's OUT-neighbors' features over ``hops``
    propagation steps.

    ``edges``: (src, dst) — direction followed src -> dst (pass a
    column-swapped frame for in-neighbors; the PropertyGraph transpose
    is exactly that swap, reference g4s-matrix-graph GetEdges
    transpose). ``features``: (id_col, numeric feature columns...).
    ``agg``: one of sum / mean / min / max / count, applied
    per-feature-column per hop. Returns (id_col, *feature_cols) for
    every node with at least one out-neighbor carrying features at
    every hop (inner semantics — a node whose neighborhood has no
    features after h hops has no h-hop summary; left-pad downstream if
    zeros are wanted).

    Multi-hop note: hop 2 aggregates hop-1 AGGREGATES (the ego-graph
    summary tree), matching GraphSAGE's layered AGGREGATE — not the
    flat 2-hop neighbor multiset.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    if hops < 1:
        raise ValueError("hops must be >= 1")
    cols = feature_cols or [c for c in features.columns if c != id_col]
    if not cols:
        raise ValueError("features has no feature columns besides id")
    fn = _AGGS[agg]
    e = edges.select("src", "dst")
    feats = features.select(F.col(id_col), *cols)
    for _ in range(hops):
        feats = (
            e.join(feats, e.dst == feats[id_col])
            .groupBy("src")
            .agg(*[fn(F.col(c)).alias(c) for c in cols])
            .withColumnRenamed("src", id_col)
        )
    return feats

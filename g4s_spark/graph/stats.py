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
    # (type, side) -> distinct endpoint count, side 0 = src, 2 = dst.
    # Raw countDistinct over the edge table (danglers included) — only
    # sound for the planner's tautological-hop elimination when combined
    # with the edge-coverage test, which fails whenever a dangling edge
    # of the type exists (a dangling edge contributes no triplet row, so
    # coverage < type count). Empty dict = unknown -> no elimination.
    endpoint_counts: dict[tuple[str, int], int] = field(default_factory=dict)
    # True when every node id carries exactly one label row. The planner's
    # label-implied semi-join skip is only sound under this invariant: with
    # multi-label nodes the two-sided triplet join counts an edge once per
    # label *pair*, so a side-sum over triplet_counts can equal type_card
    # without every edge's endpoint carrying the label (a 2-label endpoint
    # plus a dangling edge cancel exactly). None = unknown -> no skip.
    single_label: bool | None = None

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
        ep: dict[tuple[str, int], int] = {}
        for r in (
            edges.groupBy("type")
            .agg(
                F.countDistinct("src").alias("ns"),
                F.countDistinct("dst").alias("nd"),
            )
            .collect()
        ):
            ep[(r.type, 0)] = int(r.ns)
            ep[(r.type, 2)] = int(r.nd)
        one_label = (
            nodes.groupBy("id").count().filter(F.col("count") > 1).limit(1).count() == 0
        )
        return GraphStats(
            sum(lc.values()), sum(tc.values()), lc, tc, tpc, ep, one_label
        )

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

    # ---- WHERE-predicate selectivity (extension beyond the reference's
    # label-frequency model; SURVEY §4.2 lists selectivity as the
    # optimizer's whole signal — histograms extend it to predicates) ----
    #
    # Lazily-built per-(label, prop) equi-width histograms over the
    # numeric interpretation of the props map, cached for the stats
    # object's lifetime (= the graph's). Building one is an ANALYZE-style
    # aggregation job at plan time — paid once per (label, prop), reused
    # by every later query on the same graph.

    HIST_BUCKETS = 32

    def _histogram(self, nodes: DataFrame, label: str | None, prop: str):
        cache = self.__dict__.setdefault("_hist_cache", {})
        key = (label, prop)
        if key in cache:
            return cache[key]
        if "props" not in nodes.columns:
            cache[key] = None
            return None
        base = nodes if label is None else nodes.filter(F.col("label") == label)
        v = F.col("props").getItem(prop)
        # try_cast: ANSI mode would error the whole job on one
        # non-numeric string; unparsable values simply fall out of the
        # numeric histogram (their distinct count still informs equality)
        vn = v.try_cast("double")
        stats_row = base.agg(
            F.min(vn).alias("lo"),
            F.max(vn).alias("hi"),
            F.count(vn).alias("n"),
            F.approx_count_distinct(v).alias("nd"),
        ).collect()[0]
        nd = max(int(stats_row["nd"]), 1)
        if stats_row["n"] == 0 or stats_row["lo"] is None:
            cache[key] = (None, None, 0, nd, None)
            return cache[key]
        lo, hi, n = float(stats_row["lo"]), float(stats_row["hi"]), int(stats_row["n"])
        counts = [0] * self.HIST_BUCKETS
        if hi > lo:
            b = F.least(
                F.lit(self.HIST_BUCKETS - 1),
                F.floor((vn - lo) / (hi - lo) * self.HIST_BUCKETS).cast("int"),
            )
            for r in base.filter(vn.isNotNull()).groupBy(b.alias("b")).count().collect():
                if r["b"] is not None:
                    counts[int(r["b"])] = int(r["count"])
        else:
            counts[0] = n
        cache[key] = (lo, hi, n, nd, counts)
        return cache[key]

    def pred_sel(
        self,
        nodes: DataFrame,
        label: str | None,
        prop: str,
        op: str,
        value,
        is_num: bool,
    ) -> float | None:
        """Estimated fraction of `label` nodes satisfying
        `prop <op> value`. None = unknown (planner keeps its upper
        bound). Numeric ranges interpolate the histogram; equality uses
        1/approx-distinct; string ops beyond (=, <>) are unestimated."""
        return self._sel_from_hist(self._histogram(nodes, label, prop), op, value, is_num)

    def edge_pred_sel(
        self,
        edges: DataFrame,
        types: tuple[str, ...],
        prop: str,
        op: str,
        value,
        is_num: bool,
    ) -> float | None:
        """Selectivity of an edge-property predicate over the typed edge
        set — the edge twin of pred_sel, histogram cached per
        (types, prop). The value column is the typed column (weight) when
        present, else the edge props map."""
        cache = self.__dict__.setdefault("_hist_cache", {})
        key = ("edge", types, prop)
        if key not in cache:
            base = edges
            if prop in edges.columns:
                v = F.col(prop)
            elif "props" in edges.columns:
                v = F.col("props").getItem(prop)
            else:
                cache[key] = None
                return None
            vn = v.try_cast("double")
            row = base.agg(
                F.min(vn).alias("lo"), F.max(vn).alias("hi"),
                F.count(vn).alias("n"), F.approx_count_distinct(v).alias("nd"),
            ).collect()[0]
            nd = max(int(row["nd"]), 1)
            if row["n"] == 0 or row["lo"] is None:
                cache[key] = (None, None, 0, nd, None)
            else:
                lo, hi, n = float(row["lo"]), float(row["hi"]), int(row["n"])
                counts = [0] * self.HIST_BUCKETS
                if hi > lo:
                    b = F.least(
                        F.lit(self.HIST_BUCKETS - 1),
                        F.floor((vn - lo) / (hi - lo) * self.HIST_BUCKETS).cast("int"),
                    )
                    for r in base.filter(vn.isNotNull()).groupBy(b.alias("b")).count().collect():
                        if r["b"] is not None:
                            counts[int(r["b"])] = int(r["count"])
                else:
                    counts[0] = n
                cache[key] = (lo, hi, n, nd, counts)
        return self._sel_from_hist(cache[key], op, value, is_num)

    def _sel_from_hist(self, h, op: str, value, is_num: bool) -> float | None:
        if h is None:
            return None
        lo, hi, n, nd, counts = h
        if not is_num:
            if op == "=":
                return 1.0 / nd
            if op in ("<>", "!="):
                return 1.0 - 1.0 / nd
            return None
        if counts is None:
            return None
        x = float(value)
        if op == "=":
            return 1.0 / nd
        if op in ("<>", "!="):
            return 1.0 - 1.0 / nd
        if hi <= lo:
            below = 1.0 if lo <= x else 0.0
        else:
            width = (hi - lo) / len(counts)
            mass = 0.0
            for i, c in enumerate(counts):
                b_lo = lo + i * width
                b_hi = b_lo + width
                if b_hi <= x:
                    mass += c
                elif b_lo < x:
                    mass += c * (x - b_lo) / width
            below = mass / n
        if op in ("<", "<="):
            return max(min(below, 1.0), 1.0 / n)
        if op in (">", ">="):
            return max(min(1.0 - below, 1.0), 1.0 / n)
        return None

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


def stats_to_dict(s: "GraphStats") -> dict:
    """JSON-safe rendering (triplet keys join on \\x1f — labels/types
    are identifiers, so the separator cannot collide)."""
    return {
        "node_count": s.node_count,
        "edge_count": s.edge_count,
        "label_counts": s.label_counts,
        "type_counts": s.type_counts,
        "triplet_counts": {
            "\x1f".join(k): v for k, v in s.triplet_counts.items()
        },
        "endpoint_counts": {
            f"{t}\x1f{side}": v for (t, side), v in s.endpoint_counts.items()
        },
        "single_label": s.single_label,
    }


def stats_from_dict(d: dict) -> "GraphStats":
    return GraphStats(
        d["node_count"],
        d["edge_count"],
        dict(d.get("label_counts", {})),
        dict(d.get("type_counts", {})),
        {tuple(k.split("\x1f")): v for k, v in d.get("triplet_counts", {}).items()},
        {
            (k.split("\x1f")[0], int(k.split("\x1f")[1])): v
            for k, v in d.get("endpoint_counts", {}).items()
        },
        d.get("single_label"),
    )

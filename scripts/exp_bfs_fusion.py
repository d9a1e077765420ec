"""Round-16 experiment: fuse TWO BFS/SSSP expansion levels per driver
barrier ("Not yet optimized" #1 — the loops are iteration-latency-bound
at sf0.1: 6-7 sequential convergence jobs dominate).

Candidate: per driver round, expand level k+1 AND level k+2 inside one
job (the two new-level frames are unioned with a level tag; ONE
groupBy(level).count() action materializes both lazily-checkpointed
levels and returns both convergence counts). Result set is provably
identical: level-by-level expansion is just unrolled once.

Interleaved A/B in one session, N reps each, plus a result-equality
assertion on the real sf0.1 graph and per-variant Spark job counts.

Usage: python scripts/exp_bfs_fusion.py [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from g4s_spark.checkpointing import iter_checkpoint
from g4s_spark.graph import build_graph
from g4s_spark.operators.algorithms import _bc, _cached_typed_edges, bfs, sssp


def bfs_fused(graph, start_ids, max_hops=None, edge_types=None,
              broadcast_frontier=None) -> DataFrame:
    spark = graph.spark
    edges = _cached_typed_edges(graph, edge_types, ("src", "dst"))
    visited = spark.createDataFrame([(int(s), 0) for s in start_ids], "id long, dist long")
    frontier = visited.select("id")
    n_frontier = n_visited = len(start_ids)
    dist = 0

    def expand(fr, n_fr, excl, n_ex):
        return (
            _bc(fr, n_fr, broadcast_frontier)
            .join(edges, fr.id == edges.src)
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
            .join(_bc(excl, n_ex, broadcast_frontier), on="id", how="left_anti")
        )

    while max_hops is None or dist < max_hops:
        one_level = max_hops is not None and dist + 1 == max_hops
        nxt1 = iter_checkpoint(
            expand(frontier, n_frontier, visited.select("id"), n_visited), eager=False
        )
        if one_level:
            n1 = nxt1.count()
            if n1 == 0:
                break
            visited = iter_checkpoint(
                visited.unionByName(nxt1.withColumn("dist", F.lit(dist + 1))), eager=False
            )
            dist += 1
            break
        # speculative second level in the same job; excluded set =
        # visited ∪ nxt1 (anti-join twice; nxt1's size is unknown at
        # plan time so its anti-join is left to AQE, no forced broadcast)
        nxt2 = (
            nxt1.join(edges, nxt1.id == edges.src)
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
            .join(_bc(visited.select("id"), n_visited, broadcast_frontier), on="id", how="left_anti")
            .join(nxt1, on="id", how="left_anti")
        )
        both = iter_checkpoint(
            nxt1.withColumn("dist", F.lit(dist + 1)).unionByName(
                nxt2.withColumn("dist", F.lit(dist + 2))
            ),
            eager=False,
        )
        counts = {r["dist"]: r["n"] for r in
                  both.groupBy("dist").agg(F.count(F.lit(1)).alias("n")).collect()}
        n1 = counts.get(dist + 1, 0)
        n2 = counts.get(dist + 2, 0)
        if n1 == 0:
            break
        visited = iter_checkpoint(visited.unionByName(both), eager=False)
        n_visited += n1 + n2
        if n2 == 0:
            dist += 1
            break
        frontier = both.filter(F.col("dist") == dist + 2).select("id")
        n_frontier = n2
        dist += 2
    return visited


def sssp_fused(graph, start_ids, max_iters=50, edge_types=None,
               weight_col="weight", broadcast_frontier=None) -> DataFrame:
    edges = _cached_typed_edges(graph, edge_types, ("src", "dst", weight_col)).select(
        "src", "dst", F.col(weight_col).alias("w")
    )
    spark = graph.spark
    wtype = dict(edges.dtypes)["w"]
    zero = 0.0 if wtype in ("double", "float") else 0
    dist = spark.createDataFrame([(int(s), zero) for s in start_ids], f"id long, dist {wtype}")
    frontier = dist
    n_frontier = n_dist = len(start_ids)

    def relax(fr, n_fr, cur, n_cur):
        cand = (
            _bc(fr, n_fr, broadcast_frontier)
            .join(edges, fr.id == edges.src)
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        return (
            cand.alias("c")
            .join(_bc(cur, n_cur, broadcast_frontier).alias("d"), on="id", how="left")
            .filter(F.col("d.dist").isNull() | (F.col("c.dist") < F.col("d.dist")))
            .select("id", F.col("c.dist").alias("dist"))
        )

    it = 0
    while it < max_iters:
        imp1 = iter_checkpoint(relax(frontier, n_frontier, dist, n_dist), eager=False)
        # dist after applying imp1 (not yet counted — same job below)
        dist1 = dist.join(imp1.select("id"), on="id", how="left_anti").unionByName(imp1)
        imp2 = relax(imp1, n_dist, dist1, 2 * n_dist)  # sizes are upper bounds for the bc gate
        both = iter_checkpoint(
            imp1.withColumn("_lvl", F.lit(1)).unionByName(imp2.withColumn("_lvl", F.lit(2))),
            eager=False,
        )
        counts = {r["_lvl"]: r["n"] for r in
                  both.groupBy("_lvl").agg(F.count(F.lit(1)).alias("n")).collect()}
        n1, n2 = counts.get(1, 0), counts.get(2, 0)
        if n1 == 0:
            break
        imp1m = both.filter(F.col("_lvl") == 1).drop("_lvl")
        imp2m = both.filter(F.col("_lvl") == 2).drop("_lvl")
        merged = dist.join(imp1m.select("id"), on="id", how="left_anti").unionByName(imp1m)
        if n2 == 0:
            dist = iter_checkpoint(merged, eager=False)
            it += 1
            break
        dist = iter_checkpoint(
            merged.join(imp2m.select("id"), on="id", how="left_anti").unionByName(imp2m),
            eager=False,
        )
        frontier = imp2m
        n_frontier = n2
        n_dist += n1 + n2  # monotone upper bound, bc gate only
        it += 2
    else:
        raise RuntimeError(f"sssp_fused did not converge within {max_iters} iterations")
    return dist


def jobs_run(spark, fn):
    st = spark.sparkContext.statusTracker()
    before = len(st.getJobIdsForGroup(None) or [])
    t0 = time.time()
    fn()
    return time.time() - t0, len(st.getJobIdsForGroup(None) or []) - before


def main():
    reps = 4
    for i, a in enumerate(sys.argv):
        if a == "--reps":
            reps = int(sys.argv[i + 1])
    from g4s_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp_bfs_fusion")
    spark.range(1000).count()
    g = build_graph(spark, sf_dir)
    start = [g.spark.conf.get("spark.g4s.bfs_start", None)]
    import __spark_entry__ as entry

    s = [entry.BFS_START]

    def run_noop(df):
        df.write.mode("overwrite").format("noop").save()

    # equality on the real graph (the whole point: results identical)
    base_b = {(r.id, r.dist) for r in bfs(g, s).collect()}
    fused_b = {(r.id, r.dist) for r in bfs_fused(g, s).collect()}
    assert fused_b == base_b, (len(base_b), len(fused_b))
    base_s = {(r.id, r.dist) for r in sssp(g, s).collect()}
    fused_s = {(r.id, r.dist) for r in sssp_fused(g, s).collect()}
    assert fused_s == base_s, (len(base_s), len(fused_s))
    # max_hops parity paths
    for mh in (1, 2, 3, 6):
        a = {(r.id, r.dist) for r in bfs(g, s, max_hops=mh).collect()}
        b = {(r.id, r.dist) for r in bfs_fused(g, s, max_hops=mh).collect()}
        assert a == b, (mh, len(a), len(b))
    print("# equality OK on sf0.1 (bfs full + max_hops 1/2/3/6, sssp full)", file=sys.stderr)

    res = {"bfs_old": [], "bfs_new": [], "sssp_old": [], "sssp_new": []}
    jobs = {k: None for k in res}
    for r in range(reps):
        for name, fn in (
            ("bfs_old", lambda: run_noop(bfs(g, s).select("id", "dist"))),
            ("bfs_new", lambda: run_noop(bfs_fused(g, s).select("id", "dist"))),
            ("sssp_old", lambda: run_noop(sssp(g, s).select("id", "dist"))),
            ("sssp_new", lambda: run_noop(sssp_fused(g, s).select("id", "dist"))),
        ):
            spark.sparkContext.setJobDescription(f"{name} [{r}]")
            dt, nj = jobs_run(spark, fn)
            res[name].append(round(dt, 3))
            jobs[name] = nj
    for k, v in res.items():
        print(f"{k}: min {min(v):.3f}  jobs/run {jobs[k]}  samples {v}")


if __name__ == "__main__":
    main()

"""Round-16 experiment: does AQE help or hurt the bfs/sssp fixpoint
loops at sf0.1?

Motivation: the two-level fusion experiment (scripts/exp_bfs_fusion.py)
showed the loops run ~30 Spark jobs per bfs() call against only 6-7
convergence barriers — AQE shuffle-stage materialization sub-jobs
dominate the job count. Each iteration's shuffles (frontier
dropDuplicates, sssp's groupBy-min) are tiny in the broadcast regime,
so AQE's replan barrier may cost more than its coalescing saves.

Candidate: toggle spark.sql.adaptive.enabled=false for the duration of
the call (results provably identical — AQE never changes semantics).
Interleaved A/B in one session, N reps each, plus job counts and a
result-equality assertion on the real sf0.1 graph.

Usage: python scripts/exp_bfs_aqe.py [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from g4s_spark.graph import build_graph
from g4s_spark.operators.algorithms import bfs, sssp


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
    spark = get_spark("exp_bfs_aqe")
    spark.range(1000).count()
    g = build_graph(spark, sf_dir)
    import __spark_entry__ as entry

    s = [entry.BFS_START]

    def run_noop(df):
        df.write.mode("overwrite").format("noop").save()

    def aqe_off(fn):
        def wrapped():
            old = spark.conf.get("spark.sql.adaptive.enabled")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                fn()
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", old)
        return wrapped

    # warm the typed-edge cache outside the timed region (both variants
    # share it; the bench warmup does the same)
    run_noop(bfs(g, s).select("id", "dist"))
    run_noop(sssp(g, s).select("id", "dist"))

    # equality (trivial — AQE cannot change results — but assert anyway)
    base_b = {(r.id, r.dist) for r in bfs(g, s).collect()}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    off_b = {(r.id, r.dist) for r in bfs(g, s).collect()}
    off_s = {(r.id, r.dist) for r in sssp(g, s).collect()}
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    base_s = {(r.id, r.dist) for r in sssp(g, s).collect()}
    assert off_b == base_b, (len(base_b), len(off_b))
    assert off_s == base_s, (len(base_s), len(off_s))
    print("# equality OK on sf0.1 (bfs, sssp; AQE on == off)", file=sys.stderr)

    res = {"bfs_aqe_on": [], "bfs_aqe_off": [], "sssp_aqe_on": [], "sssp_aqe_off": []}
    jobs = {k: None for k in res}
    for r in range(reps):
        for name, fn in (
            ("bfs_aqe_on", lambda: run_noop(bfs(g, s).select("id", "dist"))),
            ("bfs_aqe_off", aqe_off(lambda: run_noop(bfs(g, s).select("id", "dist")))),
            ("sssp_aqe_on", lambda: run_noop(sssp(g, s).select("id", "dist"))),
            ("sssp_aqe_off", aqe_off(lambda: run_noop(sssp(g, s).select("id", "dist")))),
        ):
            spark.sparkContext.setJobDescription(f"{name} [{r}]")
            dt, nj = jobs_run(spark, fn)
            res[name].append(round(dt, 3))
            jobs[name] = nj
    for k, v in res.items():
        print(f"{k}: min {min(v):.3f}  jobs/run {jobs[k]}  samples {v}")


if __name__ == "__main__":
    main()

"""Diagnose the systematic graph_bfs first-sample inflation in the bench.

Across the six clean-band r16 runs, graph_bfs's FIRST timed sample reads
2.2x its other samples (4.9-5.4 s vs ~2 s) while every later sample is
steady — despite the untimed warmup pass having already executed bfs
once, and despite pass-major ordering giving sample 1 the exact same
predecessor context as samples 2..5. GC per sample is 0. Hypothesis:
unified-memory eviction — the heavy queries later in the warmup pass
(pagerank's dst-keyed mass cache, the mxm fixtures) borrow execution
memory and evict the typed-edge cache blocks bfs/sssp share; bfs
sample 1 pays the re-cache, after which total storage fits and no later
pass evicts again.

Method: replicate the bench's session + warmup exactly, then dump the
RDD storage inventory (cached partitions / total, memory size) at three
points: after warmup, after the pass-1 prefix (the four cypher gates),
and after bfs sample 1 — then run the remainder of pass 1 and time bfs
sample 2. If the typed-edge cache shows missing partitions before
sample 1 and full residency after, the hypothesis is confirmed.

Diagnostic only: no product change; results inform OPTIMIZATION_r16.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def storage_report(spark, tag):
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    print(f"## storage [{tag}]: {len(infos)} cached RDDs", file=sys.stderr)
    for inf in infos:
        print(
            f"   id={inf.id()} {inf.numCachedPartitions()}/{inf.numPartitions()}"
            f" mem={inf.memSize() / (1 << 20):.1f}MiB"
            f" name={str(inf.name())[:90]}",
            file=sys.stderr,
        )


def run(qs, spark, sf_dir, name):
    t0 = time.time()
    qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.time() - t0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from g4s_spark.session import get_spark

    spark = get_spark("g4s_exp_bfs_firstsample")
    spark.range(1000).count()
    qs = entrymod.queries()

    for name in HEADLINE:
        dt = run(qs, spark, sf_dir, name)
        print(f"# [warmup] {name}: {dt:.2f}s", file=sys.stderr)
    storage_report(spark, "after warmup")

    bfs_at = HEADLINE.index("graph_bfs")
    for name in HEADLINE[:bfs_at]:
        run(qs, spark, sf_dir, name)
    storage_report(spark, "pass1 pre-bfs")

    s1 = run(qs, spark, sf_dir, "graph_bfs")
    storage_report(spark, "after bfs sample1")
    print(f"# bfs sample1: {s1:.2f}s", file=sys.stderr)

    for name in HEADLINE[bfs_at + 1 :]:
        run(qs, spark, sf_dir, name)
    for name in HEADLINE[:bfs_at]:
        run(qs, spark, sf_dir, name)
    s2 = run(qs, spark, sf_dir, "graph_bfs")
    storage_report(spark, "after bfs sample2")
    print(f"# bfs sample2: {s2:.2f}s", file=sys.stderr)
    print(f"RESULT sample1={s1:.2f}s sample2={s2:.2f}s ratio={s1 / s2:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()

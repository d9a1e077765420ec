"""Second experiment for the graph_bfs first-timed-sample inflation.

exp_bfs_firstsample.py showed the effect is NOT storage eviction (all
cached RDDs fully resident, ~140 MiB total, before and after the slow
sample). Remaining question: is the slowdown attached to bfs's second
execution per se, or to the work interleaved between warmup and pass 1?

Method: bench-identical warmup pass, then FOUR bfs executions
back-to-back with nothing in between. [slow, fast, fast, fast] means
execution-count (something bfs's own first execution leaves behind that
its second pays for once); [fast, fast, ...] means the interleaved
queries cause it; [slow, slow, ...] would mean steady-state regression.

Diagnostic only: no product change.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from g4s_spark.session import get_spark

    spark = get_spark("g4s_exp_bfs_backtoback")
    spark.range(1000).count()
    qs = entrymod.queries()

    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        print(f"# [warmup] {name}: {time.time() - t0:.2f}s", file=sys.stderr)

    ts = []
    for i in range(4):
        t0 = time.time()
        qs["graph_bfs"](spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts.append(time.time() - t0)
        print(f"# bfs exec {i + 2}: {ts[-1]:.2f}s", file=sys.stderr)
    print("RESULT " + " ".join(f"{t:.2f}" for t in ts))
    spark.stop()


if __name__ == "__main__":
    main()

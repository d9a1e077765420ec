"""Time single queries in isolation with the bench methodology (untimed
warmup + N noop-sink samples). Usage:

    python scripts/time_query.py <query> [query ...] [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    import __spark_entry__ as entrymod
    from g4s_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_query")
    spark.range(1000).count()
    qs = entrymod.queries()
    for name in args:
        spark.sparkContext.setJobDescription(f"warmup {name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        print(f"# warmup {name}: {time.time() - t0:.2f}s", file=sys.stderr)
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} [{r}]")
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
        print(f"{name}: min {min(samples):.3f}  samples {samples}")


if __name__ == "__main__":
    main()

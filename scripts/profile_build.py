"""Per-gate driver plan-construction profile (VERDICT r12 #3 / r13 #2).

For each bench HEADLINE gate, split wall time into:

- **build**: `queries()[name](spark, sf_dir)` — Python-side Column
  construction plus Spark's eager analysis of every DataFrame step.
  This cost runs ON THE DRIVER once per query; at 100 TB it is
  amortized over a huge execution, but a >100 ms build on a 24-query
  driver loop is pure serial overhead the executors wait behind
  (SCALE.md "driver-side plan construction" lesson: one-string SQL
  builds in ~1 ms what thousands of py4j Column calls build in
  hundreds).
- **execute**: first action on the built DataFrame (`count()` on a
  cache-cleared session), i.e. optimization + scheduling + run.

Run:  python scripts/profile_build.py [gate ...]
Writes a markdown table to stdout (paste into NOTES.md).

Method note: build is measured on a WARM session (tables cached in the
load_table registry map, JVM classes loaded) after one throwaway build
of a trivial gate, median of 3 — so the number is the steady-state
per-query driver cost, not JVM warmup.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from bench import HEADLINE  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    sf_dir = "/root/testdata/sf0.01"
    from g4s_spark.session import get_spark

    spark = get_spark("profile_build")
    qs = E.queries()
    # warm the session: table registry, py4j, analyzer classes
    qs["rel_q1_pricing"](spark, sf_dir)

    rows = []
    for name in names:
        fn = qs[name]
        builds = []
        df = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            builds.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        n = df.count()
        execute = time.perf_counter() - t0
        build_ms = statistics.median(builds) * 1000
        rows.append((name, build_ms, execute, n))
        print(
            f"# {name}: build {build_ms:.0f}ms execute {execute:.2f}s rows {n}",
            file=sys.stderr,
        )

    print("| gate | build (ms) | execute (s) | build share |")
    print("|---|---|---|---|")
    for name, b, x, _ in sorted(rows, key=lambda r: -r[1]):
        share = b / 1000 / (b / 1000 + x) * 100
        print(f"| {name} | {b:.0f} | {x:.2f} | {share:.0f}% |")


if __name__ == "__main__":
    main()

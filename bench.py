"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the noop sink (full computation, no driver
collect). Headline set = the queries whose input scales with sf
(lineitem/orders/events-driven), covering the pattern-match pipeline,
kernels, algorithms, analytics, and streaming-batch shapes.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "cypher_1hop",
    "cypher_2hop_reverse",
    "cypher_multi_return",
    "cypher_fork",
    "graph_bfs",
    "graph_sssp",
    "graph_pagerank",
    "mxm_plus_times",
    "mxm_any_pair",
    "ewise_union_plus",
    "reduce_rows_plus",
    "rel_q1_pricing",
    "rel_top_orders",
    "rel_supplier_rank",
    # events_window_agg retired round-10 (subsumed by the sliding
    # variant); the sliding window is the strictly-heavier twin
    "events_sliding_window",
    "events_sessionize",
    "events_asof",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_quality",
    "multimodal_meta",
    "ann_topk",
    "ann_lsh_topk",
]


# median-of-5: this box carries bursty background load (NOTES.md) — with
# 3 repeats a single noise spike can still land in the middle sample;
# 5 keeps the total run under ~5 min while making the median robust to
# two bad samples per query
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))


def _loadavg() -> list[float] | None:
    """1/5/15-min load averages — recorded so a contended driver run
    self-documents (round-9, VERDICT r8 #7: r8's 54 s 'regression' burned
    an adjudication cycle on regression-or-noise)."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return None


def _gc_millis(spark) -> int:
    """Cumulative JVM GC time (ms). local[*] means the driver JVM IS the
    executor, so deltas around a sample attribute its GC cost exactly —
    the instrument VERDICT r8 #5 asked for on the pagerank bimodality."""
    try:
        total = 0
        beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        for i in range(beans.size()):
            t = beans.get(i).getCollectionTime()
            if t > 0:
                total += t
        return total
    except Exception:
        return -1


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import statistics

    import __spark_entry__ as entrymod
    from g4s_spark.session import get_spark

    # contention gate (VERDICT r10 #4: three straight driver rounds ran
    # against loadavg 5-14 and every total needed manual adjudication):
    # if the box is busy, wait briefly for it to quiet down, then run
    # regardless — flagging the start state so a contended run
    # self-labels instead of reading as a regression
    wait_s = int(os.environ.get("SPARK_GRAFT_BENCH_WAIT_S", "120"))
    load_threshold = 4.0
    waited = 0
    la = _loadavg()
    while la and la[0] > load_threshold and waited < wait_s:
        print(
            f"# [contention] loadavg(1)={la[0]:.1f} > {load_threshold}; "
            f"waiting ({waited}/{wait_s}s)",
            file=sys.stderr,
        )
        time.sleep(10)
        waited += 10
        la = _loadavg()
    contended = bool(la and la[0] > load_threshold)
    if contended:
        print(
            f"# WARNING: starting contended (loadavg(1)={la[0]:.1f}); "
            "totals are upper bounds — compare per-query medians, not "
            "round-over-round totals",
            file=sys.stderr,
        )

    spark = get_spark("g4s_bench")
    # one trivial job outside the timed region: JVM/JIT + scheduler warmup
    # (otherwise the first query is charged several seconds of first-job
    # session overhead that has nothing to do with its plan)
    spark.range(1000).count()
    qs = entrymod.queries()

    # median-of-REPEATS: single runs in this environment carry ±50% noise
    # (NOTES.md) — per-query medians separate plan changes from protocol
    # jitter. Passes alternate over queries (run 1 of all, then run 2 ...)
    # so cross-run cache/GC drift spreads evenly instead of biasing one run.
    # one untimed warmup pass over the headline set (round-8): first
    # executions are charged Janino/codegen compilation, parquet footer
    # reads and session-index fills (e.g. the MinHash bucket table) that
    # recur in NO steady-state sample — warming them outside the timed
    # region makes sample 1 measure the same thing as samples 2..N, so
    # per-query medians stop depending on pass order
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        print(f"# [warmup] {name}: {time.time() - t0:.2f}s", file=sys.stderr)

    load_start = _loadavg()
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    gc_ms: dict[str, list[int]] = {name: [] for name in HEADLINE}
    for rep in range(REPEATS):
        for name in HEADLINE:
            fn = qs[name]
            gc0 = _gc_millis(spark)
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            gcd = _gc_millis(spark) - gc0 if gc0 >= 0 else -1
            samples[name].append(dt)
            gc_ms[name].append(gcd)
            print(
                f"# [{rep + 1}/{REPEATS}] {name}: {dt:.2f}s (gc {gcd}ms)",
                file=sys.stderr,
            )

    timings = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}
    total = round(sum(timings.values()), 3)

    # full per-sample detail goes to STDERR as a diagnostic: the driver
    # archives only the last ~2000 chars of stdout, and r11's verbose
    # line truncated mid-"samples" — cutting the medians off the
    # artifact and failing its json parse (VERDICT r11 #7). The ONE
    # stdout JSON line is kept compact (~800 chars for 24 queries) so
    # the archived tail always holds the complete, parseable record.
    print("# samples " + json.dumps(samples), file=sys.stderr)
    print("# gc_ms " + json.dumps(gc_ms), file=sys.stderr)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "loadavg": {"start": load_start, "end": _loadavg()},
        "contended_start": contended,
        "repeats": REPEATS,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()

"""Round-17 scaling spot-check (VERDICT r16 #5): does the heavy-query
work actually parallelize, or is sf0.1 just too small to tell?

sf0.1 cannot answer it (every 8-vs-32-core ratio ~1; the suite is
latency-bound), and the driver ships no sf1 testdata. This experiment
synthesizes an sf1-SCALE corpus by replicating the sf0.1 tables 10x
with deterministic key offsets (+10M per replica — disjoint copies, so
per-row work scales exactly 10x) into /tmp, then times the heaviest
operators with the bench methodology (untimed warmup + noop-sink
samples) at the core count given by $SPARK_GRAFT_CPUS.

Query choices and why they are representative under replication:
- graph_pagerank: full-graph message passing; a disjoint 10x union is
  10x the aggregation work (nations/regions stay shared — realistic
  hub-degree growth).
- graph_bfs / graph_sssp: seeded one customer PER replica (10 sources)
  — multi-source frontier work scales 10x; a single seed would only
  explore one copy and measure nothing new.
- mxm_plus_times: the lineitem-derived matrix product; 10x rows.
- dedup_simhash: per-doc fingerprint + single-exchange vote fold; 10x
  docs. (dedup_ngram_jaccard is deliberately EXCLUDED: replicated
  identical texts make every cross-replica doc pair a candidate, so
  the pair stage grows ~100x, not 10x — replication misrepresents it.)

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/exp_sf1_scaling.py
    SPARK_GRAFT_CPUS=8  python scripts/exp_sf1_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_synth"
REPLICAS = 10
KEY_OFF = 10_000_000  # per-replica key offset; orderkey*8 stays < 1e12
REPS = 3


def generate(spark):
    from pyspark.sql import functions as F

    from g4s_spark.sources import load_table

    os.makedirs(DST, exist_ok=True)
    # key columns to offset per table (nation/region stay shared dims)
    plans = {
        "region": [],
        "nation": [],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "documents": ["doc_id"],
        "events": ["user_id"],
        "embeddings": ["vec_id"],
    }
    for name, keys in plans.items():
        out = f"{DST}/{name}.parquet"
        if os.path.exists(out):
            continue
        try:
            base = load_table(spark, SRC, name)
        except Exception as exc:  # optional tables (documents/events)
            print(f"# skip {name}: {exc}")
            continue
        if not keys:
            base.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for k in range(REPLICAS):
            df = base
            for col in keys:
                df = df.withColumn(col, F.col(col) + F.lit(k * KEY_OFF))
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # many row groups so scans parallelize like a real sf1 table
        u.repartition(32).write.mode("overwrite").parquet(out)
        print(f"# wrote {out}")


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from g4s_spark.session import get_spark

    spark = get_spark(f"exp_sf1_scaling_c{cpus}")
    spark.range(1000).count()
    generate(spark)

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from g4s_spark.graph import build_graph
    from g4s_spark.operators import bfs, pagerank, sssp

    g = build_graph(spark, DST)
    # one customer seed per replica (same base key the bench's BFS uses)
    seeds = [3_000_000_000_000 + 1 + k * KEY_OFF for k in range(REPLICAS)]

    def q_pagerank():
        return pagerank(g, iters=3)

    def q_bfs():
        return bfs(g, seeds)

    def q_sssp():
        return sssp(g, seeds)

    def q_mxm():
        from g4s_spark.grblas import PLUS_TIMES, mxm

        _li, a, b = entry._li_matrices(spark, DST)
        return mxm(a, b, PLUS_TIMES).df.select(
            "i", "j", F.round(F.col("v"), 2).alias("v")
        )

    def q_simhash():
        from g4s_spark.functions.dedup import simhash
        from g4s_spark.sources import load_table

        return simhash(load_table(spark, DST, "documents"))

    results = {}
    for name, fn in [
        ("graph_pagerank", q_pagerank),
        ("graph_bfs", q_bfs),
        ("graph_sssp", q_sssp),
        ("mxm_plus_times", q_mxm),
        ("dedup_simhash", q_simhash),
    ]:
        spark.sparkContext.setJobDescription(f"warmup {name}")
        t0 = time.time()
        fn().write.mode("overwrite").format("noop").save()
        print(f"# warmup {name}: {time.time() - t0:.2f}s", file=sys.stderr)
        samples = []
        for r in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} [{r}]")
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
        results[name] = {"min": min(samples), "samples": samples}
        print(f"{name}: min {min(samples):.3f}  samples {samples}")
    print(json.dumps({"cpus": int(cpus), "replicas": REPLICAS, "results": results}))


if __name__ == "__main__":
    main()

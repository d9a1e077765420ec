"""Skew before/after demo for SCALE.md.

Builds a hub-heavy power-law graph (node 0 owns a constant fraction of all
in-edges) and times a 2-hop expand join three ways:

  1. AQE skew-join split ON   (the default session config)
  2. AQE skew-join split OFF  (one straggler task owns the hub partition)
  3. manual salting            (salt_join_skewed, the documented fallback)

Run: python scripts/skew_demo.py [n_nodes] [n_edges]
Prints one JSON line; results are recorded in SCALE.md.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from g4s_spark.graph.synth import power_law_graph, salt_join_skewed
from g4s_spark.session import get_spark


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    spark = get_spark("skew_demo")
    # force the shuffle path: SMJ, no broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # skew detection works on COMPRESSED shuffle sizes; a hub partition of
    # repeated keys compresses ~5×, so the detection threshold must sit
    # well under hub-partition-bytes/5 to fire
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

    g = power_law_graph(spark, n_nodes=n_nodes, n_edges=n_edges, alpha=5.0, seed=11)
    g = g.repartition(32).cache()
    g.count()

    hub = g.groupBy("dst").count().orderBy(F.desc("count")).first()
    # expand join: hub-skewed edge endpoints against the node table —
    # the shape of a Filter/Expand hop at scale
    e1 = g.select(F.col("src").alias("a"), F.col("dst").alias("k"))
    nodes = spark.range(n_nodes).select(
        F.col("id").alias("k2"), (F.col("id") * 2).alias("payload")
    )

    def run(tag):
        t0 = time.monotonic()
        cnt = e1.join(nodes, e1["k"] == nodes["k2"]).groupBy().agg(
            F.count(F.lit(1)).alias("n")
        )
        n = cnt.collect()[0]["n"]
        dt = time.monotonic() - t0
        plan = cnt._jdf.queryExecution().executedPlan().toString()
        return {"rows": n, "sec": round(dt, 2), "skew_split": "skew=true" in plan}

    out = {"n_nodes": n_nodes, "n_edges": n_edges,
           "hub_in_degree": hub["count"], "hub_id": hub["dst"]}

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    out["aqe_off"] = run("aqe_off")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["aqe_skew_split"] = run("aqe_on")

    t0 = time.monotonic()
    n_salted = salt_join_skewed(e1, nodes, "k", "k2", n_salts=16).count()
    out["salted"] = {"rows": n_salted, "sec": round(time.monotonic() - t0, 2)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()

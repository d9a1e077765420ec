"""Round-15 debut-gate staging area (successor to r14_queue.py —
the r14 debuts text_token_bpe + graph_resource_alloc LANDED in
__spark_entry__ in round 14; git history keeps the old file).

Gates here are BUILT AND ORACLE-VERIFIED but wait for registry
capacity: after the r14 debuts the registry is **191** of the 192 D=2
steady-state trip-wire. ONE debut remains: graph_random_walks lands at
r15 (registry 192, AT the trip-wire). From r15 on, every new debut
pairs with a genuine-subsumption retirement — the steady-state rule is
written in tests/test_entry_contract.py::
test_registry_under_sustainable_ledger_capacity; NOTES.md "r16+
retirement candidates" pre-stages the lookup.

- graph_random_walks: deterministic md5-keyed DeepWalk-style walks
  over the part->supplier digraph; the oracle unrolls the per-step
  arg_min(md5) draws (md5 byte-identical across engines).

Verify locally:  python scripts/r15_queue.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from g4s_spark.sources import load_table


def _q_graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-keyed walks (round-11, DeepWalk corpus
    generation) over the part->supplier digraph (the graph_scc
    fixture): 3 steps from every source node; the oracle unrolls the
    per-step arg_min(md5) draws — md5 is byte-identical across Spark,
    DuckDB, and hashlib."""
    from pyspark.sql import functions as F

    from g4s_spark.graph.tpch import PART_OFF, SUPPLIER_OFF
    from g4s_spark.operators import random_walks

    li = load_table(spark, sf_dir, "lineitem")
    pid = (F.lit(PART_OFF) + F.col("l_partkey")).cast("long")
    sid = (F.lit(SUPPLIER_OFF) + F.col("l_suppkey")).cast("long")
    fwd = li.select(pid.alias("src"), sid.alias("dst"))
    back = li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linenumber") == 1)
    ).select(sid.alias("src"), pid.alias("dst"))
    edges = fwd.unionByName(back)
    return random_walks(edges, length=3, walks_per_node=1, seed=42)


QUEUE_QUERIES = {
    "graph_random_walks": _q_graph_random_walks,
}

QUEUE_ORACLES = {
    "graph_random_walks": None,  # built below (needs the id offsets)
}


def _random_walks_oracle() -> str:
    """Three unrolled arg_min(md5) draw steps over the part->supplier
    digraph — the exact per-step key string Spark's concat_ws builds:
    'seed:start:rep:t:dst' with longs rendered bare."""
    from g4s_spark.graph.tpch import PART_OFF, SUPPLIER_OFF

    def step(t: int, prev: str) -> str:
        return f"""
        s{t} AS (
            SELECT w.start,
                   arg_min(e.dst, md5('42:' || CAST(w.start AS VARCHAR)
                                      || ':0:{t}:' || CAST(e.dst AS VARCHAR)))
                   AS node
            FROM {prev} w JOIN e ON e.src = w.node GROUP BY w.start
        )"""

    return f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT CAST({PART_OFF} + l_partkey AS BIGINT) AS src,
                   CAST({SUPPLIER_OFF} + l_suppkey AS BIGINT) AS dst
            FROM lineitem
            UNION
            SELECT DISTINCT CAST({SUPPLIER_OFF} + l_suppkey AS BIGINT),
                   CAST({PART_OFF} + l_partkey AS BIGINT)
            FROM lineitem WHERE l_returnflag = 'R' AND l_linenumber = 1
        ),
        w0 AS (SELECT DISTINCT src AS start, src AS node FROM e),
        {step(1, 'w0')},
        {step(2, 's1')},
        {step(3, 's2')}
        SELECT start, CAST(0 AS BIGINT) AS rep, CAST(0 AS BIGINT) AS step, node FROM w0
        UNION ALL SELECT start, 0, 1, node FROM s1
        UNION ALL SELECT start, 0, 2, node FROM s2
        UNION ALL SELECT start, 0, 3, node FROM s3
    """


QUEUE_ORACLES["graph_random_walks"] = _random_walks_oracle()


def main() -> None:
    sys.path.insert(0, "/root/repo/scripts")
    from check_correctness import run_queue

    run_queue(QUEUE_QUERIES, QUEUE_ORACLES, app_name="r15_queue")


if __name__ == "__main__":
    main()

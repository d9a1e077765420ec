"""Round-14/15 debut-gate staging area (successor to r13_queue.py —
the r13 debuts events_range_stream + dedup_semantic LANDED in
__spark_entry__ in round 13; git history keeps the old file).

Gates here are BUILT AND ORACLE-VERIFIED but wait for registry
capacity: after the r13 debuts the registry is **189** of the 192 D=2
steady-state trip-wire. The remaining queue lands exactly at capacity
with no budget widening: TWO debuts at r14 (text_token_bpe +
graph_resource_alloc → 191), ONE at r15 (graph_random_walks → 192, AT
the trip-wire). From r15 on, every new debut pairs with a
genuine-subsumption retirement — the steady-state rule is written in
tests/test_entry_contract.py::test_registry_under_sustainable_ledger_capacity.

- text_token_bpe: token_count(mode='bpe') — GPT-2-style pre-token
  counts; the lookahead-free pattern is engine-identical in Java regex
  and DuckDB RE2 (cross-checked r11; whitespace as an explicit class
  because Python/Java \\s includes \\x0B and RE2's does not — r12).
- graph_resource_alloc: resource-allocation link prediction (Zhou
  2009) — common_neighbor_scores over the co-purchase projection;
  exact rational weights, the jaccard oracle's join with a 1/deg(nb)
  weight.
- graph_random_walks: deterministic md5-keyed DeepWalk-style walks
  over the part->supplier digraph; the oracle unrolls the per-step
  arg_min(md5) draws (md5 byte-identical across engines).

Verify locally:  python scripts/r14_queue.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from g4s_spark.sources import load_table


def _q_text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style pre-token counts (round-11 token_count mode='bpe'):
    the lookahead-free pattern evaluates identically in Java regex and
    DuckDB's RE2 (cross-checked round-11), so the oracle is the same
    regexp_extract_all length."""
    from g4s_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    return token_count(docs, mode="bpe")


def _q_graph_resource_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-allocation link prediction (Zhou 2009) over the
    co-purchase projection: Σ 1/deg(w) across shared neighbors —
    exact rational per term, rounded like graph_harmonic's 1/d sums."""
    from pyspark.sql import functions as F

    from g4s_spark.functions.rounding import pround
    from g4s_spark.operators import common_neighbor_scores

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l1 = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    l2 = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    pairs = (
        l1.join(l2, on="o")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    out = common_neighbor_scores(
        pairs, index="resource_allocation", min_shared=40
    )
    return out.select("x", "y", "shared", pround(F.col("score"), 6).alias("score"))


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
    "text_token_bpe": _q_text_token_bpe,
    "graph_resource_alloc": _q_graph_resource_alloc,
    "graph_random_walks": _q_graph_random_walks,
}

QUEUE_ORACLES = {
    # same pattern, same engine semantics — whitespace as an EXPLICIT
    # class because Python/Java \s includes \x0B and RE2's does not
    # (round-12 review; re-verified identical across all three engines
    # on \x0B/\x1c-bearing inputs)
    "text_token_bpe": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(
                   text,
                   ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\f\r]+|[ \t\n\f\r]+'
               )) AS BIGINT) AS n_tokens
        FROM documents
    """,
    # the jaccard oracle's inverted-index join with a 1/deg(nb) weight
    # attached to the index rows (explicit DOUBLE so DuckDB does not
    # fall into DECIMAL arithmetic)
    "graph_resource_alloc": """
        WITH pairs AS (
            SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
            WHERE l1.l_partkey < l2.l_partkey
        ),
        sym AS (SELECT a AS n, b AS x FROM pairs UNION ALL SELECT b, a FROM pairs),
        deg AS (SELECT n, count(*) AS deg FROM sym GROUP BY 1),
        inv AS (
            SELECT sym.x AS nb, sym.n AS node,
                   CAST(1 AS DOUBLE) / d.deg AS w
            FROM sym JOIN deg d ON d.n = sym.x
        )
        SELECT l.node AS x, r.node AS y, CAST(count(*) AS BIGINT) AS shared,
               floor(sum(l.w) * 1000000 + 0.5) / 1000000 AS score
        FROM inv l JOIN inv r ON l.nb = r.nb AND l.node < r.node
        GROUP BY 1, 2 HAVING count(*) >= 40
    """,
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

    run_queue(QUEUE_QUERIES, QUEUE_ORACLES, app_name="r14_queue")


if __name__ == "__main__":
    main()

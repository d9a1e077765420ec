"""Round-11 debut-gate staging area — LIFTED in round 11.

The SIX gates here were BUILT AND ORACLE-VERIFIED in round 10 and
lifted verbatim into __spark_entry__._queries_unordered / oracle_sql at
round 11 (they lead _WINDOW_ORDER alongside the 37 forced r7 rotations
and 7 r8 refreshes — see NOTES.md "Draft r11 _WINDOW_ORDER"). CAPACITY
after the lift: the registry was 183 entering round 11 (the
cypher_merge retirement landed in round 10 itself); 183 + 6 debuts − 1
retirement (graph_closeness → graph_harmonic, RETIRED_GATES.json) =
188 of the 190 trip-wire.

Three of the gates drive the round-10 asof_join direction/tolerance
surface at the driver: forward and nearest directions (pandas
merge_asof parity; DuckDB's native ASOF JOIN accepts any inequality, so
forward gets the same native-oracle strength as events_asof), and the
backward tolerance path (stale matches null out but rows survive). The
other three: graph_neighbor_agg (GraphSAGE layered ego aggregation),
cypher_deep_chain (the VERDICT r9 #9 deep-closure gate, 15-40 walk
levels), dedup_canonical (quality-aware cluster representatives).

This file stays as the standalone verification harness:
    python scripts/r11_queue.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g4s_spark.functions.rounding import pround
from g4s_spark.functions.temporal import asof_join
from g4s_spark.graph.tpch import ORDER_OFF, PART_OFF, SUPPLIER_OFF
from g4s_spark.operators import neighbor_agg
from g4s_spark.sources import load_table


def _clicks_purchases(spark: SparkSession, sf_dir: str):
    """The events_asof fixture: clicks as the point stream, purchases
    pre-aggregated to one row per (user, ts) so the match is
    deterministic."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    return clicks, purchases


def _q_events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: each click picks the user's EARLIEST purchase
    at-or-after it; the oracle is DuckDB's native ASOF LEFT JOIN with
    the inequality flipped (c.ts <= p.ts)."""
    clicks, purchases = _clicks_purchases(spark, sf_dir)
    out = asof_join(clicks, purchases, on="user_id", direction="forward")
    return out.select("event_id", "user_id", "ts", "ts_r", "pvalue_r")


def _q_events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of: closer of the backward/forward candidates, exact
    ties to backward (pandas tie-break). The oracle ranks all same-user
    purchases by |delta| with the backward-first tie-break."""
    clicks, purchases = _clicks_purchases(spark, sf_dir)
    out = asof_join(clicks, purchases, on="user_id", direction="nearest")
    return out.select("event_id", "user_id", "ts", "ts_r", "pvalue_r")


def _q_events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 1-hour tolerance: a match staler than the
    budget nulls out but the click row survives (left-outer) — the
    tolerance is measured against the MATCHED row's timestamp."""
    clicks, purchases = _clicks_purchases(spark, sf_dir)
    out = asof_join(clicks, purchases, on="user_id", tolerance_s=3600)
    return out.select("event_id", "user_id", "ts", "ts_r", "pvalue_r")


def _q_graph_neighbor_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style 2-hop neighbor aggregation (round-10,
    operators/features.py) on the part<->supplier digraph (the
    graph_scc fixture): hop 1 sums each node's out-neighbors' balance
    feature; hop 2 sums the hop-1 SUMMARIES (layered ego aggregation,
    not the flat 2-hop multiset). Feature = s_acctbal on suppliers,
    p_retailprice on parts."""
    li = load_table(spark, sf_dir, "lineitem")
    pid = (F.lit(PART_OFF) + F.col("l_partkey")).cast("long")
    sid = (F.lit(SUPPLIER_OFF) + F.col("l_suppkey")).cast("long")
    fwd = li.select(pid.alias("src"), sid.alias("dst"))
    back = li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linenumber") == 1)
    ).select(sid.alias("src"), pid.alias("dst"))
    edges = fwd.unionByName(back).dropDuplicates(["src", "dst"])
    sup = load_table(spark, sf_dir, "supplier").select(
        (F.lit(SUPPLIER_OFF) + F.col("s_suppkey")).cast("long").alias("id"),
        F.col("s_acctbal").cast("double").alias("bal"),
    )
    prt = load_table(spark, sf_dir, "part").select(
        (F.lit(PART_OFF) + F.col("p_partkey")).cast("long").alias("id"),
        F.col("p_retailprice").cast("double").alias("bal"),
    )
    out = neighbor_agg(edges, sup.unionByName(prt), agg="sum", hops=2)
    return out.select("id", pround(F.col("bal"), 2).alias("bal2"))


def _q_cypher_deep_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep semi-naive closure (VERDICT r9 #9): per-customer order
    CHAINS (orders linked in (o_orderdate, o_orderkey) sequence) give
    walk depths of 15-40 levels — far past the ~6 the TPC-H relation
    graph reaches — so length(p) over [:NEXT*] exercises the
    MAX_CLOSURE_ITERS=64 iteration guard well into its range; an early
    bail-out could not silently pass (the deepest pairs would vanish
    and the hash would differ)."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    seq = orders.select(
        (F.lit(ORDER_OFF) + F.col("o_orderkey")).cast("long").alias("id"),
        "o_custkey",
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("rn"),
    )
    a, b = seq.alias("a"), seq.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("b.rn") == F.col("a.rn") + 1),
        )
        .select(
            F.col("a.id").alias("src"),
            F.col("b.id").alias("dst"),
            F.lit("NEXT").alias("type"),
        )
    )
    nodes = seq.select("id", F.lit("Order").alias("label"))
    g = PropertyGraph(nodes, edges, spark)
    return run_cypher(
        g, "MATCH p = (a:Order)-[:NEXT*]->(b:Order) RETURN a, b, length(p) AS len"
    )


def _q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection (round-10,
    dedup.select_canonical): MinHash-LSH clusters over the corpus, then
    ONE surviving row per cluster — longest document wins, ties to the
    lowest doc id. The oracle wraps the existing dedup_clusters SQL
    twin with the same argmax."""
    from g4s_spark.functions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    cl = D.dedup_clusters(docs)
    out = D.select_canonical(
        docs.select("doc_id", "source", "n_chars"), cl, score_col="n_chars"
    )
    return out.select("doc_id", "cluster", "source", "n_chars")


QUEUE_QUERIES = {
    "events_asof_forward": _q_events_asof_forward,
    "events_asof_nearest": _q_events_asof_nearest,
    "events_asof_tolerance": _q_events_asof_tolerance,
    "graph_neighbor_agg": _q_graph_neighbor_agg,
    "cypher_deep_chain": _q_cypher_deep_chain,
    "dedup_canonical": _q_dedup_canonical,
}

_CLICKS_PURCHASES_SQL = """
    clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, max(value) AS pvalue
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
"""

QUEUE_ORACLES = {
    # native ASOF with the flipped inequality: smallest p.ts >= c.ts
    "events_asof_forward": f"""
        WITH {_CLICKS_PURCHASES_SQL}
        SELECT c.event_id, c.user_id, c.ts,
               p.ts AS ts_r, p.pvalue AS pvalue_r
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
    # nearest: rank every same-user candidate by |delta|; the tie-break
    # (p.ts ASC) selects the backward candidate on an exact tie — the
    # pandas merge_asof convention the Spark side follows
    "events_asof_nearest": f"""
        WITH {_CLICKS_PURCHASES_SQL}
        SELECT event_id, user_id, ts, ts_r, pvalue_r FROM (
            SELECT c.event_id, c.user_id, c.ts,
                   p.ts AS ts_r, p.pvalue AS pvalue_r,
                   row_number() OVER (
                       PARTITION BY c.event_id
                       ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)) ASC,
                                p.ts ASC
                   ) AS rnk
            FROM clicks c LEFT JOIN purchases p ON c.user_id = p.user_id
        ) WHERE rnk = 1
    """,
    # backward + tolerance: the native ASOF picks the latest-at-or-
    # before row, then a stale match (> 1 h) nulls out while the click
    # row survives — exactly asof_join's left-outer tolerance semantics
    "events_asof_tolerance": f"""
        WITH {_CLICKS_PURCHASES_SQL}
        SELECT c.event_id, c.user_id, c.ts,
               CASE WHEN epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
                    THEN p.ts END AS ts_r,
               CASE WHEN epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
                    THEN p.pvalue END AS pvalue_r
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    # two unrolled hop CTEs: hop 2 aggregates hop-1 aggregates (the
    # layered ego-summary semantics neighbor_agg documents)
    "graph_neighbor_agg": f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT CAST({PART_OFF} + l_partkey AS BIGINT) AS src,
                   CAST({SUPPLIER_OFF} + l_suppkey AS BIGINT) AS dst
            FROM lineitem
            UNION
            SELECT DISTINCT CAST({SUPPLIER_OFF} + l_suppkey AS BIGINT),
                   CAST({PART_OFF} + l_partkey AS BIGINT)
            FROM lineitem WHERE l_returnflag = 'R' AND l_linenumber = 1
        ),
        f0 AS (
            SELECT CAST({SUPPLIER_OFF} + s_suppkey AS BIGINT) AS id,
                   CAST(s_acctbal AS DOUBLE) AS bal
            FROM supplier
            UNION ALL
            SELECT CAST({PART_OFF} + p_partkey AS BIGINT),
                   CAST(p_retailprice AS DOUBLE)
            FROM part
        ),
        f1 AS MATERIALIZED (
            SELECT e.src AS id, sum(f0.bal) AS bal
            FROM e JOIN f0 ON f0.id = e.dst GROUP BY e.src
        ),
        f2 AS (
            SELECT e.src AS id, sum(f1.bal) AS bal
            FROM e JOIN f1 ON f1.id = e.dst GROUP BY e.src
        )
        SELECT id, floor(bal * 100 + 0.5) / 100 AS bal2 FROM f2
    """,
    # acyclic per-customer chains: every (a, b) pair has EXACTLY one
    # walk, so length(p) is the plain recursion depth — no min needed
    "cypher_deep_chain": f"""
        WITH RECURSIVE seq AS (
            SELECT CAST({ORDER_OFF} + o_orderkey AS BIGINT) AS id, o_custkey,
                   row_number() OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ) AS rn
            FROM orders
        ),
        chain AS MATERIALIZED (
            SELECT a.id AS src, b.id AS dst
            FROM seq a JOIN seq b
              ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1
        ),
        walk(src, dst, d) AS (
            SELECT src, dst, CAST(1 AS BIGINT) FROM chain
            UNION ALL
            SELECT w.src, c.dst, w.d + 1 FROM walk w JOIN chain c ON c.src = w.dst
        )
        SELECT src AS a, dst AS b, d AS len FROM walk
    """,
    "dedup_canonical": None,  # built below from the live dedup_clusters oracle
}


def _dedup_canonical_oracle() -> str:
    """Wrap the registry's dedup_clusters SQL twin (min-id propagation
    over the MinHash-LSH pair graph) with the quality argmax: per
    cluster, keep max n_chars, ties -> min doc_id."""
    import __spark_entry__ as E

    base = E.oracle_sql()["dedup_clusters"]
    return f"""
        WITH cl AS ({base}),
        j AS (
            SELECT d.doc_id, cl.cluster, d.source, d.n_chars
            FROM documents d JOIN cl USING (doc_id)
        )
        SELECT doc_id, cluster, source, n_chars FROM (
            SELECT j.*, row_number() OVER (
                PARTITION BY cluster ORDER BY n_chars DESC, doc_id ASC
            ) AS rk FROM j
        ) WHERE rk = 1
    """


QUEUE_ORACLES["dedup_canonical"] = _dedup_canonical_oracle()


def main() -> None:
    sys.path.insert(0, "/root/repo/scripts")
    from check_correctness import run_queue

    run_queue(QUEUE_QUERIES, QUEUE_ORACLES, app_name="r11_queue")


if __name__ == "__main__":
    main()

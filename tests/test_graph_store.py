"""Graph store mutation/lookup tests (SURVEY §2.5: insertVertex/insertEdge/
getV semantics, ConcurrentDirectedGraph.scala:104-153) and stats
maintenance (StatsStore convergence, StatsStoreSpec.scala:49-121)."""

import pytest
from pyspark.sql import functions as F

from g4s_spark.graph import GraphStats, PropertyGraph
from g4s_spark.plans import run_cypher


def test_insert_vertices_and_edges_visible_to_queries(spark):
    g = PropertyGraph.from_tuples(
        spark, nodes=[(0, "A"), (1, "B")], edges=[(0, 1, "X")]
    )
    assert {tuple(r) for r in run_cypher(g, "MATCH (a:A)-[:X]->(b:B) RETURN b").collect()} == {(1,)}

    nid = g.next_id()
    assert nid == 2
    g2 = g.insert_vertices(spark.createDataFrame([(nid, "B")], "id long, label string"))
    g2 = g2.insert_edges(spark.createDataFrame([(0, nid, "X")], "src long, dst long, type string"))
    got = {tuple(r) for r in run_cypher(g2, "MATCH (a:A)-[:X]->(b:B) RETURN b").collect()}
    assert got == {(1,), (2,)}
    # original graph unchanged (immutability)
    assert g.nodes.count() == 2


def test_get_vs_payload_lookup(spark):
    g = PropertyGraph.from_tuples(spark, nodes=[(0, "A"), (1, "B"), (2, "C")], edges=[])
    ids = spark.createDataFrame([(1,), (2,)], "nid long")
    got = {(r.id, r.label) for r in g.get_vs(ids).select("id", "label").collect()}
    assert got == {(1, "B"), (2, "C")}


def test_stats_selectivities(spark):
    # 60/30/10 label mix (StatsStoreSpec.scala:49-121)
    nodes = [(i, "A") for i in range(60)] + [(100 + i, "B") for i in range(30)] + [
        (200 + i, "C") for i in range(10)
    ]
    g = PropertyGraph.from_tuples(spark, nodes, [])
    s = g.stats
    assert s.node_sel("A") == pytest.approx(0.6)
    assert s.node_sel("B") == pytest.approx(0.3)
    assert s.node_sel("C") == pytest.approx(0.1)
    assert s.node_sel(None) == 1.0
    assert s.label_card("A") == 60


def test_typed_edges_transpose(spark):
    g = PropertyGraph.from_tuples(spark, nodes=[(0, "A"), (1, "B")], edges=[(0, 1, "X")])
    t = g.typed_edges(["X"], transpose=True).select("src", "dst").collect()
    assert [(r.src, r.dst) for r in t] == [(1, 0)]


def test_empty_graph(spark):
    g = PropertyGraph.empty(spark)
    assert g.next_id() == 0
    assert g.stats.node_count == 0
    assert run_cypher(g, "MATCH (a:A) RETURN a").count() == 0

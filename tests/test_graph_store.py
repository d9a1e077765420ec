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


def test_remove_vertices_cascades_edges(spark):
    """Delete-then-query visibility: removed nodes disappear from label
    scans AND their incident edges vanish from pattern matches (beyond
    the reference's unimplemented removeNode, StatsStore.scala:172-177)."""
    nodes = [(0, "A"), (1, "B"), (2, "B"), (3, "C")]
    edges = [(0, 1, "X"), (0, 2, "X"), (2, 3, "Y"), (1, 3, "Y")]
    g = PropertyGraph.from_tuples(spark, nodes, edges)
    g2 = g.remove_vertices(spark.createDataFrame([(2,)], "id long"))
    assert {r.id for r in g2.nodes.select("id").collect()} == {0, 1, 3}
    # edges touching node 2 cascaded away, others survive
    assert {(r.src, r.dst) for r in g2.edges.select("src", "dst").collect()} == {(0, 1), (1, 3)}
    got = run_cypher(g2, "MATCH (a:A)-[:X]->(b:B)-[:Y]->(c:C) RETURN a, b, c")
    assert [(r.a, r.b, r.c) for r in got.collect()] == [(0, 1, 3)]
    # original graph untouched (immutable rewrite)
    assert g.edges.count() == 4


def test_remove_edges_by_endpoints_and_type(spark):
    nodes = [(0, "A"), (1, "B")]
    edges = [(0, 1, "X"), (0, 1, "Y"), (1, 0, "X")]
    g = PropertyGraph.from_tuples(spark, nodes, edges)
    # typed delete removes only the (src,dst,type) row
    g2 = g.remove_edges(spark.createDataFrame([(0, 1, "X")], "src long, dst long, type string"))
    assert {(r.src, r.dst, r.type) for r in g2.edges.collect()} == {(0, 1, "Y"), (1, 0, "X")}
    # untyped delete drops every parallel edge between the endpoints
    g3 = g.remove_edges(spark.createDataFrame([(0, 1)], "src long, dst long"))
    assert {(r.src, r.dst, r.type) for r in g3.edges.collect()} == {(1, 0, "X")}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="src and dst"):
        g.remove_edges(spark.createDataFrame([(1,)], "src long"))


def test_update_node_props_merge_and_replace(spark):
    """SET verb (round-6): += merge keeps untouched keys, update keys
    win; replace swaps the whole map; visibility through BOTH the graph
    API and a Cypher property read (VERDICT r5 #7)."""
    nodes = spark.createDataFrame(
        [
            (0, "Person", {"age": "30.0", "city": "berlin"}),
            (1, "Person", {"age": "40.0", "city": "paris"}),
        ],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame([], "src long, dst long, type string")
    g = PropertyGraph(nodes, edges, spark)
    upd = spark.createDataFrame(
        [(0, {"age": "31.0", "vip": "yes"})], "id long, props map<string,string>"
    )
    g2 = g.update_node_props(upd)
    got = {r.id: dict(r.props) for r in g2.nodes.collect()}
    assert got[0] == {"age": "31.0", "city": "berlin", "vip": "yes"}
    assert got[1] == {"age": "40.0", "city": "paris"}
    # Cypher property read sees the new value
    out = run_cypher(g2, "MATCH (p:Person) WHERE p.age >= 31 RETURN p, p.age AS age")
    assert sorted((r.p, r.age) for r in out.collect()) == [(0, "31.0"), (1, "40.0")]
    # replace semantics drop unmentioned keys
    g3 = g.update_node_props(upd, replace=True)
    got3 = {r.id: dict(r.props) for r in g3.nodes.collect()}
    assert got3[0] == {"age": "31.0", "vip": "yes"}
    # original untouched (immutable rewrite)
    assert {r.id: dict(r.props) for r in g.nodes.collect()}[0]["age"] == "30.0"


def test_update_node_props_without_props_column(spark):
    g = PropertyGraph.from_tuples(spark, [(0, "A"), (1, "A")], [])
    upd = g.spark.createDataFrame(
        [(1, {"k": "v"})], "id long, props map<string,string>"
    )
    g2 = g.update_node_props(upd)
    got = {r.id: (dict(r.props) if r.props is not None else None)
           for r in g2.nodes.collect()}
    assert got == {0: None, 1: {"k": "v"}}


def test_update_edge_weights(spark):
    nodes = [(0, "A"), (1, "B")]
    edges = [(0, 1, "X", 1.0), (1, 0, "X", 2.0)]
    g = PropertyGraph.from_tuples(spark, nodes, edges)
    upd = spark.createDataFrame(
        [(0, 1, 9.5)], "src long, dst long, weight double"
    )
    g2 = g.update_edge_weights(upd)
    got = {(r.src, r.dst): r.weight for r in g2.edges.collect()}
    assert got == {(0, 1): 9.5, (1, 0): 2.0}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="src and dst"):
        g.update_edge_weights(spark.createDataFrame([(1.0,)], "weight double"))


def test_cypher_set_statement(spark):
    """MATCH ... SET b.prop = literal: the query-language surface of
    update_node_props — matched nodes get the props, the rest and the
    input graph stay untouched; reads see the update."""
    from g4s_spark.plans import run_cypher_set

    nodes = spark.createDataFrame(
        [
            (0, "Person", {"city": "berlin"}),
            (1, "Person", {"city": "paris"}),
            (2, "Item", {"price": "5.0"}),
        ],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(0, 2, "BOUGHT")], "src long, dst long, type string"
    )
    g = PropertyGraph(nodes, edges, spark)
    g2 = run_cypher_set(
        g, "MATCH (p:Person)-[:BOUGHT]->(i:Item) SET p.vip = 'yes', i.price = 6"
    )
    got = {r.id: dict(r.props) for r in g2.nodes.collect()}
    assert got[0] == {"city": "berlin", "vip": "yes"}
    assert got[1] == {"city": "paris"}  # unmatched: untouched
    assert got[2] == {"price": "6"}
    # visible to a Cypher read on the updated graph
    out = run_cypher(g2, "MATCH (p:Person) WHERE p.vip = 'yes' RETURN p")
    assert [r.p for r in out.collect()] == [0]
    # input graph unchanged
    assert "vip" not in dict(
        {r.id: dict(r.props) for r in g.nodes.collect()}[0]
    )


def test_cypher_set_parse_errors(spark):
    from g4s_spark.cypher import CypherParseError
    from g4s_spark.plans import run_cypher_set

    g = PropertyGraph.from_tuples(spark, [(0, "A")], [])
    import pytest as _pytest
    with _pytest.raises(CypherParseError, match="unbound"):
        run_cypher_set(g, "MATCH (a:A) SET z.x = 1")
    with _pytest.raises(CypherParseError, match="SET statement"):
        run_cypher_set(g, "SET a.x = 1")


def test_update_node_props_dedups_duplicate_ids(spark):
    """Duplicate ids in the updates frame must not duplicate node rows
    through the left join (ADVICE r6)."""
    g = PropertyGraph.from_tuples(spark, [(0, "A"), (1, "A")], [])
    updates = spark.createDataFrame(
        [(0, {"x": "1"}), (0, {"x": "2"}), (1, {"y": "9"})],
        "id long, props map<string,string>",
    )
    g2 = g.update_node_props(updates)
    assert g2.nodes.count() == 2
    got = {r.id: dict(r.props) for r in g2.nodes.collect()}
    assert got[0]["x"] in ("1", "2") and got[1] == {"y": "9"}


def test_update_edge_weights_dedups_duplicate_keys(spark):
    g = PropertyGraph.from_tuples(
        spark, [(0, "A"), (1, "A")], [(0, 1, "E", 1.0)]
    )
    updates = spark.createDataFrame(
        [(0, 1, "E", 5.0), (0, 1, "E", 7.0)],
        "src long, dst long, type string, weight double",
    )
    g2 = g.update_edge_weights(updates)
    assert g2.edges.count() == 1
    w = g2.edges.collect()[0].weight
    assert w in (5.0, 7.0)


def test_merge_vertices_match_or_create_idempotent(spark):
    """MERGE (VERDICT r6 #6): existing (id,label) rows untouched, new
    rows append ONCE; re-running the same merge is a no-op and
    duplicates inside the merge batch insert once."""
    g = PropertyGraph.from_tuples(spark, [(0, "A"), (1, "A")], [])
    batch = spark.createDataFrame(
        [(1, "A"), (2, "A"), (2, "A"), (3, "B")], "id long, label string"
    )
    g2 = g.merge_vertices(batch)
    assert g2.nodes.count() == 4
    got = sorted((r.id, r.label) for r in g2.nodes.collect())
    assert got == [(0, "A"), (1, "A"), (2, "A"), (3, "B")]
    # idempotent re-run
    assert g2.merge_vertices(batch).nodes.count() == 4


def test_merge_edges_keeps_existing_attributes(spark):
    g = PropertyGraph.from_tuples(
        spark, [(0, "A"), (1, "A"), (2, "A")], [(0, 1, "E", 5.0)]
    )
    batch = spark.createDataFrame(
        [(0, 1, "E", 99.0), (1, 2, "E", 7.0)],
        "src long, dst long, type string, weight double",
    )
    g2 = g.merge_edges(batch)
    got = {(r.src, r.dst): r.weight for r in g2.edges.collect()}
    # existing edge keeps its weight (5.0, not 99.0); missing edge appends
    assert got == {(0, 1): 5.0, (1, 2): 7.0}
    assert g2.merge_edges(batch).edges.count() == 2


def test_cypher_set_expression_rhs(spark):
    """SET with an expression RHS (VERDICT r6 #4): increment and
    property-from-property, read back through run_cypher."""
    from g4s_spark.plans import run_cypher, run_cypher_set

    nodes = spark.createDataFrame(
        [(0, "P", {"cnt": "1", "base": "10"}), (1, "P", {"cnt": "4", "base": "20"}),
         (2, "Q", {"cnt": "9"})],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame([], "src long, dst long, type string")
    g = PropertyGraph(nodes, edges)
    g2 = run_cypher_set(g, "MATCH (p:P) SET p.cnt = p.cnt + 1, p.twice = p.base * 2")
    got = {r.id: dict(r.props) for r in g2.nodes.collect()}
    assert got[0]["cnt"] == "2.0" and got[0]["twice"] == "20.0"
    assert got[1]["cnt"] == "5.0" and got[1]["twice"] == "40.0"
    assert got[2] == {"cnt": "9"}  # other label untouched
    # read-back through the query path
    out = run_cypher(g2, "MATCH (p:P) WHERE p.twice > 30 RETURN p")
    assert [r.p for r in out.collect()] == [1]


def test_cypher_set_expression_rejects_cross_binding(spark):
    from g4s_spark.cypher import CypherParseError
    from g4s_spark.plans import run_cypher_set
    import pytest as _pytest

    g = PropertyGraph.from_tuples(
        spark, [(0, "A"), (1, "B")], [(0, 1, "E")]
    )
    with _pytest.raises(CypherParseError, match="only reference"):
        run_cypher_set(g, "MATCH (a:A)-[:E]->(b:B) SET a.x = b.y + 1")


def test_cypher_set_edge_weight(spark):
    """`SET e.weight = <number>` overwrites matched edges' weight via
    update_edge_weights; other types keep theirs (round-7)."""
    from g4s_spark.plans import run_cypher_set

    g = PropertyGraph.from_tuples(
        spark,
        [(0, "A"), (1, "B"), (2, "B"), (3, "C")],
        [(0, 1, "E", 1.0), (0, 2, "E", 1.0), (1, 3, "F", 7.0)],
    )
    g2 = run_cypher_set(g, "MATCH (a:A)-[e:E]->(b:B) SET e.weight = 9")
    got = {(r.src, r.dst, r.type): r.weight for r in g2.edges.collect()}
    assert got == {(0, 1, "E"): 9.0, (0, 2, "E"): 9.0, (1, 3, "F"): 7.0}
    # input untouched
    assert {r.weight for r in g.edges.collect()} == {1.0, 7.0}


def test_cypher_set_edge_weight_errors(spark):
    from g4s_spark.cypher import CypherParseError
    from g4s_spark.plans import run_cypher_set
    import pytest as _pytest

    g = PropertyGraph.from_tuples(
        spark, [(0, "A"), (1, "B")], [(0, 1, "E", 1.0)]
    )
    with _pytest.raises(CypherParseError, match="weight"):
        run_cypher_set(g, "MATCH (a:A)-[e:E]->(b:B) SET e.foo = 1")
    with _pytest.raises(CypherParseError, match="only reference"):
        run_cypher_set(g, "MATCH (a:A)-[e:E]->(b:B) SET e.weight = b.x + 1")


def test_cypher_set_edge_weight_expression(spark):
    """`SET e.weight = e.weight * 2 + 1` (round-7): the current weight
    rides the match as an edge-prop column and feeds the update."""
    from g4s_spark.plans import run_cypher_set

    g = PropertyGraph.from_tuples(
        spark,
        [(0, "A"), (1, "B"), (2, "B")],
        [(0, 1, "E", 3.0), (0, 2, "E", 5.0), (1, 2, "F", 7.0)],
    )
    g2 = run_cypher_set(g, "MATCH (a:A)-[e:E]->(b:B) SET e.weight = e.weight * 2 + 1")
    got = {(r.src, r.dst, r.type): r.weight for r in g2.edges.collect()}
    assert got == {(0, 1, "E"): 7.0, (0, 2, "E"): 11.0, (1, 2, "F"): 7.0}


def test_cypher_merge_node_create_and_noop(spark):
    """MERGE (n:L {props}) (round-8, VERDICT r7 #4): creates the node
    when absent (with ON CREATE SET props), is a no-op when present —
    idempotent re-run; input graph untouched."""
    from g4s_spark.plans import run_cypher, run_cypher_merge

    nodes = spark.createDataFrame(
        [(0, "City", {"name": "berlin"}), (1, "City", {"name": "paris"})],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame([], "src long, dst long, type string")
    g = PropertyGraph(nodes, edges, spark)
    g2 = run_cypher_merge(
        g, "MERGE (c:City {name: 'tokyo'}) ON CREATE SET c.pop = 37"
    )
    got = {r.id: dict(r.props) for r in g2.nodes.collect()}
    assert got[2] == {"name": "tokyo", "pop": "37"}
    # re-run: no-op (props identity matched)
    g3 = run_cypher_merge(
        g2, "MERGE (c:City {name: 'tokyo'}) ON CREATE SET c.pop = 99"
    )
    assert g3.nodes.count() == 3
    assert {r.id: dict(r.props) for r in g3.nodes.collect()}[2]["pop"] == "37"
    # existing node: no create, no mutation without ON MATCH
    g4 = run_cypher_merge(g, "MERGE (c:City {name: 'berlin'})")
    assert g4.nodes.count() == 2
    assert g.nodes.count() == 2  # immutable input


def test_cypher_merge_node_on_match_set(spark):
    """ON MATCH SET fires only for pre-existing matches, with
    expression RHS over the node's own props (VERDICT r7 missing #5)."""
    from g4s_spark.plans import run_cypher_merge

    nodes = spark.createDataFrame(
        [(0, "City", {"name": "berlin", "seen": "1"})],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame([], "src long, dst long, type string")
    g = PropertyGraph(nodes, edges, spark)
    g2 = run_cypher_merge(
        g,
        "MERGE (c:City {name: 'berlin'}) "
        "ON CREATE SET c.seen = 0 ON MATCH SET c.seen = c.seen + 1",
    )
    assert {r.id: dict(r.props) for r in g2.nodes.collect()}[0]["seen"] == "2.0"
    # unmatched pattern takes the ON CREATE branch instead
    g3 = run_cypher_merge(
        g,
        "MERGE (c:City {name: 'oslo'}) "
        "ON CREATE SET c.seen = 0 ON MATCH SET c.seen = c.seen + 1",
    )
    got = {dict(r.props)["name"]: dict(r.props) for r in g3.nodes.collect()}
    assert got["oslo"]["seen"] == "0" and got["berlin"]["seen"] == "1"


def test_cypher_merge_node_numeric_prop_match(spark):
    """Numeric pattern props match as doubles ('37' vs 37.0 — the
    WHERE-literal contract), so a re-merge after an expression SET
    still finds the node."""
    from g4s_spark.plans import run_cypher_merge

    nodes = spark.createDataFrame(
        [(0, "P", {"rank": "3.0"})], "id long, label string, props map<string,string>"
    )
    edges = spark.createDataFrame([], "src long, dst long, type string")
    g = PropertyGraph(nodes, edges, spark)
    g2 = run_cypher_merge(g, "MERGE (p:P {rank: 3})")
    assert g2.nodes.count() == 1


def test_cypher_merge_edge_create_and_on_match(spark):
    """MATCH ... MERGE (a)-[r:T]->(b): every distinct matched pair gets
    one T edge; ON CREATE SET stamps new edges only, ON MATCH SET
    rewrites pre-existing ones (expression over r.weight)."""
    from g4s_spark.plans import run_cypher_merge

    g = PropertyGraph.from_tuples(
        spark,
        [(0, "A"), (1, "B"), (2, "B")],
        [(0, 1, "E", 1.0), (0, 1, "T", 10.0)],
    )
    g2 = run_cypher_merge(
        g,
        "MATCH (a:A), (b:B) MERGE (a)-[r:T]->(b) "
        "ON CREATE SET r.weight = 2 ON MATCH SET r.weight = r.weight + 5",
    )
    got = {(r.src, r.dst, r.type): r.weight for r in g2.edges.collect()}
    assert got[(0, 1, "T")] == 15.0  # pre-existing: ON MATCH
    assert got[(0, 2, "T")] == 2.0  # created: ON CREATE
    assert got[(0, 1, "E")] == 1.0  # other type untouched
    # idempotent without ON MATCH mutation
    g3 = run_cypher_merge(g2, "MATCH (a:A), (b:B) MERGE (a)-[:T]->(b)")
    assert g3.edges.filter(F.col("type") == "T").count() == 2


def test_cypher_merge_edge_pattern_match_body(spark):
    """The MATCH body runs through the normal planner (patterns + WHERE),
    and only the surviving pairs merge."""
    from g4s_spark.plans import run_cypher_merge

    nodes = spark.createDataFrame(
        [(0, "A", {"x": "1"}), (1, "A", {"x": "9"}), (2, "B", None), (3, "C", None)],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(0, 2, "E", None), (1, 2, "E", None)], "src long, dst long, type string, weight double"
    )
    g = PropertyGraph(nodes, edges, spark)
    g2 = run_cypher_merge(
        g, "MATCH (a:A)-[:E]->(b:B), (c:C) WHERE a.x >= 5 MERGE (a)-[:LINK]->(c)"
    )
    links = {(r.src, r.dst) for r in g2.edges.filter(F.col("type") == "LINK").collect()}
    assert links == {(1, 3)}


def test_cypher_merge_parse_errors(spark):
    from g4s_spark.cypher import CypherParseError
    from g4s_spark.plans import run_cypher_merge
    import pytest as _pytest

    g = PropertyGraph.from_tuples(spark, [(0, "A"), (1, "B")], [(0, 1, "E")])
    with _pytest.raises(CypherParseError, match="MERGE statement"):
        run_cypher_merge(g, "MERGE nonsense")
    with _pytest.raises(CypherParseError, match="not bound"):
        run_cypher_merge(g, "MATCH (a:A) MERGE (a)-[:T]->(zz)")
    with _pytest.raises(CypherParseError, match="target"):
        run_cypher_merge(g, "MERGE (n:A {k: 'v'}) ON CREATE SET m.x = 1")
    with _pytest.raises(CypherParseError, match="only reference"):
        run_cypher_merge(
            g, "MATCH (a:A), (b:B) MERGE (a)-[r:T]->(b) ON MATCH SET r.weight = a.x + 1"
        )
    with _pytest.raises(CypherParseError, match="duplicate ON"):
        run_cypher_merge(g, "MERGE (n:A {k: 'v'}) ON CREATE SET n.x = 1 ON CREATE SET n.y = 2")


def test_graphdb_update_routes_merge(spark):
    from g4s_spark.db import GraphDB

    g = PropertyGraph.from_tuples(spark, [(0, "A")], [])
    db = GraphDB(g)
    db2 = db.update("MERGE (n:A {k: 'v'})")
    assert db2.graph.nodes.count() == 2


def test_graphdb_update_verb_routing_ignores_literals(spark):
    """Verb keywords INSIDE quoted string values must not hijack the
    route (round-9, VERDICT r8 #2): the router scans a literal-masked
    copy of the statement, so ``SET c.note = 'please DELETE'`` executes
    as SET and a DELETE whose WHERE compares against ``'CREATE (x)'``
    still deletes."""
    from g4s_spark.db import GraphDB

    nodes = spark.createDataFrame(
        [(0, "A", {"k": "CREATE (x)"}), (1, "B", {"k": "keep"})],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame([], "src long, dst long, type string")
    db = GraphDB(PropertyGraph(nodes, edges, spark))

    # every mutation keyword, inside a SET literal: must route to SET
    for lit in ("please DELETE me", "then MERGE (x)", "REMOVE it",
                "CREATE (y)", "DETACH DELETE all"):
        db2 = db.update(f"MATCH (a:A) SET a.note = '{lit}'")
        got = {r.id: dict(r.props) for r in db2.graph.nodes.collect()}
        assert got[0]["note"] == lit, lit  # executed as SET
        assert set(got) == {0, 1}, lit  # nothing deleted / created

    # a real DELETE whose literal contains 'CREATE (' still deletes
    db3 = db.update("MATCH (a:A) WHERE a.k = 'CREATE (x)' DETACH DELETE a")
    assert {r.id for r in db3.graph.nodes.collect()} == {1}
    # bare verbs still route (regression guard for the masking)
    assert db.update("CREATE (n:C {k: 'v'})").graph.nodes.count() == 3
    assert db.update("MERGE (n:A {k: 'new'})").graph.nodes.count() == 3


def test_graphdb_update_routing_escaped_quotes(spark):
    """ADVICE r9 (low): a backslash-escaped quote inside a literal —
    ``SET a.note = 'it\\'s a DELETE'`` — must never de-sync the mask and
    misroute to the DELETE runner. The literal grammar can't execute
    escaped quotes anyway (every literal regex repo-wide is '[^']*'),
    so the router REJECTS them with a clear error instead of routing;
    unbalanced quotes are likewise rejected, and the double-quote style
    carries an apostrophe fine. ADVICE r10 (low): a literal whose
    content merely ENDS in a backslash ('dir\\') is grammar-parseable
    and must still EXECUTE — the r10 blanket \\' rejection over-fired
    on it."""
    import pytest

    from g4s_spark.db import GraphDB

    nodes = spark.createDataFrame(
        [(0, "A", {"k": "v"})], "id long, label string, props map<string,string>"
    )
    edges = spark.createDataFrame([], "src long, dst long, type string")
    db = GraphDB(PropertyGraph(nodes, edges, spark))
    with pytest.raises(ValueError, match="escaped quotes"):
        db.update(r"MATCH (a:A) SET a.note = 'it\'s a DELETE'")
    with pytest.raises(ValueError, match="unbalanced"):
        db.update("MATCH (a:A) SET a.note = 'truncated DELETE")
    # ADVICE r11 (medium): an EVEN count of escaped quotes pairs up
    # wrongly under the no-escape grammar and leaks literal content
    # into the routing text with NO unpaired quote left — the
    # mask-divergence check must reject it (before the fix this routed
    # to the DELETE runner on leaked literal content)
    with pytest.raises(ValueError, match="escaped quotes"):
        db.update(r'MATCH (a:A) SET a.note = "x \" DETACH DELETE a \""')
    # nothing was deleted by either rejected statement
    assert {r.id for r in db.graph.nodes.collect()} == {0}
    # the supported spelling: apostrophe inside double quotes routes to
    # SET even though the literal contains a DELETE keyword
    db2 = db.update('MATCH (a:A) SET a.note = "it\'s a DELETE"')
    got = {r.id: dict(r.props) for r in db2.graph.nodes.collect()}
    assert got[0]["note"] == "it's a DELETE"
    # a trailing backslash inside a literal is NOT an escaped quote to
    # the grammar ('[^']*' parses 'dir\' fine) — it routes and executes
    db3 = db.update(r"MATCH (a:A) SET a.note = 'dir\'")
    got3 = {r.id: dict(r.props) for r in db3.graph.nodes.collect()}
    assert got3[0]["note"] == "dir\\"


def test_cypher_delete_edge_and_detach_node(spark):
    """[DETACH] DELETE (round-8): edge-variable deletes remove matched
    (src,dst,type) rows; DETACH DELETE cascades incident edges; input
    graph untouched."""
    from g4s_spark.plans import run_cypher_delete

    g = PropertyGraph.from_tuples(
        spark,
        [(0, "A"), (1, "B"), (2, "B"), (3, "C")],
        [(0, 1, "E"), (0, 2, "E"), (1, 3, "F"), (2, 3, "F")],
    )
    g2 = run_cypher_delete(g, "MATCH (a:A)-[e:E]->(b:B) DELETE e")
    assert {(r.src, r.dst, r.type) for r in g2.edges.collect()} == {
        (1, 3, "F"), (2, 3, "F")
    }
    g3 = run_cypher_delete(g, "MATCH (b:B) DETACH DELETE b")
    assert {r.id for r in g3.nodes.collect()} == {0, 3}
    assert g3.edges.count() == 0
    assert g.edges.count() == 4  # immutable input


def test_cypher_delete_plain_requires_no_relationships(spark):
    """openCypher: plain DELETE of a connected node raises unless this
    same statement also deletes its relationships."""
    from g4s_spark.plans import run_cypher_delete
    import pytest as _pytest

    g = PropertyGraph.from_tuples(
        spark, [(0, "A"), (1, "B"), (9, "Z")], [(0, 1, "E")]
    )
    with _pytest.raises(ValueError, match="DETACH"):
        run_cypher_delete(g, "MATCH (b:B) DELETE b")
    # isolated node: plain DELETE fine
    g2 = run_cypher_delete(g, "MATCH (z:Z) DELETE z")
    assert {r.id for r in g2.nodes.collect()} == {0, 1}
    # deleting the edge in the same statement unblocks the node delete
    g3 = run_cypher_delete(g, "MATCH (a:A)-[e:E]->(b:B) DELETE e, b")
    assert {r.id for r in g3.nodes.collect()} == {0, 9}
    assert g3.edges.count() == 0


def test_cypher_delete_parse_errors(spark):
    from g4s_spark.cypher import CypherParseError
    from g4s_spark.plans import run_cypher_delete
    import pytest as _pytest

    g = PropertyGraph.from_tuples(spark, [(0, "A")], [])
    with _pytest.raises(CypherParseError, match="unbound"):
        run_cypher_delete(g, "MATCH (a:A) DELETE z")
    with _pytest.raises(CypherParseError, match="DELETE statement"):
        run_cypher_delete(g, "DELETE a")


def test_cypher_remove_drops_props(spark):
    """REMOVE n.prop (round-8): matched nodes lose the key (reads back
    NULL), other nodes/keys untouched; absent key is a no-op."""
    from g4s_spark.plans import run_cypher, run_cypher_remove

    nodes = spark.createDataFrame(
        [
            (0, "P", {"vip": "yes", "city": "berlin"}),
            (1, "P", {"city": "paris"}),
            (2, "Q", {"vip": "yes"}),
        ],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame([], "src long, dst long, type string")
    g = PropertyGraph(nodes, edges, spark)
    g2 = run_cypher_remove(g, "MATCH (p:P) REMOVE p.vip")
    got = {r.id: dict(r.props) for r in g2.nodes.collect()}
    assert got[0] == {"city": "berlin"}
    assert got[1] == {"city": "paris"}
    assert got[2] == {"vip": "yes"}  # other label untouched
    out = run_cypher(g2, "MATCH (p:P) WHERE p.vip IS NULL RETURN p")
    assert sorted(r.p for r in out.collect()) == [0, 1]
    # input untouched
    assert dict({r.id: dict(r.props) for r in g.nodes.collect()}[0])["vip"] == "yes"


def test_cypher_remove_errors(spark):
    from g4s_spark.cypher import CypherParseError
    from g4s_spark.plans import run_cypher_remove
    import pytest as _pytest

    g = PropertyGraph.from_tuples(spark, [(0, "A"), (1, "B")], [(0, 1, "E")])
    with _pytest.raises(CypherParseError, match="unbound"):
        run_cypher_remove(g, "MATCH (a:A) REMOVE z.x")
    with _pytest.raises(CypherParseError, match="edge"):
        run_cypher_remove(g, "MATCH (a:A)-[e:E]->(b:B) REMOVE e.weight")


def test_graphdb_update_routes_delete_and_remove(spark):
    from g4s_spark.db import GraphDB

    nodes = spark.createDataFrame(
        [(0, "A", {"k": "v"}), (1, "A", None)],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame([], "src long, dst long, type string")
    db = GraphDB(PropertyGraph(nodes, edges, spark))
    assert db.update("MATCH (a:A) DETACH DELETE a").graph.nodes.count() == 0
    g2 = db.update("MATCH (a:A) REMOVE a.k").graph
    assert all(
        r.props is None or "k" not in r.props for r in g2.nodes.collect()
    )


def test_graph_save_load_roundtrip(spark, tmp_path):
    """save_graph/load_graph (round-8): label/type-partitioned parquet
    layout; a label scan after reload is DIRECTORY pruning (the filter
    lands in PartitionFilters, not a row-level scan filter)."""
    from pyspark.sql import functions as F

    from g4s_spark.graph import PropertyGraph, load_graph, save_graph
    from g4s_spark.plans import run_cypher

    nodes = spark.createDataFrame(
        [(1, "A", {"v": "x"}), (2, "A", {"v": "y"}), (10, "B", {"v": "z"})],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(1, 10, "E", 1.5), (2, 10, "F", 2.5)],
        "src long, dst long, type string, weight double",
    )
    g = PropertyGraph(nodes, edges, spark)
    path = str(tmp_path / "g")
    save_graph(g, path)
    g2 = load_graph(spark, path)
    assert sorted((r.id, r.label) for r in g2.nodes.collect()) == [
        (1, "A"), (2, "A"), (10, "B")
    ]
    assert sorted((r.src, r.dst, r.type, r.weight) for r in g2.edges.collect()) == [
        (1, 10, "E", 1.5), (2, 10, "F", 2.5)
    ]
    # queries run on the reloaded graph
    got = run_cypher(g2, "MATCH (a:A)-[:E]->(b:B) RETURN a, b").collect()
    assert [(r.a, r.b) for r in got] == [(1, 10)]
    # the label predicate is partition pruning, not a data filter
    plan = (
        g2.nodes.filter(F.col("label") == "A")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "label" in plan.split("PartitionFilters")[1][:120]
    # typed-edge scan prunes on the type partition the same way
    plan = (
        g2.typed_edges(["E"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "type" in plan.split("PartitionFilters")[1][:120]


def test_cypher_create_statement(spark):
    """CREATE (round-8): unconditional node creation with assigned ids;
    MATCH ... CREATE edge per distinct matched pair, optional literal
    weight; GraphDB.update routes the verb."""
    import pytest as _pytest

    from g4s_spark.cypher import CypherParseError
    from g4s_spark.db import GraphDB
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher, run_cypher_create

    nodes = spark.createDataFrame(
        [(0, "A", {"name": "a0"}), (1, "B", {"name": "b0"})],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame([(0, 1, "E")], "src long, dst long, type string")
    g = PropertyGraph(nodes, edges, spark)
    g2 = run_cypher_create(
        g, "CREATE (x:C {name: 'c1', rank: 3}), (y:C {name: 'c2'})"
    )
    got = {r.id: (r.label, dict(r.props)) for r in g2.nodes.collect()}
    assert got[2] == ("C", {"name": "c1", "rank": "3"})
    assert got[3] == ("C", {"name": "c2"})
    # edge form: one edge per distinct matched pair, weighted
    g3 = run_cypher_create(
        g2, "MATCH (a:A), (c:C) CREATE (a)-[:LINKS {weight: 2.5}]->(c)"
    )
    new_edges = sorted(
        (r.src, r.dst, r.type, r.weight)
        for r in g3.edges.filter("type = 'LINKS'").collect()
    )
    assert new_edges == [(0, 2, "LINKS", 2.5), (0, 3, "LINKS", 2.5)]
    # created nodes are queryable
    out = run_cypher(g3, "MATCH (a:A)-[:LINKS]->(c:C) RETURN c.name AS n")
    assert sorted(r.n for r in out.collect()) == ["c1", "c2"]
    # GraphDB routing
    db = GraphDB(g).update("CREATE (z:Z {k: 'v'})")
    assert db.graph.nodes.filter("label = 'Z'").count() == 1
    with _pytest.raises(CypherParseError, match="weight only"):
        run_cypher_create(g2, "MATCH (a:A), (c:C) CREATE (a)-[:L {cost: 1}]->(c)")


def test_multilabel_prop_projection_no_fanout(spark):
    """openCypher: one row per match (round-9, VERDICT r8 #4). A node
    with SEVERAL label rows sharing one payload must project / filter /
    aggregate its props exactly once — across plain prop returns,
    property aggregates, arithmetic WHERE, and properties() — while
    same-id rows with genuinely DISTINCT payloads (the driver lineitem
    quirk) keep per-row semantics."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher

    nodes = spark.createDataFrame(
        [
            (0, "A", {"name": "x", "v": "10.0"}),
            (0, "Big", {"name": "x", "v": "10.0"}),  # same payload, 2nd label
            (1, "A", {"name": "y", "v": "3.0"}),
            (7, "L", {"v": "1.0"}),  # anomalous: same id, DISTINCT payloads
            (7, "L", {"v": "2.0"}),
            (9, "T", {"name": "t"}),
        ],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(0, 9, "E"), (1, 9, "E"), (7, 9, "E")],
        "src long, dst long, type string",
    )
    g = PropertyGraph(nodes, edges, spark)
    # prop projection: the two-label node yields ONE row
    out = run_cypher(g, "MATCH (a:A)-[:E]->(t:T) RETURN a, a.name AS n")
    assert sorted((r.a, r.n) for r in out.collect()) == [(0, "x"), (1, "y")]
    # property aggregate: payload counted once per match
    out = run_cypher(g, "MATCH (a:A)-[:E]->(t:T) RETURN t, sum(a.v) AS s")
    assert [(r.t, r.s) for r in out.collect()] == [(9, 13.0)]
    # arithmetic WHERE resolves through the same deduped payload
    out = run_cypher(g, "MATCH (a:A)-[:E]->(t:T) WHERE a.v * 2 > 8 RETURN a")
    assert sorted(r.a for r in out.collect()) == [0]
    # properties() renders the shared payload once
    out = run_cypher(g, "MATCH (a:A) RETURN a, properties(a) AS ps")
    assert sorted((r.a, r.ps) for r in out.collect()) == [
        (0, "name=x,v=10.0"), (1, "name=y,v=3.0"),
    ]
    # DISTINCT payloads on one id stay per-row (pinned driver semantics)
    out = run_cypher(g, "MATCH (l:L)-[:E]->(t:T) RETURN t, sum(l.v) AS s")
    assert [(r.t, r.s) for r in out.collect()] == [(9, 3.0)]


def test_label_mutation_statements(spark):
    """SET n:Label / REMOVE n:Label (round-8): label rows append
    idempotently with the node's props payload; removing a node's last
    label removes the node (and its incident edges)."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher, run_cypher_remove, run_cypher_set

    nodes = spark.createDataFrame(
        [(0, "A", {"name": "a0"}), (1, "A", {"name": "a1"}), (2, "B", {"name": "b0"})],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(0, 2, "E"), (1, 2, "E")], "src long, dst long, type string"
    )
    g = PropertyGraph(nodes, edges, spark)
    g2 = run_cypher_set(g, "MATCH (a:A) WHERE a.name = 'a0' SET a:VIP")
    assert sorted(
        (r.id, r.label) for r in g2.nodes.filter("label = 'VIP'").collect()
    ) == [(0, "VIP")]
    # the VIP row carries the payload; resolution is per DISTINCT
    # (id, payload) (round-9, VERDICT r8 #4) — the two label rows share
    # one payload, so the match projects exactly ONE row (openCypher)
    out = run_cypher(g2, "MATCH (v:VIP) RETURN v, v.name AS n")
    assert [(r.v, r.n) for r in out.collect()] == [(0, "a0")]
    # idempotent
    g3 = run_cypher_set(g2, "MATCH (a:A) WHERE a.name = 'a0' SET a:VIP")
    assert g3.nodes.filter("label = 'VIP'").count() == 1
    # remove the extra label: node survives under A
    g4 = run_cypher_remove(g3, "MATCH (v:VIP) REMOVE v:VIP")
    assert g4.nodes.filter("label = 'VIP'").count() == 0
    assert g4.nodes.filter("id = 0").count() == 1
    # removing the LAST label removes node + incident edges
    g5 = run_cypher_remove(g, "MATCH (b:B) REMOVE b:B")
    assert g5.nodes.filter("id = 2").count() == 0
    assert g5.edges.count() == 0

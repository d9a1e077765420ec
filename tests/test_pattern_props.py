"""Inline property maps in MATCH patterns (round-16, openCypher
MapExpression): ``(a:L {k: 'v', n: 5})`` and ``-[e:T {w: 3}]->``
desugar to the same equality PropFilters the WHERE grammar produces,
so every map query must return exactly what its WHERE spelling
returns. The reference front-end accepts maps via its openCypher
artifact (reference build.sbt:117); CREATE/MERGE here already take
them — this closes the MATCH side.
"""

import pytest

from g4s_spark.cypher import CypherParseError, parse
from g4s_spark.graph import PropertyGraph
from g4s_spark.plans import run_cypher


# ---------- parse level (no Spark) ----------


def test_node_map_desugars_to_filters():
    g = parse("MATCH (a:P {name: 'x', age: 5}) RETURN a")
    assert [(f.binding, f.prop, f.op, f.value, f.is_num) for f in g.filters] == [
        ("a", "name", "=", "x", False),
        ("a", "age", "=", 5.0, True),
    ]
    assert all(f.clause == 0 for f in g.filters)


def test_edge_map_desugars_to_edge_filters_and_names_anon_edges():
    g = parse("MATCH (a:P)-[:K {w: 3}]->(b:P) RETURN a")
    assert g.edges[0].name is not None  # auto-named so filters can key on it
    ef = g.edge_filters[0]
    assert (ef.binding, ef.prop, ef.op, ef.value) == (g.edges[0].name, "w", "=", 3.0)


def test_optional_clause_map_gets_its_clause_index():
    g = parse(
        "MATCH (a:P) OPTIONAL MATCH (a)-[:K]->(b:P {age: 6}) RETURN a, b"
    )
    assert [(f.binding, f.clause) for f in g.filters] == [("b", 1)]


def test_map_literal_interiors_are_data():
    g = parse("MATCH (a:P {name: 'has,comma'}) RETURN a")
    assert g.filters[0].value == "has,comma"
    g = parse("MATCH (a:P)-[:K {note: 'a*b'}]->(b:P) RETURN a")
    assert g.edge_filters[0].value == "a*b"  # '*' in a value is not varlength
    assert g.edges[0].min_hops == 1 and g.edges[0].max_hops == 1


def test_empty_map_is_noop():
    g = parse("MATCH (a:P {}) RETURN a")
    assert g.filters == []


@pytest.mark.parametrize(
    "q,msg",
    [
        ("MATCH (a:P)-[:K*1..2 {w: 3}]->(b:P) RETURN a",
         "variable-length pattern edges"),
        ("MATCH (a:P) WHERE (a)-[:K {w: 1}]->(b) RETURN a",
         "pattern predicates"),
        ("MATCH (a:P {bad}) RETURN a", "unsupported pattern property entry"),
        ("MATCH (a:P {f(x): 1}) RETURN a", "unsupported pattern property"),
    ],
)
def test_unsupported_map_positions(q, msg):
    with pytest.raises(CypherParseError, match=msg):
        parse(q)


# ---------- execution level ----------


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [
            (0, "Person", {"age": "35.0", "city": "berlin"}),
            (1, "Person", {"age": "17.0", "city": "paris"}),
            (2, "Person", {"age": "35.0", "city": "berlin"}),
            (3, "Item", {"price": "9.5"}),
            (4, "Item", {"price": "120.0"}),
        ],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            (0, 3, "BOUGHT", 1.0),
            (1, 3, "BOUGHT", 2.0),
            (2, 4, "BOUGHT", 2.0),
            (2, 3, "BOUGHT", 3.0),
        ],
        "src long, dst long, type string, weight double",
    )
    return PropertyGraph(nodes, edges, spark).cache()


def rows(df):
    return {tuple(r) for r in df.collect()}


def _same(graph, q_map, q_where):
    got, want = rows(run_cypher(graph, q_map)), rows(run_cypher(graph, q_where))
    assert got == want, f"{q_map!r} -> {got} != WHERE form {want}"
    return got


def test_node_map_equals_where_form(graph):
    got = _same(
        graph,
        "MATCH (p:Person {city: 'berlin'})-[:BOUGHT]->(i:Item) RETURN p, i",
        "MATCH (p:Person)-[:BOUGHT]->(i:Item) WHERE p.city = 'berlin' RETURN p, i",
    )
    assert got == {(0, 3), (2, 4), (2, 3)}


def test_numeric_node_map(graph):
    got = _same(
        graph,
        "MATCH (p:Person {age: 35.0}) RETURN p",
        "MATCH (p:Person) WHERE p.age = 35.0 RETURN p",
    )
    assert got == {(0,), (2,)}


def test_edge_map_named_and_anonymous(graph):
    want = rows(run_cypher(
        graph,
        "MATCH (p:Person)-[e:BOUGHT]->(i:Item) WHERE e.weight = 2 RETURN p, i",
    ))
    assert want == {(1, 3), (2, 4)}
    for q in (
        "MATCH (p:Person)-[e:BOUGHT {weight: 2}]->(i:Item) RETURN p, i",
        "MATCH (p:Person)-[:BOUGHT {weight: 2}]->(i:Item) RETURN p, i",
    ):
        assert rows(run_cypher(graph, q)) == want


def test_map_on_anonymous_node(graph):
    got = rows(run_cypher(
        graph,
        "MATCH ({city: 'paris'})-[:BOUGHT]->(i:Item) RETURN i",
    ))
    assert got == {(3,)}


def test_map_combines_with_where(graph):
    got = rows(run_cypher(
        graph,
        "MATCH (p:Person {city: 'berlin'})-[:BOUGHT]->(i:Item) "
        "WHERE i.price < 100 RETURN p, i",
    ))
    assert got == {(0, 3), (2, 3)}


def test_map_in_optional_match(graph):
    got = rows(run_cypher(
        graph,
        "MATCH (p:Person) OPTIONAL MATCH (p)-[:BOUGHT {weight: 3}]->(i:Item) "
        "RETURN p, i",
    ))
    assert got == {(0, None), (1, None), (2, 3)}


# ---------- differential property (no Spark) ----------


def test_map_form_parses_identically_to_where_form():
    """For a grid of (label, key, literal) combinations, the map form's
    parsed filters equal the WHERE form's — the desugaring is literally
    the same PropFilter constructor."""
    lits = ["'x'", "'a,b'", "5", "-2.5", "''"]
    for lit in lits:
        m = parse(f"MATCH (a:P {{k: {lit}}})-[:T]->(b:Q) RETURN a")
        w = parse(f"MATCH (a:P)-[:T]->(b:Q) WHERE a.k = {lit} RETURN a")
        assert m.filters == w.filters, lit
    for lit in lits:
        m = parse(f"MATCH (a:P)-[e:T {{w: {lit}}}]->(b:Q) RETURN a")
        w = parse(f"MATCH (a:P)-[e:T]->(b:Q) WHERE e.w = {lit} RETURN a")
        assert m.edge_filters == w.edge_filters, lit

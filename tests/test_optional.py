"""OPTIONAL MATCH extension: left-outer pattern groups with NULL for
unmatched bindings."""

import pytest

from g4s_spark.cypher import CypherParseError, parse
from g4s_spark.graph import PropertyGraph
from g4s_spark.plans import run_cypher


@pytest.fixture(scope="module")
def g(spark):
    # A customers 1,2,3; only 1,2 placed orders; order 20 has an item
    return PropertyGraph.from_tuples(
        spark,
        nodes=[(1, "C"), (2, "C"), (3, "C"), (10, "O"), (20, "O"), (30, "L")],
        edges=[(1, 10, "PLACED"), (2, 20, "PLACED"), (20, 30, "HAS_ITEM")],
    ).cache()


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_parse_optional():
    qg = parse("MATCH (c:C) OPTIONAL MATCH (c)-[:PLACED]->(o:O) RETURN c, o")
    assert len(qg.edges) == 0 and len(qg.optionals) == 1
    e = qg.optionals[0][0]
    assert (e.src, e.dst, e.types) == ("c", "o", ("PLACED",))
    assert qg.match_bindings == {"c"}


def test_parse_optional_needs_edge():
    with pytest.raises(CypherParseError):
        parse("MATCH (c:C) OPTIONAL MATCH (o:O) RETURN c, o")


def test_optional_basic(g):
    got = rows(run_cypher(g, "MATCH (c:C) OPTIONAL MATCH (c)-[:PLACED]->(o:O) RETURN c, o"))
    assert got == {(1, 10), (2, 20), (3, None)}


def test_optional_after_required_edge(g):
    got = rows(
        run_cypher(
            g,
            "MATCH (c:C)-[:PLACED]->(o:O) OPTIONAL MATCH (o)-[:HAS_ITEM]->(l:L) "
            "RETURN c, o, l",
        )
    )
    assert got == {(1, 10, None), (2, 20, 30)}


def test_optional_count_skips_nulls(g):
    got = rows(
        run_cypher(
            g,
            "MATCH (c:C) OPTIONAL MATCH (c)-[:PLACED]->(o:O) RETURN c, count(o) AS n",
        )
    )
    assert got == {(1, 1), (2, 1), (3, 0)}


def test_chained_optionals(g):
    got = rows(
        run_cypher(
            g,
            "MATCH (c:C) OPTIONAL MATCH (c)-[:PLACED]->(o:O) "
            "OPTIONAL MATCH (o)-[:HAS_ITEM]->(l:L) RETURN c, l",
        )
    )
    assert got == {(1, None), (2, 30), (3, None)}


def test_optional_requires_shared_binding(g):
    with pytest.raises(ValueError):
        run_cypher(g, "MATCH (c:C) OPTIONAL MATCH (x:O)-[:HAS_ITEM]->(l:L) RETURN c, l").collect()


def test_count_star_matches(g):
    got = rows(
        run_cypher(g, "MATCH (c:C)-[:PLACED]->(o:O) RETURN count(*) AS n")
    )
    assert got == {(2,)}


def test_count_star_grouped(g):
    got = rows(
        run_cypher(
            g,
            "MATCH (c:C)-[:PLACED]->(o:O)-[:HAS_ITEM]->(l:L) RETURN c, count(*) AS n",
        )
    )
    assert got == {(2, 1)}


# --- path bindings in OPTIONAL MATCH (round-7) ----------------------------


def test_optional_path_length_fixed(g):
    """p = (...) inside OPTIONAL MATCH: length is the hop count for
    matched rows and NULL for unmatched ones."""
    got = rows(run_cypher(
        g,
        "MATCH (c:C) OPTIONAL MATCH p = (c)-[:PLACED]->(o:O) "
        "RETURN c, o, length(p) AS hops",
    ))
    assert got == {(1, 10, 1), (2, 20, 1), (3, None, None)}


def test_optional_path_length_fixed_without_returning_binding(g):
    # the group's non-shared binding is force-kept as the NULL guard
    got = rows(run_cypher(
        g,
        "MATCH (c:C) OPTIONAL MATCH p = (c)-[:PLACED]->(o:O) "
        "RETURN c, length(p) AS hops",
    ))
    assert got == {(1, 1), (2, 1), (3, None)}


def test_optional_path_length_varlength(g):
    # customer 2 reaches order 20 (1 hop) and item 30 (2 hops);
    # customer 3 reaches nothing
    got = rows(run_cypher(
        g,
        "MATCH (c:C) OPTIONAL MATCH p = (c)-[*]->(x) "
        "RETURN c, x, length(p) AS hops",
    ))
    assert got == {
        (1, 10, 1), (2, 20, 1), (2, 30, 2), (3, None, None),
    }


def test_optional_path_name_collision_rejected(g):
    with pytest.raises(CypherParseError, match="collides"):
        run_cypher(
            g,
            "MATCH (c:C) OPTIONAL MATCH c = (c)-[:PLACED]->(o:O) RETURN c",
        )


def test_optional_path_cannot_be_returned(g):
    with pytest.raises(CypherParseError, match="length"):
        run_cypher(
            g,
            "MATCH (c:C) OPTIONAL MATCH p = (c)-[:PLACED]->(o:O) RETURN c, p",
        )


def test_coalesce_fills_optional_nulls(spark):
    """coalesce(b.prop, 'default') in RETURN (round-7): the NULL-fill
    companion of OPTIONAL MATCH."""
    from g4s_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [(1, "C", None), (2, "C", None), (10, "O", {"v": "9"})],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(1, 10, "PLACED")], "src long, dst long, type string"
    )
    gg = PropertyGraph(nodes, edges)
    got = sorted(
        tuple(r) for r in run_cypher(
            gg,
            "MATCH (c:C) OPTIONAL MATCH (c)-[:PLACED]->(o:O) "
            "RETURN c, coalesce(o.v, 'none') AS v",
        ).collect()
    )
    assert got == [(1, "9"), (2, "none")]


def test_coalesce_on_required_match_missing_prop(spark):
    from g4s_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [(1, "P", {"x": "a"}), (2, "P", {})],
        "id long, label string, props map<string,string>",
    )
    gg = PropertyGraph(
        nodes, spark.createDataFrame([], "src long, dst long, type string")
    )
    got = sorted(
        tuple(r) for r in run_cypher(
            gg, "MATCH (p:P) RETURN p, coalesce(p.x, 'dflt') AS x"
        ).collect()
    )
    assert got == [(1, "a"), (2, "dflt")]

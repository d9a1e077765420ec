"""Parse-level pins for the token-span RETURN/WITH item grammar
(round-16, second tokenizer-migration chunk after the WHERE atoms —
the twelve `re.fullmatch` item shapes retired for _ret_item_shape /
_apply_ret_item token dispatch). Driver-only — no SparkSession;
execution-level RETURN coverage lives in test_cypher / test_with /
test_relational.

Characterization corpus: scripts/return_corpus.py (252 rows diffed
regex-vs-token at migration time — identical except the documented
whitespace liberalization, pinned below).
"""

from __future__ import annotations

import pytest

from g4s_spark.cypher import CypherParseError, parse

FRAME = "MATCH (a:Person)-[e:KNOWS]->(b:Person) RETURN {item}"
PATH_FRAME = "MATCH p = (a:Person)-[:KNOWS*1..2]->(b:Person) RETURN {item}"


def _g(item: str, frame: str = FRAME):
    return parse(frame.format(item=item))


def test_bare_star_and_rename():
    assert _g("a, b").returns == ["a", "b"]
    assert _g("*").returns == ["a", "b"]
    assert _g("a AS x").id_returns == [("a", "x")]
    with pytest.raises(CypherParseError, match="unbound variable: 'e'"):
        _g("e")
    with pytest.raises(CypherParseError, match="unsupported return item"):
        _g("z AS x")


def test_prop_returns_node_and_edge():
    g = _g("a.name, e.weight AS w")
    assert g.prop_returns == [("a", "name", "a_name")]
    assert g.edge_prop_returns == [("e", "weight", "w")]


def test_count_star_and_aggregates():
    assert _g("count(*)").aggregates[0].alias == "count_star"
    assert _g("COUNT( * ) AS n").aggregates[0].alias == "n"
    a = _g("count(DISTINCT a.name) AS dn").aggregates[0]
    assert (a.func, a.binding, a.prop, a.distinct, a.alias) == (
        "count", "a", "name", True, "dn",
    )
    a = _g("stDevP(a.age)").aggregates[0]
    assert (a.func, a.alias) == ("stdevp", "stdevp_a_age")
    # whitespace liberalization vs the retired regexes (round-16):
    a = _g("sum ( a . age )").aggregates[0]
    assert (a.func, a.binding, a.prop) == ("sum", "a", "age")


def test_edge_property_aggregates():
    a = _g("sum(e.weight)").aggregates[0]
    assert a.on_edge and a.alias == "sum_e_weight"
    with pytest.raises(CypherParseError, match="DISTINCT edge-property"):
        _g("sum(DISTINCT e.weight)")
    with pytest.raises(CypherParseError, match="count\\(\\) of unbound variable: 'e'"):
        _g("count(e)")
    with pytest.raises(CypherParseError, match="needs a property"):
        _g("sum(a)")


def test_percentiles():
    a = _g("percentileDisc(a.age, .9) AS p").aggregates[0]
    assert (a.func, a.param, a.alias) == ("percentiledisc", 0.9, "p")
    assert _g("percentileCont(a.age, 1)").aggregates[0].param == 1.0
    # out-of-range quantile is no shape -> the canonical error
    with pytest.raises(CypherParseError, match="unsupported return item"):
        _g("percentileCont(a.age, 1.5)")


def test_coalesce():
    assert _g("coalesce(a.name, 'x')").coalesce_returns == [
        ("a", "name", "x", "coalesce_a_name")
    ]
    # numeric defaults keep their source text (props are strings)
    assert _g("coalesce(a.age, -1.5)").coalesce_returns[0][2] == "-1.5"
    # a comma inside the literal is data
    assert _g("coalesce(a.name, 'a, b')").coalesce_returns[0][2] == "a, b"


def test_scalar_string_fns():
    assert _g("toLower(a.name)").string_fn_returns == [
        ("tolower", "a", "name", "tolower_a_name")
    ]
    assert _g("substring(a.name, 1, 2)").string_fn_returns[0][0] == (
        "substring\x1f1\x1f2"
    )
    with pytest.raises(CypherParseError, match="needs a start index"):
        _g("substring(a.name)")
    with pytest.raises(CypherParseError, match="takes exactly"):
        _g("left(a.name)")


def test_replace():
    assert _g("replace(a.name, 'x', 'y') AS r").string_fn_returns == [
        ("replace\x1fx\x1fy", "a", "name", "r")
    ]
    assert _g("replace(a.name, 'a,b', 'c')").string_fn_returns[0][0] == (
        "replace\x1fa,b\x1fc"
    )
    with pytest.raises(CypherParseError, match="unsupported return item"):
        _g("replace(a.name, 1, 2)")


def test_concat():
    g = _g("'<' + a.name + '>' AS x")
    assert g.concat_returns == [
        ((("lit", "<"), ("prop", "a", "name"), ("lit", ">")), "x")
    ]
    # AS and '+' inside the literal are data
    assert _g("'a AS b' + a.name AS x").concat_returns[0][0][0] == ("lit", "a AS b")
    assert _g("a.name + '+' AS x").concat_returns[0][0][1] == ("lit", "+")
    with pytest.raises(CypherParseError, match="needs an AS alias"):
        _g("a.name + '!'")
    with pytest.raises(CypherParseError, match="concat of unbound or non-node"):
        _g("e.weight + 'x' AS x")
    with pytest.raises(CypherParseError, match="takes b.prop and quoted"):
        _g("count(a) + 'x' AS x")


def test_introspection():
    assert _g("id(a) AS i").id_returns == [("a", "i")]
    assert _g("labels(a)").labels_returns == [("a", "labels_a")]
    assert _g("type(e)").edge_prop_returns == [("e", "type", "type_e")]
    assert _g("keys(a)").keys_returns == [("a", "keys_a", False)]
    assert _g("properties(a) AS ps").keys_returns == [("a", "ps", True)]
    with pytest.raises(CypherParseError, match="type\\(\\) of non-edge"):
        _g("type(a)")
    with pytest.raises(CypherParseError, match="id\\(\\) of unbound or non-node"):
        _g("id(e)")


def test_path_length():
    assert _g("length(p) AS l", PATH_FRAME).path_lengths == [("p", "l")]
    with pytest.raises(CypherParseError, match="length\\(\\) of unknown path"):
        _g("length(q)", PATH_FRAME)
    with pytest.raises(CypherParseError, match="cannot return path"):
        _g("p", PATH_FRAME)


def test_expression_items():
    it = _g("sum(a.age * 2) AS x").expr_returns[0]
    assert it.agg == "sum" and it.alias == "x"
    it = _g("abs(a.age) AS x").expr_returns[0]
    assert it.expr[0] == "fn1"
    with pytest.raises(CypherParseError, match="needs an AS alias"):
        _g("a.age + 1")
    with pytest.raises(CypherParseError, match="unbound or non-node"):
        _g("e.weight + 1 AS x")
    # no property leaf and no expr-shape trigger -> canonical error
    with pytest.raises(CypherParseError, match="unsupported return item"):
        _g("1 + 2 AS x")


@pytest.mark.parametrize(
    "item",
    [
        "a.name.x", "foo(a)", "a..name", "$p", "'lit'", "'lit' AS x",
        "3", "3 AS x", "a.name AS 'x'", "count(a.name, 1)", "a AS",
        "AS x", "count(DISTINCT(a))",
    ],
)
def test_junk_items_raise_unsupported(item):
    with pytest.raises(CypherParseError, match="unsupported return item"):
        _g(item)


def test_empty_return():
    with pytest.raises(CypherParseError, match="empty RETURN"):
        parse("MATCH (a:Person) RETURN ")

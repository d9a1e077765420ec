"""Parse-level pins for the token-span WHERE predicate grammar
(round-16, VERDICT r15 "what's missing #3": the _COND* regex family
retired in favor of _match_atom token shapes). Driver-only — no
SparkSession; execution-level WHERE coverage lives in test_where.py.

The full characterization corpus (109 predicates, diffed regex-vs-token
at migration time) is scripts/predicate_corpus.py; these pins are the
load-bearing subset: one per shape, the literal-interior traps the
regexes historically mis-read, the lexer-greedy '<-NUM' cases, and the
two deliberate liberalizations (spaced unary minus, spaced arrow).
"""

from __future__ import annotations

import pytest

from g4s_spark.cypher import CypherParseError, parse
from g4s_spark.cypher.parser import ID_PROP

FRAME = "MATCH (a:Person)-[e:KNOWS]->(b:Person) WHERE {w} RETURN a"


def _filters(w: str):
    g = parse(FRAME.format(w=w))
    return g.filters + g.edge_filters


def _one(w: str):
    fs = _filters(w)
    assert len(fs) == 1, fs
    return fs[0]


@pytest.mark.parametrize("op", ["=", "<>", "!=", "<", "<=", ">", ">="])
def test_plain_numeric_every_operator(op):
    f = _one(f"a.age {op} 30")
    assert (f.binding, f.prop, f.op, f.value, f.is_num) == ("a", "age", op, 30.0, True)


def test_plain_string_and_edge_binding():
    f = _one("a.name = 'bob'")
    assert (f.op, f.value, f.is_num) == ("=", "bob", False)
    f = _one("e.weight > 2")
    assert f.binding == "e"


@pytest.mark.parametrize(
    "w,val",
    [
        ("a.age = -5", -5.0),
        ("a.age > -5", -5.0),
        ("a.age >-5", -5.0),
        # lexer-greedy arrow: '<-5' is one '<-' token, split back (ADVICE r15)
        ("a.age <-5", -5.0),
        ("a.age < -5", -5.0),
        # liberalizations vs the retired regexes (documented in _match_atom):
        ("a.age = - 5", -5.0),
        ("a.age <- 5", -5.0),
    ],
)
def test_signed_literals_and_arrow_greed(w, val):
    f = _one(w)
    assert f.value == val and f.is_num


@pytest.mark.parametrize(
    "w",
    [
        "a.name = 'a>b'",
        "a.name = 'a AND b'",
        "a.name = ' IS NULL '",
        "a.name = '[1,2]'",
        "a.name = '=~'",
    ],
)
def test_literal_interiors_never_split(w):
    f = _one(w)
    assert f.op == "=" and not f.is_num


def test_is_null_family():
    assert _one("a.age IS NULL").op == "is_null"
    assert _one("a.age IS NOT NULL").op == "is_not_null"
    assert _one("a.age Is NoT nUlL").op == "is_not_null"
    assert _one("exists(a.age)").op == "is_not_null"
    assert _one("EXISTS ( a.age )").op == "is_not_null"


def test_scalar_fn_predicates():
    f = _one("toLower(a.name) = 'bob'")
    assert f.fn == "tolower" and f.value == "bob"
    f = _one("size(a.name) > 3")
    assert f.fn == "size" and f.value == 3.0 and f.is_num
    f = _one("substring(a.name, 1, 2) = 'ob'")
    assert f.fn == "substring\x1f1\x1f2"
    f = _one("left(a.name, 2) = 'bo'")
    assert f.fn == "left\x1f2"
    f = _one("size(a.name) <-5")  # greedy arrow in fn position
    assert (f.op, f.value) == ("<", -5.0)


@pytest.mark.parametrize(
    "w,msg",
    [
        ("size(a.name) > 'x'", "compares against a number"),
        ("toLower(a.name) = 3", "compares against a string"),
        ("substring(a.name) = 'x'", "needs a start index"),
        ("left(a.name) = 'x'", "takes exactly"),
        ("size(a.name, 1) > 3", "takes a single property"),
    ],
)
def test_scalar_fn_arity_and_type_errors(w, msg):
    with pytest.raises(CypherParseError, match=msg):
        _filters(w)


def test_regex_predicate_is_anchored():
    f = _one("a.name =~ 'b.*'")
    assert f.op == "regex" and f.value == "^(?:b.*)$"


def test_string_predicates():
    assert _one("a.name STARTS WITH 'b'").op == "starts_with"
    assert _one("a.name ENDS WITH 'b'").op == "ends_with"
    assert _one("a.name CONTAINS 'o'").op == "contains"
    assert _one("a.name starts  with 'b'").op == "starts_with"


def test_in_list_expands_to_or_group():
    g = parse(FRAME.format(w="a.name IN ['a', 'b']"))
    assert len(g.or_filters) == 1 and len(g.or_filters[0]) == 2
    # single item and trailing comma collapse to a plain filter
    assert _one("a.name IN ['a']").value == "a"
    assert _one("a.age IN [2,]").value == 2.0
    # string items containing grammar-ish text survive
    assert _one("a.name IN ['a,b']").value == "a,b"


@pytest.mark.parametrize(
    "w,msg",
    [
        ("a.age IN []", "empty IN list"),
        ("a.age IN [ ]", "empty IN list"),
        ("a.age IN [foo]", "unsupported IN list item: 'foo'"),
        ("a.age IN ['a' 'b']", "unsupported IN list item"),
    ],
)
def test_in_list_errors(w, msg):
    with pytest.raises(CypherParseError, match=msg):
        _filters(w)


def test_id_predicate():
    f = _one("id(a) <= 10")
    assert (f.prop, f.op, f.value) == (ID_PROP, "<=", 10.0)
    f = _one("id(a) <-5")
    assert (f.op, f.value) == ("<", -5.0)
    with pytest.raises(CypherParseError, match="unsupported WHERE"):
        _filters("id(a) = 5.5")  # ids are integers
    with pytest.raises(CypherParseError, match="needs a node variable"):
        _filters("id(e) = 5")


@pytest.mark.parametrize(
    "w,op,val",
    [
        ("NOT a.age = 1", "<>", 1.0),
        ("NOT a.age <> 1", "=", 1.0),
        ("NOT a.age < 5", ">=", 5.0),
        ("NOT a.age >= 5", "<", 5.0),
        ("NOT exists(a.age)", "is_null", None),
        ("NOT a.age IS NULL", "is_not_null", None),
        ("NOT a.age IS NOT NULL", "is_null", None),
        ("NOT a.name STARTS WITH 'b'", "not_starts_with", "b"),
        ("NOT a.name ENDS WITH 'b'", "not_ends_with", "b"),
        ("NOT a.name CONTAINS 'o'", "not_contains", "o"),
        ("NOT a.name =~ 'b.*'", "not_regex", "^(?:b.*)$"),
        ("not a.age = 1", "<>", 1.0),
    ],
)
def test_not_folds_into_the_operator(w, op, val):
    f = _one(w)
    assert (f.op, f.value) == (op, val)


def test_not_fn_and_id():
    f = _one("NOT size(a.name) > 3")
    assert (f.fn, f.op) == ("size", "<=")
    f = _one("NOT id(a) = 5")
    assert f.op == "<>"


def test_not_unsupported_shapes():
    with pytest.raises(CypherParseError, match="NOT IN is unsupported"):
        _filters("NOT a.age IN [1, 2]")
    with pytest.raises(CypherParseError, match="unsupported WHERE"):
        _filters("NOT (a.age = 1 OR a.age = 2)")  # no De Morgan
    with pytest.raises(CypherParseError, match="unsupported WHERE"):
        _filters("NOT NOT a.age = 1")


@pytest.mark.parametrize(
    "w",
    [
        "a.age == 1",
        "a.age =",
        "= 3",
        "a. = 3",
        "a.age 30",
        "foo",
        "a.name = bob",
        "a.age = $p",
        "a.name STARTS WITH 3",
        "a.name =~ 3",
        "a.age IS NULL NULL",
        "a.age IN [[1]]",
    ],
)
def test_unsupported_shapes_raise_typed_error(w):
    with pytest.raises(CypherParseError):
        _filters(w)


def test_unbound_binding_still_checked():
    with pytest.raises(CypherParseError, match="unbound variable: 'z'"):
        _filters("z.age = 1")

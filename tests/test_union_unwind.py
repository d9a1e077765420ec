"""UNION [ALL] set queries and UNWIND literal-list row generators
(extensions beyond the reference surface, which has no set ops at the
query level — SURVEY §2.7; matrix-level union lives in grblas.ewise)."""

import pytest

from g4s_spark.cypher import CypherParseError
from g4s_spark.graph import PropertyGraph
from g4s_spark.plans import run_cypher


@pytest.fixture(scope="module")
def g(spark):
    return PropertyGraph.from_tuples(
        spark,
        nodes=[(0, "A"), (1, "B"), (2, "B"), (3, "C"), (5, "A")],
        edges=[(0, 1, "X"), (0, 2, "X"), (1, 3, "Y"), (5, 1, "X")],
    ).cache()


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_union_dedups_across_sides(g):
    got = rows(run_cypher(
        g,
        "MATCH (a:A)-[:X]->(b:B) RETURN b "
        "UNION MATCH (b:B)-[:Y]->(c:C) RETURN b",
    ))
    # side 1: {1, 2}; side 2: {1}; UNION dedups the shared 1
    assert got == [(1,), (2,)]


def test_union_all_keeps_cross_side_duplicates(g):
    got = rows(run_cypher(
        g,
        "MATCH (a:A)-[:X]->(b:B) RETURN b "
        "UNION ALL MATCH (b:B)-[:Y]->(c:C) RETURN b",
    ))
    assert got == [(1,), (1,), (2,)]


def test_union_mismatched_columns_rejected(g):
    with pytest.raises(CypherParseError, match="different columns"):
        run_cypher(
            g,
            "MATCH (a:A)-[:X]->(b:B) RETURN a UNION MATCH (b:B) RETURN b",
        )


def test_union_mixing_all_rejected(g):
    with pytest.raises(CypherParseError, match="mix"):
        run_cypher(
            g,
            "MATCH (b:B) RETURN b UNION MATCH (b:B) RETURN b "
            "UNION ALL MATCH (b:B) RETURN b",
        )


def test_unwind_cross_multiplies_matches(g):
    got = rows(run_cypher(
        g, "UNWIND [10, 20] AS k MATCH (b:B)-[:Y]->(c:C) RETURN b, k"
    ))
    assert got == [(1, 10), (1, 20)]


def test_unwind_standalone_and_duplicates(g):
    got = rows(run_cypher(g, "UNWIND [1, 2, 2] AS x RETURN x"))
    # the generator itself preserves list duplicates
    assert got == [(1,), (2,), (2,)]


def test_unwind_chained(g):
    got = rows(run_cypher(g, "UNWIND [1, 2] AS x UNWIND ['u'] AS y RETURN x, y"))
    assert got == [(1, "u"), (2, "u")]


def test_unwind_name_not_returned_is_dropped(g):
    got = rows(run_cypher(g, "UNWIND [7] AS k MATCH (c:C) RETURN c"))
    assert got == [(3,)]


def test_unwind_mixed_types_rejected(g):
    with pytest.raises(CypherParseError, match="mixed-type"):
        run_cypher(g, "UNWIND [1, 'a'] AS x RETURN x")


def test_unwind_inside_union_side(g):
    got = rows(run_cypher(
        g,
        "UNWIND [9] AS k MATCH (c:C) RETURN c "
        "UNION ALL MATCH (b:B)-[:Y]->(c:C) RETURN c",
    ))
    assert got == [(3,), (3,)]


def test_unwind_alias_and_return_order(g):
    """`k AS kk` aliases the unwound column instead of leaking `k AS kk`
    into the inner match (ADVICE r5), and output columns follow the
    RETURN item order."""
    df = run_cypher(g, "UNWIND [1, 2] AS k MATCH (c:C) RETURN k AS kk, c")
    assert df.columns == ["kk", "c"]
    assert rows(df) == [(1, 3), (2, 3)]
    df2 = run_cypher(g, "UNWIND [7] AS k MATCH (c:C) RETURN c, k")
    assert df2.columns == ["c", "k"]


def test_unwind_whitespace_normalized(g):
    got = rows(run_cypher(g, "UNWIND [4] AS k MATCH (c:C) RETURN  k , c"))
    assert got == [(4, 3)]


def test_unwind_where_filters_generator(g):
    """WHERE over an unwound name lifts out of the inner query and
    prunes the literal generator pre-join (round-6; previously a
    documented limitation)."""
    got = rows(run_cypher(
        g, "UNWIND [1, 2, 3] AS k MATCH (c:C) WHERE k >= 2 RETURN c, k"
    ))
    assert got == [(3, 2), (3, 3)]


def test_unwind_where_mixed_with_pattern_predicates(g):
    got = rows(run_cypher(
        g, "UNWIND [10, 20] AS k MATCH (b:B) WHERE k > 15 RETURN b, k"
    ))
    assert got == [(1, 20), (2, 20)]


def test_unwind_where_empties_unreturned_generator(g):
    got = rows(run_cypher(
        g, "UNWIND [1] AS k MATCH (c:C) WHERE k > 5 RETURN c"
    ))
    assert got == []


def test_unwind_where_string_values(g):
    got = rows(run_cypher(
        g, "UNWIND ['x', 'y'] AS s MATCH (c:C) WHERE s = 'y' RETURN c, s"
    ))
    assert got == [(3, "y")]


def test_unwind_range(g):
    got = rows(run_cypher(g, "UNWIND range(1, 3) AS k MATCH (c:C) RETURN c, k"))
    assert got == [(3, 1), (3, 2), (3, 3)]
    step = rows(run_cypher(g, "UNWIND range(10, 1, -4) AS k RETURN k"))
    assert step == [(2,), (6,), (10,)]
    with pytest.raises(CypherParseError, match="never reaches"):
        run_cypher(g, "UNWIND range(1, 5, -1) AS k RETURN k")


def test_unwind_range_in_pipeline(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
           "UNWIND range(0, 1) AS k RETURN a, k",
    ))
    assert got == [(0, 0), (0, 1), (5, 0), (5, 1)]


def test_unwind_range_is_distributed_and_lazy(g):
    """Leading UNWIND range() builds on spark.range — a 100M-element
    range plans without materializing a driver-side list (ADVICE r6)."""
    df = run_cypher(g, "UNWIND range(0, 99999999) AS k RETURN k")
    assert [r.k for r in df.limit(3).collect()] == [0, 1, 2]


def test_unwind_range_cap_in_with_tail(g):
    """The WITH-tail UNWIND embeds the range as a literal array, so it
    is capped instead of OOMing the driver (ADVICE r6)."""
    with pytest.raises(CypherParseError, match="exceeds"):
        run_cypher(
            g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
               "UNWIND range(0, 99999999) AS k RETURN a, k",
        )

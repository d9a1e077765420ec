"""WITH pipeline stages (extension beyond the reference surface):
MATCH ... WITH items [WHERE ...] MATCH ... RETURN ... — openCypher row
piping under the engine's ANY_PAIR existence semantics."""

import pytest

from g4s_spark.cypher import CypherParseError
from g4s_spark.graph import PropertyGraph
from g4s_spark.plans import run_cypher


@pytest.fixture(scope="module")
def g(spark):
    # A-nodes fan into B-nodes (X), B-nodes fan into C-nodes (Y)
    return PropertyGraph.from_tuples(
        spark,
        nodes=[(0, "A"), (1, "B"), (2, "B"), (3, "C"), (4, "C"), (5, "A")],
        edges=[(0, 1, "X"), (0, 2, "X"), (1, 3, "Y"), (1, 4, "Y"), (2, 3, "Y"), (5, 1, "X")],
    ).cache()


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_with_aggregate_having_then_match(g):
    got = rows(run_cypher(
        g,
        "MATCH (a:A)-[:X]->(b:B) WITH b, count(a) AS na WHERE na >= 2 "
        "MATCH (b)-[:Y]->(c:C) RETURN c, na",
    ))
    # b=1 is reached from a∈{0,5} (na=2, kept), b=2 only from 0 (filtered)
    assert got == [(3, 2), (4, 2)]


def test_with_having_direct_return(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb WHERE nb >= 2 RETURN a, nb"
    ))
    assert got == [(0, 2)]


def test_with_rename_passthrough_order_limit(g):
    got = [tuple(r) for r in run_cypher(
        g,
        "MATCH (a:A)-[:X]->(b:B) WITH b AS mid, count(a) AS na "
        "MATCH (mid)-[:Y]->(c:C) RETURN mid, c, na "
        "ORDER BY c DESC, mid DESC LIMIT 2",
    ).collect()]
    # c=3 is reachable from both mids — the secondary key makes the
    # LIMIT cut deterministic
    assert got == [(1, 4, 2), (2, 3, 1)]


def test_with_carried_only_return_is_existence_check(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, b MATCH (b)-[:Y]->(c:C) RETURN a"
    ))
    assert got == [(0,), (5,)]


def test_with_two_stage_chain(g):
    got = rows(run_cypher(
        g,
        "MATCH (a:A)-[:X]->(b:B) WITH a, b "
        "MATCH (b)-[:Y]->(c:C) WITH a, count(c) AS nc "
        "MATCH (a)-[:X]->(b2:B) RETURN a, nc, count(b2) AS nb",
    ))
    # a=0 reaches b∈{1,2}; distinct c via those b = {3,4} → nc=3? no:
    # distinct (a,c) pairs: (0,3),(0,4) → nc=2; a=5 → b=1 → c∈{3,4} → nc=2
    assert got == [(0, 2, 2), (5, 2, 1)]


def test_with_where_string_and_numeric_filters(g):
    got = rows(run_cypher(
        g,
        "MATCH (a:A)-[:X]->(b:B) WITH b, count(a) AS na "
        "WHERE na >= 1 AND na < 2 MATCH (b)-[:Y]->(c:C) RETURN b, c",
    ))
    assert got == [(2, 3)]


def test_with_cartesian_when_no_shared_binding(g):
    got = rows(run_cypher(
        g,
        "MATCH (a:A)-[:X]->(b:B) WITH count(b) AS nb "
        "MATCH (c:C) RETURN c, nb",
    ))
    # count(b) over the distinct match set projected to b (existence
    # semantics): distinct b = {1,2} → nb=2; then an explicit cartesian
    # with the C nodes
    assert got == [(3, 2), (4, 2)]


def test_with_errors(g):
    with pytest.raises(CypherParseError):
        run_cypher(g, "MATCH (a:A) WITH q RETURN q")  # unknown name
    with pytest.raises(CypherParseError):
        run_cypher(g, "MATCH (a:A) WITH a")  # no RETURN
    with pytest.raises(CypherParseError):
        # WITH WHERE over a non-carried column
        run_cypher(g, "MATCH (a:A)-[:X]->(b:B) WITH a WHERE b > 1 RETURN a")


def test_with_top_n_stage(g):
    got = rows(run_cypher(
        g,
        "MATCH (a:A)-[:X]->(b:B) "
        "WITH b, count(a) AS na ORDER BY na DESC, b ASC LIMIT 1 "
        "MATCH (b)-[:Y]->(c:C) RETURN b, c, na",
    ))
    # top-1 B by incoming A count: b=1 (na=2) beats b=2 (na=1)
    assert got == [(1, 3, 2), (1, 4, 2)]


def test_with_top_n_then_direct_return(g):
    got = [tuple(r) for r in run_cypher(
        g,
        "MATCH (a:A)-[:X]->(b:B) "
        "WITH a, count(b) AS nb ORDER BY nb DESC, a ASC LIMIT 1 RETURN a, nb",
    ).collect()]
    assert got == [(0, 2)]


def test_with_then_optional_match_in_final_stage(g):
    got = rows(run_cypher(
        g,
        "MATCH (a:A)-[:X]->(b:B) WITH b, count(a) AS na "
        "MATCH (b2:B) OPTIONAL MATCH (b2)-[:Y]->(c:C) RETURN b2, c",
    ))
    # no shared binding and nothing carried into RETURN: the carry is a
    # pure existence guard; the optional rows come through deduplicated
    assert (1, 3) in got and (1, 4) in got and (2, 3) in got


def test_with_varlength_stage(g):
    got = rows(run_cypher(
        g,
        "MATCH (a:A)-[*1..2]->(x) WITH a, count(x) AS nx WHERE nx >= 4 "
        "RETURN a, nx",
    ))
    # a=0 reaches {1,2} in 1 hop and {3,4} in 2 hops -> nx=4; a=5 reaches
    # {1,3,4} -> 3 (filtered)
    assert got == [(0, 4)]


# --- round-6 extensions: UNWIND over collected/carried lists and
# arithmetic in the final RETURN (VERDICT r5 #4/#5) ---------------------

def test_unwind_collected_list(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, collect(b) AS bs "
           "UNWIND bs AS x RETURN a, x",
    ))
    assert got == [(0, 1), (0, 2), (5, 1)]


def test_unwind_collected_after_where(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, collect(b) AS bs, count(b) AS nb "
           "WHERE nb >= 2 UNWIND bs AS x RETURN a, x",
    ))
    assert got == [(0, 1), (0, 2)]


def test_unwind_carried_into_next_match(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, collect(b) AS bs "
           "UNWIND bs AS b2 MATCH (c:C) RETURN a, b2, c",
    ))
    assert (0, 1, 3) in got and (5, 1, 4) in got and len(got) == 6


def test_unwind_literal_list_in_pipeline(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
           "UNWIND [10, 20] AS k RETURN a, k",
    ))
    assert got == [(0, 10), (0, 20), (5, 10), (5, 20)]


def test_unwind_unknown_carried_column_rejected(g):
    with pytest.raises(CypherParseError, match="unknown carried column"):
        run_cypher(
            g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
               "UNWIND zs AS x RETURN a, x",
        )


def test_final_return_expression(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
           "RETURN a, nb * 2 + 1 AS n2",
    ))
    assert got == [(0, 5.0), (5, 3.0)]


def test_final_return_expression_parens_and_unary(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
           "RETURN a, -(nb - 4) / 2 AS hm",
    ))
    assert got == [(0, 1.0), (5, 1.5)]


def test_final_return_expression_unknown_column(g):
    with pytest.raises(CypherParseError, match="unknown column"):
        run_cypher(
            g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
               "RETURN a, zz * 2 AS n2",
        )


def test_final_return_expression_needs_alias(g):
    with pytest.raises(CypherParseError, match="aliased expression"):
        run_cypher(
            g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
               "RETURN a, nb * 2",
        )


# --- carry-only stages: aggregate-of-aggregate (round-6) ----------------

def test_agg_of_agg_count_of_counts(g):
    """The TPC-H Q13 idiom in Cypher: group twice via consecutive
    WITHs — the second stage runs carry-only (no new MATCH)."""
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
           "WITH nb, count(a) AS na RETURN nb, na",
    ))
    # a=0 reaches 2 Bs, a=5 reaches 1 -> one A at each count
    assert got == [(1, 1), (2, 1)]


def test_final_return_aggregates_over_carried(g):
    row = run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
           "RETURN sum(nb) AS total, count(*) AS n, min(nb) AS lo, "
           "max(nb) AS hi, avg(nb) AS mean",
    ).collect()[0]
    assert (row.total, row.n, row.lo, row.hi, row.mean) == (3.0, 2, 1, 2, 1.5)


def test_carry_stage_then_match(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
           "WITH nb, count(a) AS na MATCH (c:C) RETURN nb, na, c",
    ))
    assert len(got) == 4 and (1, 1, 3) in got and (2, 1, 4) in got


def test_carry_stage_projection_only_dedups(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, b WITH b RETURN b",
    ))
    assert got == [(1,), (2,)]


def test_with_where_expression_over_carried(g):
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
           "WHERE nb * 2 >= 3 RETURN a, nb",
    ))
    assert got == [(0, 2)]


def test_carry_stage_unknown_column_rejected(g):
    with pytest.raises(CypherParseError, match="carry-only|unknown"):
        run_cypher(
            g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
               "WITH zz, count(a) AS na RETURN zz, na",
        )


def test_return_star_after_with(g):
    df = run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb RETURN * ORDER BY nb DESC",
    )
    assert df.columns == ["a", "nb"]
    assert [tuple(r) for r in df.collect()] == [(0, 2), (5, 1)]


def test_order_by_expression_in_with_stage(g):
    df = run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
           "RETURN a, nb ORDER BY nb * -1 ASC LIMIT 1",
    )
    assert [tuple(r) for r in df.collect()] == [(0, 2)]


def test_collect_in_carry_stage_then_unwind(g):
    """collect() in a carry-only stage composes with UNWIND: group the
    grouped result, collect the keys, explode them back."""
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb "
           "WITH nb, collect(a) AS as_grp UNWIND as_grp AS x RETURN nb, x",
    ))
    assert got == [(1, 5), (2, 0)]  # a=5 had 1 B, a=0 had 2


def test_with_star_passthrough(g):
    """WITH * carries every named binding into the next stage."""
    got = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH * MATCH (b)-[:Y]->(c:C) RETURN a, b, c",
    ))
    assert (0, 1, 3) in got and (0, 2, 3) in got and (5, 1, 4) in got
    # carried columns ride through a second WITH *
    got2 = rows(run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, count(b) AS nb WITH * RETURN a, nb",
    ))
    assert got2 == [(0, 2), (5, 1)]


def test_count_distinct_in_carry_stage(g):
    """count(DISTINCT col) counts VALUES, not rows, over the carried
    set (rows are distinct as tuples; a single column may repeat)."""
    df = run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, b "
           "RETURN count(b) AS rows_, count(DISTINCT b) AS vals",
    )
    r = df.collect()[0]
    assert (r.rows_, r.vals) == (3, 2)  # pairs (0,1),(0,2),(5,1); b values {1,2}


def test_sum_avg_distinct_in_carry_stage(g):
    """sum/avg(DISTINCT col) aggregate the distinct VALUES (VERDICT r6
    #8); min/max ignore DISTINCT (semantic no-op)."""
    df = run_cypher(
        g, "MATCH (a:A)-[:X]->(b:B) WITH a, b "
           "RETURN sum(b) AS s, sum(DISTINCT b) AS sd, "
           "avg(DISTINCT b) AS ad, max(DISTINCT b) AS m",
    )
    r = df.collect()[0]
    # pairs (0,1),(0,2),(5,1): sum rows = 4, distinct values {1,2} -> 3
    assert (r.s, r.sd, r.ad, r.m) == (4.0, 3.0, 1.5, 2)


# --- OPTIONAL MATCH as a WITH stage (VERDICT r6 #5) -----------------------


@pytest.fixture(scope="module")
def gopt(spark):
    nodes = spark.createDataFrame(
        [(1, "C", {"name": "a"}), (2, "C", {"name": "b"}), (3, "C", {"name": "c"}),
         (10, "O", {"v": "5"}), (20, "O", {"v": "9"}), (30, "L", None)],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(1, 10, "PLACED"), (2, 20, "PLACED"), (20, 30, "HAS_ITEM")],
        "src long, dst long, type string",
    )
    return PropertyGraph(nodes, edges)


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=str)


def test_with_optional_basic(gopt):
    got = _rows(run_cypher(
        gopt, "MATCH (c:C) WITH c OPTIONAL MATCH (c)-[:PLACED]->(o:O) RETURN c, o"
    ))
    assert got == [(1, 10), (2, 20), (3, None)]


def test_with_optional_count_zero(gopt):
    got = _rows(run_cypher(
        gopt,
        "MATCH (c:C) WITH c OPTIONAL MATCH (c)-[:PLACED]->(o:O) "
        "RETURN c, count(o) AS n",
    ))
    assert got == [(1, 1), (2, 1), (3, 0)]


def test_with_optional_where_scoped_to_stage(gopt):
    # WHERE restricts the optional group only: unmatched rows keep NULL,
    # they are never dropped
    got = _rows(run_cypher(
        gopt,
        "MATCH (c:C) WITH c OPTIONAL MATCH (c)-[:PLACED]->(o:O) "
        "WHERE o.v > 6 RETURN c, o",
    ))
    assert got == [(1, None), (2, 20), (3, None)]


def test_with_optional_prop_return(gopt):
    got = _rows(run_cypher(
        gopt,
        "MATCH (c:C) WITH c OPTIONAL MATCH (c)-[:PLACED]->(o:O) "
        "RETURN c, o.v AS val",
    ))
    assert got == [(1, "5"), (2, "9"), (3, None)]


def test_with_optional_mid_pipeline_carries_aggregates(gopt):
    # a carried aggregate column rides through the optional stage
    got = _rows(run_cypher(
        gopt,
        "MATCH (c:C)-[:PLACED]->(o:O) WITH c, count(o) AS n_ord "
        "OPTIONAL MATCH (c)-[:PLACED]->(o2:O)-[:HAS_ITEM]->(l:L) "
        "RETURN c, n_ord, l",
    ))
    assert got == [(1, 1, None), (2, 1, 30)]


def test_with_optional_rejects_pattern_predicates(gopt):
    with pytest.raises(CypherParseError, match="OPTIONAL MATCH stage"):
        run_cypher(
            gopt,
            "MATCH (c:C) WITH c OPTIONAL MATCH (o:O) RETURN c, o",
        )


def test_with_optional_prop_aggregates_null_semantics(gopt):
    """Aggregates over the optional binding's PROPS (round-8, VERDICT
    r7 #6): unmatched rows aggregate per openCypher — sum() of no
    values is 0, count() is 0, min/max/avg of no values are NULL."""
    got = _rows(run_cypher(
        gopt,
        "MATCH (c:C) WITH c OPTIONAL MATCH (c)-[:PLACED]->(o:O) "
        "RETURN c, sum(o.v) AS s, count(o) AS n, max(o.v) AS mx, avg(o.v) AS av",
    ))
    assert got == [(1, 5.0, 1, 5.0, 5.0), (2, 9.0, 1, 9.0, 9.0),
                   (3, 0.0, 0, None, None)]


def test_with_optional_agg_into_next_with_stage(gopt):
    """`WITH c OPTIONAL MATCH ... WITH c, sum(o.v) AS s` — the optional
    binding's prop aggregate lands in a WITH stage and survives into a
    final carry-only projection."""
    got = _rows(run_cypher(
        gopt,
        "MATCH (c:C) WITH c OPTIONAL MATCH (c)-[:PLACED]->(o:O) "
        "WITH c, sum(o.v) AS s RETURN c, s",
    ))
    assert got == [(1, 5.0), (2, 9.0), (3, 0.0)]


def test_with_optional_filtered_sum_zero(gopt):
    """A clause-scoped WHERE inside the optional stage can empty a
    matched group; its sum folds to 0 not NULL."""
    got = _rows(run_cypher(
        gopt,
        "MATCH (c:C) WITH c OPTIONAL MATCH (c)-[:PLACED]->(o:O) "
        "WHERE o.v > 6 RETURN c, sum(o.v) AS s",
    ))
    assert got == [(1, 0.0), (2, 9.0), (3, 0.0)]


def test_carry_stage_sum_of_empty_is_zero(gopt):
    """Carry-only WITH aggregation (sum / sum DISTINCT) over a column
    that is entirely NULL also folds to 0 (openCypher)."""
    got = _rows(run_cypher(
        gopt,
        "MATCH (c:C) WITH c OPTIONAL MATCH (c)-[:PLACED]->(o:O) "
        "WITH c, o.v AS v WITH sum(v) AS total RETURN total",
    ))
    assert got == [(14.0,)]


def test_with_stage_introspection_and_concat(spark):
    """Round-8 item kinds inside WITH pipelines: labels()/concat as
    stage grouping keys, id() over carried bindings in the final
    RETURN (and in carry-only stages)."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher

    nodes = spark.createDataFrame(
        [(1, "A", {"name": "ann"}), (2, "A", {"name": "bob"}),
         (10, "B", {"name": "x"}), (11, "B", {"name": "y"})],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(1, 10, "E"), (1, 11, "E"), (2, 10, "E")],
        "src long, dst long, type string",
    )
    g = PropertyGraph(nodes, edges, spark)
    got = sorted(map(tuple, run_cypher(
        g, "MATCH (a:A)-[:E]->(b:B) WITH labels(a) AS la, count(b) AS n "
           "RETURN la, n"
    ).collect()))
    assert got == [("A", 3)]
    got = sorted(map(tuple, run_cypher(
        g, "MATCH (a:A)-[:E]->(b:B) WITH a.name + '#' AS tag, count(b) AS n "
           "RETURN tag, n"
    ).collect()))
    assert got == [("ann#", 2), ("bob#", 1)]
    got = sorted(map(tuple, run_cypher(
        g, "MATCH (a:A)-[:E]->(b:B) WITH a, count(b) AS n WHERE n >= 2 "
           "RETURN id(a) AS ai, n"
    ).collect()))
    assert got == [(1, 2)]

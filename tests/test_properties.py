"""Property-based kernel tests (hypothesis), mirroring the reference's
ScalaCheck suites (SURVEY §5): random COO matrices with coordinate-distinct
entries, checked against a pure-python oracle.

- MxM associativity (MxMSpec.scala:21-62)
- reduce vs oracle (ReduceSpec.scala:31-137)
- self-union == self-intersect == 2x (ElemWiseSpec.scala:19-70)
- extract/assign roundtrip (AssignSpec.scala:26-81)
- transpose involution

Example counts are kept small: each example runs real Spark jobs; the
fixed-seed suites in test_grblas.py carry the volume, these carry the
generator diversity.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from g4s_spark import grblas as gb

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def coo(draw, n=6, vmin=1, vmax=9):
    ncoords = draw(st.integers(1, n * n // 2))
    coords = draw(
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            min_size=ncoords, max_size=ncoords, unique=True,
        )
    )
    return [(i, j, draw(st.integers(vmin, vmax))) for i, j in coords]


def py_mxm(a, b):
    out = {}
    for (i, k1), va in a.items():
        for (k2, j), vb in b.items():
            if k1 == k2:
                out[(i, j)] = out.get((i, j), 0) + va * vb
    return out


def as_dict(t):
    return {(i, j): v for i, j, v in t}


@given(ta=coo(), tb=coo(), tc=coo())
@settings(**SETTINGS)
def test_mxm_associativity_property(spark, ta, tb, tc):
    n = 6
    A = gb.Matrix.from_tuples(spark, ta, n, n)
    B = gb.Matrix.from_tuples(spark, tb, n, n)
    C = gb.Matrix.from_tuples(spark, tc, n, n)
    left = gb.mxm(gb.mxm(A, B, gb.PLUS_TIMES), C, gb.PLUS_TIMES)
    right = gb.mxm(A, gb.mxm(B, C, gb.PLUS_TIMES), gb.PLUS_TIMES)
    assert as_dict(left.to_tuples()) == py_mxm(py_mxm(as_dict(ta), as_dict(tb)), as_dict(tc))
    assert gb.is_eq(left, right)


@given(t=coo())
@settings(**SETTINGS)
def test_reduce_property(spark, t):
    A = gb.Matrix.from_tuples(spark, t, 6, 6)
    assert gb.reduce_all(A, "plus") == sum(v for _, _, v in t)
    assert gb.reduce_all(A, "max") == max(v for _, _, v in t)
    rows = dict(gb.reduce_rows(A, "min").to_tuples())
    expect = {}
    for i, _, v in t:
        expect[i] = min(expect.get(i, 10**9), v)
    assert rows == expect


@given(t=coo())
@settings(**SETTINGS)
def test_self_union_intersect_double_property(spark, t):
    A = gb.Matrix.from_tuples(spark, t, 6, 6)
    doubled = {(i, j): 2 * v for i, j, v in t}
    assert as_dict(gb.ewise_union(A, A, "plus").to_tuples()) == doubled
    assert as_dict(gb.ewise_intersect(A, A, "plus").to_tuples()) == doubled


@given(t=coo(), lo=st.integers(0, 2), hi=st.integers(3, 5))
@settings(**SETTINGS)
def test_extract_assign_roundtrip_property(spark, t, lo, hi):
    A = gb.Matrix.from_tuples(spark, t, 6, 6)
    sub = gb.extract(A, (lo, hi), (lo, hi))
    back = gb.assign(A, sub, (lo, hi), (lo, hi))
    assert gb.is_eq(back, A)


@given(t=coo())
@settings(**SETTINGS)
def test_transpose_involution_property(spark, t):
    A = gb.Matrix.from_tuples(spark, t, 6, 6)
    assert gb.is_eq(A.transpose().transpose(), A)
    assert as_dict(A.transpose().to_tuples()) == {(j, i): v for i, j, v in t}


@st.composite
def bool_coo(draw, n=6):
    ncoords = draw(st.integers(1, n * n // 2))
    coords = draw(
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            min_size=ncoords, max_size=ncoords, unique=True,
        )
    )
    return [(i, j, draw(st.booleans())) for i, j in coords]


def _py_mxm(ta, tb):
    out = {}
    for (i, k1, va) in ta:
        for (k2, j, vb) in tb:
            if k1 == k2:
                out[(i, j)] = out.get((i, j), 0) + va * vb
    return out


@given(ta=coo(), tb=coo(), tm=bool_coo(), comp=st.booleans(), valued=st.booleans())
@settings(**SETTINGS)
def test_mask_descriptor_model(spark, ta, tb, tm, comp, valued):
    """mxm under every mask descriptor combination vs a pure-python model
    (DescriptorSpec analogue): effective mask = structure or truthy cells,
    complement flips, result = Z restricted to the effective set."""
    n = 6
    A = gb.Matrix.from_tuples(spark, ta, n, n)
    B = gb.Matrix.from_tuples(spark, tb, n, n)
    M = gb.Matrix.from_tuples(spark, tm, n, n, vtype="boolean")
    z = _py_mxm(ta, tb)
    eff = {(i, j) for i, j, v in tm if (v if valued else True)}
    keep = {c for c in z if (c not in eff) == comp}
    expect = {c: z[c] for c in keep}
    got = gb.mxm(A, B, gb.PLUS_TIMES, mask=M, mask_complement=comp, mask_valued=valued)
    assert {(i, j): v for i, j, v in got.to_tuples()} == expect


@given(ta=coo(), tb=coo(), tm=bool_coo(), tc=coo(), replace=st.booleans())
@settings(**SETTINGS)
def test_replace_descriptor_model(spark, ta, tb, tm, tc, replace):
    """C<M> += Z with replace on/off vs the model: inside the mask old and
    new merge with the accumulator; outside, old survives iff not replace."""
    n = 6
    A = gb.Matrix.from_tuples(spark, ta, n, n)
    B = gb.Matrix.from_tuples(spark, tb, n, n)
    M = gb.Matrix.from_tuples(spark, tm, n, n, vtype="boolean")
    C = gb.Matrix.from_tuples(spark, tc, n, n)
    z = _py_mxm(ta, tb)
    old = {(i, j): v for i, j, v in tc}
    eff = {(i, j) for i, j, _ in tm}  # structural mask
    expect = {}
    for c in set(z) | set(old):
        in_mask = c in eff
        if in_mask:
            if c in z and c in old:
                expect[c] = old[c] + z[c]
            elif c in z:
                expect[c] = z[c]
            else:
                expect[c] = old[c]
        elif c in old and not replace:
            expect[c] = old[c]
    got = gb.mxm(
        A, B, gb.PLUS_TIMES, mask=M,
        accum_into=C, accum_op=lambda x, y: x + y, replace=replace,
    )
    assert {(i, j): v for i, j, v in got.to_tuples()} == expect


@st.composite
def _sel2(draw, n=6):
    """A 2-position selection over [0, n): inclusive range, stride pair,
    or index list (arbitrary order) — every form assign accepts."""
    kind = draw(st.sampled_from(["range", "stride", "list"]))
    if kind == "range":
        lo = draw(st.integers(0, n - 2))
        return (lo, lo + 1), [lo, lo + 1]
    if kind == "stride":
        lo = draw(st.integers(0, n - 3))
        return (lo, lo + 2, 2), [lo, lo + 2]
    idx = draw(
        st.lists(st.integers(0, n - 1), min_size=2, max_size=2, unique=True)
    )
    return idx, idx


@given(
    ta=coo(), tsub=coo(n=2), tm=bool_coo(),
    rows_sel=_sel2(), cols_sel=_sel2(),
    comp=st.booleans(), valued=st.booleans(),
    accum=st.booleans(), replace=st.booleans(),
)
@settings(**SETTINGS)
def test_assign_descriptor_model(spark, ta, tsub, tm, rows_sel, cols_sel,
                                 comp, valued, accum, replace):
    """Round-12 assign descriptor tail vs a pure-python model across
    every (mask, complement, valued, accum, replace) combination AND
    every selection form (range / stride / index list — position k of
    the sub maps to the k-th selected coordinate): the C-space mask
    gates region writes; inside the effective mask old and new merge
    under accum (new pattern wins without accum); off-mask region cells
    survive iff not replace; cells outside the (I, J) region never
    change."""
    n = 6
    rows, row_map = rows_sel
    cols, col_map = cols_sel
    A = gb.Matrix.from_tuples(spark, ta, n, n)
    SUB = gb.Matrix.from_tuples(spark, tsub, 2, 2)
    M = gb.Matrix.from_tuples(spark, tm, n, n, vtype="boolean")

    old = {(i, j): v for i, j, v in ta}
    shifted = {(row_map[si], col_map[sj]): v for si, sj, v in tsub}
    region = {(i, j) for i in row_map for j in col_map}
    eff = {(i, j) for i, j, v in tm if (v if valued else True)}
    member = lambda c: (c in eff) != comp  # noqa: E731
    z = {c: v for c, v in shifted.items() if member(c)}
    old_region = {c: v for c, v in old.items() if c in region}
    expect = {c: v for c, v in old.items() if c not in region}  # untouched
    for c, v in old_region.items():
        if member(c):
            # in-mask: without accum the pattern BECOMES z's (old cell
            # not in z is deleted); with accum, old survives (merged
            # below if z also has the cell)
            if accum and c not in z:
                expect[c] = v
        elif not replace:
            expect[c] = v  # off-mask region cell kept unless replace
    for c, v in z.items():
        expect[c] = (old_region[c] + v) if (accum and c in old_region) else v

    got = gb.assign(
        A, SUB, rows, cols, mask=M, mask_complement=comp,
        mask_valued=valued,
        accum_op=(lambda x, y: x + y) if accum else None,
        replace=replace,
    )
    assert {(i, j): v for i, j, v in got.to_tuples()} == expect


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
        min_size=1, max_size=14, unique=True,
    )
)
@settings(**SETTINGS)
def test_path_length_matches_bfs_model(spark, edges):
    """length(p) over an unbounded closure == min directed walk length
    from a pure-python BFS, on random digraphs (cycles included)."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher

    nodes = sorted({v for e in edges for v in e})
    g = PropertyGraph.from_tuples(
        spark,
        nodes=[(v, "N") for v in nodes],
        edges=[(a, b, "X") for a, b in edges],
    )
    got = {
        (r.a, r.b): r.d
        for r in run_cypher(g, "MATCH p = (a)-[:X*]->(b) RETURN a, b, length(p) AS d").collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    expect = {}
    for s0 in nodes:
        # BFS from s0 over directed edges; distance to s0 itself only via a
        # real cycle (min walk >= 1), matching the closure's semantics
        from collections import deque

        dist = {}
        dq = deque((n, 1) for n in adj.get(s0, []))
        while dq:
            v, d = dq.popleft()
            if v in dist:
                continue
            dist[v] = d
            for w in adj.get(v, []):
                if w not in dist:
                    dq.append((w, d + 1))
        for v, d in dist.items():
            expect[(s0, v)] = d
    assert got == expect


# --- WITH pipeline vs a pure-python model ------------------------------------

@st.composite
def typed_digraph(draw, n=5):
    pairs = st.tuples(
        st.integers(0, n - 1), st.integers(0, n - 1), st.sampled_from(["X", "Y"])
    )
    edges = draw(st.sets(pairs, min_size=1, max_size=14))
    return sorted(edges)


@given(edges=typed_digraph(), k=st.integers(1, 2))
@settings(**SETTINGS)
def test_with_pipeline_matches_model(spark, edges, k):
    """MATCH-WITH-MATCH over random typed digraphs == the set-algebra
    model: stage1 counts distinct X-successors per node, HAVING >= k,
    stage2 counts distinct Y-successors of the survivors."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher

    nodes = sorted({v for e in edges for v in e[:2]})
    g = PropertyGraph.from_tuples(
        spark, nodes=[(i, "N") for i in nodes], edges=list(edges)
    )
    got = {
        (r.a, r.nx, r.ny)
        for r in run_cypher(
            g,
            f"MATCH (a:N)-[:X]->(b:N) WITH a, count(b) AS nx WHERE nx >= {k} "
            "MATCH (a)-[:Y]->(c:N) RETURN a, nx, count(c) AS ny",
        ).collect()
    }
    out_x: dict[int, set] = {}
    out_y: dict[int, set] = {}
    for s, d, t in edges:
        (out_x if t == "X" else out_y).setdefault(s, set()).add(d)
    want = {
        (a, len(out_x[a]), len(out_y.get(a, ())))
        for a in out_x
        if len(out_x[a]) >= k and out_y.get(a)
    }
    assert got == want


@st.composite
def undirected_pairs(draw, n=8):
    npairs = draw(st.integers(1, n * (n - 1) // 2))
    pairs = draw(st.lists(
        st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
        min_size=npairs, max_size=npairs, unique=True,
    ))
    return sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})


@given(pairs=undirected_pairs(), k=st.integers(1, 4))
@settings(**SETTINGS)
def test_k_core_matches_python_peeling(spark, pairs, k):
    """k_core vs a pure-python peel: same member set, and every member's
    within-core degree >= k (self-consistency the definition demands)."""
    from g4s_spark.operators import k_core

    if not pairs:
        return
    # python oracle: peel to fixpoint
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r.id: r.core_deg for r in k_core(df, k).collect()}
    assert set(got) == alive
    assert all(got[v] == len(adj[v] & alive) for v in alive)
    assert all(d >= k for d in got.values())


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=6).map(" ".join),
        min_size=1, max_size=6,
    ),
    bench=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=6).map(" ".join),
        min_size=1, max_size=3,
    ),
    n=st.integers(2, 3),
)
@settings(**SETTINGS)
def test_decontaminate_matches_brute_force(spark, docs, bench, n):
    """decontaminate vs brute-force n-gram overlap on tiny random docs."""
    from g4s_spark.functions.text import decontaminate

    def grams(text):
        toks = text.split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    bench_grams = set().union(*(grams(t) for t in bench)) if bench else set()
    expect = {i: bool(grams(t) & bench_grams) for i, t in enumerate(docs)}

    corpus_df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    bench_df = spark.createDataFrame(
        [(i + 1000, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    got = {r.doc_id: r.contaminated for r in decontaminate(corpus_df, bench_df, n=n).collect()}
    assert got == expect


@st.composite
def arith_tree(draw, depth=0):
    """Random +-*/ tree over p.age and positive integer literals, with
    its python evaluator — rendered to Cypher text for the engine. The
    root is always an operator node: a bare leaf is a prop_return /
    invalid item, not an expression."""
    if depth >= 3 or (depth > 0 and draw(st.booleans())):
        if draw(st.booleans()):
            return ("p.age", lambda age: age)
        lit = draw(st.integers(1, 9))
        return (str(lit), lambda age, lit=lit: float(lit))
    op = draw(st.sampled_from("+-*/"))
    lt, lf = draw(arith_tree(depth=depth + 1))
    rt, rf = draw(arith_tree(depth=depth + 1))
    if op == "/":
        # keep denominators away from zero: use a literal-only right side
        rlit = draw(st.integers(1, 9))
        rt, rf = str(rlit), lambda age, rlit=rlit: float(rlit)
    text = f"({lt} {op} {rt})"
    fn = {
        "+": lambda age: lf(age) + rf(age),
        "-": lambda age: lf(age) - rf(age),
        "*": lambda age: lf(age) * rf(age),
        "/": lambda age: lf(age) / rf(age),
    }[op]
    return (text, fn)


@given(tree=arith_tree())
@settings(**SETTINGS)
def test_cypher_expressions_match_python_eval(spark, tree):
    """Random arithmetic RETURN expressions evaluate exactly like the
    equivalent python expression over the same prop values."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher

    from hypothesis import assume

    text, fn = tree
    # literal-only trees are rejected by design (an expression item must
    # reference at least one property)
    assume("p.age" in text)
    nodes = spark.createDataFrame(
        [(1, "Person", {"age": "30.0"}), (2, "Person", {"age": "41.0"})],
        "id long, label string, props map<string,string>",
    )
    edges = spark.createDataFrame([], "src long, dst long, type string")
    g = PropertyGraph(nodes, edges)
    got = {r.p: r.v for r in run_cypher(
        g, f"MATCH (p:Person) RETURN p, {text} AS v"
    ).collect()}
    expect = {1: fn(30.0), 2: fn(41.0)}
    assert got.keys() == expect.keys()
    for k in expect:
        assert got[k] == expect[k] or abs(got[k] - expect[k]) < 1e-9 * max(1.0, abs(expect[k]))


@given(q=st.text(
    alphabet="MATCHRETURNWHEO {}()[]<>-:.*,'|abcz0123456789+/=",
    min_size=1, max_size=80,
))
@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_parser_never_crashes_with_foreign_exceptions(q):
    """Fuzz: any input either parses or raises CypherParseError — no
    IndexError/KeyError/AttributeError escapes (the reference throws a
    typed MatchError the same way)."""
    from g4s_spark.cypher import CypherParseError, parse

    try:
        parse(q)
    except CypherParseError:
        pass


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(lambda e: e[0] != e[1]),
        min_size=1, max_size=10, unique=True,
    ),
    use_all=st.booleans(),
)
@settings(**SETTINGS)
def test_union_matches_set_model(spark, edges, use_all):
    """UNION [ALL] of two one-hop queries vs the python set/multiset
    model over the same random digraph."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher

    nodes = sorted({v for e in edges for v in e})
    g = PropertyGraph.from_tuples(
        spark,
        nodes=[(v, "N") for v in nodes],
        edges=[(a, b, "X" if a < b else "Y") for a, b in edges],
    )
    kw = "UNION ALL" if use_all else "UNION"
    got = sorted(
        r.b for r in run_cypher(
            g, f"MATCH (a:N)-[:X]->(b:N) RETURN b {kw} MATCH (a:N)-[:Y]->(b:N) RETURN b"
        ).collect()
    )
    xs = sorted({b for a, b in edges if a < b})
    ys = sorted({b for a, b in edges if a > b})
    expect = sorted(xs + ys) if use_all else sorted(set(xs) | set(ys))
    assert got == expect


@given(
    docs=st.lists(
        st.integers(0, 40), min_size=1, max_size=5  # token counts per doc
    ),
    chunk=st.integers(2, 12),
    overlap=st.integers(0, 6),
)
@settings(**SETTINGS)
def test_chunk_documents_matches_python_model(spark, docs, chunk, overlap):
    """chunk_documents vs a pure-python window model: same chunk count,
    same chunk texts, same token accounting — across random doc lengths
    (incl. empty), chunk sizes, and overlaps."""
    from g4s_spark.functions.sampling import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    }
    expect = {}
    for i, n in enumerate(docs):
        toks = [f"w{j}" for j in range(n)] if n > 0 else [""]  # split('') -> ['']
        starts = [s for s in range(0, len(toks), stride)
                  if s == 0 or s + overlap < len(toks)]
        for s in starts:
            w = toks[s:s + chunk]
            expect[(i, s // stride)] = (" ".join(w), len(w))
    assert got == expect


@given(q=st.text(
    alphabet="MATCHWIHUNDSETRODBYLKP ()[]<>-:.*,'abz019+/=",
    min_size=1, max_size=90,
))
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_pipeline_front_end_never_crashes(spark, q):
    """Fuzz the FULL run_cypher/run_cypher_set front-end (WITH pipelines,
    UNWIND, SET, carry stages, ORDER BY props): any input either plans or
    raises CypherParseError/ValueError — planning only, nothing executes,
    and no foreign exception escapes. The alphabet is biased to generate
    the new round-6 keywords (WITH/UNWIND/SET/ORDER BY/SKIP/LIMIT)."""
    from g4s_spark.cypher import CypherParseError
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher, run_cypher_set

    g = PropertyGraph.from_tuples(
        spark, nodes=[(0, "a"), (1, "b")], edges=[(0, 1, "z")]
    )
    for fn in (run_cypher, run_cypher_set):
        try:
            fn(g, q)
        except (CypherParseError, ValueError):
            pass


# keyword-token fuzz (round-12, VERDICT r11 #8): compose statements from
# the FULL keyword surface — including the r10/r11 additions
# (shortestPath, ON CREATE/ON MATCH SET, DETACH, coalesce, IS NULL) the
# character alphabets above are too sparse to generate — and require
# every outcome to be a plan or a typed error.
_CYPHER_TOKENS = [
    "MATCH", "OPTIONAL MATCH", "RETURN", "WHERE", "WITH", "UNWIND",
    "SET", "MERGE", "CREATE", "DELETE", "DETACH DELETE", "REMOVE",
    "ORDER BY", "SKIP", "LIMIT", "UNION", "UNION ALL", "DISTINCT",
    "shortestPath", "ON CREATE SET", "ON MATCH SET", "coalesce",
    "IS NULL", "IS NOT NULL", "count", "sum", "CASE", "WHEN", "THEN",
    "END", "EXISTS", "NOT", "AND", "OR", "IN", "AS", "=~", "STARTS WITH",
    "(", ")", "[", "]", "{", "}", "-", "->", "<-", "--", ":", ",", "*",
    "..", ".", "=", "<", ">", "|", "+", "a", "b", "n", "r", "k", "A", "X",
    "'x'", "1", "2", "$p", "*1..2", "NULL", "true",
]


@given(toks=st.lists(st.sampled_from(_CYPHER_TOKENS), min_size=1, max_size=24))
@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_keyword_fuzz_plans_or_typed_error(spark, toks):
    """Any token-soup statement either plans or raises
    CypherParseError/ValueError from BOTH the query and the mutation
    front-ends — no IndexError/KeyError/AttributeError/TypeError
    escapes, no silent None."""
    from g4s_spark.cypher import CypherParseError
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher, run_cypher_set

    q = " ".join(toks)
    g = PropertyGraph.from_tuples(
        spark, nodes=[(0, "A"), (1, "B")], edges=[(0, 1, "X")]
    )
    for fn in (run_cypher, run_cypher_set):
        try:
            out = fn(g, q)
            assert out is not None
        except (CypherParseError, ValueError):
            pass


@given(
    parts=st.lists(
        st.text(
            alphabet="ab1 ()[]{}'\",+.:-<>=",
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    ),
    delim=st.sampled_from([",", "+"]),
)
@settings(max_examples=120, deadline=None)
def test_split_punct_roundtrip(parts, delim):
    """Pure-python property for the round-15 item splitter: for any
    lexable source, every removed delimiter is exactly one top-level
    ``delim`` char, so joining the parts back with it reproduces the
    source verbatim; and no part retokenizes with a top-level delim of
    its own (splits are maximal). Unlexable/unbalanced input raises the
    typed lexer error, never a foreign exception."""
    from g4s_spark.cypher.tokenizer import CypherLexError, split_punct, tokenize

    s = delim.join(parts)
    try:
        got = split_punct(s, tokenize(s), delim)
    except CypherLexError:
        return
    assert delim.join(got) == s
    for p in got:
        # a part is always lexable (it is a token-aligned slice) and
        # carries no further top-level delimiter
        sub = split_punct(p, tokenize(p), delim)
        assert sub == [p]


def test_unsupported_opencypher_negative_corpus(spark):
    """Round-12 (VERDICT r11 #8): the top unsupported openCypher
    constructs must raise a TYPED CypherParseError — never a silent
    wrong plan, never a foreign exception. Each entry was probed to be
    genuinely unsupported; if one starts parsing, this test forces the
    implementer to either finish the semantics or keep rejecting."""
    import pytest as pt

    from g4s_spark.cypher import CypherParseError
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher

    g = PropertyGraph.from_tuples(
        spark, nodes=[(0, "A"), (1, "B")], edges=[(0, 1, "X")]
    )
    corpus = [
        # iteration / subquery forms
        "FOREACH (x IN [1,2] | SET n.p = x)",
        "CALL db.labels() YIELD label RETURN label",
        "CALL { MATCH (n:A) RETURN n } RETURN n",
        "MATCH (a:A) CALL apoc.do.x(a) YIELD value RETURN value",
        # comprehensions / quantifiers / reduce
        "MATCH (a:A) RETURN [x IN range(1,3) | x*2] AS l",
        "MATCH (a:A) RETURN [(a)-->(b) | b] AS l",
        "MATCH (a:A) RETURN reduce(acc = 0, x IN [1,2] | acc + x) AS s",
        "MATCH (a:A) WHERE any(x IN [1,2] WHERE x > 1) RETURN a",
        "MATCH (a:A) RETURN all(x IN [1] WHERE x = 1) AS q",
        # subquery EXISTS / path variants
        "MATCH (a:A) WHERE EXISTS { MATCH (a)-[:X]->(:B) } RETURN a",
        "MATCH p = allShortestPaths((a:A)-[*]->(b:B)) RETURN p",
        "MATCH ((a:A)-[:X]->(b:B)){1,3} RETURN a",
        # I/O, hints, multi-db
        "LOAD CSV FROM 'file:///x.csv' AS row RETURN row",
        "MATCH (a:A) USING INDEX a:A(k) WHERE a.k = 1 RETURN a",
        "USE db2 MATCH (a:A) RETURN a",
        "MANDATORY MATCH (a:A) RETURN a",
        # operators / functions / projections
        "MATCH (a:A) RETURN a.x XOR a.y AS z",
        "MATCH (a:A) RETURN datetime() AS d",
        "MATCH (a:A) RETURN a {.k, .v} AS m",
        "MATCH (n:$label) RETURN n",
        # mutation forms outside the runners' grammar
        "MERGE (a:A)-[:R]-(b:B)",
        "MATCH (a:A) SET a += {k: 1} RETURN a",
        "MATCH (a:A)-[:X]->(b) DELETE a RETURN b",
    ]
    for q in corpus:
        with pt.raises(CypherParseError):
            run_cypher(g, q)


# --- round-8 operator properties ------------------------------------------

_WORD = st.text(alphabet="abcxyz", min_size=1, max_size=4)


@given(
    docs=st.lists(
        st.lists(_WORD, min_size=0, max_size=5), min_size=1, max_size=6
    ),
    min_docs=st.integers(2, 3),
)
@settings(**SETTINGS)
def test_dedup_lines_invariants(spark, docs, min_docs):
    """For ANY corpus: n_kept + n_removed == segment count per doc, every
    doc survives as a row, and kept text is a subsequence rendering of
    the original segments (python replica oracle)."""
    from collections import defaultdict

    from g4s_spark.functions.text import dedup_lines

    rows = [(i, "\n".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_lines(df, min_docs=min_docs).collect()}
    # python replica
    seg_docs = defaultdict(set)
    for i, txt in rows:
        for seg in txt.split("\n"):
            seg_docs[seg].add(i)
    # blank segments are structure, never boilerplate (round-9)
    common = {
        s for s, ds in seg_docs.items()
        if len(ds) >= min_docs and s.strip() != ""
    }
    for i, txt in rows:
        segs = txt.split("\n")
        kept = [s for s in segs if s not in common]
        r = got[i]
        assert r.n_kept + r.n_removed == len(segs)
        assert r.text == "\n".join(kept)


@given(
    w=st.lists(
        st.floats(0.05, 1.0, allow_nan=False), min_size=2, max_size=4
    ).map(lambda xs: {f"s{i}": x / sum(xs) for i, x in enumerate(xs)}),
    seed=st.integers(0, 10),
)
@settings(**SETTINGS)
def test_split_corpus_partition_property(spark, w, seed):
    """Splits are a PARTITION: every row gets exactly one split name,
    assignments are deterministic, and membership depends only on
    (key, seed) — not row order."""
    from g4s_spark.functions.sampling import split_corpus

    # weights must sum to exactly 1.0 for the validator: renormalize the
    # last entry against float error
    names = sorted(w)
    w[names[-1]] = 1.0 - sum(w[n] for n in names[:-1])
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in split_corpus(df, w, seed=seed).collect()}
    assert set(a) == set(range(300))
    assert set(a.values()) <= set(w)
    shuffled = df.orderBy(F.rand(42))
    b = {r.doc_id: r.split
         for r in split_corpus(shuffled, w, seed=seed).collect()}
    assert a == b


@given(values=st.sets(st.integers(0, 10**9), min_size=1, max_size=60),
       k=st.integers(4, 32))
@settings(**SETTINGS)
def test_kmv_exact_under_k(spark, values, k):
    """KMV is EXACT whenever the distinct count is under k, regardless
    of duplication."""
    from g4s_spark.functions.dedup import kmv_distinct

    rows = [(v,) for v in values] + [(v,) for v in list(values)[: len(values) // 2]]
    df = spark.createDataFrame(rows, "v long")
    r = kmv_distinct(df, "v", k=k).collect()[0]
    if len(values) < k:
        assert r.n_kept == len(values) and r.estimate == float(len(values))
    else:
        assert r.n_kept == k


# --- cypher pipeline vs pure-python replica (round-9 fuzz) ----------------

_EDGE = st.tuples(st.integers(0, 7), st.integers(0, 7))


def _fuzz_graph(spark, edges):
    from g4s_spark.graph import PropertyGraph

    nodes = [(i, "A" if i % 2 == 0 else "B") for i in range(8)]
    dedup = sorted({(s, d, "T") for s, d in edges if s != d})
    return PropertyGraph.from_tuples(spark, nodes, dedup), dedup


@given(edges=st.lists(_EDGE, min_size=0, max_size=20))
@settings(**SETTINGS)
def test_cypher_one_hop_matches_replica(spark, edges):
    """For ANY random digraph: MATCH (a:A)-[:T]->(b:B) RETURN a, b is
    exactly the distinct (even, odd) edge set — parser, planner, label
    semi-joins and existence dedup fuzzed together."""
    from g4s_spark.plans import run_cypher

    g, e = _fuzz_graph(spark, edges)
    out = run_cypher(g, "MATCH (a:A)-[:T]->(b:B) RETURN a, b")
    got = sorted((r.a, r.b) for r in out.collect())
    want = sorted({(s, d) for s, d, _ in e if s % 2 == 0 and d % 2 == 1})
    assert got == want


@given(edges=st.lists(_EDGE, min_size=0, max_size=20))
@settings(**SETTINGS)
def test_cypher_two_hop_existence_matches_replica(spark, edges):
    """MATCH (a:A)-[:T]->(b:B)-[:T]->(c:A) RETURN a, c: the DISTINCT
    endpoint-pair set (ANY_PAIR existence — path multiplicity must
    never leak into binding-only projections), any join order the
    cost model picks."""
    from g4s_spark.plans import run_cypher

    g, e = _fuzz_graph(spark, edges)
    out = run_cypher(g, "MATCH (a:A)-[:T]->(b:B)-[:T]->(c:A) RETURN a, c")
    got = sorted((r.a, r.c) for r in out.collect())
    adj = {(s, d) for s, d, _ in e}
    want = sorted({
        (a, c)
        for a, b in adj if a % 2 == 0 and b % 2 == 1
        for b2, c in adj if b2 == b and c % 2 == 0
    })
    assert got == want


@given(edges=st.lists(_EDGE, min_size=0, max_size=20))
@settings(**SETTINGS)
def test_cypher_fork_and_agg_match_replica(spark, edges):
    """Fork pattern (two branches off one binding) + grouped count:
    bushy DP trees and the aggregate path against brute force."""
    from g4s_spark.plans import run_cypher

    g, e = _fuzz_graph(spark, edges)
    adj = {(s, d) for s, d, _ in e}
    out = run_cypher(
        g, "MATCH (b:B)-[:T]->(x:A), (b)-[:T]->(y:B) RETURN b, x, y"
    )
    got = sorted((r.b, r.x, r.y) for r in out.collect())
    want = sorted({
        (b, x, y)
        for b, x in adj if b % 2 == 1 and x % 2 == 0
        for b2, y in adj if b2 == b and y % 2 == 1
    })
    assert got == want
    agg = run_cypher(g, "MATCH (a:A)-[:T]->(b:B) RETURN a, count(b) AS n")
    got_n = sorted((r.a, r.n) for r in agg.collect())
    from collections import Counter

    cnt = Counter(s for s, d in adj if s % 2 == 0 and d % 2 == 1)
    want_n = sorted(cnt.items())
    assert got_n == want_n


@given(
    edges=st.lists(_EDGE, min_size=0, max_size=20),
    vals=st.lists(st.integers(0, 9), min_size=8, max_size=8),
    cut=st.integers(0, 9),
)
@settings(**SETTINGS)
def test_cypher_where_pushdown_matches_replica(spark, edges, vals, cut):
    """WHERE on both bindings' props (scan pushdown) and a cross-binding
    arithmetic predicate (post-join resolution) vs brute force, on
    random graphs with random property values."""
    from g4s_spark.graph import PropertyGraph
    from g4s_spark.plans import run_cypher

    nodes = spark.createDataFrame(
        [(i, "A" if i % 2 == 0 else "B", {"v": str(float(vals[i]))})
         for i in range(8)],
        "id long, label string, props map<string,string>",
    )
    dedup = sorted({(s, d) for s, d in edges if s != d})
    edf = spark.createDataFrame(
        [(s, d, "T") for s, d in dedup] or [],
        "src long, dst long, type string",
    )
    g = PropertyGraph(nodes, edf, spark)
    out = run_cypher(
        g,
        f"MATCH (a:A)-[:T]->(b:B) WHERE a.v >= {cut} AND b.v < {cut} "
        "RETURN a, b",
    )
    got = sorted((r.a, r.b) for r in out.collect())
    want = sorted({
        (s, d) for s, d in dedup
        if s % 2 == 0 and d % 2 == 1 and vals[s] >= cut and vals[d] < cut
    })
    assert got == want
    # cross-binding arithmetic WHERE (resolves via payload_rows joins)
    out2 = run_cypher(
        g, "MATCH (a:A)-[:T]->(b:B) WHERE a.v + b.v > 9 RETURN a, b"
    )
    got2 = sorted((r.a, r.b) for r in out2.collect())
    want2 = sorted({
        (s, d) for s, d in dedup
        if s % 2 == 0 and d % 2 == 1 and vals[s] + vals[d] > 9
    })
    assert got2 == want2


@given(edges=st.lists(_EDGE, min_size=0, max_size=20))
@settings(**SETTINGS)
def test_cypher_optional_matches_replica(spark, edges):
    """OPTIONAL MATCH: every :A node survives; unmatched rows carry
    NULL — left-join semantics vs brute force on random graphs."""
    from g4s_spark.plans import run_cypher

    g, e = _fuzz_graph(spark, edges)
    out = run_cypher(
        g, "MATCH (a:A) OPTIONAL MATCH (a)-[:T]->(b:B) RETURN a, b"
    )
    got = sorted((r.a, r.b) for r in out.collect())
    adj = {(s, d) for s, d, _ in e}
    want = []
    for a in range(0, 8, 2):
        hits = sorted(d for s, d in adj if s == a and d % 2 == 1)
        want += [(a, d) for d in hits] or [(a, None)]
    assert got == sorted(want)


@given(
    lts=st.lists(
        st.tuples(st.integers(0, 2),
                  st.one_of(st.integers(0, 50), st.none())),
        min_size=1, max_size=12,
    ),
    rts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                 min_size=1, max_size=12),
    tol=st.one_of(st.none(), st.integers(1, 20)),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
@settings(**SETTINGS)
def test_asof_join_matches_pandas(spark, lts, rts, tol, direction):
    """asof_join vs pandas.merge_asof (ALL three directions, inclusive,
    by-key, optional tolerance) on random keyed time series. The second
    payload column is NULL on a third of the right rows: ADVICE r9
    (high) — a matched row's genuine NULL must come through as NULL,
    never a stale value carried forward from an OLDER right row (the
    per-column last(ignorenulls) formulation this pins against).
    'nearest' ties are fuzzed too (integer-second grids collide often)
    and must follow pandas' backward tie-break. Left timestamps are
    nullable (ADVICE r10: previously unfuzzed) — merge_asof rejects
    null merge keys outright, so the oracle splits: null-ts rows must
    match NOTHING in any direction, the rest compare against pandas."""
    import pandas as pd

    from g4s_spark.functions.temporal import asof_join

    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame({
        "k": [k for k, _ in lts],
        "ts": [pd.NaT if s is None else base + pd.Timedelta(seconds=s)
               for _, s in lts],
        "li": range(len(lts)),
    })
    rrows = sorted({(k, s) for k, s in rts})  # unique (key, ts) contract
    rpdf = pd.DataFrame({
        "k": [k for k, _ in rrows],
        "ts": [base + pd.Timedelta(seconds=s) for _, s in rrows],
        "rv": [float(k * 100 + s) for k, s in rrows],
        "rv2": [None if s % 3 == 0 else float(s) for _, s in rrows],
    })
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = {
        r.li: (r.rv_r, r.rv2_r, r.ts_r)
        for r in asof_join(
            left, right, on="k",
            tolerance_s=float(tol) if tol is not None else None,
            direction=direction,
        ).collect()
    }
    lnull = lpdf[lpdf["ts"].isna()]
    lval = lpdf[lpdf["ts"].notna()]
    for li in lnull["li"]:
        assert got[li] == (None, None, None), (li, got[li])
    kw = {"tolerance": pd.Timedelta(seconds=tol)} if tol is not None else {}
    if len(lval):
        exp = pd.merge_asof(
            lval.sort_values("ts", kind="stable"),
            rpdf.sort_values("ts", kind="stable"),
            on="ts", by="k", direction=direction, suffixes=("", "_r"), **kw
        )
        for _, row in exp.iterrows():
            want_rv = None if pd.isna(row["rv"]) else row["rv"]
            want_rv2 = None if pd.isna(row["rv2"]) else row["rv2"]
            assert got[row["li"]][0] == want_rv, (row["li"], got[row["li"]], want_rv)
            assert got[row["li"]][1] == want_rv2, (
                row["li"], got[row["li"]], want_rv2,
            )


@given(
    pts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 40)),
                 min_size=1, max_size=10),
    ivs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 15)),
        min_size=1, max_size=8,
    ),
    bucket=st.sampled_from([1, 7, 3600]),
)
@settings(**SETTINGS)
def test_range_join_matches_brute_force(spark, pts, ivs, bucket):
    """Bucketed band join == the naive containment join for ANY bucket
    width — bucket-boundary straddles and inclusive ends fuzzed."""
    import pandas as pd

    from g4s_spark.functions.temporal import range_join

    base = pd.Timestamp("2024-01-01")
    ppdf = pd.DataFrame({
        "k": [k for k, _ in pts],
        "ts": [base + pd.Timedelta(seconds=s) for _, s in pts],
        "pi": range(len(pts)),
    })
    ipdf = pd.DataFrame({
        "k": [k for k, _, _ in ivs],
        "start": [base + pd.Timedelta(seconds=s) for _, s, _ in ivs],
        "end": [base + pd.Timedelta(seconds=s + d) for _, s, d in ivs],
        "ii": range(len(ivs)),
    })
    got = sorted(
        (r.pi, r.ii)
        for r in range_join(
            spark.createDataFrame(ppdf), spark.createDataFrame(ipdf),
            on="k", bucket_s=bucket,
        ).collect()
    )
    want = sorted(
        (pi, ii)
        for pi, (pk, ps) in enumerate(pts)
        for ii, (ik, is_, d) in enumerate(ivs)
        if pk == ik and is_ <= ps <= is_ + d
    )
    assert got == want


@given(
    pts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 40)),
                 min_size=1, max_size=10),
    ivs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 15)),
        min_size=1, max_size=8,
    ),
)
@settings(**SETTINGS)
def test_range_join_left_null_point_columns(spark, pts, ivs):
    """range_join(how='left') with a NULLABLE non-key point column:
    ADVICE r9 (medium) — the miss set anti-joins on a surrogate row id,
    so a matched point whose own payload is NULL must appear EXACTLY
    once (the old all-columns null-unsafe anti-join emitted it twice).
    Every point appears exactly max(1, n_matches) times."""
    import pandas as pd

    from g4s_spark.functions.temporal import range_join

    base = pd.Timestamp("2024-01-01")
    ppdf = pd.DataFrame({
        "k": [k for k, _ in pts],
        "ts": [base + pd.Timedelta(seconds=s) for _, s in pts],
        "pi": range(len(pts)),
        # NULL on a third of the points — the anti-join hazard column
        "note": [None if s % 3 == 0 else f"n{s}" for _, s in pts],
    })
    ipdf = pd.DataFrame({
        "k": [k for k, _, _ in ivs],
        "start": [base + pd.Timedelta(seconds=s) for _, s, _ in ivs],
        "end": [base + pd.Timedelta(seconds=s + d) for _, s, d in ivs],
        "ii": range(len(ivs)),
    })
    rows = range_join(
        spark.createDataFrame(ppdf), spark.createDataFrame(ipdf),
        on="k", bucket_s=7, how="left",
    ).collect()
    from collections import Counter

    got = Counter(r.pi for r in rows)
    matches = {
        pi: sum(
            1 for ik, is_, d in ivs if ik == pk and is_ <= ps <= is_ + d
        )
        for pi, (pk, ps) in enumerate(pts)
    }
    for pi, (pk, ps) in enumerate(pts):
        assert got[pi] == max(1, matches[pi]), (pi, got[pi], matches[pi])
    # miss rows carry NULL interval columns; hits carry real interval ids
    for r in rows:
        if matches[r.pi] == 0:
            assert r.ii is None


@given(
    edges=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 5)),
                   min_size=1, max_size=12, unique=True),
    feats=st.lists(st.tuples(st.integers(0, 5), st.integers(-9, 9)),
                   min_size=1, max_size=6, unique_by=lambda t: t[0]),
    agg=st.sampled_from(["sum", "mean", "min", "max", "count"]),
    hops=st.integers(1, 2),
)
@settings(**SETTINGS)
def test_neighbor_agg_matches_replica(spark, edges, feats, agg, hops):
    """neighbor_agg vs a pure-python layered replica on random digraphs
    (round-10): per hop, every featured node's out-neighborhood reduces
    with the chosen aggregate; nodes whose neighborhood lost all
    features drop (inner semantics)."""
    import statistics

    from g4s_spark.operators import neighbor_agg

    e = spark.createDataFrame(edges, "src long, dst long")
    f = spark.createDataFrame(
        [(i, float(v)) for i, v in feats], "id long, x double"
    )
    got = {r.id: r.x for r in neighbor_agg(e, f, agg=agg, hops=hops).collect()}

    cur = {i: float(v) for i, v in feats}
    fns = {"sum": sum, "mean": statistics.mean, "min": min, "max": max,
           "count": len}
    for _ in range(hops):
        nxt = {}
        for s in {s for s, _ in edges}:
            vals = [cur[d] for (s2, d) in edges if s2 == s and d in cur]
            if vals:
                nxt[s] = float(fns[agg](vals))
        cur = nxt
    assert set(got) == set(cur)
    for k, v in cur.items():
        assert got[k] == pytest.approx(v, abs=1e-9), (k, got[k], v)

"""Kernel tests mirroring the reference's property suites (SURVEY §5):
MxMSpec associativity, ReduceSpec oracle reductions, ElemWiseSpec
self-union == self-intersect == 2x, AssignSpec extract/assign roundtrip,
DocSpec BFS neighbours golden."""

import random

import pytest

from g4s_spark import grblas as gb


def rand_coo(seed, n, nvals, vmax=9):
    rng = random.Random(seed)
    coords = rng.sample([(i, j) for i in range(n) for j in range(n)], nvals)
    return [(i, j, rng.randint(1, vmax)) for i, j in coords]


def as_dict(tuples):
    return {(i, j): v for i, j, v in tuples}


def py_mxm(a, b, plus, times, n):
    out = {}
    for (i, k1), va in a.items():
        for (k2, j), vb in b.items():
            if k1 == k2:
                key = (i, j)
                prod = times(va, vb)
                out[key] = plus(out[key], prod) if key in out else prod
    return out


@pytest.mark.parametrize("seed", [1, 7])
def test_mxm_plus_times_matches_oracle_and_associativity(spark, seed):
    n = 8
    ta, tb, tc = rand_coo(seed, n, 12), rand_coo(seed + 100, n, 12), rand_coo(seed + 200, n, 12)
    A = gb.Matrix.from_tuples(spark, ta, n, n)
    B = gb.Matrix.from_tuples(spark, tb, n, n)
    C = gb.Matrix.from_tuples(spark, tc, n, n)
    ab = gb.mxm(A, B, gb.PLUS_TIMES)
    assert as_dict(ab.to_tuples()) == py_mxm(as_dict(ta), as_dict(tb), lambda x, y: x + y, lambda x, y: x * y, n)
    # associativity (AB)C == A(BC)  (MxMSpec.scala:21-62)
    left = gb.mxm(ab, C, gb.PLUS_TIMES)
    right = gb.mxm(A, gb.mxm(B, C, gb.PLUS_TIMES), gb.PLUS_TIMES)
    assert gb.is_eq(left, right)


def test_mxm_any_pair_is_existence(spark):
    ta = [(0, 1, 5), (0, 2, 5), (1, 3, 2)]
    tb = [(1, 4, 7), (2, 4, 1), (3, 4, 1)]
    A = gb.Matrix.from_tuples(spark, ta, 5, 5)
    B = gb.Matrix.from_tuples(spark, tb, 5, 5)
    got = {(i, j) for i, j, _ in gb.mxm(A, B, gb.ANY_PAIR).to_tuples()}
    # two paths 0->4 collapse into one entry: no path counting
    assert got == {(0, 4), (1, 4)}


def test_min_plus_sssp_step(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 1, 3), (0, 2, 7), (1, 2, 2)], 3, 3)
    two_hop = gb.mxm(A, A, gb.MIN_PLUS)
    assert as_dict(two_hop.to_tuples()) == {(0, 2): 5}


@pytest.mark.parametrize("monoid,pyop", [("plus", sum), ("min", min), ("max", max)])
def test_reduce_vs_oracle(spark, monoid, pyop):
    t = rand_coo(3, 6, 10)
    A = gb.Matrix.from_tuples(spark, t, 6, 6)
    rows = dict(gb.reduce_rows(A, monoid).to_tuples())
    expect = {}
    for i, j, v in t:
        expect.setdefault(i, []).append(v)
    assert rows == {i: (pyop(vs) if pyop is not sum else sum(vs)) for i, vs in expect.items()}
    assert gb.reduce_all(A, monoid) == pyop([v for _, _, v in t]) if pyop is not sum else sum(
        v for _, _, v in t
    )


def test_ewise_self_union_intersect_double(spark):
    t = rand_coo(5, 6, 9)
    A = gb.Matrix.from_tuples(spark, t, 6, 6)
    u = gb.ewise_union(A, A, "plus")
    i = gb.ewise_intersect(A, A, "plus")
    doubled = {(x, y): 2 * v for x, y, v in t}
    assert as_dict(u.to_tuples()) == doubled
    assert as_dict(i.to_tuples()) == doubled


def test_ewise_union_disjoint_keeps_values(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1)], 2, 2)
    B = gb.Matrix.from_tuples(spark, [(1, 1, 5)], 2, 2)
    assert as_dict(gb.ewise_union(A, B, "plus").to_tuples()) == {(0, 0): 1, (1, 1): 5}
    assert gb.ewise_intersect(A, B, "plus").nvals() == 0


def test_transpose_and_diag(spark):
    t = [(0, 1, 4), (2, 0, 6)]
    A = gb.Matrix.from_tuples(spark, t, 3, 3)
    assert as_dict(A.transpose().to_tuples()) == {(1, 0): 4, (0, 2): 6}
    v = gb.Vector.from_tuples(spark, [(0, 2), (2, 9)], 3)
    assert as_dict(gb.diag(v).to_tuples()) == {(0, 0): 2, (2, 2): 9}


def test_extract_assign_roundtrip(spark):
    t = rand_coo(11, 8, 20)
    A = gb.Matrix.from_tuples(spark, t, 8, 8)
    sub = gb.extract(A, (2, 5), (1, 6))
    back = gb.assign(A, sub, (2, 5), (1, 6))
    assert gb.is_eq(back, A)  # AssignSpec.scala:26-81 roundtrip
    expect = {(i - 2, j - 1): v for (i, j), v in as_dict(t).items() if 2 <= i <= 5 and 1 <= j <= 6}
    assert as_dict(sub.to_tuples()) == expect


def test_extract_index_list(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1), (2, 1, 3), (4, 2, 5)], 5, 3)
    sub = gb.extract(A, [0, 2, 4], None)
    assert as_dict(sub.to_tuples()) == {(0, 0): 1, (1, 1): 3, (2, 2): 5}


def test_mask_and_accum(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1), (0, 1, 1)], 2, 2)
    B = gb.Matrix.from_tuples(spark, [(0, 0, 1), (1, 1, 1)], 2, 2)
    mask = gb.Matrix.from_tuples(spark, [(0, 0, 1)], 2, 2)
    keep = gb.mxm(A, B, gb.PLUS_TIMES, mask=mask)
    assert as_dict(keep.to_tuples()) == {(0, 0): 1}
    drop = gb.mxm(A, B, gb.PLUS_TIMES, mask=mask, mask_complement=True)
    assert as_dict(drop.to_tuples()) == {(0, 1): 1}
    acc = gb.mxm(A, B, gb.PLUS_TIMES, accum_into=mask, accum_op=lambda a, b: a + b)
    assert as_dict(acc.to_tuples()) == {(0, 0): 2, (0, 1): 1}


def test_bfs_neighbours_docspec_golden(spark):
    """DocSpec.scala:31-53 — out-neighbours(0) of the 7-node digraph."""
    edges = [(0, 2), (0, 3), (1, 4), (1, 6), (2, 5), (3, 0), (3, 2), (4, 5), (5, 2), (6, 2), (6, 3), (6, 4)]
    A = gb.Matrix.from_tuples(spark, [(i, j, True) for i, j in edges], 7, 7, vtype="boolean")
    front = gb.Vector.from_tuples(spark, [(0, True)], 7, vtype="boolean")
    out = gb.vxm(front, A, gb.LOR_LAND)
    assert {i for i, _ in out.to_tuples()} == {2, 3}

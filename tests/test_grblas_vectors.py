"""Vector kernel surface (GrBVector, SparseVectorHandler.scala:7-33 +
per-type instances) and the 27-op binary catalog (GrBBinaryOp.scala:23-58)
against python oracles."""

import pytest

from g4s_spark import grblas as gb
from g4s_spark.grblas import BINARY_OPS


def test_vector_extract_range_and_assign_roundtrip(spark):
    v = gb.Vector.from_tuples(spark, [(0, 1), (3, 4), (5, 6), (9, 10)], 10)
    sub = v.extract((3, 6))
    assert dict(sub.to_tuples()) == {0: 4, 2: 6}
    back = v.assign(sub, (3, 6))
    assert dict(back.to_tuples()) == dict(v.to_tuples())


def test_vector_extract_index_list(spark):
    v = gb.Vector.from_tuples(spark, [(0, 1), (3, 4), (5, 6)], 10)
    sub = v.extract([5, 0])
    assert dict(sub.to_tuples()) == {0: 6, 1: 1}


def test_vector_ewise_and_reduce(spark):
    a = gb.Vector.from_tuples(spark, [(0, 1), (1, 2)], 4)
    b = gb.Vector.from_tuples(spark, [(1, 10), (2, 20)], 4)
    u = gb.vector_ewise_union(a, b, "plus")
    assert dict(u.to_tuples()) == {0: 1, 1: 12, 2: 20}
    i = gb.vector_ewise_intersect(a, b, "times")
    assert dict(i.to_tuples()) == {1: 20}
    assert gb.vector_reduce(a, "plus") == 3
    assert gb.vector_reduce(b, "max") == 20


def test_mxv_matches_manual(spark):
    a = gb.Matrix.from_tuples(spark, [(0, 1, 2), (1, 2, 3)], 3, 3)
    x = gb.Vector.from_tuples(spark, [(1, 5), (2, 7)], 3)
    y = gb.mxv(a, x, gb.PLUS_TIMES)
    assert dict(y.to_tuples()) == {0: 10, 1: 21}


# the (T,T)->T arithmetic/logical portion of the 27-op catalog vs python
CASES = {
    "first": lambda a, b: a, "second": lambda a, b: b,
    "min": min, "max": max,
    "plus": lambda a, b: a + b, "minus": lambda a, b: a - b,
    "rminus": lambda a, b: b - a, "times": lambda a, b: a * b,
    "iseq": lambda a, b: int(a == b), "isne": lambda a, b: int(a != b),
    "isgt": lambda a, b: int(a > b), "islt": lambda a, b: int(a < b),
    "isge": lambda a, b: int(a >= b), "isle": lambda a, b: int(a <= b),
}


@pytest.mark.parametrize("op", sorted(CASES))
def test_binary_op_catalog_vs_oracle(spark, op):
    tuples_a = [(0, 0, 7), (1, 1, 3)]
    tuples_b = [(0, 0, 2), (1, 1, 3)]
    a = gb.Matrix.from_tuples(spark, tuples_a, 2, 2)
    b = gb.Matrix.from_tuples(spark, tuples_b, 2, 2)
    got = {(i, j): v for i, j, v in gb.ewise_intersect(a, b, op).to_tuples()}
    want = {(0, 0): CASES[op](7, 2), (1, 1): CASES[op](3, 3)}
    assert got == want


@pytest.mark.parametrize("op,expect", [("lor", True), ("land", False), ("lxor", True)])
def test_logical_ops(spark, op, expect):
    a = gb.Matrix.from_tuples(spark, [(0, 0, True)], 1, 1, vtype="boolean")
    b = gb.Matrix.from_tuples(spark, [(0, 0, False)], 1, 1, vtype="boolean")
    got = gb.ewise_intersect(a, b, op).to_tuples()
    assert got == [(0, 0, expect)]


def test_comparison_ops_return_boolean(spark):
    a = gb.Matrix.from_tuples(spark, [(0, 0, 7)], 1, 1)
    b = gb.Matrix.from_tuples(spark, [(0, 0, 2)], 1, 1)
    for op, expect in [("eq", False), ("ne", True), ("gt", True), ("lt", False), ("ge", True), ("le", False)]:
        got = gb.ewise_intersect(a, b, op).to_tuples()
        assert got == [(0, 0, expect)], op


def test_pair_and_div_ops(spark):
    a = gb.Matrix.from_tuples(spark, [(0, 0, 8)], 1, 1)
    b = gb.Matrix.from_tuples(spark, [(0, 0, 2)], 1, 1)
    assert gb.ewise_intersect(a, b, "pair").to_tuples() == [(0, 0, 1)]
    assert gb.ewise_intersect(a, b, "div").to_tuples() == [(0, 0, 4.0)]
    assert gb.ewise_intersect(a, b, "rdiv").to_tuples() == [(0, 0, 0.25)]

"""Round-2 kernel-parity tests: strided/backwards extract
(GrBRangeSpec.scala:8-33), index-list assign (AssignSpec.scala:26-81),
point element ops (GrBMatrix.scala:32-45,127-128), isAll with arbitrary
ops (MatrixOps.scala:108-160), mask/accum threading through mxv/vxm and
ewise (MatrixOps.scala:20-106, ElemWise.scala:12-95), exact ``times``
reductions over zero/negative domains (ReduceSpec.scala:31-137), and BFS
as complemented-mask vxm (DocSpec.scala:31-53)."""

import math

import pytest

from g4s_spark import grblas as gb


def as_dict(tuples):
    return {(i, j): v for i, j, v in tuples}


def vec_dict(v):
    return dict(v.to_tuples())


# --- strided / backwards extract (GrBRange) --------------------------------

def test_extract_stride(spark):
    # rows 0..9, diagonal values = row index
    A = gb.Matrix.from_tuples(spark, [(i, i, i) for i in range(10)], 10, 10)
    # rows 1,4,7 -> re-based 0,1,2
    sub = gb.extract(A, (1, 8, 3), None)
    assert sub.nrows == 3
    assert as_dict(sub.to_tuples()) == {(0, 1): 1, (1, 4): 4, (2, 7): 7}


def test_extract_backwards(spark):
    A = gb.Matrix.from_tuples(spark, [(i, 0, i) for i in range(6)], 6, 1)
    # rows 5,3,1 (backwards stride -2) -> re-based 0,1,2
    sub = gb.extract(A, (5, 1, -2), None)
    assert sub.nrows == 3
    assert as_dict(sub.to_tuples()) == {(0, 0): 5, (1, 0): 3, (2, 0): 1}


def test_extract_stride_roundtrip_assign(spark):
    """extract(sel) then assign(sel) restores the original (AssignSpec
    roundtrip property, over a strided selection)."""
    A = gb.Matrix.from_tuples(spark, [(i, j, 10 * i + j) for i in range(6) for j in range(2)], 6, 2)
    sel = (0, 5, 2)  # rows 0, 2, 4
    sub = gb.extract(A, sel, None)
    back = gb.assign(A, sub, sel, None)
    assert gb.is_eq(back, A)


def test_vector_extract_stride_and_backwards(spark):
    v = gb.Vector.from_tuples(spark, [(i, i * i) for i in range(8)], 8)
    assert vec_dict(v.extract((0, 7, 2))) == {0: 0, 1: 4, 2: 16, 3: 36}
    assert vec_dict(v.extract((7, 0, -2))) == {0: 49, 1: 25, 2: 9, 3: 1}


def test_empty_or_zero_stride_rejected(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1)], 2, 2)
    with pytest.raises(ValueError):
        gb.extract(A, (0, 1, 0), None)
    with pytest.raises(ValueError):
        gb.extract(A, (3, 1, 1), None)


# --- index-list assign -----------------------------------------------------

def test_assign_index_lists(spark):
    A = gb.Matrix.from_tuples(spark, [(i, j, 1) for i in range(4) for j in range(4)], 4, 4)
    sub = gb.Matrix.from_tuples(spark, [(0, 0, 7), (1, 1, 8)], 2, 2)
    out = gb.assign(A, sub, [0, 2], [1, 3])
    got = as_dict(out.to_tuples())
    # region {0,2}x{1,3} replaced by sub's (sparse!) content
    assert got[(0, 1)] == 7 and got[(2, 3)] == 8
    assert (0, 3) not in got and (2, 1) not in got  # overwritten to empty
    # outside the region untouched
    assert got[(1, 1)] == 1 and got[(3, 3)] == 1 and got[(0, 0)] == 1


def test_assign_index_list_rows_range_cols_roundtrip(spark):
    A = gb.Matrix.from_tuples(spark, [(i, j, i + j) for i in range(5) for j in range(3)], 5, 3)
    rows = [4, 1, 3]  # arbitrary order: position k maps to rows[k]
    sub = gb.extract(A, rows, (0, 1))
    back = gb.assign(A, sub, rows, (0, 1))
    assert gb.is_eq(back, A)


# --- extract/assign descriptor tail (round-12, MatrixOps.scala:46-106) -----

def test_extract_mask_accum_replace(spark):
    """extract carries the same mask/accum/desc tail as mxm/apply: the
    mask lives in the re-based OUTPUT space; accum_into merges with ⊕;
    replace clears accum_into's off-mask cells."""
    A = gb.Matrix.from_tuples(
        spark, [(i, j, 10 * i + j) for i in range(4) for j in range(2)], 4, 2
    )
    # rows 1..3 re-based to 0..2
    mask = gb.Matrix.from_tuples(spark, [(0, 0, 1), (2, 1, 1)], 3, 2)
    sub = gb.extract(A, (1, 3), None, mask=mask)
    assert as_dict(sub.to_tuples()) == {(0, 0): 10, (2, 1): 31}
    # complemented mask: everything EXCEPT the two masked cells
    subc = gb.extract(A, (1, 3), None, mask=mask, mask_complement=True)
    assert as_dict(subc.to_tuples()) == {
        (0, 1): 11, (1, 0): 20, (1, 1): 21, (2, 0): 30
    }
    # accum_into: C ⊕= Z inside the mask, C kept outside (replace=False)
    C = gb.Matrix.from_tuples(spark, [(0, 0, 100), (1, 1, 200)], 3, 2)
    out = gb.extract(
        A, (1, 3), None, mask=mask,
        accum_into=C, accum_op=gb.BINARY_OPS["plus"],
    )
    assert as_dict(out.to_tuples()) == {(0, 0): 110, (2, 1): 31, (1, 1): 200}
    # replace=True clears C's off-mask cell (1,1)
    outr = gb.extract(
        A, (1, 3), None, mask=mask,
        accum_into=C, accum_op=gb.BINARY_OPS["plus"], replace=True,
    )
    assert as_dict(outr.to_tuples()) == {(0, 0): 110, (2, 1): 31}


def test_assign_mask_accum_replace(spark):
    """assign's descriptor tail: the mask (C-coordinate space) gates
    which region cells get written; off-mask region cells are kept
    (replace=False) or cleared (replace=True); accum_op merges old
    region values with the new ones inside the mask."""
    A = gb.Matrix.from_tuples(
        spark, [(i, j, 1) for i in range(4) for j in range(4)], 4, 4
    )
    sub = gb.Matrix.from_tuples(spark, [(0, 0, 7), (1, 1, 8)], 2, 2)
    # region rows 0..1 x cols 0..1; mask covers only cell (0,0)
    mask = gb.Matrix.from_tuples(spark, [(0, 0, 1)], 4, 4)
    out = gb.assign(A, sub, (0, 1), (0, 1), mask=mask)
    got = as_dict(out.to_tuples())
    assert got[(0, 0)] == 7          # written through the mask
    assert got[(1, 1)] == 1          # off-mask region cell KEPT
    assert got[(0, 1)] == 1 and got[(1, 0)] == 1
    assert got[(2, 2)] == 1          # outside region untouched
    # replace=True: off-mask region cells cleared
    outr = gb.assign(A, sub, (0, 1), (0, 1), mask=mask, replace=True)
    gotr = as_dict(outr.to_tuples())
    assert gotr[(0, 0)] == 7
    assert (1, 1) not in gotr and (0, 1) not in gotr and (1, 0) not in gotr
    assert gotr[(3, 3)] == 1         # outside region still untouched
    # accum: old ⊕ new inside the mask; old region cells not in sub kept
    outa = gb.assign(
        A, sub, (0, 1), (0, 1), mask=mask, accum_op=gb.BINARY_OPS["plus"]
    )
    gota = as_dict(outa.to_tuples())
    assert gota[(0, 0)] == 8         # 1 ⊕ 7
    assert gota[(1, 1)] == 1         # off-mask kept
    # no-mask accum: whole region merges, old cells without new kept
    outna = gb.assign(A, sub, (0, 1), (0, 1), accum_op=gb.BINARY_OPS["plus"])
    gotna = as_dict(outna.to_tuples())
    assert gotna[(0, 0)] == 8 and gotna[(1, 1)] == 9
    assert gotna[(0, 1)] == 1 and gotna[(1, 0)] == 1  # kept under accum


def test_extract_accum_into_without_accum_op_is_masked_write(spark):
    """Round-12 review fix: accum_into with NO accumulator is a masked
    WRITE per GraphBLAS — Z's pattern wins inside the effective mask,
    C's off-mask cells survive per replace. Previously C was silently
    dropped wholesale (the state is unreachable from mxm/ewise, which
    default the accumulator, but extract/apply expose it)."""
    A = gb.Matrix.from_tuples(
        spark, [(i, j, 10 * i + j) for i in range(4) for j in range(2)], 4, 2
    )
    mask = gb.Matrix.from_tuples(spark, [(0, 0, 1), (2, 1, 1)], 3, 2)
    C = gb.Matrix.from_tuples(
        spark, [(0, 0, 100), (1, 1, 200), (2, 1, 300)], 3, 2
    )
    # rows 1..3 re-based to 0..2; no accum_op: in-mask C cells get Z's
    # values ((0,0)->10, (2,1)->31 — the old 100/300 overwritten), the
    # off-mask (1,1)=200 survives
    out = gb.extract(A, (1, 3), None, mask=mask, accum_into=C)
    assert as_dict(out.to_tuples()) == {(0, 0): 10, (2, 1): 31, (1, 1): 200}
    # replace=True clears the off-mask cell
    outr = gb.extract(A, (1, 3), None, mask=mask, accum_into=C, replace=True)
    assert as_dict(outr.to_tuples()) == {(0, 0): 10, (2, 1): 31}
    # no mask at all: C = Z wholesale
    outw = gb.extract(A, (1, 3), None, accum_into=C)
    assert as_dict(outw.to_tuples()) == {
        (i, j): 10 * (i + 1) + j for i in range(3) for j in range(2)
    }


def test_assign_valued_mask(spark):
    """valued mask (Descriptor.scala:50-94): only truthy mask cells
    write; falsy-valued mask cells behave as off-mask."""
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1), (0, 1, 1)], 1, 2)
    sub = gb.Matrix.from_tuples(spark, [(0, 0, 5), (0, 1, 6)], 1, 2)
    mask = gb.Matrix.from_tuples(spark, [(0, 0, 0), (0, 1, 1)], 1, 2)
    out = gb.assign(A, sub, (0, 0), (0, 1), mask=mask, mask_valued=True)
    assert as_dict(out.to_tuples()) == {(0, 0): 1, (0, 1): 6}


# --- point element ops -----------------------------------------------------

def test_matrix_point_set_get_remove(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1), (1, 1, 2)], 3, 3)
    assert A.get_element(0, 0) == 1
    assert A.get_element(2, 2) is None
    B = A.set_element(0, 0, 9).set_element(2, 2, 5)
    assert B.get_element(0, 0) == 9 and B.get_element(2, 2) == 5
    assert B.nvals() == 3
    C = B.remove_element(1, 1)
    assert C.get_element(1, 1) is None and C.nvals() == 2


def test_vector_point_set_get_remove(spark):
    v = gb.Vector.from_tuples(spark, [(0, 1), (2, 3)], 4)
    assert v.get_element(2) == 3 and v.get_element(1) is None
    w = v.set_element(1, 7).remove_element(0)
    assert vec_dict(w) == {1: 7, 2: 3}


# --- isAll with arbitrary ops ---------------------------------------------

def test_is_all_ops(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1), (1, 1, 5)], 2, 2)
    B = gb.Matrix.from_tuples(spark, [(0, 0, 2), (1, 1, 6)], 2, 2)
    assert gb.is_all(A, B, "lt")       # every aligned pair a < b
    assert gb.is_all(B, A, "gt")
    assert not gb.is_all(A, B, "eq")
    assert gb.is_all(A, A, "eq") and gb.is_all(A, A, "ge")
    # pattern mismatch -> False for any op
    C = gb.Matrix.from_tuples(spark, [(0, 0, 1), (0, 1, 5)], 2, 2)
    assert not gb.is_all(A, C, "lt")
    # shape mismatch
    D = gb.Matrix.from_tuples(spark, [(0, 0, 1), (1, 1, 5)], 3, 3)
    assert not gb.is_all(A, D, "eq")


# --- exact times reductions over zero / negative domains -------------------

@pytest.mark.parametrize(
    "values",
    [[2, 3, 4], [2, -3, 4], [-2, -3, -4, -5], [2, 0, 4], [0, 0], [-7]],
)
def test_reduce_all_times_exact(spark, values):
    """ReduceSpec.scala:31-137 product oracle — including zeros (product
    must be 0, not the log-sum artifact) and negatives (sign preserved)."""
    tuples = [(i, 0, v) for i, v in enumerate(values)]
    A = gb.Matrix.from_tuples(spark, tuples, len(values), 1)
    expect = math.prod(values)
    assert gb.reduce_all(A, "times") == expect


def test_reduce_rows_times_with_zero_and_negative(spark):
    A = gb.Matrix.from_tuples(
        spark, [(0, 0, 2), (0, 1, -3), (1, 0, 5), (1, 1, 0)], 2, 2
    )
    got = vec_dict(gb.reduce_rows(A, "times"))
    assert got == {0: -6, 1: 0}


# --- mask/accum through mxv/vxm/ewise --------------------------------------

def test_mxv_masked_and_accum(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1), (1, 0, 2), (2, 0, 3)], 3, 3)
    x = gb.Vector.from_tuples(spark, [(0, 10)], 3)
    # unmasked: y = {0:10, 1:20, 2:30}
    mask = gb.Vector.from_tuples(spark, [(1, True)], 3, "boolean")
    y = gb.mxv(A, x, gb.PLUS_TIMES, mask=mask)
    assert vec_dict(y) == {1: 20}
    y2 = gb.mxv(A, x, gb.PLUS_TIMES, mask=mask, mask_complement=True)
    assert vec_dict(y2) == {0: 10, 2: 30}
    # accumulate into an existing output with plus
    acc = gb.Vector.from_tuples(spark, [(1, 100), (2, 100)], 3)
    y3 = gb.mxv(A, x, gb.PLUS_TIMES, accum_into=acc)
    assert vec_dict(y3) == {0: 10, 1: 120, 2: 130}


def test_vxm_complemented_mask_is_bfs_step(spark):
    """DocSpec.scala:31-53 idiom: next = frontier vxm A with mask=¬visited."""
    # path 0 -> 1 -> 2
    A = gb.Matrix.from_tuples(spark, [(0, 1, True), (1, 2, True)], 3, 3, "boolean")
    frontier = gb.Vector.from_tuples(spark, [(0, True)], 3, "boolean")
    visited = gb.Vector.from_tuples(spark, [(0, 0)], 3)
    nxt = gb.vxm(frontier, A, gb.LOR_LAND, mask=visited, mask_complement=True)
    assert set(vec_dict(nxt)) == {1}


def test_ewise_union_masked_accum(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1), (0, 1, 2)], 2, 2)
    B = gb.Matrix.from_tuples(spark, [(0, 1, 10), (1, 1, 20)], 2, 2)
    mask = gb.Matrix.from_tuples(spark, [(0, 1, True), (1, 1, True)], 2, 2, "boolean")
    out = gb.ewise_union(A, B, "plus", mask=mask)
    assert as_dict(out.to_tuples()) == {(0, 1): 12, (1, 1): 20}
    out2 = gb.ewise_union(A, B, "plus", mask=mask, mask_complement=True)
    assert as_dict(out2.to_tuples()) == {(0, 0): 1}
    acc = gb.Matrix.from_tuples(spark, [(0, 0, 100)], 2, 2)
    out3 = gb.ewise_intersect(A, B, "plus", accum_into=acc)
    assert as_dict(out3.to_tuples()) == {(0, 0): 100, (0, 1): 12}


def test_vector_ewise_masked(spark):
    a = gb.Vector.from_tuples(spark, [(0, 1), (1, 2)], 3)
    b = gb.Vector.from_tuples(spark, [(1, 10), (2, 20)], 3)
    mask = gb.Vector.from_tuples(spark, [(1, True)], 3, "boolean")
    assert vec_dict(gb.vector_ewise_union(a, b, "plus", mask=mask)) == {1: 12}
    assert vec_dict(
        gb.vector_ewise_union(a, b, "plus", mask=mask, mask_complement=True)
    ) == {0: 1, 2: 20}


# --- BFS as kernel calls ---------------------------------------------------

def test_bfs_levels_masked_vxm(spark):
    # 0 -> 1 -> 2 -> 3, plus shortcut 0 -> 2; node 4 unreachable
    A = gb.Matrix.from_tuples(
        spark,
        [(0, 1, True), (1, 2, True), (2, 3, True), (0, 2, True)],
        5, 5, "boolean",
    )
    levels = gb.bfs_levels(A, [0])
    assert vec_dict(levels) == {0: 0, 1: 1, 2: 1, 3: 2}


def test_large_index_list_uses_join_path(spark):
    """Index lists beyond INDEX_MAP_JOIN_THRESHOLD must still select and
    re-base correctly (join path instead of a literal map)."""
    from g4s_spark.grblas import matrix as M

    n = M.INDEX_MAP_JOIN_THRESHOLD + 50
    v = gb.Vector.from_tuples(spark, [(i, i) for i in range(n + 10)], n + 10)
    sel = list(range(n))
    got = vec_dict(v.extract(sel))
    assert len(got) == n and got[0] == 0 and got[n - 1] == n - 1


# --- index-list selections: duplicates + big-list parity --------------------

def test_extract_duplicate_indices_replicate_rows(spark):
    A = gb.Matrix.from_tuples(spark, [(i, i, i) for i in range(5)], 5, 5)
    # row list [1, 1, 3]: row 1 must appear at BOTH target positions 0 and 1
    sub = gb.extract(A, [1, 1, 3], None)
    got = as_dict(sub.to_tuples())
    assert got == {(0, 1): 1, (1, 1): 1, (2, 3): 3}


def test_extract_index_list_same_semantics_across_threshold(spark, monkeypatch):
    from g4s_spark.grblas import matrix as mx

    A = gb.Matrix.from_tuples(spark, [(i, i, i) for i in range(6)], 6, 6)
    sel = [4, 0, 4]
    big = as_dict(gb.extract(A, sel, None).to_tuples())
    monkeypatch.setattr(mx, "INDEX_MAP_JOIN_THRESHOLD", 0)
    small = as_dict(gb.extract(A, sel, None).to_tuples())
    assert big == small == {(0, 4): 4, (1, 0): 0, (2, 4): 4}


def test_stride_rebase_exact_above_float53(spark):
    # indices above 2^53 are not exactly representable as doubles — the
    # re-base must use integer division
    base = 1 << 55
    A = gb.Matrix.from_tuples(
        spark, [(base + k, 0, 1) for k in (1, 4, 7)], base + 10, 1
    )
    sub = gb.extract(A, (base + 1, base + 8, 3), None)
    assert sorted(i for i, _, _ in sub.to_tuples()) == [0, 1, 2]


# --- valued masks + replace descriptor (Descriptor.scala:50-94) -------------

def test_valued_mask_false_cells_mask_out(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1), (1, 1, 2)], 2, 2)
    I = gb.Matrix.from_tuples(spark, [(0, 0, 1), (1, 1, 1)], 2, 2)
    M = gb.Matrix.from_tuples(spark, [(0, 0, True), (1, 1, False)], 2, 2, vtype="boolean")
    # structural mask (default): presence of a cell masks in, value ignored
    structural = gb.mxm(A, I, gb.PLUS_TIMES, mask=M)
    assert as_dict(structural.to_tuples()) == {(0, 0): 1, (1, 1): 2}
    # valued mask: only truthy cells mask in
    valued = gb.mxm(A, I, gb.PLUS_TIMES, mask=M, mask_valued=True)
    assert as_dict(valued.to_tuples()) == {(0, 0): 1}
    # complemented valued mask: false-valued and absent cells mask in
    comp = gb.mxm(A, I, gb.PLUS_TIMES, mask=M, mask_valued=True, mask_complement=True)
    assert as_dict(comp.to_tuples()) == {(1, 1): 2}


def test_replace_descriptor_on_accum(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1), (1, 1, 2)], 2, 2)
    I = gb.Matrix.from_tuples(spark, [(0, 0, 1), (1, 1, 1)], 2, 2)
    C = gb.Matrix.from_tuples(spark, [(0, 1, 10), (1, 1, 20)], 2, 2)
    M = gb.Matrix.from_tuples(spark, [(0, 0, 1)], 2, 2)
    plus = lambda x, y: x + y
    # replace=False (GraphBLAS default): C cells outside the mask survive
    keep = gb.mxm(A, I, gb.PLUS_TIMES, mask=M, accum_into=C, accum_op=plus)
    assert as_dict(keep.to_tuples()) == {(0, 0): 1, (0, 1): 10, (1, 1): 20}
    # replace=True: C is cleared outside the mask before the merge
    clear = gb.mxm(A, I, gb.PLUS_TIMES, mask=M, accum_into=C, accum_op=plus, replace=True)
    assert as_dict(clear.to_tuples()) == {(0, 0): 1}


def test_vector_valued_mask_and_replace(spark):
    A = gb.Matrix.from_tuples(spark, [(0, 0, 1), (1, 1, 1)], 2, 2)
    x = gb.Vector.from_tuples(spark, [(0, 5), (1, 7)], 2)
    m = gb.Vector.from_tuples(spark, [(0, True), (1, False)], 2, vtype="boolean")
    got = vec_dict(gb.mxv(A, x, gb.PLUS_TIMES, mask=m, mask_valued=True))
    assert got == {0: 5}
    c = gb.Vector.from_tuples(spark, [(1, 100)], 2)
    kept = vec_dict(gb.mxv(A, x, gb.PLUS_TIMES, mask=m, mask_valued=True,
                           accum_into=c, accum_op=lambda a, b: a + b))
    assert kept == {0: 5, 1: 100}
    cleared = vec_dict(gb.mxv(A, x, gb.PLUS_TIMES, mask=m, mask_valued=True,
                              accum_into=c, accum_op=lambda a, b: a + b, replace=True))
    assert cleared == {0: 5}


# --- apply / select ----------------------------------------------------------

def test_apply_unary_catalog(spark):
    a = gb.Matrix.from_tuples(spark, [(0, 0, 4.0), (0, 1, -9.0), (1, 1, 1.0)], 2, 2, vtype="double")
    got = dict(((i, j), v) for i, j, v in gb.apply(a, "abs").to_tuples())
    assert got == {(0, 0): 4.0, (0, 1): 9.0, (1, 1): 1.0}
    got = dict(((i, j), v) for i, j, v in gb.apply(a, "ainv").to_tuples())
    assert got == {(0, 0): -4.0, (0, 1): 9.0, (1, 1): -1.0}
    got = dict(((i, j), v) for i, j, v in gb.apply(a, "one").to_tuples())
    assert set(got.values()) == {1.0}
    import math
    got = dict(((i, j), v) for i, j, v in gb.apply(a, "sqrt").to_tuples())
    assert got[(0, 0)] == 2.0 and math.isnan(got[(0, 1)])
    with pytest.raises(ValueError, match="unknown unary"):
        gb.apply(a, "nope")


def test_apply_with_mask_and_accum(spark):
    a = gb.Matrix.from_tuples(spark, [(0, 0, 4.0), (0, 1, 9.0)], 2, 2, vtype="double")
    mask = gb.Matrix.from_tuples(spark, [(0, 0, True)], 2, 2, vtype="boolean")
    got = dict(((i, j), v) for i, j, v in gb.apply(a, "ainv", mask=mask).to_tuples())
    assert got == {(0, 0): -4.0}
    c = gb.Matrix.from_tuples(spark, [(0, 0, 100.0), (1, 1, 7.0)], 2, 2, vtype="double")
    from g4s_spark.grblas.semiring import BINARY_OPS
    got = dict(
        ((i, j), v)
        for i, j, v in gb.apply(
            a, "ainv", mask=mask, accum_into=c, accum_op=BINARY_OPS["plus"]
        ).to_tuples()
    )
    # inside mask: 100 + (-4); outside mask: C kept (replace=False default)
    assert got == {(0, 0): 96.0, (1, 1): 7.0}


def test_select_predicates(spark):
    a = gb.Matrix.from_tuples(
        spark, [(0, 0, 5.0), (0, 1, -2.0), (1, 0, 3.0), (1, 1, 0.0)], 2, 2,
        vtype="double",
    )
    t = lambda m: {(i, j) for i, j, _ in m.to_tuples()}
    assert t(gb.select(a, "tril")) == {(0, 0), (1, 0), (1, 1)}
    assert t(gb.select(a, "triu")) == {(0, 0), (0, 1), (1, 1)}
    assert t(gb.select(a, "diag")) == {(0, 0), (1, 1)}
    assert t(gb.select(a, "offdiag")) == {(0, 1), (1, 0)}
    assert t(gb.select(a, "nonzero")) == {(0, 0), (0, 1), (1, 0)}
    assert t(gb.select(a, "gt", 0.0)) == {(0, 0), (1, 0)}
    assert t(gb.select(a, "le", 0.0)) == {(0, 1), (1, 1)}
    with pytest.raises(ValueError, match="threshold"):
        gb.select(a, "gt")
    with pytest.raises(ValueError, match="unknown select"):
        gb.select(a, "wat", 1)


def test_kron_matches_numpy_model(spark):
    """Kronecker product vs the dense model: C[i1*rb+i2, j1*cb+j2] =
    A[i1,j1] * B[i2,j2] over every stored-entry pair."""
    from g4s_spark.grblas import Matrix, kron

    A = [(0, 0, 2), (0, 1, 3), (1, 1, 5)]
    B = [(0, 0, 7), (1, 0, 11)]
    a = Matrix.from_tuples(spark, A, 2, 2)
    b = Matrix.from_tuples(spark, B, 2, 1)
    c = kron(a, b)
    assert (c.nrows, c.ncols) == (4, 2)
    got = {(r.i, r.j): r.v for r in c.df.collect()}
    want = {
        (i1 * 2 + i2, j1 * 1 + j2): va * vb
        for (i1, j1, va) in A for (i2, j2, vb) in B
    }
    assert got == want


def test_kron_plus_op_and_shape_guard(spark):
    from g4s_spark.grblas import Matrix, kron
    import pytest as _pytest

    a = Matrix.from_tuples(spark, [(0, 0, 1)], 1, 1)
    b = Matrix.from_tuples(spark, [(0, 0, 4)], 1, 1)
    assert kron(a, b, "plus").to_tuples() == [(0, 0, 5)]
    noshape = Matrix.from_df(b.df, "i", "j", "v")  # nrows/ncols = -1
    with _pytest.raises(ValueError, match="logical shape"):
        kron(a, noshape)


def test_kron_unknown_a_shape_propagates_sentinel(spark):
    """A with unknown shape (-1): the product shape stays the -1 unknown
    sentinel, never a garbage negative (ADVICE r6)."""
    from g4s_spark.grblas import Matrix, kron

    b = Matrix.from_tuples(spark, [(0, 0, 4)], 2, 3)
    noshape_a = Matrix.from_df(b.df, "i", "j", "v")
    c = kron(noshape_a, b)
    assert (c.nrows, c.ncols) == (-1, -1)

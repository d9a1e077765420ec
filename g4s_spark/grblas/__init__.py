from .bfs import bfs_levels
from .matrix import (
    Matrix,
    UNARY_OPS,
    apply,
    select,
    Vector,
    assign,
    diag,
    ewise_intersect,
    ewise_union,
    extract,
    is_all,
    is_eq,
    mxm,
    mxv,
    reduce_all,
    reduce_cols,
    reduce_rows,
    vector_ewise_intersect,
    vector_ewise_union,
    vector_reduce,
    vxm,
)
from .semiring import (
    ANY_PAIR,
    BINARY_OPS,
    LOR_LAND,
    MIN_PLUS,
    MONOIDS,
    PLUS_TIMES,
    SEMIRINGS,
    Monoid,
    Semiring,
)

__all__ = [
    "Matrix", "Vector", "mxm", "mxv", "vxm", "ewise_union", "ewise_intersect",
    "reduce_rows", "reduce_cols", "reduce_all", "diag", "extract", "assign",
    "is_eq", "is_all", "bfs_levels", "apply", "select", "UNARY_OPS",
    "vector_ewise_union", "vector_ewise_intersect", "vector_reduce",
    "ANY_PAIR", "LOR_LAND", "MIN_PLUS", "PLUS_TIMES", "SEMIRINGS",
    "BINARY_OPS", "MONOIDS", "Monoid", "Semiring",
]

"""Sparse matrix / vector as DataFrames — the GraphBLAS kernel surface.

Reference kernels (SURVEY §2.3):
- mxm:                 .../grbv2/MatrixOps.scala:162-210
- ewise union/intersect: .../grbv2/ElemWise.scala:12-95
- transpose:           .../grbv2/MatrixOps.scala:20-44
- extract/assign:      .../grbv2/MatrixOps.scala:46-106
- reduce rows/cols/all: .../grbv2/GrBMatrix.scala:50-82
- diag:                .../grbv2/Diag.scala:7-27
- isEq:                .../grbv2/MatrixOps.scala:108-160

A matrix is a DataFrame ``(i: long, j: long, v: T)`` with logical shape
``(nrows, ncols)``; a vector is ``(i: long, v: T)``. Implicit zeros are
absent rows — exactly GraphBLAS sparsity. All kernels are declarative
DataFrame programs: Catalyst plans them, Tungsten executes them, and at
cluster scale the joins shuffle on (i/j) keys — a 100 TB matrix is just a
big DataFrame.

Masks and accumulators are expressed as join modifiers:
- mask          -> left-semi join with the mask's (i,j) pattern
- complemented  -> left-anti join
- accum(op)     -> full-outer merge of old output with the new values
which mirrors the descriptor/mask/accum parameters threaded through every
reference kernel (MatrixOps.scala / ElemWise.scala).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .semiring import BINARY_OPS, MONOIDS, BinOp, Monoid, Semiring


@dataclass
class Matrix:
    df: DataFrame  # columns: i (long), j (long), v
    nrows: int
    ncols: int

    @staticmethod
    def from_tuples(
        spark: SparkSession,
        tuples: list[tuple[int, int, object]],
        nrows: int,
        ncols: int,
        vtype: str = "long",
    ) -> "Matrix":
        """COO bulk load (SparseMatrixHandler.scala:10-30). Duplicate
        coordinates are not allowed (matches reference fromTuples)."""
        df = spark.createDataFrame(tuples, schema=f"i long, j long, v {vtype}")
        return Matrix(df, nrows, ncols)

    @staticmethod
    def from_df(df: DataFrame, i: str, j: str, v: str | None, nrows: int = -1, ncols: int = -1) -> "Matrix":
        cols = [F.col(i).cast("long").alias("i"), F.col(j).cast("long").alias("j")]
        cols.append(F.col(v).alias("v") if v is not None else F.lit(True).alias("v"))
        return Matrix(df.select(*cols), nrows, ncols)

    def to_tuples(self) -> list[tuple[int, int, object]]:
        """Matrix -> COO extract (GrBMatrix.scala:47-48). Driver-side."""
        return [(r.i, r.j, r.v) for r in self.df.collect()]

    def nvals(self) -> int:
        return self.df.count()

    def transpose(self) -> "Matrix":
        """Aᵀ — a column swap; no data movement (MatrixOps.scala:20-44)."""
        return Matrix(
            self.df.select(F.col("j").alias("i"), F.col("i").alias("j"), "v"),
            self.ncols,
            self.nrows,
        )

    def duplicate(self) -> "Matrix":
        return Matrix(self.df, self.nrows, self.ncols)  # DataFrames are immutable

    def cache(self) -> "Matrix":
        self.df = self.df.cache()
        return self


@dataclass
class Vector:
    df: DataFrame  # columns: i (long), v
    size: int

    @staticmethod
    def from_tuples(
        spark: SparkSession, tuples: list[tuple[int, object]], size: int, vtype: str = "long"
    ) -> "Vector":
        df = spark.createDataFrame(tuples, schema=f"i long, v {vtype}")
        return Vector(df, size)

    def to_tuples(self) -> list[tuple[int, object]]:
        return [(r.i, r.v) for r in self.df.collect()]

    def nvals(self) -> int:
        return self.df.count()

    def extract(self, sel: tuple[int, int] | list[int]) -> "Vector":
        """Subvector w = v(I) with re-based indices
        (SparseVectorHandler.scala:7-33 extract surface)."""
        if isinstance(sel, tuple):
            lo, hi = sel
            return Vector(
                self.df.filter(F.col("i").between(lo, hi)).withColumn("i", F.col("i") - F.lit(lo)),
                hi - lo + 1,
            )
        mapping = {int(old): pos for pos, old in enumerate(sel)}
        mexpr = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
        return Vector(
            self.df.filter(F.col("i").isin(list(mapping))).withColumn("i", mexpr[F.col("i")]),
            len(sel),
        )

    def assign(self, sub: "Vector", sel: tuple[int, int]) -> "Vector":
        """v(I) = sub: anti out the range, union the re-based values."""
        lo, hi = sel
        outside = self.df.filter(~F.col("i").between(lo, hi))
        shifted = sub.df.select((F.col("i") + F.lit(lo)).alias("i"), "v")
        return Vector(outside.unionByName(shifted), self.size)


def vector_ewise_union(a: Vector, b: Vector, op_name: str) -> Vector:
    op = BINARY_OPS[op_name]
    ad = a.df.withColumnRenamed("v", "va")
    bd = b.df.withColumnRenamed("v", "vb")
    joined = ad.join(bd, on="i", how="full_outer")
    return Vector(
        joined.select(
            "i",
            F.when(F.col("va").isNull(), F.col("vb"))
            .when(F.col("vb").isNull(), F.col("va"))
            .otherwise(op(F.col("va"), F.col("vb")))
            .alias("v"),
        ),
        a.size,
    )


def vector_ewise_intersect(a: Vector, b: Vector, op_name: str) -> Vector:
    op = BINARY_OPS[op_name]
    ad = a.df.withColumnRenamed("v", "va")
    bd = b.df.withColumnRenamed("v", "vb")
    return Vector(
        ad.join(bd, on="i").select("i", op(F.col("va"), F.col("vb")).alias("v")), a.size
    )


def vector_reduce(a: Vector, monoid_name: str = "plus"):
    m = MONOIDS[monoid_name]
    return a.df.agg(m.agg(F.col("v")).alias("v")).collect()[0].v


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def _apply_mask(df: DataFrame, mask: Matrix | None, complement: bool) -> DataFrame:
    if mask is None:
        return df
    how = "left_anti" if complement else "left_semi"
    return df.join(mask.df.select("i", "j"), on=["i", "j"], how=how)


def _accum(old: DataFrame, new: DataFrame, accum: BinOp | None) -> DataFrame:
    """C ⊕= new — outer-join merge with the existing output."""
    if accum is None:
        return new
    o = old.withColumnRenamed("v", "v_old")
    n = new.withColumnRenamed("v", "v_new")
    merged = o.join(n, on=["i", "j"], how="full_outer")
    return merged.select(
        "i",
        "j",
        F.when(F.col("v_old").isNull(), F.col("v_new"))
        .when(F.col("v_new").isNull(), F.col("v_old"))
        .otherwise(accum(F.col("v_old"), F.col("v_new")))
        .alias("v"),
    )


def mxm(
    a: Matrix,
    b: Matrix,
    semiring: Semiring,
    mask: Matrix | None = None,
    mask_complement: bool = False,
    accum_into: Matrix | None = None,
    accum_op: BinOp | None = None,
) -> Matrix:
    """C = A ⊕.⊗ B (MatrixOps.scala:162-210).

    Join A.j == B.i, ⊗ the values, ⊕-aggregate per (A.i, B.j). For
    existence semirings (ANY_PAIR / LOR_LAND) this collapses to a distinct
    equi-join with no value arithmetic — the reference's short-circuit
    semiring (Operator.scala:401-424) and the key trick that bounds
    intermediate size at scale: never count paths when you only need
    reachability.
    """
    ad = a.df.select(F.col("i").alias("ai"), F.col("j").alias("k"), F.col("v").alias("av"))
    bd = b.df.select(F.col("i").alias("k"), F.col("j").alias("bj"), F.col("v").alias("bv"))
    joined = ad.join(bd, on="k")
    if semiring.existence:
        out = (
            joined.select(F.col("ai").alias("i"), F.col("bj").alias("j"))
            .dropDuplicates(["i", "j"])
            .withColumn("v", F.lit(True))
        )
    else:
        prod = semiring.times(F.col("av"), F.col("bv")).alias("v")
        out = (
            joined.select(F.col("ai").alias("i"), F.col("bj").alias("j"), prod)
            .groupBy("i", "j")
            .agg(semiring.plus.agg(F.col("v")).alias("v"))
        )
    out = _apply_mask(out, mask, mask_complement)
    if accum_into is not None:
        out = _accum(accum_into.df, out, accum_op or semiring.plus.binop)
    return Matrix(out, a.nrows, b.ncols)


def mxv(a: Matrix, x: Vector, semiring: Semiring) -> Vector:
    """y = A ⊕.⊗ x — matrix-vector product (vector as n×1 matrix)."""
    ad = a.df.select(F.col("i").alias("ai"), F.col("j").alias("k"), F.col("v").alias("av"))
    xd = x.df.select(F.col("i").alias("k"), F.col("v").alias("xv"))
    joined = ad.join(xd, on="k")
    if semiring.existence:
        out = (
            joined.select(F.col("ai").alias("i")).dropDuplicates(["i"]).withColumn("v", F.lit(True))
        )
    else:
        prod = semiring.times(F.col("av"), F.col("xv")).alias("v")
        out = (
            joined.select(F.col("ai").alias("i"), prod)
            .groupBy("i")
            .agg(semiring.plus.agg(F.col("v")).alias("v"))
        )
    return Vector(out, a.nrows)


def vxm(x: Vector, a: Matrix, semiring: Semiring) -> Vector:
    """y = xᵀ ⊕.⊗ A — frontier pushed across the adjacency (BFS step)."""
    return mxv(a.transpose(), x, semiring)


def ewise_union(a: Matrix, b: Matrix, op_name: str) -> Matrix:
    """Element-wise ⊕ over the union of patterns (ElemWise.scala:12-53).

    Positions present in only one operand keep that operand's value
    (GraphBLAS union semantics)."""
    op = BINARY_OPS[op_name]
    ad = a.df.withColumnRenamed("v", "va")
    bd = b.df.withColumnRenamed("v", "vb")
    joined = ad.join(bd, on=["i", "j"], how="full_outer")
    return Matrix(
        joined.select(
            "i",
            "j",
            F.when(F.col("va").isNull(), F.col("vb"))
            .when(F.col("vb").isNull(), F.col("va"))
            .otherwise(op(F.col("va"), F.col("vb")))
            .alias("v"),
        ),
        a.nrows,
        a.ncols,
    )


def ewise_intersect(a: Matrix, b: Matrix, op_name: str) -> Matrix:
    """Element-wise ⊗ over the intersection (ElemWise.scala:55-95)."""
    op = BINARY_OPS[op_name]
    ad = a.df.withColumnRenamed("v", "va")
    bd = b.df.withColumnRenamed("v", "vb")
    joined = ad.join(bd, on=["i", "j"])
    return Matrix(
        joined.select("i", "j", op(F.col("va"), F.col("vb")).alias("v")), a.nrows, a.ncols
    )


def reduce_rows(a: Matrix, monoid_name: str = "plus") -> Vector:
    """Row-wise reduction matrix -> vector (GrBMatrix.scala:50-54)."""
    m = MONOIDS[monoid_name]
    return Vector(a.df.groupBy("i").agg(m.agg(F.col("v")).alias("v")), a.nrows)


def reduce_cols(a: Matrix, monoid_name: str = "plus") -> Vector:
    """Column-wise reduction (GrBMatrix.scala:56-65)."""
    m = MONOIDS[monoid_name]
    return Vector(
        a.df.groupBy("j").agg(m.agg(F.col("v")).alias("v")).withColumnRenamed("j", "i"),
        a.ncols,
    )


def reduce_all(a: Matrix, monoid_name: str = "plus"):
    """Whole-matrix scalar reduction (GrBMatrix.scala:67-82)."""
    m = MONOIDS[monoid_name]
    row = a.df.agg(m.agg(F.col("v")).alias("v")).collect()[0]
    return row.v


def diag(x: Vector) -> Matrix:
    """Vector onto the main diagonal (Diag.scala:7-27)."""
    return Matrix(x.df.select(F.col("i"), F.col("i").alias("j"), "v"), x.size, x.size)


def extract(a: Matrix, rows: tuple[int, int] | list[int] | None, cols: tuple[int, int] | list[int] | None) -> Matrix:
    """Submatrix to = from(I, J) (MatrixOps.scala:46-76, GrBRange.scala).

    ``rows``/``cols``: None = All, (lo, hi) = inclusive range, list = index
    set. Indices are re-based to 0 like GraphBLAS extract."""
    df = a.df
    nrows, ncols = a.nrows, a.ncols

    def apply(df, sel, col):
        if sel is None:
            return df, (a.nrows if col == "i" else a.ncols)
        if isinstance(sel, tuple):
            lo, hi = sel
            df = df.filter(F.col(col).between(lo, hi)).withColumn(col, F.col(col) - F.lit(lo))
            return df, hi - lo + 1
        mapping = {int(old): pos for pos, old in enumerate(sel)}
        mexpr = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
        df = df.filter(F.col(col).isin(list(mapping))).withColumn(col, mexpr[F.col(col)])
        return df, len(sel)

    df, nrows = apply(df, rows, "i")
    df, ncols = apply(df, cols, "j")
    return Matrix(df, nrows, ncols)


def assign(a: Matrix, sub: Matrix, rows: tuple[int, int] | None, cols: tuple[int, int] | None) -> Matrix:
    """to(I, J) = from (MatrixOps.scala:78-106): anti-join out the target
    region, union in the re-based new values."""
    rlo, rhi = rows if rows is not None else (0, a.nrows - 1)
    clo, chi = cols if cols is not None else (0, a.ncols - 1)
    outside = a.df.filter(
        ~(F.col("i").between(rlo, rhi) & F.col("j").between(clo, chi))
    )
    shifted = sub.df.select(
        (F.col("i") + F.lit(rlo)).alias("i"), (F.col("j") + F.lit(clo)).alias("j"), "v"
    )
    return Matrix(outside.unionByName(shifted), a.nrows, a.ncols)


def is_eq(a: Matrix, b: Matrix) -> bool:
    """Matrix equality: shape, nvals, element-wise eq AND-reduce
    (MatrixOps.scala:108-160). This is the fixpoint test for iterative
    algorithms — implemented as two anti-join counts so it short-circuits
    in one job each way."""
    if (a.nrows, a.ncols) != (b.nrows, b.ncols):
        return False
    diff1 = a.df.join(b.df, on=["i", "j", "v"], how="left_anti").limit(1).count()
    if diff1:
        return False
    diff2 = b.df.join(a.df, on=["i", "j", "v"], how="left_anti").limit(1).count()
    return diff2 == 0

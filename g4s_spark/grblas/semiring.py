"""GraphBLAS op catalog re-expressed as Spark SQL expressions.

Reference surface:
- 27-op binary catalog: /root/reference/g4s-sparse/src/main/scala/com/github/
  fabianmurariu/g4s/sparse/grb/GrBBinaryOp.scala:23-58
- monoids (op + identity): .../grb/GrBMonoid.scala:8-70
- semirings (⊕ monoid, ⊗ binop), built-ins ANY_PAIR / LOR_LAND / MIN_PLUS /
  PLUS_TIMES: .../grb/GrBSemiring.scala:18-46 and uses at
  .../optim/impls/Operator.scala:401-424

A BinaryOp is a function (Column, Column) -> Column; a Monoid pairs an
aggregate expression factory with its identity; a Semiring pairs a Monoid ⊕
with a BinaryOp ⊗. Everything stays JVM-side (whole-stage codegen) — no
Python UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

BinOp = Callable[[Column, Column], Column]

# --- binary op catalog (GrBBinaryOp.scala:23-58) -------------------------
# (T,T) -> T arithmetic/logical ops
BINARY_OPS: dict[str, BinOp] = {
    "first": lambda a, b: a,
    "second": lambda a, b: b,
    "any": lambda a, b: a,  # ANY: either operand; pick deterministically
    "pair": lambda a, b: F.lit(1).cast("long"),
    "min": lambda a, b: F.least(a, b),
    "max": lambda a, b: F.greatest(a, b),
    "plus": lambda a, b: a + b,
    "minus": lambda a, b: a - b,
    "rminus": lambda a, b: b - a,
    "times": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "rdiv": lambda a, b: b / a,
    # is* ops return T (0/1 in the same domain)
    "iseq": lambda a, b: (a == b).cast("long"),
    "isne": lambda a, b: (a != b).cast("long"),
    "isgt": lambda a, b: (a > b).cast("long"),
    "islt": lambda a, b: (a < b).cast("long"),
    "isge": lambda a, b: (a >= b).cast("long"),
    "isle": lambda a, b: (a <= b).cast("long"),
    "lor": lambda a, b: (a.cast("boolean") | b.cast("boolean")),
    "land": lambda a, b: (a.cast("boolean") & b.cast("boolean")),
    "lxor": lambda a, b: (a.cast("boolean") != b.cast("boolean")),
    # (T,T) -> Boolean comparisons
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
    "gt": lambda a, b: a > b,
    "lt": lambda a, b: a < b,
    "ge": lambda a, b: a >= b,
    "le": lambda a, b: a <= b,
}


@dataclass(frozen=True)
class Monoid:
    """⊕: commutative/associative aggregate with identity (GrBMonoid.scala:8-70)."""

    name: str
    agg: Callable[[Column], Column]  # aggregate expression over grouped values
    binop: BinOp                     # same op as a scalar expression
    identity: object

    def __repr__(self) -> str:  # pragma: no cover
        return f"Monoid({self.name})"


MONOIDS: dict[str, Monoid] = {
    "plus": Monoid("plus", F.sum, BINARY_OPS["plus"], 0),
    # exact product aggregate (JVM-side): correct for zeros and negative
    # values, unlike the exp(sum(log)) trick (GrBMonoid.scala TIMES over
    # any signed domain). F.product returns double — exact for integer
    # magnitudes up to 2^53.
    "times": Monoid("times", F.product, BINARY_OPS["times"], 1),
    "min": Monoid("min", F.min, BINARY_OPS["min"], float("inf")),
    "max": Monoid("max", F.max, BINARY_OPS["max"], float("-inf")),
    "lor": Monoid("lor", lambda c: F.max(c.cast("boolean")), BINARY_OPS["lor"], False),
    "land": Monoid("land", lambda c: F.min(c.cast("boolean")), BINARY_OPS["land"], True),
    # ANY = "pick either operand": F.first is nondeterministic under
    # parallel aggregation, which is exactly the GraphBLAS ANY contract
    # (used only where any present value is acceptable, e.g. existence).
    "any": Monoid("any", F.first, BINARY_OPS["any"], None),
}


@dataclass(frozen=True)
class Semiring:
    """(⊕ monoid, ⊗ binop) — parameterizes mxm (GrBSemiring.scala:18-46)."""

    name: str
    plus: Monoid
    times: BinOp
    # existence-only semirings skip value arithmetic entirely: mxm becomes a
    # distinct equi-join — the Spark analogue of the reference's ANY_PAIR
    # short-circuit (Operator.scala:113-114,401-422).
    existence: bool = False

    def __repr__(self) -> str:  # pragma: no cover
        return f"Semiring({self.name})"


ANY_PAIR = Semiring("any_pair", MONOIDS["any"], BINARY_OPS["pair"], existence=True)
LOR_LAND = Semiring("lor_land", MONOIDS["lor"], BINARY_OPS["land"], existence=True)
MIN_PLUS = Semiring("min_plus", MONOIDS["min"], BINARY_OPS["plus"])
PLUS_TIMES = Semiring("plus_times", MONOIDS["plus"], BINARY_OPS["times"])
MAX_TIMES = Semiring("max_times", MONOIDS["max"], BINARY_OPS["times"])
MIN_FIRST = Semiring("min_first", MONOIDS["min"], BINARY_OPS["first"])

SEMIRINGS: dict[str, Semiring] = {
    s.name: s
    for s in [ANY_PAIR, LOR_LAND, MIN_PLUS, PLUS_TIMES, MAX_TIMES, MIN_FIRST]
}

"""Synthetic graph generators for scale experiments.

Real graphs are power-law: a few hub vertices own a large share of the
edges, so any shuffle keyed on vertex id (the expand join, mxm's
contraction key) lands one oversized partition on one straggler task.
This module synthesizes that shape deterministically and fully
distributed — `spark.range` plus column arithmetic, no driver-side
loops — so tests and benchmarks can demonstrate the two mitigations
documented in SCALE.md: AQE skew-join splitting and manual salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _uniform01(col, seed: int):
    """Deterministic pseudo-uniform in [0,1) from a seeded 64-bit hash.

    xxhash64 is a JVM-side codegen'd expression; masking to 2^52 keeps the
    double conversion exact.
    """
    h = F.xxhash64(col, F.lit(seed))
    return (F.pmod(h, F.lit(1 << 52)).cast("double")) / float(1 << 52)


def power_law_graph(
    spark: SparkSession,
    n_nodes: int = 10_000,
    n_edges: int = 200_000,
    alpha: float = 3.0,
    seed: int = 41,
) -> DataFrame:
    """(src, dst) edge list whose *destination* degrees follow a power law.

    dst is drawn by inverse-CDF sampling: ``dst = floor(n * u^alpha)`` for
    uniform u — node 0 is the hub, receiving a ``n^(-1/alpha)`` fraction
    of ALL edges (alpha=3, n=2000 → ~8%, hundreds of times the mean),
    with a long sparse tail. src is uniform. Deterministic in
    (n_nodes, n_edges, alpha, seed).
    """
    e = spark.range(n_edges).withColumnRenamed("id", "eid")
    u = _uniform01(F.col("eid"), seed)
    dst = F.floor(F.pow(u, F.lit(alpha)) * F.lit(float(n_nodes))).cast("long")
    src = F.pmod(F.xxhash64(F.col("eid"), F.lit(seed + 1)), F.lit(n_nodes)).cast("long")
    return e.select(src.alias("src"), dst.alias("dst"))


def salt_join_skewed(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Manual salting for a join whose `skewed` side has hub keys.

    The skewed side gets a per-row salt (deterministic hash of all its
    columns), the other side is replicated across all `n_salts` salt
    values; the join key becomes (key, salt), so one hub key spreads over
    `n_salts` shuffle partitions instead of one straggler. Cost: the
    other side's shuffle volume × n_salts — use only when AQE skew-split
    is unavailable (e.g. a non-shuffle consumer pins the partitioning).

    Columns of both inputs are preserved; duplicate key values join
    exactly as the unsalted `skewed.join(other, on=key)` would.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("_g4s_salt", salt)
    right = other.withColumn(
        "_g4s_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (left[skewed_key] == right[other_key]) & (
        left["_g4s_salt"] == right["_g4s_salt"]
    )
    return left.join(right, cond).drop("_g4s_salt")

"""BFS over the kernel surface — the reference's own idiom.

Reference (DocSpec.scala:31-53): one BFS step is the frontier vector
pushed across the adjacency with ``vxm`` over LOR_LAND, with the visited
set excluded by a COMPLEMENTED MASK — not a post-hoc anti-join bolted on
outside the kernel. Here the mask parameter threads through ``vxm``
(matrix.py), so the exclusion is part of the kernel call, and physically
it plans as a left-anti join on the vector index (shuffle-free when the
frontier is broadcastable).

The DataFrame-native BFS in ``operators/algorithms.py`` remains the
production path (size-aware broadcast, checkpointing); this one exists to
prove kernel-parity: BFS is expressible purely in GraphBLAS calls.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..checkpointing import iter_checkpoint

from .matrix import Matrix, Vector, vxm
from .semiring import LOR_LAND

MAX_BFS_ITERS = 1024


def bfs_levels(adj: Matrix, start_ids: list[int]) -> Vector:
    """Levels vector (i -> hop distance, start = 0) via iterated
    complemented-mask ``vxm``:

        frontier' = frontier ⊕.⊗ A   ⟨mask = ¬levels⟩

    over LOR_LAND — each round discovers exactly the unvisited vertices
    adjacent to the frontier."""
    spark = adj.df.sparkSession
    levels = Vector.from_tuples(spark, [(int(s), 0) for s in start_ids], adj.nrows, "long")
    frontier = Vector.from_tuples(
        spark, [(int(s), True) for s in start_ids], adj.nrows, "boolean"
    )
    for level in range(1, MAX_BFS_ITERS + 1):
        nxt = vxm(frontier, adj, LOR_LAND, mask=levels, mask_complement=True)
        nxt.df = iter_checkpoint(nxt.df)
        if nxt.df.limit(1).count() == 0:
            return levels
        levels = Vector(
            iter_checkpoint(levels.df.unionByName(
                nxt.df.select("i", F.lit(level).cast("long").alias("v"))
            )),
            levels.size,
        )
        frontier = nxt
    raise RuntimeError(f"bfs_levels did not converge within {MAX_BFS_ITERS} iterations")

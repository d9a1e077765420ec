"""Lineage truncation for iterative loops (closure, BFS, SSSP, PageRank,
connected components, LSH pair materialization).

``localCheckpoint`` stores blocks on executors — fastest, and correct in
local mode, but a lost executor loses its blocks and the job cannot
recompute them (lineage is gone). On a real cluster, set
``G4S_CHECKPOINT_DIR`` to a reliable path (HDFS/S3) and every iterative
loop in the package switches to reliable ``checkpoint()`` backed by that
directory; executor loss then just re-reads the checkpoint files
(SCALE.md 'Known scale limits').
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

ENV_VAR = "G4S_CHECKPOINT_DIR"


def iter_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage between loop iterations.

    local (default) or reliable (``G4S_CHECKPOINT_DIR`` set) — one knob
    covering every iterative operator, per VERDICT r4 #5."""
    ckdir = os.environ.get(ENV_VAR)
    if ckdir:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() != ckdir:
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)

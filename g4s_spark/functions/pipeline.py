"""End-to-end corpus curation — the composed operation a training-data
pipeline runs over a raw document table: quality scoring x language
filter x duplicate-cluster representative selection, producing the kept
training set. Each stage is one of this package's oracle-checked
operators. The scoring/filter stages compose lazily (pure DataFrame
joins, predicates stay pushable); the dedup stage materializes eagerly —
dedup_clusters runs the LSH pair join and the iterative component loop
as jobs at build time, since iterative connected components cannot be
expressed as one Catalyst plan.

Scale shape: quality/lang are per-row expressions (no shuffle beyond the
joins); dedup representatives come from the bucketed LSH + pair-graph
components path (dedup.dedup_clusters) — the only stages that shuffle
are keyed on doc_id / LSH buckets, never on pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_clusters
from .text import lang_id, quality_score


def curate_corpus(
    df: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Kept documents: (doc_id, pred_lang, quality) for documents that
    (1) score at least min_quality, (2) classify into one of ``langs``,
    and (3) are their duplicate-cluster's representative (minimum doc id
    — deterministic keep-first)."""
    q = quality_score(df, text_col, id_col).select(id_col, "quality")
    l = lang_id(df, text_col, id_col)
    reps = (
        dedup_clusters(df, text_col, id_col)
        .filter(F.col("cluster") == F.col(id_col))
        .select(id_col)
    )
    return (
        df.select(id_col)
        .join(q.filter(F.col("quality") >= min_quality), on=id_col)
        .join(l.filter(F.col("pred_lang").isin(list(langs))), on=id_col)
        .join(reps, on=id_col)
        .select(id_col, "pred_lang", "quality")
    )

"""Streaming deduplication: keep-first-arrival by content digest with
watermark-bounded state.

The batch twin is functions.dedup.exact_dedup (digest groupBy, min-id
rep). The streaming shape answers a different operational question — an
INGEST pipeline seeing documents arrive over time must drop re-crawls /
re-submissions near arrival time without holding every digest ever seen:
``dropDuplicatesWithinWatermark`` keeps the first arrival per digest and
EVICTS digest state once the watermark passes it, so state is bounded by
(arrival rate × watermark), not corpus size. A duplicate arriving after
its digest's state expired is emitted again — the documented trade; make
the watermark as long as the re-crawl horizon or run a batch exact_dedup
compaction downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_docs_stream(
    docs_stream: DataFrame,
    watermark: str = "1 hour",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """First-arrival-wins exact dedup of a document stream by md5 content
    digest, state bounded by the event-time watermark."""
    return (
        docs_stream.withColumn("digest", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def dedup_docs_batch(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Batch twin: one surviving row per digest (min id — deterministic,
    unlike first-arrival, which depends on stream order). Same digest
    grouping as functions.dedup.exact_dedup."""
    w = docs.withColumn("digest", F.md5(F.col(text_col)))
    reps = w.groupBy("digest").agg(F.min(id_col).alias(id_col))
    return w.join(reps, on=["digest", id_col], how="left_semi")

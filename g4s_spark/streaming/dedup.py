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


def dedup_against_stream(
    docs_stream: DataFrame,
    corpus: DataFrame,
    sink,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming incremental dedup: each micro-batch of arriving docs is
    near-dup-checked against a STATIC reference corpus (the batch op
    functions.dedup.dedup_against), and the surviving docs go to
    ``sink(kept_df, batch_id)``. The signature computation is row-wise
    (no aggregation state); the per-batch anti-join probes the corpus's
    precomputable bucket table — foreachBatch because the doc-level
    "no band matched" decision needs a per-doc ALL over band rows,
    which append-mode streams cannot express mid-plan. Returns the
    StreamingQuery; callers own stop().

    Note: batches are checked against the corpus only, not against each
    other — compose with dedup_docs_stream (exact) upstream or a batch
    compaction downstream for intra-stream near-dups."""
    from ..functions.dedup import dedup_against

    def check_batch(batch_df, batch_id):
        sink(dedup_against(batch_df, corpus, text_col, id_col), batch_id)

    return (
        docs_stream.writeStream.foreachBatch(check_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )

"""Streaming temporal enrichment (round-9): AS-OF join of an arriving
point stream against a static (or slowly-refreshed) dimension table —
the point-in-time feature-lookup every event-driven training pipeline
runs (attach the latest model score / price / profile at-or-before each
event).

foreachBatch, like streaming/dedup.dedup_against_stream: the AS-OF
formulation is a keyed running window, which an append-mode stream
cannot express mid-plan; per micro-batch it is the plain batch operator
(functions.temporal.asof_join), so stream and batch results coincide
batch-by-batch. State lives entirely in the static side — nothing
accumulates across batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def asof_enrich_stream(
    points_stream: DataFrame,
    dim: DataFrame,
    sink,
    checkpoint: str,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_s: float | None = None,
    direction: str = "backward",
):
    """Each micro-batch of ``points_stream`` is asof_join-ed (inclusive,
    optional tolerance, any ``direction`` — backward/forward/nearest,
    round-11 parity with the batch operator) against the static ``dim``
    and handed to ``sink(enriched_df, batch_id)``. Returns the
    StreamingQuery; callers own stop(). Batches are independent — the
    dimension is the only join state, so a replayed batch re-enriches
    identically (exactly-once downstream is the sink's checkpoint
    contract)."""
    from ..functions.temporal import asof_join

    def enrich_batch(batch_df, batch_id):
        sink(
            asof_join(
                batch_df, dim, on=on, left_ts=left_ts,
                right_ts=right_ts, tolerance_s=tolerance_s,
                direction=direction,
            ),
            batch_id,
        )

    return (
        points_stream.writeStream.foreachBatch(enrich_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def range_enrich_stream(
    points_stream: DataFrame,
    intervals: DataFrame,
    sink,
    checkpoint: str,
    on: str | list[str] | None,
    point_ts: str = "ts",
    start_ts: str = "start",
    end_ts: str = "end",
    bucket_s: int | None = 3600,
    how: str = "inner",
    max_fanout: int = 1024,
):
    """Streaming twin of functions.temporal.range_join (round-10,
    completing the temporal family's streaming story — VERDICT r9 #8):
    each micro-batch of arriving points joins every containing interval
    of the static ``intervals`` table (inclusive BETWEEN, optional
    equality keys, 'inner' or 'left') and is handed to
    ``sink(joined_df, batch_id)``. Returns the StreamingQuery; callers
    own stop().

    foreachBatch for the same reason as asof_enrich_stream: the bucketed
    band join explodes the STATIC side only, so per micro-batch it is
    exactly the batch operator — stream and batch results coincide
    batch-by-batch (pinned in tests), no state accumulates, and a
    replayed batch re-joins identically. ``bucket_s=None`` is resolved
    to a concrete width HERE, once — per-batch derivation would re-scan
    the static intervals side for the same median every micro-batch."""
    from ..functions.temporal import derive_bucket_s, range_join

    if bucket_s is None:
        bucket_s = derive_bucket_s(intervals, start_ts, end_ts)

    def join_batch(batch_df, batch_id):
        sink(
            range_join(
                batch_df, intervals, on=on, point_ts=point_ts,
                start_ts=start_ts, end_ts=end_ts,
                bucket_s=bucket_s, how=how, max_fanout=max_fanout,
            ),
            batch_id,
        )

    return (
        points_stream.writeStream.foreachBatch(join_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )

from .dedup import dedup_against_stream, dedup_docs_batch, dedup_docs_stream
from .temporal import asof_enrich_stream, range_enrich_stream
from .events import (
    compact_edge_ingest,
    enrich_events,
    extract_props,
    window_anomalies,
    event_followups,
    funnel,
    event_followups_stream,
    read_events_stream,
    stream_edges_into_graph,
    trending_topk,
    trending_topk_stream,
    session_counts,
    session_window_counts,
    sessionize,
    sessionize_stream,
    windowed_counts,
    windowed_counts_stream,
)

__all__ = [
    "windowed_counts", "windowed_counts_stream", "sessionize",
    "session_counts", "session_window_counts", "sessionize_stream",
    "read_events_stream", "stream_edges_into_graph", "compact_edge_ingest",
    "dedup_docs_stream", "dedup_docs_batch", "dedup_against_stream",
    "asof_enrich_stream",
    "range_enrich_stream",
    "event_followups", "event_followups_stream", "funnel",
    "enrich_events", "trending_topk", "trending_topk_stream", "window_anomalies", "extract_props",
]

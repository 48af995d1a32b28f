from csv_query_engine_spark.streaming.events import (
    conversion_join,
    ensure_event_time,
    enrich_with_dim,
    quality_gate_stream,
    read_events_stream,
    run_stream_to_memory,
    running_user_totals,
    sessionize_stream,
    stateful_type_profiles,
    stream_dedup,
    streaming_heavy_hitters,
    windowed_event_counts,
)

__all__ = [
    "conversion_join",
    "enrich_with_dim",
    "ensure_event_time",
    "quality_gate_stream",
    "read_events_stream",
    "run_stream_to_memory",
    "running_user_totals",
    "sessionize_stream",
    "stateful_type_profiles",
    "stream_dedup",
    "streaming_heavy_hitters",
    "windowed_event_counts",
]

from temporalvault_spark.streaming.jobs import (
    clicks_to_purchases_join,
    dedup_events_stream,
    dedup_ingest_stream,
    events_stream,
    funnel_state_stream,
    ingest_into_vault,
    latest_state_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    tumbling_counts,
    user_totals_stream,
)

__all__ = [
    "events_stream",
    "dedup_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "latest_state_stream",
    "run_available_now",
    "ingest_into_vault",
    "dedup_ingest_stream",
    "funnel_state_stream",
    "clicks_to_purchases_join",
    "user_totals_stream",
]
